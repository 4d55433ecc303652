import numpy as np
import pytest

from knowledge_enhanced_multimodal_retrieval_tpu.data.preprocess import preprocess_pil, safe_preprocess
from knowledge_enhanced_multimodal_retrieval_tpu.ops import image_ops as iops


def _rand_image(rng, h, w):
    return (rng.random((h, w, 3)) * 255).astype(np.uint8)


def test_center_crop_exact():
    img = np.arange(6 * 8 * 1, dtype=np.float32).reshape(6, 8, 1)
    out = np.asarray(iops.center_crop(img, 4))
    np.testing.assert_array_equal(out, img[1:5, 2:6, :])


def test_normalize_values():
    x = np.full((2, 2, 3), 0.5, np.float32)
    out = np.asarray(iops.normalize(x))
    expected = (0.5 - np.array(iops.CLIP_MEAN)) / np.array(iops.CLIP_STD)
    np.testing.assert_allclose(out[0, 0], expected, rtol=1e-6)


def test_resize_shorter_side_geometry():
    img = np.zeros((100, 200, 3), np.float32)
    out = iops.resize_shorter_side(img, 224)
    assert out.shape == (224, 448, 3)
    img2 = np.zeros((300, 150, 3), np.float32)
    out2 = iops.resize_shorter_side(img2, 224)
    assert out2.shape == (448, 224, 3)


def test_preprocess_shapes(rng):
    img = _rand_image(rng, 310, 420)
    out = np.asarray(iops.preprocess_image(img, size=224))
    assert out.shape == (224, 224, 3)
    assert out.dtype == np.float32


def test_device_vs_pil_parity(rng):
    """Device (XLA cubic) and host (PIL BICUBIC) paths agree closely."""
    pytest.importorskip("PIL")
    img = _rand_image(rng, 320, 480)
    dev = np.asarray(iops.preprocess_image(img, size=224))
    host = preprocess_pil(img, size=224)
    assert dev.shape == host.shape
    # Both are antialiased cubic resamplers; random noise is the hardest case.
    diff = np.abs(dev - host)
    assert diff.mean() < 0.05, f"mean abs diff {diff.mean()}"
    # cosine similarity of flattened normalized images
    a, b = dev.ravel(), host.ravel()
    cos = a @ b / (np.linalg.norm(a) * np.linalg.norm(b))
    assert cos > 0.995, f"cosine {cos}"


def test_device_vs_pil_parity_natural(rng):
    """Smooth (natural-image-like) content should match much tighter."""
    pytest.importorskip("PIL")
    yy, xx = np.mgrid[0:300, 0:400].astype(np.float32)
    smooth = np.stack([np.sin(yy / 23) * 0.5 + 0.5, np.cos(xx / 31) * 0.5 + 0.5, (xx + yy) / 700], -1)
    img = (smooth * 255).astype(np.uint8)
    dev = np.asarray(iops.preprocess_image(img, size=224))
    host = preprocess_pil(img, size=224)
    assert np.abs(dev - host).mean() < 5e-3


def test_preprocess_batch(rng):
    imgs = np.stack([_rand_image(rng, 256, 256) for _ in range(4)])
    out = np.asarray(iops.preprocess_batch(imgs, size=224))
    assert out.shape == (4, 224, 224, 3)


def test_safe_preprocess_fallback():
    arr, ok = safe_preprocess(b"not an image", size=224)
    assert not ok
    assert arr.shape == (224, 224, 3)
    assert (arr == 0).all()


def test_pil_upscale_small_image():
    pytest.importorskip("PIL")
    img = np.zeros((50, 60, 3), np.uint8)
    out = preprocess_pil(img, size=224)
    assert out.shape == (224, 224, 3)


# ---------------------------------------------------------------------------
# Preprocess parity modes (openai torchvision vs HF CLIPImageProcessor)
# ---------------------------------------------------------------------------


def test_resize_shortest_edge_floor_semantics():
    """Both torchvision and HF floor the long side: int(size * long / short)."""
    pytest.importorskip("PIL")
    from PIL import Image

    from knowledge_enhanced_multimodal_retrieval_tpu.data.preprocess import resize_shortest_edge

    img = Image.fromarray(np.zeros((225, 301, 3), np.uint8))
    out = resize_shortest_edge(img, 224)
    assert out.size == (int(224 * 301 / 225), 224)  # (299, 224), floored


def test_openai_vs_hf_crop_offset(rng):
    """When the post-resize extent minus crop size is odd, torchvision's
    round-half-even offset sits one pixel right/below HF's floor offset."""
    pytest.importorskip("PIL")
    img = _rand_image(rng, 225, 301)  # resizes to (299, 224): 299-224=75 odd
    a = preprocess_pil(img, size=224, mode="openai")
    b = preprocess_pil(img, size=224, mode="hf")
    assert a.shape == b.shape == (224, 224, 3)
    assert not np.allclose(a, b)
    np.testing.assert_allclose(a[:, :-1], b[:, 1:], atol=1e-6)


def test_modes_identical_on_even_margins(rng):
    pytest.importorskip("PIL")
    img = _rand_image(rng, 224, 448)  # margins even -> identical crops
    a = preprocess_pil(img, size=224, mode="openai")
    b = preprocess_pil(img, size=224, mode="hf")
    np.testing.assert_array_equal(a, b)


def test_hf_mode_matches_transformers_processor(rng):
    """Bit-parity with the actual HF CLIPImageProcessor (evaluator_hf parity)."""
    pytest.importorskip("PIL")
    transformers = pytest.importorskip("transformers")
    from PIL import Image

    proc = transformers.CLIPImageProcessor(
        do_resize=True,
        size={"shortest_edge": 224},
        resample=3,  # PILImageResampling.BICUBIC
        do_center_crop=True,
        crop_size={"height": 224, "width": 224},
        do_rescale=True,
        do_normalize=True,
        image_mean=list(iops.CLIP_MEAN),
        image_std=list(iops.CLIP_STD),
        do_convert_rgb=True,
    )
    for h, w in [(225, 301), (320, 480), (640, 300), (224, 224), (150, 500)]:
        img = Image.fromarray(_rand_image(rng, h, w))
        ref = proc(img, return_tensors="np")["pixel_values"][0].transpose(1, 2, 0)
        got = preprocess_pil(img, size=224, mode="hf")
        np.testing.assert_allclose(got, ref, atol=2e-6), (h, w)


def test_preprocess_mode_rejects_unknown():
    with pytest.raises(ValueError):
        preprocess_pil(np.zeros((64, 64, 3), np.uint8), mode="nope")
