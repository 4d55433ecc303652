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
