"""Native image-preprocess engine parity (native/image.cpp).

The C++ engine re-implements Pillow's two-pass fixed-point bicubic resample
plus both center-crop rounding modes; these tests pin bit-exactness against
the PIL path (reference semantics: ``clip_dataset.py:56-78`` torchvision,
``evaluator_hf.py:115-147`` HF processor).
"""

import numpy as np
import pytest

from knowledge_enhanced_multimodal_retrieval_tpu.data.preprocess import preprocess_pil
from knowledge_enhanced_multimodal_retrieval_tpu.native.image_wrapper import (
    clip_preprocess_native,
    native_image_available,
    resize_bicubic_u8,
)
from knowledge_enhanced_multimodal_retrieval_tpu.ops.image_ops import CLIP_MEAN, CLIP_STD

pytestmark = pytest.mark.skipif(
    not native_image_available(), reason="no C++ toolchain for the native engine"
)


def test_resize_bit_exact_vs_pil(rng):
    from PIL import Image

    for h, w, nh, nw in [
        (480, 640, 224, 298),  # downscale
        (100, 300, 224, 672),  # upscale rows, downscale cols
        (224, 224, 224, 224),  # identity
        (37, 1000, 224, 6054),  # extreme aspect
        (225, 224, 225, 224),  # near-identity
    ]:
        arr = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
        ref = np.asarray(Image.fromarray(arr).resize((nw, nh), Image.BICUBIC))
        got = resize_bicubic_u8(arr, nh, nw)
        np.testing.assert_array_equal(got, ref)


@pytest.mark.parametrize("mode", ["openai", "hf"])
def test_preprocess_bit_exact_vs_pil_fuzz(mode, rng):
    for _ in range(25):
        h, w = int(rng.integers(30, 700)), int(rng.integers(30, 700))
        arr = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
        ref = preprocess_pil(arr, 224, mode=mode, use_native=False)
        got = clip_preprocess_native(arr, 224, mode, CLIP_MEAN, CLIP_STD)
        np.testing.assert_array_equal(got, ref)


def test_preprocess_pil_auto_routes_native(rng):
    """Default preprocess_pil uses the native engine and matches PIL."""
    arr = rng.integers(0, 256, (223, 410, 3), dtype=np.uint8)
    auto = preprocess_pil(arr, 224)
    pure = preprocess_pil(arr, 224, use_native=False)
    np.testing.assert_array_equal(auto, pure)


def test_crop_offset_roundings(rng):
    """openai (round-half-even) vs hf (floor) differ by one row when the
    post-resize margin is odd — both must match their PIL references."""
    # margin must be ≡ 3 (mod 4) for half-even and floor to differ:
    # (302, 99) resizes to 683x224 -> margin 459, offset 229.5 -> 230 vs 229
    arr = rng.integers(0, 256, (302, 99, 3), dtype=np.uint8)
    for mode in ("openai", "hf"):
        ref = preprocess_pil(arr, 224, mode=mode, use_native=False)
        got = clip_preprocess_native(arr, 224, mode, CLIP_MEAN, CLIP_STD)
        np.testing.assert_array_equal(got, ref)
    a = clip_preprocess_native(arr, 224, "openai", CLIP_MEAN, CLIP_STD)
    b = clip_preprocess_native(arr, 224, "hf", CLIP_MEAN, CLIP_STD)
    assert not np.array_equal(a, b)
