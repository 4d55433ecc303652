"""Host-side image preprocessing (PIL path) — bit-parity with the reference.

The reference preprocesses with the torchvision ``Compose`` returned by
``clip.load``: ``Resize(n_px, BICUBIC) -> CenterCrop(n_px) -> RGB ->
ToTensor -> Normalize`` applied per sample in the dataset
(``src/clip/datasets/clip_dataset.py:56-78``). This module reproduces those
exact semantics with PIL on the host, producing NHWC float32 numpy arrays;
the jittable device path lives in ``ops.image_ops``.

Decode failures fall back to a zero image, matching the reference's
error-resilience (``clip_dataset.py:66-71``).
"""

from __future__ import annotations

import io
from typing import Tuple

import numpy as np

from ..ops.image_ops import CLIP_MEAN, CLIP_STD


def _to_pil(image):
    from PIL import Image

    if isinstance(image, Image.Image):
        return image
    if isinstance(image, (bytes, bytearray)):
        return Image.open(io.BytesIO(image))
    if isinstance(image, np.ndarray):
        return Image.fromarray(image)
    if isinstance(image, str):
        return Image.open(image)
    raise TypeError(f"unsupported image input type {type(image)!r}")


def preprocess_pil(image, size: int = 224) -> np.ndarray:
    """CLIP preprocess via PIL: returns [size, size, 3] float32 (normalized)."""
    from PIL import Image

    img = _to_pil(image).convert("RGB")
    w, h = img.size
    # shorter-side resize, PIL BICUBIC (antialiased)
    if w <= h:
        new_w, new_h = size, max(size, int(round(h * size / w)))
    else:
        new_w, new_h = max(size, int(round(w * size / h))), size
    img = img.resize((new_w, new_h), resample=Image.BICUBIC)
    # center crop
    left = (new_w - size) // 2
    top = (new_h - size) // 2
    img = img.crop((left, top, left + size, top + size))
    arr = np.asarray(img, dtype=np.float32) / 255.0
    mean = np.asarray(CLIP_MEAN, dtype=np.float32)
    std = np.asarray(CLIP_STD, dtype=np.float32)
    return (arr - mean) / std


def safe_preprocess(image, size: int = 224) -> Tuple[np.ndarray, bool]:
    """Preprocess with zero-image fallback on decode error.

    Returns ``(array, ok)``. Matches reference ``clip_dataset.py:66-71``.
    """
    try:
        return preprocess_pil(image, size), True
    except Exception:
        return np.zeros((size, size, 3), dtype=np.float32), False
