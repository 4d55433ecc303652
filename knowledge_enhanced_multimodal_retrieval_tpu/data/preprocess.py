"""Host-side image preprocessing (PIL path) — bit-parity with the reference.

Two parity modes, selected per call:

- ``mode="openai"`` — the torchvision ``Compose`` returned by ``clip.load``:
  ``Resize(n_px, BICUBIC) -> CenterCrop(n_px) -> RGB -> ToTensor ->
  Normalize``, applied per sample in the dataset (reference
  ``src/clip/datasets/clip_dataset.py:56-78``). torchvision semantics:
  resized long side is ``int(n_px * long / short)`` (floor) and the center
  crop offset is ``int(round((extent - n_px) / 2))``.
- ``mode="hf"`` — HuggingFace ``CLIPImageProcessor`` as used when evaluating
  the published model (reference ``src/clip/eval/evaluator_hf.py:115-147``):
  same shortest-edge formula, but the crop offset is ``(extent - n_px) // 2``
  (floor). Differs from ``openai`` by at most one pixel row/column when the
  post-resize extent minus ``n_px`` is odd.

Both run PIL's antialiased bicubic resize (torchvision delegates to PIL for
PIL inputs, as does HF's processor), rescale by 1/255, and normalize with the
CLIP mean/std. One documented deviation: RGB conversion happens *before*
resizing in both modes (HF's order); ``clip.load`` converts after the crop,
which differs only for palette/alpha sources where resizing raw palette
indices is a reference defect not worth replicating (docs/PARITY.md).

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


def resize_shortest_edge(img, size: int):
    """Shortest-edge bicubic resize, identical in torchvision and HF."""
    from PIL import Image

    w, h = img.size
    if w <= h:
        new_w, new_h = size, int(size * h / w)
    else:
        new_w, new_h = int(size * w / h), size
    return img.resize((new_w, new_h), resample=Image.BICUBIC)


def preprocess_pil(image, size: int = 224, mode: str = "openai", use_native=None) -> np.ndarray:
    """CLIP preprocess via PIL: returns [size, size, 3] float32 (normalized).

    ``mode`` selects torchvision (``"openai"``) vs ``CLIPImageProcessor``
    (``"hf"``) center-crop rounding — see module docstring.

    ``use_native=None`` auto-uses the C++ engine (``native/image.cpp``) when
    available for the compute half (resize/crop/normalize, bit-exact with
    the PIL path and GIL-free); decode + RGB conversion stay with PIL.
    """
    if mode not in ("openai", "hf"):
        raise ValueError(f"unknown preprocess mode {mode!r}; use 'openai' or 'hf'")
    img = _to_pil(image).convert("RGB")
    if use_native or use_native is None:
        from ..native.image_wrapper import clip_preprocess_native

        out = clip_preprocess_native(np.asarray(img), size, mode, CLIP_MEAN, CLIP_STD)
        if out is not None:
            return out
        if use_native:
            raise RuntimeError("native image engine requested but unavailable")
    img = resize_shortest_edge(img, size)
    new_w, new_h = img.size
    if mode == "openai":  # torchvision CenterCrop: round-half-even offsets
        left = int(round((new_w - size) / 2.0))
        top = int(round((new_h - size) / 2.0))
    else:  # HF image_transforms.center_crop: floor offsets
        left = (new_w - size) // 2
        top = (new_h - size) // 2
    img = img.crop((left, top, left + size, top + size))
    arr = np.asarray(img, dtype=np.float32) / 255.0
    mean = np.asarray(CLIP_MEAN, dtype=np.float32)
    std = np.asarray(CLIP_STD, dtype=np.float32)
    return (arr - mean) / std


def safe_preprocess(image, size: int = 224, mode: str = "openai") -> Tuple[np.ndarray, bool]:
    """Preprocess with zero-image fallback on decode error.

    Returns ``(array, ok)``. Matches reference ``clip_dataset.py:66-71``.
    """
    try:
        return preprocess_pil(image, size, mode=mode), True
    except Exception:
        return np.zeros((size, size, 3), dtype=np.float32), False
