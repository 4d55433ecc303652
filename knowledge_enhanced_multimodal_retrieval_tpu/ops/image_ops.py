"""Device-side image preprocessing (resize / center-crop / normalize).

TPU-native replacement for the reference's host-side torchvision pipeline
(the ``preprocess`` returned by ``clip.load`` and applied per sample in
``src/clip/datasets/clip_dataset.py:56-78``): bicubic shorter-side resize,
center crop, scale to [0,1], per-channel normalization. Implemented as
jittable XLA transforms so serving-path images can be preprocessed on device,
fused with the encoder forward.

Layout is NHWC (TPU-friendly); a host PIL path with identical semantics lives
in ``data.preprocess`` for bit-parity with the reference's PIL decoding.
"""

from __future__ import annotations

import functools
import jax
import jax.numpy as jnp

# Public OpenAI CLIP normalization constants.
CLIP_MEAN = (0.48145466, 0.4578275, 0.40821073)
CLIP_STD = (0.26862954, 0.26130258, 0.27577711)


def resize_shorter_side(image: jax.Array, size: int, method: str = "cubic") -> jax.Array:
    """Resize so the shorter side equals ``size``, preserving aspect ratio.

    ``image``: [H, W, C], any float/uint dtype. Anti-aliased cubic resampling
    (the XLA analogue of PIL BICUBIC, which always filters on downscale).
    Output shape depends only on the static input shape, so this stays
    jit-compatible (one trace per input geometry).
    """
    h, w = image.shape[0], image.shape[1]
    # floored long side — torchvision's and HF's shared formula
    # (see data/preprocess.resize_shortest_edge, pinned by tests)
    if h <= w:
        new_h, new_w = size, int(w * size / h)
    else:
        new_h, new_w = int(h * size / w), size
    img = image.astype(jnp.float32)
    return jax.image.resize(img, (new_h, new_w, image.shape[2]), method=method, antialias=True)


def center_crop(image: jax.Array, size: int) -> jax.Array:
    """Crop the central ``size`` x ``size`` region of an [H, W, C] image."""
    h, w = image.shape[0], image.shape[1]
    top = max(0, (h - size) // 2)
    left = max(0, (w - size) // 2)
    return jax.lax.dynamic_slice(image, (top, left, 0), (min(size, h), min(size, w), image.shape[2]))


def normalize(image01: jax.Array, mean=CLIP_MEAN, std=CLIP_STD) -> jax.Array:
    """Per-channel normalize an image already scaled to [0, 1]."""
    mean = jnp.asarray(mean, dtype=image01.dtype)
    std = jnp.asarray(std, dtype=image01.dtype)
    return (image01 - mean) / std


@functools.partial(jax.jit, static_argnames=("size", "method"))
def preprocess_image(image: jax.Array, size: int = 224, method: str = "cubic") -> jax.Array:
    """Full CLIP preprocess for one [H, W, 3] uint8/float image -> [size, size, 3] float32.

    resize(shorter->size, bicubic) -> center crop -> /255 -> normalize.
    """
    img = resize_shorter_side(image, size, method)
    img = center_crop(img, size)
    img = jnp.clip(img / 255.0, 0.0, 1.0)
    return normalize(img)


def preprocess_batch(images: jax.Array, size: int = 224) -> jax.Array:
    """Preprocess a fixed-geometry [N, H, W, 3] batch (vmapped device path)."""
    return jax.vmap(lambda im: preprocess_image(im, size=size))(images)
