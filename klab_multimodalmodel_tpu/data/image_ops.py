"""On-device image preprocessing.

The reference runs the HF image processor on CPU inside the train loop every
step (``/root/reference/train.py:55``) — after the dataset has *already*
resized and rescaled (quirk #5, SURVEY.md §2A). Here the host pipeline ships
raw uint8 images and normalization runs on-device inside the jit-compiled
step, fused by XLA into the first conv.

``reference_double_rescale=True`` reproduces the reference's accidental
numerics exactly: images already scaled to [0,1] are rescaled by 1/255 again
before ImageNet normalization (ToTensor at loader.py:16 followed by the HF
processor's rescale at train.py:55).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# HF Swinv2 preprocessor defaults (IMAGENET_STANDARD mean/std).
IMAGENET_MEAN = (0.485, 0.456, 0.406)
IMAGENET_STD = (0.229, 0.224, 0.225)


def normalize_images(images_uint8: jax.Array,
                     dtype=jnp.float32,
                     reference_double_rescale: bool = False) -> jax.Array:
    """(B, H, W, 3) uint8 -> normalized (B, H, W, 3) in ``dtype``."""
    x = images_uint8.astype(jnp.float32) / 255.0
    if reference_double_rescale:
        x = x / 255.0
    mean = jnp.asarray(IMAGENET_MEAN, jnp.float32)
    std = jnp.asarray(IMAGENET_STD, jnp.float32)
    return ((x - mean) / std).astype(dtype)
