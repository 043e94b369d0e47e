"""Device-side image preprocessing as fused XLA ops.

The reference preprocesses with PIL + CLIPImageProcessor on dataloader
workers (base_dataset.py:178-197). The BASELINE north star requires the
multi-frame preprocessing to *compile to fused XLA ops*; this module is
that path: uint8 HWC frames -> resized, normalized model input entirely
on-device (resize + rescale + normalize fuse into a couple of kernels).

Aspect modes (reference parity):
  * 'resize' — stretch to (S, S) (the Merlin training default)
  * 'pad'    — expand to square with CLIP-mean fill, top-left paste
               (mm_utils.expand2square keeps boxes valid), then resize
  * 'none'   — CLIP default: resize shortest edge to S then center crop
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

CLIP_MEAN = (0.48145466, 0.4578275, 0.40821073)
CLIP_STD = (0.26862954, 0.26130258, 0.27577711)


def normalize(images: jax.Array, mean=CLIP_MEAN, std=CLIP_STD) -> jax.Array:
    """float [0,1] (or uint8) HWC images -> normalized float32."""
    if images.dtype == jnp.uint8:
        images = images.astype(jnp.float32) / 255.0
    mean = jnp.asarray(mean, jnp.float32)
    std = jnp.asarray(std, jnp.float32)
    return (images.astype(jnp.float32) - mean) / std


def resize_bicubic(images: jax.Array, size: Tuple[int, int]) -> jax.Array:
    """Batched bicubic resize, NHWC. No-op when already at target size
    (jax.image.resize does NOT short-circuit and costs ~5ms for an 8-frame
    448 batch otherwise)."""
    b, h, w, c = images.shape
    if (h, w) == tuple(size):
        return images.astype(jnp.float32)
    return jax.image.resize(images.astype(jnp.float32),
                            (b, size[0], size[1], c), method="bicubic")


def expand2square(images: jax.Array, fill=CLIP_MEAN) -> jax.Array:
    """Top-left paste into a square canvas filled with `fill` (in [0,1]
    units; reference mm_utils.expand2square:10-21 keeps the image at the
    origin so box coordinates stay valid)."""
    b, h, w, c = images.shape
    side = max(h, w)
    fill = jnp.asarray(fill, jnp.float32) * (
        255.0 if images.dtype == jnp.uint8 else 1.0)
    canvas = jnp.broadcast_to(fill, (b, side, side, c)).astype(jnp.float32)
    return jax.lax.dynamic_update_slice(
        canvas, images.astype(jnp.float32), (0, 0, 0, 0))


def center_crop(images: jax.Array, size: int) -> jax.Array:
    b, h, w, c = images.shape
    top = (h - size) // 2
    left = (w - size) // 2
    return jax.lax.dynamic_slice(images, (0, top, left, 0),
                                 (b, size, size, c))


@functools.partial(jax.jit, static_argnames=("image_size", "aspect_mode"))
def preprocess_images(images: jax.Array, *, image_size: int = 448,
                      aspect_mode: str = "resize") -> jax.Array:
    """uint8/float NHWC frames -> normalized f32 (b, S, S, 3).

    Jit once per input geometry; XLA fuses rescale+normalize into the
    resize. This is the hot path for the 8-frame interpair encode.
    """
    if images.dtype == jnp.uint8:
        images = images.astype(jnp.float32) / 255.0
    if aspect_mode == "resize":
        images = resize_bicubic(images, (image_size, image_size))
    elif aspect_mode == "pad":
        images = expand2square(images)
        images = resize_bicubic(images, (image_size, image_size))
    elif aspect_mode == "none":
        b, h, w, c = images.shape
        scale = image_size / min(h, w)
        nh, nw = round(h * scale), round(w * scale)
        images = resize_bicubic(images, (nh, nw))
        images = center_crop(images, image_size)
    else:
        raise ValueError(f"unknown aspect_mode {aspect_mode!r}")
    images = jnp.clip(images, 0.0, 1.0)
    return normalize(images)
