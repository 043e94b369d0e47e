"""Host-side image loading/decoding for the data pipeline.

Dataloader workers decode + geometrically resize with PIL (parity with the
reference's CLIPImageProcessor usage, base_dataset.py:178-197) but emit
uint8 HWC arrays; rescale+normalize happen on-device through
:mod:`merlin_tpu.ops.image_ops` so they fuse into the model's first ops.
"""

from __future__ import annotations

import io
from typing import Optional, Tuple

import numpy as np

CLIP_MEAN = (0.48145466, 0.4578275, 0.40821073)


def _pil():
    from PIL import Image, ImageFile
    ImageFile.LOAD_TRUNCATED_IMAGES = True  # reference base_dataset.py:19
    return Image


def load_image(path_or_bytes) -> "Image":
    Image = _pil()
    if isinstance(path_or_bytes, (bytes, bytearray)):
        return Image.open(io.BytesIO(path_or_bytes)).convert("RGB")
    return Image.open(path_or_bytes).convert("RGB")


def preprocess_pil(image, image_size: int = 448,
                   aspect_mode: str = "resize") -> np.ndarray:
    """PIL image -> uint8 (S, S, 3) under the reference aspect modes."""
    Image = _pil()
    if aspect_mode == "resize":
        image = image.resize((image_size, image_size), Image.BICUBIC)
    elif aspect_mode == "pad":
        w, h = image.size
        side = max(w, h)
        fill = tuple(int(m * 255) for m in CLIP_MEAN)
        canvas = Image.new("RGB", (side, side), fill)
        canvas.paste(image, (0, 0))  # top-left: keeps box coords valid
        image = canvas.resize((image_size, image_size), Image.BICUBIC)
    elif aspect_mode == "keep":
        w, h = image.size
        aspect = max(w, h) / min(w, h)
        shortest = int(min(image_size * 2 / aspect, image_size))
        scale = shortest / min(w, h)
        image = image.resize((round(w * scale), round(h * scale)),
                             Image.BICUBIC)
    elif aspect_mode == "none":
        w, h = image.size
        scale = image_size / min(w, h)
        image = image.resize((round(w * scale), round(h * scale)),
                             Image.BICUBIC)
        left = (image.size[0] - image_size) // 2
        top = (image.size[1] - image_size) // 2
        image = image.crop((left, top, left + image_size, top + image_size))
    else:
        raise ValueError(f"unknown aspect_mode {aspect_mode!r}")
    return np.asarray(image, np.uint8)


def zero_image(image_size: int) -> np.ndarray:
    """Broken-image fallback (reference conversation_dataset.py:200-214)."""
    return np.zeros((image_size, image_size, 3), np.uint8)


def load_and_preprocess(path, image_size: int = 448,
                        aspect_mode: str = "resize") -> np.ndarray:
    try:
        return preprocess_pil(load_image(path), image_size, aspect_mode)
    except Exception:
        return zero_image(image_size)
