"""Vision tower factory (reference model/vision_encoder/builder.py:7-15:
name-substring dispatch — 'qwen' -> the no-sampler Qwen tower, 'sam' ->
SAM ViTDet, default CLIP; metaclip is a dead variant there)."""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp

from merlin_tpu.models.sam_vit import SAMImageEncoder, SAMViTConfig
from merlin_tpu.models.vit import (
    CLIPVisionTower, ViTConfig, clip_vit_l14, metaclip_vit_h14, qwen_vit_bigG)


def vision_kind_from_name(name: str) -> str:
    low = (name or "clip").lower()
    if "qwen" in low:
        return "qwen"
    if "sam" in low:
        return "sam"
    if "metaclip" in low:
        return "metaclip"
    return "clip"


def default_vision_config(kind: str, image_size: int, dtype=jnp.bfloat16):
    if kind == "sam":
        return SAMViTConfig(dtype=dtype)  # SAM runs at its native 1024
    if kind == "qwen":
        return qwen_vit_bigG(image_size, dtype=dtype)
    if kind == "metaclip":
        return metaclip_vit_h14(image_size, dtype=dtype)
    return clip_vit_l14(image_size, dtype=dtype)


def build_vision_tower(kind: str, cfg, *, select_layer: int = -2,
                       select_feature: str = "patch", name: str = "vision_tower"):
    if kind == "sam":
        assert isinstance(cfg, SAMViTConfig)
        return SAMImageEncoder(cfg, name=name)
    assert isinstance(cfg, ViTConfig)
    if kind == "qwen":
        # Qwen tower: last hidden state, no CLS to drop
        return CLIPVisionTower(cfg, select_layer=-1,
                               select_feature="cls_patch", name=name)
    return CLIPVisionTower(cfg, select_layer=select_layer,
                           select_feature=select_feature, name=name)
