"""MMGPT: the multimodal composition (vision tower -> projector -> LM).

Rebuilds ``model/mmgpt/base_mmgpt.py`` TPU-first. The reference splices
projected image features into the token-embedding sequence with a
*per-sample Python loop* over <im_start> positions (base_mmgpt.py:104-160,
flagged in SURVEY.md §3.1 as a hot serial path). Here the splice is a single
vectorized gather: every ``<im_patch>`` position pulls its feature by
running count, so XLA fuses it and there is no host loop and no dynamic
shape.

Batching contract (static shapes for XLA):
  * ``images``: (b, max_images, H, W, C) — samples with fewer images pad
    with zero images; unused slots are never gathered because they have no
    ``<im_patch>`` tokens. This also subsumes the reference's
    dummy-feature 0-mult trick for text-only samples
    (base_mmgpt.py:109-113): the tower always runs, so its params stay in
    the graph.
  * number of <im_patch> tokens in row i == (#real images in row i) *
    image_token_len, in image order — guaranteed by the data layer.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from merlin_tpu.models.decoder import CausalLM, DecoderConfig, cross_entropy_loss
from merlin_tpu.models.projectors import build_projector
from merlin_tpu.utils.constants import IGNORE_INDEX


@dataclasses.dataclass(frozen=True)
class MMGPTConfig:
    lm: DecoderConfig
    vit: Any  # ViTConfig or SAMViTConfig, per vision_kind
    projector: str = "conv"
    conv_stride: int = 2
    vision_kind: str = "clip"  # clip | metaclip | qwen | sam
    select_layer: int = -2
    select_feature: str = "patch"
    use_im_start_end: bool = True
    # token ids assigned by the tokenizer after add_special_tokens
    image_patch_id: int = -1
    im_start_id: int = -1
    im_end_id: int = -1

    @property
    def vision_grid(self) -> int:
        return getattr(self.vit, "grid_size", None) or self.vit.grid

    @property
    def image_token_len(self) -> int:
        """Tokens per image after projection (reference clip_encoder.py:106-107,
        sam_encoder.py:64-65, qwen Resampler 256 queries)."""
        if self.projector in ("conv",):
            side = self.vision_grid // self.conv_stride
            return side * side
        if self.projector in ("qwen_sampler", "resampler"):
            return 256
        if self.projector == "sam":
            # two stride-2 convs over the grid (sam_projector.py:12-30)
            return (self.vision_grid // 4) ** 2
        return self.vision_grid ** 2


def splice_image_embeds(token_embeds: jax.Array, patch_mask: jax.Array,
                        image_feats: jax.Array) -> jax.Array:
    """Vectorized image-feature splice.

    token_embeds: (b, s, d); patch_mask: (b, s) bool marking <im_patch>
    positions; image_feats: (b, n_feats, d) projected features in image
    order. The k-th True position in row i receives image_feats[i, k].
    """
    idx = jnp.cumsum(patch_mask.astype(jnp.int32), axis=1) - 1
    idx = jnp.clip(idx, 0, image_feats.shape[1] - 1)
    gathered = jnp.take_along_axis(image_feats, idx[..., None], axis=1)
    return jnp.where(patch_mask[..., None],
                     gathered.astype(token_embeds.dtype), token_embeds)


class MMGPT(nn.Module):
    """Vision tower + projector + causal LM with embedding-level splice."""

    cfg: MMGPTConfig

    def setup(self):
        cfg = self.cfg
        from merlin_tpu.models.vision_builder import build_vision_tower
        self.vision_tower = build_vision_tower(
            cfg.vision_kind, cfg.vit, select_layer=cfg.select_layer,
            select_feature=cfg.select_feature, name="vision_tower")
        # resampler kinds attend at the VISION width (the reference builds
        # Resampler(embed_dim=vision_hidden_size) and only its final proj
        # maps to the LM width, qwen_sampler_projector.py:22-31)
        embed_dim = (getattr(cfg.vit, "hidden_size", None)
                     if cfg.projector in ("qwen_sampler", "resampler")
                     else None)
        self.projector = build_projector(
            cfg.projector, cfg.lm.hidden_size, conv_stride=cfg.conv_stride,
            dtype=cfg.lm.dtype, embed_dim=embed_dim, name="projector")
        self.lm = CausalLM(cfg.lm, name="lm")

    def encode_images(self, images: jax.Array) -> jax.Array:
        """(n, H, W, C) pixel values -> (n, image_token_len, d_lm)."""
        feats = self.vision_tower(images)
        return self.projector(feats)

    def __call__(self, input_ids, *, images=None, positions=None,
                 segment_ids=None, kv_cache=None, labels=None):
        """Forward. images: (b, n_img, H, W, C) or None (text-only/decode).

        Returns (logits, new_kv_cache[, loss if labels given]).
        """
        cfg = self.cfg
        embeds = self.lm.embed(input_ids)
        if images is not None:
            b, n = images.shape[:2]
            feats = self.encode_images(images.reshape((b * n,) + images.shape[2:]))
            feats = feats.reshape(b, n * feats.shape[1], feats.shape[2])
            patch_mask = input_ids == cfg.image_patch_id
            embeds = splice_image_embeds(embeds, patch_mask, feats)

        logits, new_cache = self.lm(
            inputs_embeds=embeds, positions=positions,
            segment_ids=segment_ids, kv_cache=kv_cache)

        if labels is not None:
            shifted_labels = jnp.concatenate(
                [labels[:, 1:],
                 jnp.full((labels.shape[0], 1), IGNORE_INDEX, labels.dtype)],
                axis=1)
            loss, _ = cross_entropy_loss(
                logits, shifted_labels, ignore_index=IGNORE_INDEX,
                z_loss_weight=cfg.lm.z_loss_weight)
            return logits, new_cache, loss
        return logits, new_cache
