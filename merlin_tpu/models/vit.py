"""Vision transformers: CLIP ViT tower (the Merlin default encoder).

Rebuilds the behavior of ``model/vision_encoder/clip_encoder.py``: an HF
``CLIPVisionModel``-compatible ViT whose features are selected from the
penultimate layer with the CLS token dropped (clip_encoder.py:64-72), plus
bicubic position-embedding interpolation so a 224/336-trained tower runs at
448 (utils/interpolate_model.py:8-32 surgery, done here at load time).

TPU-first details: NHWC layout, patchify as a single conv (maps to MXU),
non-causal flash attention through the shared dispatcher, f32 layernorm.
"""

from __future__ import annotations

import dataclasses
from typing import Any, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from merlin_tpu.models.layers import DenseGeneral, LayerNorm, SimpleMLP
from merlin_tpu.ops.attention import attention as shared_attention


@dataclasses.dataclass(frozen=True)
class ViTConfig:
    hidden_size: int = 1024
    num_layers: int = 24
    num_heads: int = 16
    intermediate_size: int = 4096
    patch_size: int = 14
    image_size: int = 448
    num_channels: int = 3
    layer_norm_eps: float = 1e-5
    activation: str = "quick_gelu"
    use_class_token: bool = True
    use_pre_layernorm: bool = True
    # 'learned' (CLIP) or 'sincos2d' (Qwen-VL get_abs_pos: fixed 2D sin-cos
    # table recomputed for the current grid, so any resolution works)
    pos_embed: str = "learned"
    dtype: Any = jnp.bfloat16

    @property
    def grid_size(self) -> int:
        return self.image_size // self.patch_size

    @property
    def num_patches(self) -> int:
        return self.grid_size ** 2

    @property
    def num_positions(self) -> int:
        return self.num_patches + (1 if self.use_class_token else 0)


def clip_vit_l14(image_size: int = 448, **kw) -> ViTConfig:
    return ViTConfig(hidden_size=1024, num_layers=24, num_heads=16,
                     intermediate_size=4096, patch_size=14,
                     image_size=image_size, **kw)


def metaclip_vit_h14(image_size: int = 448, **kw) -> ViTConfig:
    """MetaCLIP ViT-H/14 (reference metaclip_encoder.py — a dead variant
    there: same class name as CLIPVisionTower and never imported by the
    tower builder; provided here as a working config)."""
    return ViTConfig(hidden_size=1280, num_layers=32, num_heads=16,
                     intermediate_size=5120, patch_size=14,
                     image_size=image_size, activation="gelu", **kw)


def qwen_vit_bigG(image_size: int = 448, **kw) -> ViTConfig:
    """Qwen-VL ViT-bigG geometry (qwen_nosampler_encoder.py:430-438):
    1664-wide, 48 layers, patch 14, no CLS token, fixed 2D-sincos absolute
    positions recomputed for the current grid (the reference's
    get_abs_pos:28-44 interpolation becomes unnecessary)."""
    kw.setdefault("pos_embed", "sincos2d")  # 'learned' for pretrained loads
    return ViTConfig(hidden_size=1664, num_layers=48, num_heads=16,
                     intermediate_size=8192, patch_size=14,
                     image_size=image_size, activation="gelu",
                     use_class_token=False, **kw)


def tiny_vit(**kw) -> ViTConfig:
    defaults = dict(hidden_size=32, num_layers=2, num_heads=4,
                    intermediate_size=64, patch_size=4, image_size=16,
                    dtype=jnp.float32)
    defaults.update(kw)
    return ViTConfig(**defaults)


class PatchEmbed(nn.Module):
    """Patchify as space-to-depth + ONE matmul.

    With stride == kernel size the patch conv is a pure relayout of
    non-overlapping windows followed by a dense projection; the matmul
    path measures 1.03 ms vs 1.31 ms for XLA's conv at the 16-frame 448
    encode shape (RTT-immune chained probe, r5). The param tree is
    IDENTICAL to the ``nn.Conv(name="patch_embed")`` this replaces —
    ``patch_embed/kernel`` in HWIO (p, p, cin, hidden) — and the cols
    flatten in the same (dh, dw, cin) row-major order the kernel
    reshape uses, so checkpoints and the torch converters (vit.py
    clip/metaclip/qwen loaders) are unaffected."""

    features: int
    patch: int
    use_bias: bool = False
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, pixels):  # (b, H, W, cin) -> (b, gh, gw, features)
        b, H, W, cin = pixels.shape
        p = self.patch
        kernel = self.param(
            "kernel",
            nn.with_logical_partitioning(
                nn.initializers.lecun_normal(),
                ("conv_hw", "conv_hw", "conv_in", "vit_embed")),
            (p, p, cin, self.features), jnp.float32)
        g_h, g_w = H // p, W // p
        t = pixels.astype(self.dtype).reshape(
            b, g_h, p, g_w, p, cin).transpose(0, 1, 3, 2, 4, 5)
        out = jnp.dot(
            t.reshape(b * g_h * g_w, p * p * cin),
            kernel.astype(self.dtype).reshape(p * p * cin, self.features))
        if self.use_bias:
            bias = self.param(
                "bias",
                nn.with_logical_partitioning(
                    nn.initializers.zeros_init(), ("vit_embed",)),
                (self.features,), jnp.float32)
            out = out + bias.astype(self.dtype)
        return out.reshape(b, g_h, g_w, self.features)


class ViTBlock(nn.Module):
    cfg: ViTConfig

    @nn.compact
    def __call__(self, x):
        cfg = self.cfg
        h, d = cfg.num_heads, cfg.hidden_size // cfg.num_heads
        res = x
        x = LayerNorm(eps=cfg.layer_norm_eps, dtype=cfg.dtype, name="norm1")(x)
        q = DenseGeneral((h, d), kernel_axes=("vit_embed", "vit_heads", "kv"),
                         use_bias=True, dtype=cfg.dtype, name="q_proj")(x)
        k = DenseGeneral((h, d), kernel_axes=("vit_embed", "vit_heads", "kv"),
                         use_bias=True, dtype=cfg.dtype, name="k_proj")(x)
        v = DenseGeneral((h, d), kernel_axes=("vit_embed", "vit_heads", "kv"),
                         use_bias=True, dtype=cfg.dtype, name="v_proj")(x)
        attn = shared_attention(q, k, v, causal=False)
        attn = DenseGeneral((cfg.hidden_size,), axis=(-2, -1),
                            kernel_axes=("vit_heads", "kv", "vit_embed"),
                            use_bias=True, dtype=cfg.dtype, name="o_proj")(attn)
        x = res + attn
        res = x
        x = LayerNorm(eps=cfg.layer_norm_eps, dtype=cfg.dtype, name="norm2")(x)
        x = SimpleMLP(cfg.intermediate_size, activation=cfg.activation,
                      dtype=cfg.dtype, name="mlp")(x)
        return res + x


class ViT(nn.Module):
    """CLIP-style vision transformer. Input NHWC pixel values, output the
    per-layer hidden states (index 0 = embeddings) like HF
    ``output_hidden_states=True`` so callers can feature-select.

    ``active_layers`` truncates execution (not parameters) when the caller
    only consumes an early hidden state: XLA cannot dead-code-eliminate a
    layer whose attention is a pallas custom call, so running the dead
    24th layer costs a real ~4% of encode time."""

    cfg: ViTConfig
    active_layers: Optional[int] = None

    @nn.compact
    def __call__(self, pixel_values) -> List[jax.Array]:
        cfg = self.cfg
        b = pixel_values.shape[0]
        x = PatchEmbed(cfg.hidden_size, cfg.patch_size,
                       dtype=cfg.dtype, name="patch_embed")(
            pixel_values)
        x = x.reshape(b, -1, cfg.hidden_size)  # (b, P, C)

        if cfg.use_class_token:
            cls = self.param(
                "class_embedding",
                nn.with_logical_partitioning(
                    nn.initializers.normal(0.02), ("vit_embed",)),
                (cfg.hidden_size,), jnp.float32)
            cls = jnp.broadcast_to(cls.astype(cfg.dtype), (b, 1, cfg.hidden_size))
            x = jnp.concatenate([cls, x], axis=1)

        if cfg.pos_embed == "sincos2d":
            from merlin_tpu.models.projectors import _sincos_2d_pos_embed

            grid_pos = jnp.asarray(
                _sincos_2d_pos_embed(cfg.hidden_size, cfg.grid_size))
            if cfg.use_class_token:
                grid_pos = jnp.concatenate(
                    [jnp.zeros((1, cfg.hidden_size), jnp.float32), grid_pos])
            x = x + grid_pos[None].astype(cfg.dtype)
        else:
            pos = self.param(
                "position_embedding",
                nn.with_logical_partitioning(
                    nn.initializers.normal(0.02), ("vit_patches", "vit_embed")),
                (cfg.num_positions, cfg.hidden_size), jnp.float32)
            x = x + pos[None].astype(cfg.dtype)

        if cfg.use_pre_layernorm:
            x = LayerNorm(eps=cfg.layer_norm_eps, dtype=cfg.dtype,
                          name="pre_norm")(x)

        n_layers = (cfg.num_layers if self.active_layers is None
                    else min(self.active_layers, cfg.num_layers))
        hidden_states = [x]
        for i in range(n_layers):
            x = ViTBlock(cfg, name=f"layers_{i}")(x)
            hidden_states.append(x)
        return hidden_states


class CLIPVisionTower(nn.Module):
    """Feature-select wrapper: hidden_states[select_layer], CLS dropped
    (reference clip_encoder.py:64-72 default select_layer=-2,
    select_feature='patch')."""

    cfg: ViTConfig
    select_layer: int = -2
    select_feature: str = "patch"

    @nn.compact
    def __call__(self, pixel_values):
        # run only the layers the selection consumes (hidden_states index i
        # needs i layers; negative indices count from the full-depth list)
        sel = self.select_layer
        n_states = self.cfg.num_layers + 1
        idx = sel % n_states
        hidden_states = ViT(self.cfg, active_layers=idx, name="vit")(
            pixel_values)
        feats = hidden_states[idx]
        if self.select_feature == "patch":
            if self.cfg.use_class_token:
                feats = feats[:, 1:]
        elif self.select_feature == "cls_patch":
            pass
        else:
            raise ValueError(f"unknown select_feature {self.select_feature}")
        return feats


# ---------------------------------------------------------------------------
# HF weight conversion + position-embedding interpolation
# ---------------------------------------------------------------------------

def interpolate_pos_embedding(pos: np.ndarray, new_positions: int,
                              has_class_token: bool = True) -> np.ndarray:
    """Bicubic 2D interpolation of ViT position embeddings (224->448 upres),
    the load-time equivalent of the reference's checkpoint surgery
    (utils/interpolate_model.py:8-32)."""
    if pos.shape[0] == new_positions:
        return pos
    cls_part = pos[:1] if has_class_token else pos[:0]
    grid_part = pos[1:] if has_class_token else pos
    old_size = int(np.sqrt(grid_part.shape[0]))
    new_size = int(np.sqrt(new_positions - (1 if has_class_token else 0)))
    grid = grid_part.reshape(old_size, old_size, -1)
    resized = jax.image.resize(
        jnp.asarray(grid, jnp.float32), (new_size, new_size, grid.shape[-1]),
        method="bicubic")
    return np.concatenate(
        [cls_part, np.asarray(resized).reshape(new_size * new_size, -1)], axis=0)


def qwen_vit_params_from_torch(state_dict, cfg: ViTConfig) -> dict:
    """Qwen-VL ViT-bigG state dict -> ViT flax params.

    Source module: the reference's vendored VisionTransformer
    (qwen_nosampler_encoder.py:340-425; keys optionally under 'visual.' or
    'vision_tower.'). Two Qwen-specific layouts handled here:

      * ``attn.in_proj`` packs qkv INTERLEAVED PER HEAD — row block for
        head n is [q_n | k_n | v_n] of head_dim each (VisualAttention
        views (np, 3*hn) then splits the last dim, :202-212) — unlike the
        usual [all-q; all-k; all-v] packing;
      * ``positional_embedding`` is a learned (256, width) table the
        reference bicubically interpolates to the live grid per forward
        (get_abs_pos, :28-44); we interpolate ONCE here to cfg's grid, so
        pass a cfg with ``pos_embed='learned'`` (``qwen_vit_bigG(
        pos_embed='learned')``) when loading pretrained weights.
    """
    from merlin_tpu.models.convert import _np, _o_kernel

    sd = {k: _np(v) for k, v in state_dict.items()}

    def key(name):
        for cand in (name, "visual." + name, "vision_tower." + name,
                     "model.vision_tower." + name):
            if cand in sd:
                return sd[cand]
        raise KeyError(name)

    h = cfg.num_heads
    d = cfg.hidden_size // h
    p = {
        "patch_embed": {"kernel": key("conv1.weight").transpose(2, 3, 1, 0)},
        "pre_norm": {"scale": key("ln_pre.weight"),
                     "bias": key("ln_pre.bias")},
    }
    if cfg.pos_embed == "learned":
        pos = key("positional_embedding")
        p["position_embedding"] = interpolate_pos_embedding(
            pos, cfg.num_positions, cfg.use_class_token)
    for i in range(cfg.num_layers):
        lb = f"transformer.resblocks.{i}."
        w = key(lb + "attn.in_proj.weight")        # (3E, E), head-interleaved
        b_ = key(lb + "attn.in_proj.bias")
        w3 = w.reshape(h, 3, d, cfg.hidden_size)   # (head, qkv, d, in)
        b3 = b_.reshape(h, 3, d)
        p[f"layers_{i}"] = {
            "norm1": {"scale": key(lb + "ln_1.weight"),
                      "bias": key(lb + "ln_1.bias")},
            "norm2": {"scale": key(lb + "ln_2.weight"),
                      "bias": key(lb + "ln_2.bias")},
            "q_proj": {"kernel": w3[:, 0].transpose(2, 0, 1),
                       "bias": b3[:, 0]},
            "k_proj": {"kernel": w3[:, 1].transpose(2, 0, 1),
                       "bias": b3[:, 1]},
            "v_proj": {"kernel": w3[:, 2].transpose(2, 0, 1),
                       "bias": b3[:, 2]},
            "o_proj": {"kernel": _o_kernel(key(lb + "attn.out_proj.weight"),
                                           h, d),
                       "bias": key(lb + "attn.out_proj.bias")},
            "mlp": {"fc1": {"kernel": key(lb + "mlp.c_fc.weight").T,
                            "bias": key(lb + "mlp.c_fc.bias")},
                    "fc2": {"kernel": key(lb + "mlp.c_proj.weight").T,
                            "bias": key(lb + "mlp.c_proj.bias")}},
        }
    return p


def vit_params_from_hf(state_dict, cfg: ViTConfig) -> dict:
    """HF CLIPVisionModel state dict -> ViT flax params (vision_model.* keys,
    with/without prefix)."""
    from merlin_tpu.models.convert import _np, _qkv_kernel, _o_kernel

    sd = {k: _np(v) for k, v in state_dict.items()}

    def key(name):
        for cand in (name, "vision_model." + name, "model.vision_tower." + name,
                     "vision_tower.vision_model." + name):
            if cand in sd:
                return sd[cand]
        raise KeyError(name)

    h = cfg.num_heads
    d = cfg.hidden_size // h
    pos = key("embeddings.position_embedding.weight")
    pos = interpolate_pos_embedding(pos, cfg.num_positions,
                                    cfg.use_class_token)
    p = {
        "class_embedding": key("embeddings.class_embedding").reshape(-1),
        "position_embedding": pos,
        # torch conv OIHW -> flax HWIO
        "patch_embed": {"kernel": key("embeddings.patch_embedding.weight")
                        .transpose(2, 3, 1, 0)},
        "pre_norm": {"scale": key("pre_layrnorm.weight"),
                     "bias": key("pre_layrnorm.bias")},
    }
    for i in range(cfg.num_layers):
        lb = f"encoder.layers.{i}."
        p[f"layers_{i}"] = {
            "norm1": {"scale": key(lb + "layer_norm1.weight"),
                      "bias": key(lb + "layer_norm1.bias")},
            "norm2": {"scale": key(lb + "layer_norm2.weight"),
                      "bias": key(lb + "layer_norm2.bias")},
            "q_proj": {"kernel": _qkv_kernel(key(lb + "self_attn.q_proj.weight"), h, d),
                       "bias": key(lb + "self_attn.q_proj.bias").reshape(h, d)},
            "k_proj": {"kernel": _qkv_kernel(key(lb + "self_attn.k_proj.weight"), h, d),
                       "bias": key(lb + "self_attn.k_proj.bias").reshape(h, d)},
            "v_proj": {"kernel": _qkv_kernel(key(lb + "self_attn.v_proj.weight"), h, d),
                       "bias": key(lb + "self_attn.v_proj.bias").reshape(h, d)},
            "o_proj": {"kernel": _o_kernel(key(lb + "self_attn.out_proj.weight"), h, d),
                       "bias": key(lb + "self_attn.out_proj.bias")},
            "mlp": {"fc1": {"kernel": key(lb + "mlp.fc1.weight").T,
                            "bias": key(lb + "mlp.fc1.bias")},
                    "fc2": {"kernel": key(lb + "mlp.fc2.weight").T,
                            "bias": key(lb + "mlp.fc2.bias")}},
        }
    return p
