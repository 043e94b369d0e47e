"""SAM ViTDet image encoder (reference
model/vision_encoder/utils/image_encoder.py rebuilt in flax).

ViT-B geometry: 1024px / patch 16 -> 64x64 tokens, 12 layers, window-14
attention with global attention at layers (2, 5, 8, 11), decomposed
relative position embeddings, and a conv neck to 256 channels
(image_encoder.py:88-116). Output is (b, 4096, 256); the SAM projector
(projectors.py) then stride-2-convs it down to 256 LM tokens
(sam_projector.py:12-30).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from merlin_tpu.models.layers import DenseGeneral, SimpleMLP
from merlin_tpu.models.projectors import StridedConv


@dataclasses.dataclass(frozen=True)
class SAMViTConfig:
    img_size: int = 1024
    patch_size: int = 16
    embed_dim: int = 768
    depth: int = 12
    num_heads: int = 12
    mlp_ratio: float = 4.0
    out_chans: int = 256
    window_size: int = 14
    global_attn_indexes: Tuple[int, ...] = (2, 5, 8, 11)
    use_rel_pos: bool = True
    layer_norm_eps: float = 1e-6
    dtype: Any = jnp.bfloat16

    @property
    def grid(self) -> int:
        return self.img_size // self.patch_size


def tiny_sam(**kw) -> SAMViTConfig:
    defaults = dict(img_size=32, patch_size=4, embed_dim=16, depth=2,
                    num_heads=2, out_chans=8, window_size=4,
                    global_attn_indexes=(1,), dtype=jnp.float32)
    defaults.update(kw)
    return SAMViTConfig(**defaults)


def window_partition(x: jax.Array, window: int):
    """(b, H, W, C) -> (b*nw, win, win, C) with zero pad; returns pad size."""
    b, h, w, c = x.shape
    pad_h = (-h) % window
    pad_w = (-w) % window
    if pad_h or pad_w:
        x = jnp.pad(x, ((0, 0), (0, pad_h), (0, pad_w), (0, 0)))
    hp, wp = h + pad_h, w + pad_w
    x = x.reshape(b, hp // window, window, wp // window, window, c)
    x = x.transpose(0, 1, 3, 2, 4, 5).reshape(-1, window, window, c)
    return x, (hp, wp)


def window_unpartition(x: jax.Array, window: int, pad_hw, hw):
    hp, wp = pad_hw
    h, w = hw
    b = x.shape[0] // ((hp // window) * (wp // window))
    x = x.reshape(b, hp // window, wp // window, window, window, -1)
    x = x.transpose(0, 1, 3, 2, 4, 5).reshape(b, hp, wp, -1)
    return x[:, :h, :w]


def get_rel_pos(q_size: int, k_size: int, rel_pos: jax.Array) -> jax.Array:
    """Relative position table lookup with linear resize when the table
    doesn't match (image_encoder.py:291-316 behavior)."""
    max_rel_dist = 2 * max(q_size, k_size) - 1
    if rel_pos.shape[0] != max_rel_dist:
        rel_pos = jax.image.resize(
            rel_pos.astype(jnp.float32),
            (max_rel_dist, rel_pos.shape[1]), method="linear")
    q_coords = jnp.arange(q_size)[:, None] * max(k_size / q_size, 1.0)
    k_coords = jnp.arange(k_size)[None, :] * max(q_size / k_size, 1.0)
    rel = (q_coords - k_coords) + (k_size - 1) * max(q_size / k_size, 1.0)
    return rel_pos[rel.astype(jnp.int32)]


def add_decomposed_rel_pos(attn, q, rel_h, rel_w, q_hw, k_hw):
    """attn (b, qh*qw, kh*kw) += decomposed H/W relative biases
    (image_encoder.py:318-339)."""
    qh, qw = q_hw
    kh, kw = k_hw
    rh = get_rel_pos(qh, kh, rel_h)   # (qh, kh, d)
    rw = get_rel_pos(qw, kw, rel_w)   # (qw, kw, d)
    rq = q.reshape(q.shape[0], qh, qw, -1)
    bias_h = jnp.einsum("bhwc,hkc->bhwk", rq, rh)
    bias_w = jnp.einsum("bhwc,wkc->bhwk", rq, rw)
    attn = attn.reshape(q.shape[0], qh, qw, kh, kw)
    attn = attn + bias_h[:, :, :, :, None] + bias_w[:, :, None, :]
    return attn.reshape(q.shape[0], qh * qw, kh * kw)


class SAMAttention(nn.Module):
    cfg: SAMViTConfig
    input_size: Tuple[int, int]

    @nn.compact
    def __call__(self, x):
        cfg = self.cfg
        b, h, w, _ = x.shape
        nh = cfg.num_heads
        d = cfg.embed_dim // nh
        qkv = DenseGeneral((3, nh, d), kernel_axes=("vit_embed", None, "vit_heads", "kv"),
                           use_bias=True, dtype=cfg.dtype, name="qkv")(x)
        qkv = qkv.reshape(b, h * w, 3, nh, d).transpose(2, 0, 3, 1, 4)
        q, k, v = qkv[0], qkv[1], qkv[2]          # (b, nh, hw, d)
        q = q.reshape(b * nh, h * w, d)
        k = k.reshape(b * nh, h * w, d)
        v = v.reshape(b * nh, h * w, d)

        attn = jnp.einsum("bqd,bkd->bqk", q * (d ** -0.5), k,
                          preferred_element_type=jnp.float32)
        if cfg.use_rel_pos:
            rel_h = self.param(
                "rel_pos_h", nn.with_logical_partitioning(
                    nn.initializers.zeros, ("vit_patches", "kv")),
                (2 * self.input_size[0] - 1, d), jnp.float32)
            rel_w = self.param(
                "rel_pos_w", nn.with_logical_partitioning(
                    nn.initializers.zeros, ("vit_patches", "kv")),
                (2 * self.input_size[1] - 1, d), jnp.float32)
            attn = add_decomposed_rel_pos(
                attn, q.astype(jnp.float32), rel_h, rel_w, (h, w), (h, w))
        attn = jax.nn.softmax(attn.astype(jnp.float32), axis=-1)
        out = jnp.einsum("bqk,bkd->bqd", attn.astype(v.dtype), v,
                         preferred_element_type=jnp.float32)
        out = out.reshape(b, nh, h * w, d).transpose(0, 2, 1, 3)
        out = out.reshape(b, h, w, nh * d).astype(cfg.dtype)
        return DenseGeneral((cfg.embed_dim,),
                            kernel_axes=("vit_embed", "vit_embed"),
                            use_bias=True, dtype=cfg.dtype, name="proj")(out)


class SAMBlock(nn.Module):
    cfg: SAMViTConfig
    window_size: int

    @nn.compact
    def __call__(self, x):
        cfg = self.cfg
        shortcut = x
        x = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=cfg.dtype,
                         param_dtype=jnp.float32, name="norm1")(x)
        if self.window_size > 0:
            hw = (x.shape[1], x.shape[2])
            x, pad_hw = window_partition(x, self.window_size)
            size = (self.window_size, self.window_size)
        else:
            size = (x.shape[1], x.shape[2])
        x = SAMAttention(cfg, input_size=size, name="attn")(x)
        if self.window_size > 0:
            x = window_unpartition(x, self.window_size, pad_hw, hw)
        x = shortcut + x
        h = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=cfg.dtype,
                         param_dtype=jnp.float32, name="norm2")(x)
        h = SimpleMLP(int(cfg.embed_dim * cfg.mlp_ratio), activation="gelu",
                      dtype=cfg.dtype, name="mlp")(h)
        return x + h


class SAMImageEncoder(nn.Module):
    """pixel NHWC -> (b, grid*grid, out_chans) neck features."""

    cfg: SAMViTConfig

    @nn.compact
    def __call__(self, pixel_values):
        cfg = self.cfg
        from merlin_tpu.models.vit import PatchEmbed
        x = PatchEmbed(cfg.embed_dim, cfg.patch_size, use_bias=True,
                       dtype=cfg.dtype,
                       name="patch_embed")(pixel_values)
        pos = self.param(
            "pos_embed", nn.with_logical_partitioning(
                nn.initializers.zeros, (None, "vit_patches", "vit_patches",
                                        "vit_embed")),
            (1, cfg.grid, cfg.grid, cfg.embed_dim), jnp.float32)
        x = x + pos.astype(cfg.dtype)
        for i in range(cfg.depth):
            win = 0 if i in cfg.global_attn_indexes else cfg.window_size
            x = SAMBlock(cfg, window_size=win, name=f"blocks_{i}")(x)
        # neck: 1x1 conv -> LN -> 3x3 conv -> LN (channels-last LN == LN2d)
        x = nn.Conv(cfg.out_chans, (1, 1), use_bias=False, dtype=cfg.dtype,
                    param_dtype=jnp.float32, name="neck_conv1")(x)
        x = nn.LayerNorm(epsilon=1e-6, dtype=cfg.dtype,
                         param_dtype=jnp.float32, name="neck_ln1")(x)
        x = StridedConv(cfg.out_chans, kernel_size=(3, 3), stride=1,
                        padding=1, use_bias=False, dtype=cfg.dtype,
                        name="neck_conv2")(x)
        x = nn.LayerNorm(epsilon=1e-6, dtype=cfg.dtype,
                         param_dtype=jnp.float32, name="neck_ln2")(x)
        b = x.shape[0]
        return x.reshape(b, -1, cfg.out_chans)


def sam_params_from_torch(state_dict, cfg: SAMViTConfig) -> dict:
    """SAM official image_encoder state dict -> flax params."""
    from merlin_tpu.models.convert import _np

    sd = {k: _np(v) for k, v in state_dict.items()}

    def key(name):
        for cand in (name, "image_encoder." + name):
            if cand in sd:
                return sd[cand]
        raise KeyError(name)

    nh = cfg.num_heads
    d = cfg.embed_dim // nh
    p = {
        "patch_embed": {"kernel": key("patch_embed.proj.weight")
                        .transpose(2, 3, 1, 0),
                        "bias": key("patch_embed.proj.bias")},
        "pos_embed": key("pos_embed"),
        "neck_conv1": {"kernel": key("neck.0.weight").transpose(2, 3, 1, 0)},
        "neck_ln1": {"scale": key("neck.1.weight"), "bias": key("neck.1.bias")},
        "neck_conv2": {"kernel": key("neck.2.weight").transpose(2, 3, 1, 0)},
        "neck_ln2": {"scale": key("neck.3.weight"), "bias": key("neck.3.bias")},
    }
    for i in range(cfg.depth):
        lb = f"blocks.{i}."
        qkv_w = key(lb + "attn.qkv.weight")      # (3E, E)
        qkv_b = key(lb + "attn.qkv.bias")
        blk = {
            "norm1": {"scale": key(lb + "norm1.weight"),
                      "bias": key(lb + "norm1.bias")},
            "norm2": {"scale": key(lb + "norm2.weight"),
                      "bias": key(lb + "norm2.bias")},
            "attn": {
                "qkv": {"kernel": qkv_w.T.reshape(cfg.embed_dim, 3, nh, d),
                        "bias": qkv_b.reshape(3, nh, d)},
                "proj": {"kernel": key(lb + "attn.proj.weight").T,
                         "bias": key(lb + "attn.proj.bias")},
            },
            "mlp": {"fc1": {"kernel": key(lb + "mlp.lin1.weight").T,
                            "bias": key(lb + "mlp.lin1.bias")},
                    "fc2": {"kernel": key(lb + "mlp.lin2.weight").T,
                            "bias": key(lb + "mlp.lin2.bias")}},
        }
        if cfg.use_rel_pos:
            blk["attn"]["rel_pos_h"] = key(lb + "attn.rel_pos_h")
            blk["attn"]["rel_pos_w"] = key(lb + "attn.rel_pos_w")
        p[f"blocks_{i}"] = blk
    return p
