"""Vision-to-LM projectors (reference model/projector/* rebuilt).

Each maps tower features (b, P, C_vision) -> LM tokens (b, P', D_lm):

  * MLPProjector   — single linear (mlp_projector.py)
  * ConvProjector  — the Merlin default: features reshaped to the patch
    grid, 3x3 conv stride ``conv_stride`` (conv_projector.py:14-20);
    tokens reduced by stride^2 (448/14 grid 32x32 -> 16x16 = 256 tokens)
  * QWenProjector  — raw matmul parameter (qwen_projector.py:15)
  * SAMProjector   — two stride-2 convs then linear (sam_projector.py:12-30)
  * Resampler      — perceiver-style learnable-query cross-attention
    (qwen_sampler_projector.py + qwen_nosampler_encoder.py:97-165)
"""

from __future__ import annotations

import math
from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from merlin_tpu.models.layers import DenseGeneral, LayerNorm
from merlin_tpu.ops.attention import mha_reference


class StridedConv(nn.Module):
    """2D conv with selectable lowering; default is ``taps``.

    HISTORY (r5, two corrections):
      (1) the r3 measurement that launched the matmul lowerings — "XLA
          lowers the 3x3/s2 conv at ~33 TF/s" — was polluted by the
          remote tunnel's ~45 ms sync RTT. RTT-immune chained timing
          (tools/proj_probe.py) shows XLA's conv runs at 182 TF/s
          ISOLATED (1.70 ms vs im2col 2.17 / taps 2.39).
      (2) isolated timings don't transfer: INSIDE the full encode jit
          (tools/vit_ab_probe.py, RTT-cancelled, same process) the XLA
          conv costs ~9 ms marginal — the tower-output layout forces a
          relayout the isolated probe never pays — while ``taps`` fuses
          its strided slices into the matmuls and costs ~2 ms, its FLOP
          floor. End-to-end 16-frame 448 encode: taps 191-193.6 fps vs
          xla/im2col 176-178, tower-only 197-198 (chained cal 164-171
          TF/s on every window). Measure marginal costs inside the full
          jit; isolated microbenches misattribute (r4-r5 lesson).

    Lowerings:
      * ``taps`` (default, r5): one (b*out_hw, cin) @ (cin, cout) matmul
        PER TAP, accumulated — no 9x-duplicated cols intermediate.
      * ``im2col`` (r3): 9 strided slices concatenated into a
        (b*out_hw, kh*kw*cin) cols tensor, ONE matmul.
      * ``xla``: plain lax.conv (reference lowering for A/B probes).

    Parameter layout is IDENTICAL to ``nn.Conv`` (``kernel``
    (kh, kw, cin, cout) + optional ``bias``), so checkpoints and the
    torch converters are unaffected.
    """

    features: int
    kernel_size: Tuple[int, int] = (3, 3)
    stride: int = 2
    padding: int = 1
    use_bias: bool = True
    dtype: Any = jnp.bfloat16
    lowering: str = "taps"  # taps | im2col | xla

    @nn.compact
    def __call__(self, x):  # (b, H, W, cin) -> (b, out_h, out_w, features)
        kh, kw = self.kernel_size
        s = self.stride
        b, H, W, cin = x.shape
        out_h = (H + 2 * self.padding - kh) // s + 1
        out_w = (W + 2 * self.padding - kw) // s + 1
        kernel = self.param(
            "kernel",
            nn.with_logical_partitioning(
                nn.initializers.lecun_normal(),
                ("conv_hw", "conv_hw", "conv_in", "conv_out")),
            (kh, kw, cin, self.features), jnp.float32)
        x = x.astype(self.dtype)
        kern = kernel.astype(self.dtype)
        if self.lowering == "xla":  # reference lowering (A/B probes)
            out = jax.lax.conv_general_dilated(
                x, kern, (s, s), [(self.padding,) * 2] * 2,
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=self.dtype)
            out = out.reshape(b * out_h * out_w, self.features)
        else:
            if self.padding:
                x = jnp.pad(x, ((0, 0), (self.padding,) * 2,
                                (self.padding,) * 2, (0, 0)))
            tap = lambda dh, dw: jax.lax.slice(
                x, (0, dh, dw, 0),
                (b, dh + (out_h - 1) * s + 1, dw + (out_w - 1) * s + 1, cin),
                (1, s, s, 1))
            if self.lowering == "taps":
                out = None
                for dh in range(kh):
                    for dw in range(kw):
                        part = jnp.dot(
                            tap(dh, dw).reshape(b * out_h * out_w, cin),
                            kern[dh, dw])
                        out = part if out is None else out + part
            else:  # im2col: tap (dh, dw) contributes lanes
                # [((dh*kw)+dw)*cin, ...) — the row-major order
                # kernel.reshape(kh*kw*cin, features) flattens to
                cols = jnp.concatenate(
                    [tap(dh, dw) for dh in range(kh) for dw in range(kw)],
                    axis=-1)
                out = jnp.dot(
                    cols.reshape(b * out_h * out_w, kh * kw * cin),
                    kern.reshape(kh * kw * cin, self.features))
        if self.use_bias:
            bias = self.param(
                "bias",
                nn.with_logical_partitioning(
                    nn.initializers.zeros_init(), ("conv_out",)),
                (self.features,), jnp.float32)
            out = out + bias.astype(self.dtype)
        return out.reshape(b, out_h, out_w, self.features)


class MLPProjector(nn.Module):
    out_features: int
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        return DenseGeneral((self.out_features,),
                            kernel_axes=("vit_embed", "embed"),
                            use_bias=True, dtype=self.dtype, name="proj")(x)


class ConvProjector(nn.Module):
    """3x3 conv, stride ``conv_stride``, padding 1 over the patch grid."""

    out_features: int
    conv_stride: int = 2
    dtype: Any = jnp.bfloat16
    lowering: str = "taps"  # see StridedConv

    @nn.compact
    def __call__(self, x):
        b, p, c = x.shape
        side = int(math.isqrt(p))
        if side * side != p:
            raise ValueError(f"patch count {p} is not square")
        grid = x.reshape(b, side, side, c)
        out = StridedConv(
            self.out_features, kernel_size=(3, 3), stride=self.conv_stride,
            padding=1, use_bias=True, dtype=self.dtype,
            lowering=self.lowering, name="conv")(grid.astype(self.dtype))
        return out.reshape(b, -1, self.out_features)


class QWenProjector(nn.Module):
    """Bare matmul parameter (qwen_projector.py:15,57-63)."""

    out_features: int
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        w = self.param(
            "proj",
            nn.with_logical_partitioning(
                nn.initializers.normal(0.02), ("vit_embed", "embed")),
            (x.shape[-1], self.out_features), jnp.float32)
        return jnp.einsum("bpc,cd->bpd", x.astype(self.dtype),
                          w.astype(self.dtype),
                          preferred_element_type=jnp.float32
                          ).astype(self.dtype)


class SAMProjector(nn.Module):
    """Two stride-2 3x3 convs (C->2C->4C, no bias, NO activation between —
    the reference stacks bare Conv2d's) then linear to the LM width
    (sam_projector.py:12-38)."""

    out_features: int
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        b, p, c = x.shape
        side = int(math.isqrt(p))
        grid = x.reshape(b, side, side, c).astype(self.dtype)
        for i, ch in enumerate((2 * c, 4 * c)):
            grid = StridedConv(ch, kernel_size=(3, 3), stride=2, padding=1,
                               use_bias=False, dtype=self.dtype,
                               name=f"conv{i + 1}")(grid)
        flat = grid.reshape(b, -1, grid.shape[-1])
        return DenseGeneral((self.out_features,),
                            kernel_axes=("vit_embed", "embed"), use_bias=True,
                            dtype=self.dtype, name="proj")(flat)


def _sincos_2d_pos_embed(dim: int, grid: int) -> np.ndarray:
    """2D sin-cos absolute position table (qwen encoder get_abs_pos style)."""
    def one_axis(d, positions):
        omega = 1.0 / (10000 ** (np.arange(d // 2, dtype=np.float64) / (d // 2)))
        out = np.einsum("p,f->pf", positions, omega)
        return np.concatenate([np.sin(out), np.cos(out)], axis=1)

    coords = np.arange(grid, dtype=np.float64)
    yy, xx = np.meshgrid(coords, coords, indexing="ij")
    emb_y = one_axis(dim // 2, yy.reshape(-1))
    emb_x = one_axis(dim // 2, xx.reshape(-1))
    return np.concatenate([emb_y, emb_x], axis=1).astype(np.float32)


class Resampler(nn.Module):
    """Perceiver resampler: ``num_queries`` learnable queries cross-attend
    the vision features once (Qwen-VL style, qwen_nosampler_encoder.py:97-165).
    Output is always (b, num_queries, out_features) regardless of input P.

    ``pos_embed`` is a REAL parameter (sincos-initialized on the query
    grid) exactly like the reference's — it declares it trainable "for
    hacking fsdp" (qwen_nosampler_encoder.py:117-123), so converted
    checkpoints must carry whatever values it holds. Its use is detached
    in the reference forward (``.detach()``, :155-162) — mirrored here
    with stop_gradient — and keys see it bicubic-interpolated to the key
    grid (``get_abs_pos``, :28-44).
    """

    out_features: int
    num_queries: int = 256
    num_heads: int = 16
    # attention width; the reference runs the resampler at the VISION
    # width and only the final ``proj`` maps to the LM width
    # (qwen_sampler_projector.py:22-31: Resampler(embed_dim=vision_hidden)
    # then proj (vision_hidden, lm_hidden)). Default: out_features.
    embed_dim: Optional[int] = None
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        import jax

        b, p, c = x.shape
        dim = self.embed_dim or self.out_features
        h = self.num_heads
        d = dim // h

        queries = self.param(
            "query",
            nn.with_logical_partitioning(
                nn.initializers.truncated_normal(0.02), ("vit_patches", "embed")),
            (self.num_queries, dim), jnp.float32)

        def sincos_init(key, shape, dtype=jnp.float32):
            side = int(math.isqrt(shape[0]))
            if side * side == shape[0]:
                return jnp.asarray(_sincos_2d_pos_embed(shape[1], side), dtype)
            return jnp.zeros(shape, dtype)

        pos_embed = self.param(
            "pos_embed",
            nn.with_logical_partitioning(
                sincos_init, ("vit_patches", "embed")),
            (self.num_queries, dim), jnp.float32)

        kv_in = DenseGeneral((dim,), kernel_axes=("vit_embed", "embed"),
                             use_bias=False, dtype=self.dtype, name="kv_proj")(x)
        kv_in = LayerNorm(dtype=self.dtype, name="ln_kv")(kv_in)
        q_in = LayerNorm(dtype=self.dtype, name="ln_q")(
            jnp.broadcast_to(queries.astype(self.dtype), (b,) + queries.shape))

        # positions on queries and KEYS only — the reference calls
        # attn(q+pos, x+get_abs_pos(pos), x): values see raw x, and both
        # uses are detached (qwen_nosampler_encoder.py:155-162)
        pe = jax.lax.stop_gradient(pos_embed)
        q_in = q_in + pe[None].astype(self.dtype)
        k_in = kv_in
        side = int(math.isqrt(p))
        qside = int(math.isqrt(self.num_queries))
        if side * side == p and qside * qside == self.num_queries:
            if p == self.num_queries:
                pos_k = pe
            else:
                # get_abs_pos: bicubic-resize the query-grid table to the
                # key grid (qwen_nosampler_encoder.py:28-44)
                pos_k = jax.image.resize(
                    pe.reshape(qside, qside, dim), (side, side, dim),
                    method="bicubic").reshape(p, dim)
            k_in = kv_in + pos_k[None].astype(self.dtype)

        q = DenseGeneral((h, d), kernel_axes=("embed", "heads", "kv"),
                         use_bias=True, dtype=self.dtype, name="q_attn")(q_in)
        k = DenseGeneral((h, d), kernel_axes=("embed", "heads", "kv"),
                         use_bias=True, dtype=self.dtype, name="k_attn")(k_in)
        v = DenseGeneral((h, d), kernel_axes=("embed", "heads", "kv"),
                         use_bias=True, dtype=self.dtype, name="v_attn")(kv_in)
        out = mha_reference(q, k, v, causal=False)
        out = DenseGeneral((dim,), axis=(-2, -1),
                           kernel_axes=("heads", "kv", "embed"),
                           use_bias=True, dtype=self.dtype, name="out_attn")(out)
        out = LayerNorm(dtype=self.dtype, name="ln_post")(out)
        proj = self.param(
            "proj",
            nn.with_logical_partitioning(
                nn.initializers.normal(0.02), ("embed", "embed")),
            (dim, self.out_features), jnp.float32)
        return jnp.einsum("bqd,de->bqe", out.astype(self.dtype),
                          proj.astype(self.dtype)).astype(self.dtype)


def resampler_params_from_torch(state_dict, *, dim: int,
                                num_heads: int) -> dict:
    """Qwen-VL Resampler state dict -> :class:`Resampler` flax params.

    Source: qwen_nosampler_encoder.py:97-165. Its ``attn`` is a standard
    ``nn.MultiheadAttention`` whose in_proj packs [all-q; all-k; all-v]
    blocks (NOT the per-head interleave of the tower's VisualAttention).
    The reference's ``pos_embed`` is a LEARNABLE parameter (declared
    trainable "for hacking fsdp", :117-123) sincos-initialized on the
    query grid — a trained checkpoint may carry non-sincos values, so it
    maps to our real ``pos_embed`` parameter bit-exact (sincos init only
    when the key is absent). Official Qwen-VL visual checkpoints carry
    ``ln_post``/``proj`` after the attn_pool (the reference commented its
    own copies out, :384-387); they are mapped when present, else left at
    fresh initialization.
    """
    from merlin_tpu.models.convert import _np

    sd = {k: _np(v) for k, v in state_dict.items()}

    def key(name):
        for cand in (name, "attn_pool." + name, "resampler." + name):
            if cand in sd:
                return sd[cand]
        raise KeyError(name)

    h, d = num_heads, dim // num_heads
    w = key("attn.in_proj_weight")           # (3E, E) block-packed
    b = key("attn.in_proj_bias")
    wq, wk, wv = w[:dim], w[dim:2 * dim], w[2 * dim:]
    bq, bk, bv = b[:dim], b[dim:2 * dim], b[2 * dim:]
    p = {
        "query": key("query"),
        "kv_proj": {"kernel": key("kv_proj.weight").T},
    }
    try:
        p["pos_embed"] = key("pos_embed")
    except KeyError:
        # absent in some exports: recreate the sincos table the reference
        # initializes with (the param must exist in the flax tree)
        nq = p["query"].shape[0]
        side = int(math.isqrt(nq))
        p["pos_embed"] = (_sincos_2d_pos_embed(dim, side)
                          if side * side == nq
                          else np.zeros((nq, dim), np.float32))
    p.update({
        "ln_q": {"scale": key("ln_q.weight"), "bias": key("ln_q.bias")},
        "ln_kv": {"scale": key("ln_kv.weight"), "bias": key("ln_kv.bias")},
        "q_attn": {"kernel": wq.T.reshape(dim, h, d), "bias": bq.reshape(h, d)},
        "k_attn": {"kernel": wk.T.reshape(dim, h, d), "bias": bk.reshape(h, d)},
        "v_attn": {"kernel": wv.T.reshape(dim, h, d), "bias": bv.reshape(h, d)},
        "out_attn": {"kernel": key("attn.out_proj.weight").T.reshape(h, d, dim),
                     "bias": key("attn.out_proj.bias")},
    })
    for src, dst in (("ln_post.weight", ("ln_post", "scale")),
                     ("ln_post.bias", ("ln_post", "bias"))):
        try:
            p.setdefault(dst[0], {})[dst[1]] = key(src)
        except KeyError:
            pass
    try:
        p["proj"] = key("proj")
    except KeyError:
        pass
    return p


PROJECTOR_KINDS = {
    "mlp": MLPProjector,
    "linear": MLPProjector,
    "conv": ConvProjector,
    "qwen": QWenProjector,
    "sam": SAMProjector,
    "qwen_sampler": Resampler,
    "resampler": Resampler,
}


def default_resampler_heads(embed_dim: int) -> int:
    """Reference head count: vision_hidden // 128
    (qwen_sampler_projector.py:26); small test widths fall back to an
    8-wide head."""
    if embed_dim % 128 == 0:
        return embed_dim // 128
    return max(1, embed_dim // 8)


def build_projector(kind: str, out_features: int, *, conv_stride: int = 2,
                    dtype=jnp.bfloat16, name: str = "projector",
                    embed_dim: Optional[int] = None,
                    num_heads: Optional[int] = None):
    """Reference build_projector dispatch (model/projector/builder.py:8).

    ``embed_dim``/``num_heads`` apply to the resampler kinds only: the
    attention runs at the VISION width (reference passes
    vision_hidden_size) with vision_hidden//128 heads."""
    if kind in ("conv",):
        return ConvProjector(out_features, conv_stride=conv_stride,
                             dtype=dtype, name=name)
    if kind in ("qwen_sampler", "resampler"):
        dim = embed_dim or out_features
        return Resampler(out_features, embed_dim=embed_dim,
                         num_heads=num_heads or default_resampler_heads(dim),
                         dtype=dtype, name=name)
    if kind not in PROJECTOR_KINDS:
        raise ValueError(f"unknown projector kind {kind!r}; "
                         f"one of {sorted(PROJECTOR_KINDS)}")
    return PROJECTOR_KINDS[kind](out_features, dtype=dtype, name=name)
