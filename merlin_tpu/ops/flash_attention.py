"""Pallas TPU flash attention (forward kernel + custom VJP).

The TPU-native replacement for the reference's flash-attn 2 / xformers CUDA
kernels (SURVEY.md §2.9). Online-softmax tiling over the KV sequence:

  grid = (batch, heads, num_q_blocks, num_k_blocks), k innermost.
  TPU executes the grid sequentially, so the (m, l, acc) running statistics
  live in VMEM scratch and persist across the k iterations of one q block;
  the output tile is written once on the last k step. Softmax statistics in
  float32, matmuls on the MXU with float32 accumulation.

Features (all needed for reference parity):
  * causal or bidirectional (ViT) masking, with whole-block skipping of
    fully-masked (q, k) tiles under causal,
  * packed-sequence segment ids — the pretrain path packs ``merge_round``
    image-text pairs into one 2048-token sequence (pair_webdataset.py);
    the reference deliberately trains *without* block-diagonal masking but
    we offer it properly,
  * in-kernel ALiBi (Baichuan-13B family) computed from per-head slopes so
    the O(s^2) bias is never materialized in HBM,
  * GQA via index-mapped KV blocks (no KV repeat in memory).

The backward pass currently recomputes attention through the XLA reference
implementation (flash recompute strategy; memory stays O(s) because the
O(s^2) probabilities live only inside the fused XLA backward). A Pallas
dq/dkv kernel can swap in later without touching callers.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30
_STATS_LANES = 128  # stats tiles are (block_q, 128) to satisfy lane tiling


def _fwd_kernel(
    q_ref, k_ref, v_ref, qseg_ref, kseg_ref, slopes_ref,
    out_ref,
    m_scr, l_scr, acc_scr,
    *, scale: float, causal: bool, use_alibi: bool, use_segments: bool,
    block_q: int, block_k: int,
):
    qi = pl.program_id(2)
    ki = pl.program_id(3)
    nk = pl.num_programs(3)

    @pl.when(ki == 0)
    def _init():
        m_scr[:] = jnp.full_like(m_scr, NEG_INF)
        l_scr[:] = jnp.zeros_like(l_scr)
        acc_scr[:] = jnp.zeros_like(acc_scr)

    q_start = qi * block_q
    k_start = ki * block_k

    if causal:
        # Skip tiles strictly above the diagonal.
        live = k_start <= q_start + block_q - 1
    else:
        live = True

    @pl.when(live)
    def _compute():
        q = q_ref[0, 0]                      # (bq, d)
        k = k_ref[0, 0]                      # (bk, d)
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale                            # (bq, bk) f32

        if use_alibi or causal:
            q_pos = q_start + jax.lax.broadcasted_iota(
                jnp.int32, (block_q, block_k), 0)
            k_pos = k_start + jax.lax.broadcasted_iota(
                jnp.int32, (block_q, block_k), 1)

        if use_alibi:
            slope = slopes_ref[pl.program_id(1)]
            s = s + slope * (k_pos - q_pos).astype(jnp.float32)

        mask = None
        if use_segments:
            qseg = qseg_ref[0, :, :1]   # (bq, 1)
            kseg = kseg_ref[0, :1, :]   # (1, bk)
            mask = qseg == kseg
        if causal:
            causal_mask = k_pos <= q_pos
            mask = causal_mask if mask is None else (mask & causal_mask)
        if mask is not None:
            s = jnp.where(mask, s, NEG_INF)

        m_prev = m_scr[:, :1]                            # (bq, 1)
        m_cur = jnp.max(s, axis=-1, keepdims=True)       # (bq, 1)
        m_new = jnp.maximum(m_prev, m_cur)
        alpha = jnp.exp(m_prev - m_new)                  # (bq, 1)
        p = jnp.exp(s - m_new)                           # (bq, bk) f32
        l_new = alpha * l_scr[:, :1] + jnp.sum(p, axis=-1, keepdims=True)

        acc_scr[:] = acc_scr[:] * alpha + jax.lax.dot_general(
            p.astype(v_ref.dtype), v_ref[0, 0],
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        m_scr[:] = jnp.broadcast_to(m_new, m_scr.shape)
        l_scr[:] = jnp.broadcast_to(l_new, l_scr.shape)

    @pl.when(ki == nk - 1)
    def _finalize():
        l = l_scr[:, :1]
        l = jnp.where(l == 0.0, 1.0, l)  # fully-masked (padding) rows -> 0
        out_ref[0, 0] = (acc_scr[:] / l).astype(out_ref.dtype)


def _flash_fwd_pallas(
    q, k, v, qseg, kseg, slopes,
    *, causal: bool, scale: float, block_q: int, block_k: int,
    use_alibi: bool, use_segments: bool,
):
    b, sq, h, d = q.shape
    skv, hkv = k.shape[1], k.shape[2]
    assert h % hkv == 0, (h, hkv)
    group = h // hkv
    nq = sq // block_q
    nk = skv // block_k

    # (b, s, h, d) -> (b, h, s, d) for tile-friendly blocking
    qt = jnp.transpose(q, (0, 2, 1, 3))
    kt = jnp.transpose(k, (0, 2, 1, 3))
    vt = jnp.transpose(v, (0, 2, 1, 3))
    slopes1d = slopes.reshape(h).astype(jnp.float32)
    # TPU tiling requires >= (8, 128) tiles: broadcast q ids across lanes and
    # kv ids across sublanes (same layout the XLA flash kernels use).
    qseg_b = jnp.broadcast_to(qseg[:, :, None], (b, sq, _STATS_LANES))
    kseg_b = jnp.broadcast_to(kseg[:, None, :], (b, 8, skv))

    grid = (b, h, nq, nk)
    kernel = functools.partial(
        _fwd_kernel, scale=scale, causal=causal, use_alibi=use_alibi,
        use_segments=use_segments, block_q=block_q, block_k=block_k,
    )
    flops_scale = 0.5 if causal else 1.0
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1, block_q, d), lambda bi, hi, qi, ki: (bi, hi, qi, 0)),
            pl.BlockSpec((1, 1, block_k, d),
                         lambda bi, hi, qi, ki, g=group: (bi, hi // g, ki, 0)),
            pl.BlockSpec((1, 1, block_k, d),
                         lambda bi, hi, qi, ki, g=group: (bi, hi // g, ki, 0)),
            pl.BlockSpec((1, block_q, _STATS_LANES),
                         lambda bi, hi, qi, ki: (bi, qi, 0)),
            pl.BlockSpec((1, 8, block_k), lambda bi, hi, qi, ki: (bi, 0, ki)),
            pl.BlockSpec(memory_space=pltpu.SMEM),  # slopes: full (h,) array
        ],
        out_specs=pl.BlockSpec(
            (1, 1, block_q, d), lambda bi, hi, qi, ki: (bi, hi, qi, 0)),
        out_shape=jax.ShapeDtypeStruct((b, h, sq, d), q.dtype),
        scratch_shapes=[
            pltpu.VMEM((block_q, _STATS_LANES), jnp.float32),
            pltpu.VMEM((block_q, _STATS_LANES), jnp.float32),
            pltpu.VMEM((block_q, d), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=int(4 * b * h * sq * skv * d * flops_scale),
            bytes_accessed=int(
                q.size * q.dtype.itemsize + k.size * k.dtype.itemsize * group
                + v.size * v.dtype.itemsize * group + q.size * q.dtype.itemsize),
            transcendentals=int(b * h * sq * skv * flops_scale),
        ),
    )(qt, kt, vt, qseg_b, kseg_b, slopes1d)
    return jnp.transpose(out, (0, 2, 1, 3))


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7, 8, 9, 10, 11))
def _flash(q, k, v, qseg, kseg, slopes, causal, scale, block_q, block_k,
           use_alibi, use_segments):
    return _flash_fwd_pallas(
        q, k, v, qseg, kseg, slopes, causal=causal, scale=scale,
        block_q=block_q, block_k=block_k, use_alibi=use_alibi,
        use_segments=use_segments)


def _flash_fwd_rule(q, k, v, qseg, kseg, slopes, causal, scale, block_q,
                    block_k, use_alibi, use_segments):
    out = _flash(q, k, v, qseg, kseg, slopes, causal, scale, block_q,
                 block_k, use_alibi, use_segments)
    return out, (q, k, v, qseg, kseg, slopes)


def _flash_bwd_rule(causal, scale, block_q, block_k, use_alibi, use_segments,
                    residuals, g):
    from merlin_tpu.ops.attention import mha_reference

    q, k, v, qseg, kseg, slopes = residuals

    def ref(q_, k_, v_):
        return mha_reference(
            q_, k_, v_, causal=causal,
            segment_ids_q=qseg if use_segments else None,
            segment_ids_kv=kseg if use_segments else None,
            alibi_slopes=slopes if use_alibi else None, scale=scale)

    _, vjp = jax.vjp(ref, q, k, v)
    dq, dk, dv = vjp(g)
    f0 = jax.dtypes.float0
    return (dq, dk, dv,
            np.zeros(qseg.shape, f0), np.zeros(kseg.shape, f0),
            jnp.zeros_like(slopes))


_flash.defvjp(_flash_fwd_rule, _flash_bwd_rule)


def flash_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    *,
    segment_ids_q: Optional[jax.Array] = None,
    segment_ids_kv: Optional[jax.Array] = None,
    alibi_slopes: Optional[jax.Array] = None,
    causal: bool = True,
    scale: Optional[float] = None,
    block_q: int = 512,
    block_k: int = 512,
    interpret: bool = False,
) -> jax.Array:
    """Flash attention. q: (b, sq, h, d); k/v: (b, skv, hkv, d).

    Sequence lengths must be multiples of the block sizes (callers pad via
    :func:`merlin_tpu.ops.attention.attention`, which also masks padding).
    """
    b, sq, h, d = q.shape
    skv = k.shape[1]
    if sq % block_q or skv % block_k:
        raise ValueError(
            f"seq lens ({sq},{skv}) must be multiples of blocks ({block_q},{block_k})")
    scale = scale if scale is not None else d ** -0.5
    use_segments = segment_ids_q is not None
    if segment_ids_q is None:
        segment_ids_q = jnp.ones((b, sq), jnp.int32)
    if segment_ids_kv is None:
        segment_ids_kv = jnp.ones((b, skv), jnp.int32)
    use_alibi = alibi_slopes is not None
    if alibi_slopes is None:
        alibi_slopes = jnp.zeros((h,), jnp.float32)
    if interpret:
        with pltpu.force_tpu_interpret_mode():
            return _flash(q, k, v, segment_ids_q, segment_ids_kv, alibi_slopes,
                          causal, scale, block_q, block_k, use_alibi,
                          use_segments)
    return _flash(q, k, v, segment_ids_q, segment_ids_kv, alibi_slopes,
                  causal, scale, block_q, block_k, use_alibi, use_segments)
