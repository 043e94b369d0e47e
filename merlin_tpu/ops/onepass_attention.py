"""Single-pass (non-flash) Pallas attention for short-KV bidirectional shapes.

The ViT tower's attention (b=8, h=16, s=1025, d=64 — the CLIP ViT-L/14-448
encode hot path, reference clip_encoder.py:64-72) is a pathological shape for
online-softmax flash kernels: the work per (batch, head) cell is tiny, the
head_dim of 64 wastes half the 128-wide MXU contraction, and profiling shows
both our flash kernel and jax's canonical TPU kernel bottom out at
~40-85 G-logits/s — VPU-bound on the online-softmax bookkeeping (running max
/ sum broadcasts, alpha rescaling, masking), not MXU-bound.

This kernel exploits that the whole KV fits in VMEM at these sizes:

  * one K/V block per (b, head_group, q_block) grid cell -> NO online
    statistics: plain  m = max(s);  p = exp2(s - m);  o = (p @ v) / l.
  * head groups are processed inside each cell from the model's native
    (b, s, h*d) lane-packed layout (a free reshape) — measured tower-level,
    the (b,s,h,d)<->(b,h,s,d) transposes a per-head grid forces in XLA cost
    more than the attention math itself at this shape.
  * scores are scaled by scale*log2(e) in f32 (scaling q in bf16 before the
    matmul loses ~2 bits that exp2 amplifies to ~3% output error) and
    exponentiated with the native `exp2`.
  * padding (CLS + 1024 patches = 1025 rows) is handled internally: the
    inference path pads only to a multiple of 8 (1032) since nothing
    constrains the lane dim; the trained path pads the q length to a
    multiple of 128 because the LSE residual rides (g*8, block_q) tiles.
    Padded KV columns are masked by a compile-time `kv_len` iota compare.

Per-logit VPU work drops to ~4 ops (max-reduce, sub, exp2, sum). Not a
flash kernel: s is materialized per (block_q, skv) tile in VMEM, so this
path requires skv to fit (<= ~4k); the dispatcher falls back to the flash
kernel beyond that.

Emits the same natural-log LSE residual as the flash kernel when
differentiated, so the backward pass reuses the flash dq/dkv kernels.
"""

from __future__ import annotations

import functools
import math
import os
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30
_LSE_SUBLANES = 8
LOG2E = math.log2(math.e)


def _make_kernel(*, scale: float, kv_len: int, g: int, d: int,
                 emit_lse: bool, assume_bounded: bool,
                 mxu_sum: bool = False):
    """Kernel for one (b, head_group, q_block) cell; refs are (1, rows, g*d)
    lane-packed. Head slices are static lane offsets (free); KV blocks have
    a constant index over the q dimension, so Mosaic's revolving buffers DMA
    them once per group. ``g`` (heads per cell) is bounded so the f32 score
    tiles fit scoped VMEM (16MB).

    ``assume_bounded`` drops the max-subtraction: p = exp2(s) directly.
    Exact in f32 as long as natural logits stay below ~88 (f32 exp2
    overflows at 2^127) — true for LayerNorm'd towers at inference, whose
    logits are empirically < 30. Saves a max-reduce + subtract pass over
    the score tile, a large share of this VPU-bound kernel. The scores are
    still clamped at 2^120 so a pathological checkpoint degrades to a
    saturated-but-finite softmax instead of inf/NaN; the trained path
    (emit_lse) always runs with ``assume_bounded=False`` because
    attention-logit growth during fine-tuning is a real instability and
    the LSE residual must be exact for the backward kernels."""
    c = scale * LOG2E

    def kernel(q_ref, k_ref, v_ref, out_ref, *maybe_lse):
        skv = k_ref.shape[1]
        for hh in range(g):
            sl = slice(hh * d, (hh + 1) * d)
            s = jax.lax.dot_general(
                q_ref[0, :, sl], k_ref[0, :, sl],
                (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32) * c      # (bq, skv)
            if kv_len < skv:
                # constant bias row: 1 VPU pass instead of iota+cmp+select
                bias = jnp.where(
                    jax.lax.broadcasted_iota(
                        jnp.int32, (1, skv), 1) < kv_len,
                    0.0, NEG_INF)
                s = s + bias
            if assume_bounded:
                # clamp: overflow (logits >= ~88 natural) saturates the
                # softmax instead of producing inf/NaN outputs
                p = jnp.exp2(jnp.minimum(s, 120.0))
                m = None
            else:
                m = jnp.max(s, axis=-1, keepdims=True)
                p = jnp.exp2(s - m)
            pb = p.astype(v_ref.dtype)
            if mxu_sum and not emit_lse:
                # MXU-summed denominator: the softmax sum rides a second
                # matmul against a ones column block instead of a VPU
                # lane-reduce over up to 4k lanes — this kernel is
                # VPU-bound, the MXU is mostly idle. Using the SAME
                # bf16-rounded p for numerator and denominator keeps the
                # two consistently scaled (out = sum(p̃ v)/sum(p̃)).
                ones = jnp.ones((skv, d), v_ref.dtype)
                l_tile = jax.lax.dot_general(
                    pb, ones, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)      # (bq, d)
                acc = jax.lax.dot_general(
                    pb, v_ref[0, :, sl],
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)      # (bq, d)
                out_ref[0, :, sl] = (acc / l_tile).astype(out_ref.dtype)
                continue
            l = jnp.sum(p, axis=-1, keepdims=True)
            acc = jax.lax.dot_general(
                pb, v_ref[0, :, sl],
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)          # (bq, d)
            out_ref[0, :, sl] = (acc / l).astype(out_ref.dtype)
            if emit_lse:
                lse = (jnp.log(l) if m is None
                       else m / LOG2E + jnp.log(l)).T        # natural log
                maybe_lse[0][0, hh * _LSE_SUBLANES:(hh + 1) * _LSE_SUBLANES,
                             :] = jnp.broadcast_to(
                    lse, (_LSE_SUBLANES, lse.shape[1]))

    return kernel


def _make_kernel_bd(*, scale: float, kv_len: int, g: int, d: int):
    """Block-diagonal packed inference kernel for g*d == 128 cells.

    At d=64 a per-head (bq, 64) @ (64, skv) score matmul uses HALF the
    MXU's 128-wide contraction. Here the g heads of a cell are stacked as
    extra ROWS with their off-head lanes zeroed, so ONE
    (g*bq, 128) @ (128, skv) matmul computes every head's scores at full
    contraction utilization (rows [h*bq, (h+1)*bq) hold head h). The P@V
    stage multiplies the full lane-packed V (each row computes both
    heads' outputs, its own head's lanes kept at recombine) — same MXU
    time as two half-utilized matmuls but one op. Inference path only
    (assume_bounded, no LSE)."""
    c = scale * LOG2E

    def kernel(q_ref, k_ref, v_ref, out_ref):
        skv = k_ref.shape[1]
        bq = q_ref.shape[1]
        q = q_ref[0]                                     # (bq, g*d)
        lane = jax.lax.broadcasted_iota(jnp.int32, q.shape, 1)
        q_bd = jnp.concatenate(
            [jnp.where((lane >= hh * d) & (lane < (hh + 1) * d), q, 0)
             for hh in range(g)], axis=0)                # (g*bq, g*d)
        s = jax.lax.dot_general(
            q_bd, k_ref[0], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * c      # (g*bq, skv)
        if kv_len < skv:
            # padded-KV masking as ONE broadcast add of a constant bias
            # row (the iota/compare/select trio costs 3 full-tile VPU
            # passes; the mask pattern is compile-time constant)
            bias = jnp.where(
                jax.lax.broadcasted_iota(jnp.int32, (1, skv), 1) < kv_len,
                0.0, NEG_INF)
            s = s + bias
        p = jnp.exp2(jnp.minimum(s, 120.0))
        l = jnp.sum(p, axis=-1, keepdims=True)
        acc = jax.lax.dot_general(
            p.astype(v_ref.dtype), v_ref[0],
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)          # (g*bq, g*d)
        out = acc / l
        out_ref[0] = jnp.concatenate(
            [out[hh * bq:(hh + 1) * bq, hh * d:(hh + 1) * d]
             for hh in range(g)], axis=1).astype(out_ref.dtype)

    return kernel


def _pad_rows(x, multiple: int):
    pad = (-x.shape[1]) % multiple
    if pad:
        x = jnp.pad(x, ((0, 0), (0, pad)) + ((0, 0),) * (x.ndim - 2))
    return x


def _primal_pad(sq: int) -> int:
    """Padded q length for the inference path: rows only need sublane
    alignment (8), so 1025 pads to just 1032 instead of 1152."""
    return -(-sq // 8) * 8


def _trained_pad(sq: int) -> int:
    """Padded q length when the LSE residual is emitted: its (g*8, block_q)
    tiles need block_q % 128 == 0, so pad to a 128-divisible block grid."""
    if sq <= 512:
        return -(-sq // 128) * 128
    return -(-sq // 384) * 384


# scoped VMEM is 16MB; leave headroom for operand/output pipeline buffers
_VMEM_BUDGET = 13 * 1024 * 1024


def _pick_block_q(sq_pad: int, skv: int, g: int, align: int) -> int:
    """Largest divisor of sq_pad (aligned) whose f32+bf16 score tiles for a
    g-head group fit the VMEM budget — fewer grid cells beat smaller tiles
    (per-cell fixed costs dominate at ViT sizes)."""
    for n in (1, 2, 3, 4, 6, 8, 12, 16):
        if sq_pad % n:
            continue
        bq = sq_pad // n
        if bq % align:
            continue
        if g * bq * skv * 6 <= _VMEM_BUDGET:
            return bq
    return align


def _onepass_fwd(q, k, v, *, scale: float, kv_len: int, emit_lse: bool,
                 assume_bounded: bool = True, mxu_sum: bool = False):
    b, sq_pad, h, d = q.shape
    skv = k.shape[1]
    assert k.shape[2] == h, "GQA not supported on the one-pass path"

    # free reshapes: heads stay lane-packed, no transposes
    q2 = q.reshape(b, sq_pad, h * d)
    k2 = k.reshape(b, skv, h * d)
    v2 = v.reshape(b, skv, h * d)

    # heads per cell: exactly 128 lanes' worth (lane-tiling minimum; more
    # heads only multiply live score tiles without saving DMA)
    g = max(1, 128 // d)
    assert h % g == 0, (h, g)
    block_q = _pick_block_q(sq_pad, skv, g, 128 if emit_lse else 8)
    assert sq_pad % block_q == 0, (sq_pad, block_q)

    grid = (b, h // g, sq_pad // block_q)
    out_shapes = [jax.ShapeDtypeStruct((b, sq_pad, h * d), q.dtype)]
    out_specs = [pl.BlockSpec((1, block_q, g * d),
                              lambda bi, gi, qi: (bi, qi, gi))]
    if emit_lse:
        out_shapes.append(
            jax.ShapeDtypeStruct((b, h * _LSE_SUBLANES, sq_pad), jnp.float32))
        out_specs.append(pl.BlockSpec((1, g * _LSE_SUBLANES, block_q),
                                      lambda bi, gi, qi: (bi, gi, qi)))

    use_bd = (not emit_lse and assume_bounded and g > 1 and g * d == 128
              and os.environ.get("MERLIN_ONEPASS_BD", "1") != "0")
    kernel = (_make_kernel_bd(scale=scale, kv_len=kv_len, g=g, d=d)
              if use_bd else
              _make_kernel(scale=scale, kv_len=kv_len, g=g, d=d,
                           emit_lse=emit_lse, assume_bounded=assume_bounded,
                           mxu_sum=mxu_sum))
    outs = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, g * d), lambda bi, gi, qi: (bi, qi, gi)),
            pl.BlockSpec((1, skv, g * d), lambda bi, gi, qi: (bi, 0, gi)),
            pl.BlockSpec((1, skv, g * d), lambda bi, gi, qi: (bi, 0, gi)),
        ],
        out_specs=tuple(out_specs) if emit_lse else out_specs[0],
        out_shape=tuple(out_shapes) if emit_lse else out_shapes[0],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=int(4 * b * h * sq_pad * skv * d),
            bytes_accessed=int(2 * q.size * q.dtype.itemsize
                               + 2 * k.size * k.dtype.itemsize),
            transcendentals=int(b * h * sq_pad * skv),
        ),
    )(q2, k2, v2)
    if emit_lse:
        out, lse = outs
        # lse (b, h*8, sq) -> (b, h, 8, sq): free reshape
        return (out.reshape(b, sq_pad, h, d),
                lse.reshape(b, h, _LSE_SUBLANES, sq_pad))
    return outs.reshape(b, sq_pad, h, d), None


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def _onepass(q, k, v, scale):
    sq = q.shape[1]
    sq_pad = _primal_pad(sq)
    qp = jnp.pad(q, ((0, 0), (0, sq_pad - sq), (0, 0), (0, 0)))
    kp = _pad_rows(k, 8)
    vp = _pad_rows(v, 8)
    # MERLIN_ONEPASS_MXU_SUM=1 rides the softmax sum on a second MXU
    # matmul instead of the VPU lane-reduce. Measured on hardware it is a
    # REGRESSION at the ViT-L shape (156.5 vs 172.0 fps encode, same
    # session): the ones-matmul doubles the P@V-stage MXU work and that
    # costs more than the lane-reduce it saves. Kept behind the flag as a
    # documented dead end (r3; like r2's rejected QKV fusion).
    out, _ = _onepass_fwd(
        qp, kp, vp, scale=scale, kv_len=k.shape[1], emit_lse=False,
        mxu_sum=os.environ.get("MERLIN_ONEPASS_MXU_SUM", "0") == "1")
    return out[:, :sq]


def _onepass_fwd_rule(q, k, v, scale):
    sq = q.shape[1]
    sq_pad = _trained_pad(sq)
    qp = jnp.pad(q, ((0, 0), (0, sq_pad - sq), (0, 0), (0, 0)))
    kp = _pad_rows(k, 128)
    vp = _pad_rows(v, 128)
    out, lse = _onepass_fwd(qp, kp, vp, scale=scale, kv_len=k.shape[1],
                            emit_lse=True, assume_bounded=False)
    return out[:, :sq], (qp, kp, vp, out, lse, sq, k.shape[1])


def _make_dq_kernel(*, scale: float, g: int, d: int):
    """dq for one (b, head_group, q_block) cell, whole KV in VMEM.

    No masking needed anywhere: padded KV rows of k/v are zeros, so their
    (nonzero) p values die multiplying k=0 in the final dot; padded q rows
    produce garbage dq rows that the caller slices off.
    """
    c = scale * LOG2E

    def kernel(q_ref, k_ref, v_ref, do_ref, lse_ref, di_ref, dq_ref):
        for hh in range(g):
            sl = slice(hh * d, (hh + 1) * d)
            s = jax.lax.dot_general(
                q_ref[0, :, sl], k_ref[0, :, sl],
                (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32) * c   # (bq, skv) log2
            lse_col = lse_ref[0, hh * _LSE_SUBLANES:hh * _LSE_SUBLANES + 1,
                              :].T                         # (bq, 1) natural
            p = jnp.exp2(s - lse_col * LOG2E)
            dp = jax.lax.dot_general(
                do_ref[0, :, sl], v_ref[0, :, sl],
                (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)        # (bq, skv)
            di_col = di_ref[0, hh * _LSE_SUBLANES:hh * _LSE_SUBLANES + 1,
                            :].T                           # (bq, 1)
            ds = p * (dp - di_col) * scale
            dq_ref[0, :, sl] = jax.lax.dot_general(
                ds.astype(k_ref.dtype), k_ref[0, :, sl],
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32).astype(dq_ref.dtype)

    return kernel


def _make_dkv_kernel(*, scale: float, g: int, d: int):
    """dk/dv for one (b, head_group, k_block) cell, whole Q/do in VMEM.

    The LSE/di rows broadcast along sublanes (no transpose needed). Padded
    q columns self-cancel: do rows there are zero, so dp == di == 0 and
    ds == 0; dk's q operand rows are zero too.
    """
    c = scale * LOG2E

    def kernel(q_ref, k_ref, v_ref, do_ref, lse_ref, di_ref,
               dk_ref, dv_ref):
        for hh in range(g):
            sl = slice(hh * d, (hh + 1) * d)
            st = jax.lax.dot_general(
                k_ref[0, :, sl], q_ref[0, :, sl],
                (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32) * c    # (bk, sq) log2
            lse_row = lse_ref[0, hh * _LSE_SUBLANES:hh * _LSE_SUBLANES + 1,
                              :]                           # (1, sq) natural
            p = jnp.exp2(st - lse_row * LOG2E)
            dv_ref[0, :, sl] = jax.lax.dot_general(
                p.astype(do_ref.dtype), do_ref[0, :, sl],
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32).astype(dv_ref.dtype)
            dp = jax.lax.dot_general(
                v_ref[0, :, sl], do_ref[0, :, sl],
                (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)        # (bk, sq)
            di_row = di_ref[0, hh * _LSE_SUBLANES:hh * _LSE_SUBLANES + 1, :]
            ds = p * (dp - di_row) * scale
            dk_ref[0, :, sl] = jax.lax.dot_general(
                ds.astype(q_ref.dtype), q_ref[0, :, sl],
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32).astype(dk_ref.dtype)

    return kernel


def _onepass_bwd_rule(scale, residuals, g):
    qp, kp, vp, out, lse, sq, kv_len = residuals
    b, sq_pad, h, d = qp.shape
    skv = kp.shape[1]
    gp = jnp.pad(g, ((0, 0), (0, sq_pad - sq), (0, 0), (0, 0)))

    hg = max(1, 128 // d)
    assert h % hg == 0, (h, hg)
    # di = sum(out * do) per (b, h, pos), laid out (b, h*8, sq) like lse
    di = jnp.einsum("bshd,bshd->bhs", out.astype(jnp.float32),
                    gp.astype(jnp.float32))
    di8 = jnp.broadcast_to(di[:, :, None, :],
                           (b, h, _LSE_SUBLANES, sq_pad)
                           ).reshape(b, h * _LSE_SUBLANES, sq_pad)
    lse8 = lse.reshape(b, h * _LSE_SUBLANES, sq_pad)

    q2 = qp.reshape(b, sq_pad, h * d)
    k2 = kp.reshape(b, skv, h * d)
    v2 = vp.reshape(b, skv, h * d)
    do2 = gp.reshape(b, sq_pad, h * d)

    # dq's lse/di tiles ride (g*8, block_q), so block_q needs 128-alignment
    block_q = _pick_block_q(sq_pad, skv, hg, 128)
    dq = pl.pallas_call(
        _make_dq_kernel(scale=scale, g=hg, d=d),
        grid=(b, h // hg, sq_pad // block_q),
        in_specs=[
            pl.BlockSpec((1, block_q, hg * d), lambda bi, gi, qi: (bi, qi, gi)),
            pl.BlockSpec((1, skv, hg * d), lambda bi, gi, qi: (bi, 0, gi)),
            pl.BlockSpec((1, skv, hg * d), lambda bi, gi, qi: (bi, 0, gi)),
            pl.BlockSpec((1, block_q, hg * d), lambda bi, gi, qi: (bi, qi, gi)),
            pl.BlockSpec((1, hg * _LSE_SUBLANES, block_q),
                         lambda bi, gi, qi: (bi, gi, qi)),
            pl.BlockSpec((1, hg * _LSE_SUBLANES, block_q),
                         lambda bi, gi, qi: (bi, gi, qi)),
        ],
        out_specs=pl.BlockSpec((1, block_q, hg * d),
                               lambda bi, gi, qi: (bi, qi, gi)),
        out_shape=jax.ShapeDtypeStruct((b, sq_pad, h * d), qp.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")),
        cost_estimate=pl.CostEstimate(
            flops=int(6 * b * h * sq_pad * skv * d),
            bytes_accessed=int(4 * qp.size * qp.dtype.itemsize),
            transcendentals=int(b * h * sq_pad * skv)),
    )(q2, k2, v2, do2, lse8, di8)

    block_k = _pick_block_q(skv, sq_pad, hg, 8)
    dk, dv = pl.pallas_call(
        _make_dkv_kernel(scale=scale, g=hg, d=d),
        grid=(b, h // hg, skv // block_k),
        in_specs=[
            pl.BlockSpec((1, sq_pad, hg * d), lambda bi, gi, ki: (bi, 0, gi)),
            pl.BlockSpec((1, block_k, hg * d), lambda bi, gi, ki: (bi, ki, gi)),
            pl.BlockSpec((1, block_k, hg * d), lambda bi, gi, ki: (bi, ki, gi)),
            pl.BlockSpec((1, sq_pad, hg * d), lambda bi, gi, ki: (bi, 0, gi)),
            pl.BlockSpec((1, hg * _LSE_SUBLANES, sq_pad),
                         lambda bi, gi, ki: (bi, gi, 0)),
            pl.BlockSpec((1, hg * _LSE_SUBLANES, sq_pad),
                         lambda bi, gi, ki: (bi, gi, 0)),
        ],
        out_specs=(
            pl.BlockSpec((1, block_k, hg * d), lambda bi, gi, ki: (bi, ki, gi)),
            pl.BlockSpec((1, block_k, hg * d), lambda bi, gi, ki: (bi, ki, gi)),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((b, skv, h * d), kp.dtype),
            jax.ShapeDtypeStruct((b, skv, h * d), vp.dtype),
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")),
        cost_estimate=pl.CostEstimate(
            flops=int(10 * b * h * sq_pad * skv * d),
            bytes_accessed=int(4 * qp.size * qp.dtype.itemsize),
            transcendentals=int(b * h * sq_pad * skv)),
    )(q2, k2, v2, do2, lse8, di8)

    dq = dq.reshape(b, sq_pad, h, d)[:, :sq]
    dk = dk.reshape(b, skv, h, d)[:, :kv_len]
    dv = dv.reshape(b, skv, h, d)[:, :kv_len]
    return dq, dk, dv


_onepass.defvjp(_onepass_fwd_rule, _onepass_bwd_rule)


def onepass_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    *,
    scale: Optional[float] = None,
) -> jax.Array:
    """Single-pass bidirectional attention; q: (b, sq, h, d), k/v same h.

    Handles non-aligned sequence lengths internally (padding + masking);
    returns (b, sq, h, d).
    """
    d = q.shape[-1]
    scale = scale if scale is not None else d ** -0.5
    return _onepass(q, k, v, scale)
