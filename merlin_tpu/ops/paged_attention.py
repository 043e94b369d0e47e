"""Pallas paged-attention decode kernel + a minimal page allocator.

Serving-side replacement for the reference's HF generate over a contiguous
KV cache (SURVEY.md §2.9 "CUDA paged generation"): each sequence's KV lives
in fixed-size pages scattered across HBM; a page table maps logical blocks
to physical pages so concurrent requests share one pool with no
fragmentation or copies on admission/eviction.

Page layout is HEAD-PACKED: (total_pages, page_size, kv_heads * head_dim),
heads riding the lane dimension. One page is one contiguous HBM region
covering ALL heads, so a page moves with a single DMA (the per-head layout
needed hkv separate 32KB copies per page — DMA-issue overhead capped the
pipeline at ~150 GB/s), and each head's K/V is a free LANE slice in VMEM,
the same packing trick as onepass_attention. The layout also makes the
decode-step cache write one contiguous (hkv*d,) row per token.

Two kernels: a BlockSpec variant (grid (b, hkv, pages); scalar-prefetched
page ids inside the K/V index maps, pipeline-managed double buffering) and
the production DMA variant (flat grid over (b, blocks); explicit async
copies of whole multi-head pages, prefetch crossing cell boundaries;
online softmax per head over lane slices).
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30
_LANES = 128


def _paged_kernel(
    lengths_ref, page_tables_ref, slopes_ref,   # scalar prefetch (SMEM)
    q_ref, k_page_ref, v_page_ref,              # VMEM blocks
    out_ref,
    m_scr, l_scr, acc_scr,
    *, scale: float, page_size: int, group: int, use_alibi: bool,
):
    b = pl.program_id(0)
    hk = pl.program_id(1)
    pi = pl.program_id(2)
    n_pages = pl.num_programs(2)
    length = lengths_ref[b]

    @pl.when(pi == 0)
    def _init():
        m_scr[:] = jnp.full_like(m_scr, NEG_INF)
        l_scr[:] = jnp.zeros_like(l_scr)
        acc_scr[:] = jnp.zeros_like(acc_scr)

    @pl.when(pi * page_size < length)
    def _compute():
        q = q_ref[0, 0]                          # (group, d)
        k = k_page_ref[0]                        # (page, d) lane-block h
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * scale   # (group, page)

        k_pos = pi * page_size + jax.lax.broadcasted_iota(
            jnp.int32, s.shape, 1)
        if use_alibi:
            # per-query-head slopes; the decode token sits at length-1
            slopes = jnp.stack(
                [slopes_ref[hk * group + g] for g in range(group)])
            s = s + slopes[:, None] * (
                k_pos - (length - 1)).astype(jnp.float32)
        s = jnp.where(k_pos < length, s, NEG_INF)

        m_prev = m_scr[:, :1]
        m_cur = jnp.max(s, axis=-1, keepdims=True)
        m_new = jnp.maximum(m_prev, m_cur)
        alpha = jnp.exp(m_prev - m_new)
        p = jnp.exp(s - m_new)
        l_new = alpha * l_scr[:, :1] + jnp.sum(p, axis=-1, keepdims=True)
        acc_scr[:] = acc_scr[:] * alpha + jax.lax.dot_general(
            p.astype(v_page_ref.dtype), v_page_ref[0],
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        m_scr[:] = jnp.broadcast_to(m_new, m_scr.shape)
        l_scr[:] = jnp.broadcast_to(l_new, l_scr.shape)

    @pl.when(pi == n_pages - 1)
    def _finalize():
        l = l_scr[:, :1]
        l = jnp.where(l == 0.0, 1.0, l)
        out_ref[0, 0] = (acc_scr[:] / l).astype(out_ref.dtype)


def paged_attention(
    q: jax.Array,            # (b, h, d) one decode token per sequence
    k_pages: jax.Array,      # (total_pages, page_size, hkv*d) head-packed
    v_pages: jax.Array,
    lengths: jax.Array,      # (b,) int32 valid tokens per sequence
    page_tables: jax.Array,  # (b, pages_per_seq) int32 physical page ids
    *,
    alibi_slopes: Optional[jax.Array] = None,   # (h,) per query head
    scale: Optional[float] = None,
) -> jax.Array:
    """Decode-step attention over a paged KV cache. Returns (b, h, d)."""
    b, h, d = q.shape
    total_pages, page_size, packed = k_pages.shape
    hkv = packed // d
    assert h % hkv == 0
    group = h // hkv
    pages_per_seq = page_tables.shape[1]
    scale = scale if scale is not None else d ** -0.5
    use_alibi = alibi_slopes is not None
    if alibi_slopes is None:
        alibi_slopes = jnp.zeros((h,), jnp.float32)

    qg = q.reshape(b, hkv, group, d)

    grid = (b, hkv, pages_per_seq)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1, group, d),
                         lambda b_, h_, p_, lens, tables, sl: (b_, h_, 0, 0)),
            pl.BlockSpec((1, page_size, d),
                         lambda b_, h_, p_, lens, tables, sl:
                         (tables[b_, p_], 0, h_)),
            pl.BlockSpec((1, page_size, d),
                         lambda b_, h_, p_, lens, tables, sl:
                         (tables[b_, p_], 0, h_)),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, group, d),
            lambda b_, h_, p_, lens, tables, sl: (b_, h_, 0, 0)),
        scratch_shapes=[
            pltpu.VMEM((group, _LANES), jnp.float32),
            pltpu.VMEM((group, _LANES), jnp.float32),
            pltpu.VMEM((group, d), jnp.float32),
        ],
    )
    out = pl.pallas_call(
        functools.partial(_paged_kernel, scale=scale, page_size=page_size,
                          group=group, use_alibi=use_alibi),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, hkv, group, d), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")),
    )(lengths.astype(jnp.int32), page_tables.astype(jnp.int32),
      alibi_slopes.astype(jnp.float32), qg, k_pages, v_pages)
    return out.reshape(b, h, d)


def paged_attention_reference(q, k_pages, v_pages, lengths, page_tables,
                              *, alibi_slopes=None, scale=None):
    """XLA reference (gather pages then dense attention) for tests/CPU."""
    b, h, d = q.shape
    _, page_size, packed = k_pages.shape
    hkv = packed // d
    group = h // hkv
    pages_per_seq = page_tables.shape[1]
    max_len = pages_per_seq * page_size
    scale = scale if scale is not None else d ** -0.5

    # gather: (b, hkv, max_len, d)
    k_seq = k_pages[page_tables]               # (b, pages, page, hkv*d)
    v_seq = v_pages[page_tables]
    k_seq = k_seq.reshape(b, max_len, hkv, d).transpose(0, 2, 1, 3)
    v_seq = v_seq.reshape(b, max_len, hkv, d).transpose(0, 2, 1, 3)

    qg = q.reshape(b, hkv, group, d).astype(jnp.float32)
    s = jnp.einsum("bhgd,bhkd->bhgk", qg,
                   k_seq.astype(jnp.float32)) * scale
    k_pos = jnp.arange(max_len)
    if alibi_slopes is not None:
        slopes = alibi_slopes.reshape(hkv, group)
        dist = (k_pos[None, :] - (lengths - 1)[:, None]).astype(jnp.float32)
        s = s + slopes[None, :, :, None] * dist[:, None, None, :]
    mask = k_pos[None, :] < lengths[:, None]
    s = jnp.where(mask[:, None, None, :], s, NEG_INF)
    p = jax.nn.softmax(s, axis=-1)
    out = jnp.einsum("bhgk,bhkd->bhgd", p, v_seq.astype(jnp.float32))
    return out.reshape(b, h, d).astype(q.dtype)


# ---------------------------------------------------------------------------
# multi-page DMA variant: pages stay in HBM; the kernel double-buffers
# blocks of HEAD-PACKED pages with explicit async copies. One DMA moves a
# page for ALL kv heads (the per-head layout needed hkv separate copies,
# and DMA-issue overhead capped it at ~150 GB/s). The grid is FLAT over
# (b * blocks) with the prefetch of step t+1 issued while step t computes,
# across batch boundaries. Per-head compute reads free lane slices of the
# (tokens, hkv*d) reshape — no relayout.
# ---------------------------------------------------------------------------

def _paged_dma_kernel(
    lengths_ref, page_tables_ref,            # scalar prefetch (SMEM)
    qbd_ref, k_hbm_ref, v_hbm_ref,           # q block-diag; pages HBM/ANY
    out_ref,
    k_buf, v_buf, sems, m_scr, l_scr, acc_scr,
    *, scale: float, page_size: int, pages_per_block: int,
    max_blocks: int, hkv: int, group: int, d: int,
):
    t = pl.program_id(0)
    total = pl.num_programs(0)
    h = hkv * group
    block_tokens = page_size * pages_per_block

    def unflatten(tt):
        return tt // max_blocks, jax.lax.rem(tt, max_blocks)

    def active(tt):
        b_t, blk_t = unflatten(tt)
        return blk_t * block_tokens < lengths_ref[b_t]

    def copies(tt, slot):
        b_t, blk_t = unflatten(tt)
        out = []
        for j in range(pages_per_block):
            page = page_tables_ref[b_t, blk_t * pages_per_block + j]
            out.append(pltpu.make_async_copy(
                k_hbm_ref.at[page], k_buf.at[slot, j], sems.at[0, slot, j]))
            out.append(pltpu.make_async_copy(
                v_hbm_ref.at[page], v_buf.at[slot, j], sems.at[1, slot, j]))
        return out

    b, blk = unflatten(t)
    length = lengths_ref[b]
    slot = jax.lax.rem(t, 2)

    # steady state: step t's DMA was issued at step t-1; issue t+1's now.
    # block 0 is always active (decode lengths >= 1), so the t==0 bootstrap
    # never targets a skipped block. A block skipped by `active` gets no
    # DMA and no wait — the predicates are the same formula.
    @pl.when(t == 0)
    def _bootstrap():
        for c in copies(0, 0):
            c.start()

    @pl.when(jnp.logical_and(t + 1 < total, active(t + 1)))
    def _prefetch_next():
        for c in copies(t + 1, 1 - slot):
            c.start()

    @pl.when(blk == 0)
    def _init():
        m_scr[:] = jnp.full_like(m_scr, NEG_INF)
        l_scr[:] = jnp.zeros_like(l_scr)
        acc_scr[:] = jnp.zeros_like(acc_scr)

    @pl.when(active(t))
    def _compute():
        for c in copies(t, slot):
            c.wait()
        # (ppb, page, hkv*d) -> (tokens, hkv*d): leading-dim merge, free
        k = k_buf[slot].reshape(block_tokens, hkv * d)
        v = v_buf[slot].reshape(block_tokens, hkv * d)

        # ALL heads in one MXU matmul: qbd is block-diagonal (h, hkv*d)
        # (query row qh is nonzero only in its kv head's lane block), so
        # qbd @ k^T computes every head's scores in a single (h, tokens)
        # tile — one op chain instead of hkv tiny ones (the per-head loop
        # version spent ~20us/block on op-issue overhead alone).
        s = jax.lax.dot_general(
            qbd_ref[0], k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * scale   # (h, tokens)
        k_pos = blk * block_tokens + jax.lax.broadcasted_iota(
            jnp.int32, s.shape, 1)
        s = jnp.where(k_pos < length, s, NEG_INF)

        m_prev = m_scr[:, :1]
        m_cur = jnp.max(s, axis=-1, keepdims=True)
        m_new = jnp.maximum(m_prev, m_cur)
        alpha = jnp.exp(m_prev - m_new)
        p = jnp.exp(s - m_new)
        l_new = alpha * l_scr[:, :1] + jnp.sum(p, axis=-1, keepdims=True)
        # full P @ V: row qh's OWN kv block lands at lanes
        # [kv(qh)*d : kv(qh)*d+d]; other lanes hold cross-head garbage the
        # finalize discards. Still one matmul, still DMA-bound overall.
        acc_scr[:] = acc_scr[:] * alpha + jax.lax.dot_general(
            p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        m_scr[:] = jnp.broadcast_to(m_new, m_scr.shape)
        l_scr[:] = jnp.broadcast_to(l_new, l_scr.shape)

    # the last active block of a cell finalizes; trailing inactive blocks
    # leave out_ref untouched (same VMEM block until the cell changes)
    @pl.when(jnp.logical_and(
        active(t),
        jnp.logical_or(blk == max_blocks - 1,
                       (blk + 1) * block_tokens >= length)))
    def _finalize():
        l = l_scr[:, :1]
        l = jnp.where(l == 0.0, 1.0, l)
        acc = acc_scr[:] / l
        for qh in range(h):                      # static diag-block copies
            sl = slice((qh // group) * d, (qh // group) * d + d)
            out_ref[0, qh, :] = acc[qh, sl].astype(out_ref.dtype)


# VMEM budget for the two double-buffered page blocks (k+v), leaving
# headroom for q/out pipeline buffers and f32 score tiles
_DMA_VMEM_BUDGET = 10 * 1024 * 1024


def paged_attention_dma(
    q: jax.Array, k_pages: jax.Array, v_pages: jax.Array,
    lengths: jax.Array, page_tables: jax.Array, *,
    pages_per_block: Optional[int] = None, scale: Optional[float] = None,
) -> jax.Array:
    """Multi-page double-buffered paged attention (no ALiBi variant yet).

    Requires lengths >= 1 for every row (true for decode: the prefilled
    prompt is at least one token)."""
    b, h, d = q.shape
    total_pages, page_size, packed = k_pages.shape
    hkv = packed // d
    group = h // hkv
    pages_per_seq = page_tables.shape[1]
    # cap the block so the 2x2 double buffers fit the budget, then snap
    # down to a divisor of pages_per_seq
    page_bytes = page_size * packed * k_pages.dtype.itemsize
    cap = max(1, _DMA_VMEM_BUDGET // (4 * page_bytes))
    pages_per_block = cap if pages_per_block is None else min(
        pages_per_block, cap)
    while pages_per_seq % pages_per_block:
        pages_per_block -= 1
    pages_per_block = max(pages_per_block, 1)
    max_blocks = pages_per_seq // pages_per_block
    scale = scale if scale is not None else d ** -0.5

    # block-diagonal q (b, h, hkv*d): row qh carries q_qh in its kv head's
    # lane block, zeros elsewhere — lets the kernel compute every head's
    # scores with ONE matmul (see _paged_dma_kernel)
    h = hkv * group
    lane_head = jnp.arange(packed) // d                    # (hkv*d,)
    row_head = jnp.arange(h) // group                      # (h,)
    diag = (lane_head[None, :] == row_head[:, None])
    qbd = jnp.where(diag[None], jnp.tile(q, (1, 1, hkv)), 0).astype(q.dtype)

    def cell_map(t, lens, tables):
        return t // max_blocks, 0, 0

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(b * max_blocks,),
        in_specs=[
            pl.BlockSpec((1, h, packed), cell_map),
            pl.BlockSpec(memory_space=pl.ANY),   # k pages stay in HBM
            pl.BlockSpec(memory_space=pl.ANY),   # v pages stay in HBM
        ],
        out_specs=pl.BlockSpec((1, h, d), cell_map),
        scratch_shapes=[
            pltpu.VMEM((2, pages_per_block, page_size, packed),
                       k_pages.dtype),
            pltpu.VMEM((2, pages_per_block, page_size, packed),
                       v_pages.dtype),
            pltpu.SemaphoreType.DMA((2, 2, pages_per_block)),
            pltpu.VMEM((h, _LANES), jnp.float32),
            pltpu.VMEM((h, _LANES), jnp.float32),
            pltpu.VMEM((h, packed), jnp.float32),
        ],
    )
    out = pl.pallas_call(
        functools.partial(
            _paged_dma_kernel, scale=scale, page_size=page_size,
            pages_per_block=pages_per_block, max_blocks=max_blocks,
            hkv=hkv, group=group, d=d),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, h, d), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
    )(lengths.astype(jnp.int32), page_tables.astype(jnp.int32),
      qbd, k_pages, v_pages)
    return out


def paged_attention_dma_q8(
    q: jax.Array, k_values: jax.Array, k_scales: jax.Array,
    v_values: jax.Array, v_scales: jax.Array,
    lengths: jax.Array, page_tables: jax.Array, *,
    alibi_slopes: Optional[jax.Array] = None,
    pages_per_block: Optional[int] = None, scale: Optional[float] = None,
) -> jax.Array:
    """Head-packed DMA decode over int8 pages (any head grouping).

    q: (b, h, d); k/v_values: (P, page, hkv*d) int8; k/v_scales:
    (P, page, S) f32 in the strided layout (head i at lane i*(S//hkv)).
    The s_q==1 case of the multi-token kernel: its wrapper-side one-hot
    scale expansion handles MHA, GQA, and ALiBi uniformly (the retired
    dedicated kernel's contiguous lane-slice was MHA-only and pinned the
    head==lane scale layout that blocked TP sharding)."""
    out = paged_attention_dma_multi_q8(
        q[:, None], k_values, k_scales, v_values, v_scales,
        lengths, page_tables, alibi_slopes=alibi_slopes,
        pages_per_block=pages_per_block, scale=scale)
    return out[:, 0]


# ---------------------------------------------------------------------------
# multi-token DMA variant: s_q queries per sequence against ARBITRARY page
# tables — the enabling kernel for engine-integrated speculative decoding
# (verify windows) and chunked prefill. The reference's serving loop decodes
# one token per forward (mmgpt/engine/serve/model_worker.py:162-187); on TPU
# a k-token verify forward costs nearly the same HBM traffic as one decode
# step, so accepted drafts multiply throughput.
#
# Query packing is BLOCK-DIAGONAL like the single-token kernel, but rows are
# ordered KV-HEAD-MAJOR: row r = hk*(group*s_q) + g*s_q + t carries
# q[b, t, hk*group+g] in kv head hk's lane block. All s_q*h scores still
# come from ONE MXU matmul per page block, and the finalize extracts each
# kv head's CONTIGUOUS (group*s_q, d) row block — hkv static copies,
# independent of s_q (a (t, qh)-ordered layout would need s_q*h copies).
# Per-row causal masking uses true positions: row t sits at
# lengths[b]-s_q+t (lengths INCLUDE the window; callers write the window's
# K/V into the pages first). ALiBi rides along via a per-row slope input —
# the paged layout keeps true positions, so multi-token ALiBi is exact
# (unlike the dense slot-sparse speculative path, which excludes it).
# ---------------------------------------------------------------------------


def _mq_rows(s_q: int, h: int, group: int):
    """Row order r = hk*(group*s_q) + g*s_q + t; returns (t_of_row,
    qh_of_row) as numpy arrays for the wrapper-side packing."""
    r = np.arange(s_q * h)
    t = r % s_q
    hk = r // (group * s_q)
    g = (r // s_q) % group
    return t, hk * group + g


def _pack_q_blockdiag_multi(q: jax.Array, hkv: int, group: int,
                            out_dtype) -> jax.Array:
    """(b, s_q, h, d) -> (b, s_q*h, hkv*d) kv-head-major block-diagonal."""
    b, s_q, h, d = q.shape
    t_of_row, qh_of_row = _mq_rows(s_q, h, group)
    # rows gather their (t, qh) vector, then mask into the kv lane block
    rows = q[:, t_of_row, qh_of_row]                     # (b, R, d)
    lane_head = np.arange(hkv * d) // d                  # (hkv*d,)
    kv_of_row = qh_of_row // group                       # (R,)
    diag = jnp.asarray(lane_head[None, :] == kv_of_row[:, None])
    tiled = jnp.tile(rows, (1, 1, hkv))                  # (b, R, hkv*d)
    return jnp.where(diag[None], tiled, 0).astype(out_dtype)


def _unpack_o_multi(out: jax.Array, s_q: int, h: int, group: int
                    ) -> jax.Array:
    """(b, R, d) kv-head-major rows -> (b, s_q, h, d)."""
    b = out.shape[0]
    hkv = h // group
    d = out.shape[-1]
    out = out.reshape(b, hkv, group, s_q, d)
    return out.transpose(0, 3, 1, 2, 4).reshape(b, s_q, h, d)


def _paged_dma_multi_kernel(
    lengths_ref, page_tables_ref,
    qbd_ref, slope_rows_ref, k_hbm_ref, v_hbm_ref,
    out_ref,
    k_buf, v_buf, sems, m_scr, l_scr, acc_scr,
    *, scale: float, page_size: int, pages_per_block: int,
    max_blocks: int, hkv: int, group: int, d: int, s_q: int,
    use_alibi: bool,
):
    t = pl.program_id(0)
    total = pl.num_programs(0)
    R = s_q * hkv * group
    block_tokens = page_size * pages_per_block

    def unflatten(tt):
        return tt // max_blocks, jax.lax.rem(tt, max_blocks)

    def active(tt):
        b_t, blk_t = unflatten(tt)
        return blk_t * block_tokens < lengths_ref[b_t]

    def copies(tt, slot):
        b_t, blk_t = unflatten(tt)
        out = []
        for j in range(pages_per_block):
            page = page_tables_ref[b_t, blk_t * pages_per_block + j]
            out.append(pltpu.make_async_copy(
                k_hbm_ref.at[page], k_buf.at[slot, j], sems.at[0, slot, j]))
            out.append(pltpu.make_async_copy(
                v_hbm_ref.at[page], v_buf.at[slot, j], sems.at[1, slot, j]))
        return out

    b, blk = unflatten(t)
    length = lengths_ref[b]
    slot = jax.lax.rem(t, 2)

    @pl.when(t == 0)
    def _bootstrap():
        for c in copies(0, 0):
            c.start()

    @pl.when(jnp.logical_and(t + 1 < total, active(t + 1)))
    def _prefetch_next():
        for c in copies(t + 1, 1 - slot):
            c.start()

    @pl.when(blk == 0)
    def _init():
        m_scr[:] = jnp.full_like(m_scr, NEG_INF)
        l_scr[:] = jnp.zeros_like(l_scr)
        acc_scr[:] = jnp.zeros_like(acc_scr)

    @pl.when(active(t))
    def _compute():
        for c in copies(t, slot):
            c.wait()
        k = k_buf[slot].reshape(block_tokens, hkv * d)
        v = v_buf[slot].reshape(block_tokens, hkv * d)

        s = jax.lax.dot_general(
            qbd_ref[0], k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * scale   # (R, tokens)
        k_pos = blk * block_tokens + jax.lax.broadcasted_iota(
            jnp.int32, s.shape, 1)
        # row r's query position: length - s_q + (r % s_q)
        row_t = jax.lax.rem(
            jax.lax.broadcasted_iota(jnp.int32, s.shape, 0), s_q)
        q_pos = length - s_q + row_t
        if use_alibi:
            s = s + slope_rows_ref[0][:, :1] * (
                k_pos - q_pos).astype(jnp.float32)
        s = jnp.where(k_pos <= q_pos, s, NEG_INF)

        m_prev = m_scr[:, :1]
        m_cur = jnp.max(s, axis=-1, keepdims=True)
        m_new = jnp.maximum(m_prev, m_cur)
        alpha = jnp.exp(m_prev - m_new)
        p = jnp.exp(s - m_new)
        l_new = alpha * l_scr[:, :1] + jnp.sum(p, axis=-1, keepdims=True)
        acc_scr[:] = acc_scr[:] * alpha + jax.lax.dot_general(
            p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        m_scr[:] = jnp.broadcast_to(m_new, m_scr.shape)
        l_scr[:] = jnp.broadcast_to(l_new, l_scr.shape)

    @pl.when(jnp.logical_and(
        active(t),
        jnp.logical_or(blk == max_blocks - 1,
                       (blk + 1) * block_tokens >= length)))
    def _finalize():
        l = l_scr[:, :1]
        l = jnp.where(l == 0.0, 1.0, l)
        acc = acc_scr[:] / l
        gs = group * s_q
        for hk in range(hkv):                  # contiguous per-kv-head rows
            out_ref[0, hk * gs:(hk + 1) * gs, :] = (
                acc[hk * gs:(hk + 1) * gs, hk * d:hk * d + d]
                .astype(out_ref.dtype))


def paged_attention_dma_multi(
    q: jax.Array,            # (b, s_q, h, d) window queries per sequence
    k_pages: jax.Array, v_pages: jax.Array,
    lengths: jax.Array,      # (b,) INCLUDING the s_q window tokens
    page_tables: jax.Array, *,
    alibi_slopes: Optional[jax.Array] = None,
    pages_per_block: Optional[int] = None, scale: Optional[float] = None,
) -> jax.Array:
    """Multi-token paged attention over arbitrary page tables.

    The window's K/V must already be written into the pages (see
    :func:`write_tokens_to_pages`); query t attends causally to positions
    <= lengths-s_q+t. Supports GQA and ALiBi. Returns (b, s_q, h, d)."""
    b, s_q, h, d = q.shape
    total_pages, page_size, packed = k_pages.shape
    hkv = packed // d
    group = h // hkv
    R = s_q * h
    pages_per_seq = page_tables.shape[1]
    page_bytes = page_size * packed * k_pages.dtype.itemsize
    # qbd + acc scratch eat VMEM as s_q grows; shrink the page blocks
    fixed = R * packed * (2 + 4) + R * packed * 4   # qbd+out bf16, acc f32
    # big windows (chunked prefill, s_q ~ 128) blow the BD packing's VMEM
    # (qbd + acc are R x packed: 96 MB at 7B MHA, the r4 serving_chunked
    # compile OOM) AND pay hkv x QK^T overcompute — route them to the
    # per-kv-head blocked kernel, which is flop-optimal and O(s_q*d) VMEM
    if fixed > _DMA_VMEM_BUDGET // 2 and (group * s_q) % 8 == 0:
        return paged_attention_multi_blocked(
            q, k_pages, v_pages, lengths, page_tables,
            alibi_slopes=alibi_slopes, scale=scale)
    cap = max(1, (_DMA_VMEM_BUDGET - min(fixed, _DMA_VMEM_BUDGET // 2))
              // (4 * page_bytes))
    pages_per_block = cap if pages_per_block is None else min(
        pages_per_block, cap)
    while pages_per_seq % pages_per_block:
        pages_per_block -= 1
    pages_per_block = max(pages_per_block, 1)
    max_blocks = pages_per_seq // pages_per_block
    scale = scale if scale is not None else d ** -0.5
    use_alibi = alibi_slopes is not None

    qbd = _pack_q_blockdiag_multi(q, hkv, group, q.dtype)
    _, qh_of_row = _mq_rows(s_q, h, group)
    if use_alibi:
        slope_rows = jnp.broadcast_to(
            alibi_slopes.astype(jnp.float32)[qh_of_row][:, None],
            (R, _LANES))[None]
    else:
        slope_rows = jnp.zeros((1, R, _LANES), jnp.float32)

    def cell_map(t, lens, tables):
        return t // max_blocks, 0, 0

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(b * max_blocks,),
        in_specs=[
            pl.BlockSpec((1, R, packed), cell_map),
            pl.BlockSpec((1, R, _LANES), lambda t, lens, tables: (0, 0, 0)),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((1, R, d), cell_map),
        scratch_shapes=[
            pltpu.VMEM((2, pages_per_block, page_size, packed),
                       k_pages.dtype),
            pltpu.VMEM((2, pages_per_block, page_size, packed),
                       v_pages.dtype),
            pltpu.SemaphoreType.DMA((2, 2, pages_per_block)),
            pltpu.VMEM((R, _LANES), jnp.float32),
            pltpu.VMEM((R, _LANES), jnp.float32),
            pltpu.VMEM((R, packed), jnp.float32),
        ],
    )
    out = pl.pallas_call(
        functools.partial(
            _paged_dma_multi_kernel, scale=scale, page_size=page_size,
            pages_per_block=pages_per_block, max_blocks=max_blocks,
            hkv=hkv, group=group, d=d, s_q=s_q, use_alibi=use_alibi),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, R, d), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
    )(lengths.astype(jnp.int32), page_tables.astype(jnp.int32),
      qbd, slope_rows, k_pages, v_pages)
    return _unpack_o_multi(out, s_q, h, group)


def _paged_multi_blocked_kernel(
    lengths_ref, page_tables_ref, slopes_ref,   # scalar prefetch (SMEM)
    q_ref, k_page_ref, v_page_ref,              # VMEM blocks
    out_ref,
    m_scr, l_scr, acc_scr,
    *, scale: float, page_size: int, group: int, s_q: int,
    use_alibi: bool,
):
    b = pl.program_id(0)
    hk = pl.program_id(1)
    pi = pl.program_id(2)
    n_pages = pl.num_programs(2)
    length = lengths_ref[b]                      # INCLUDING the window

    @pl.when(pi == 0)
    def _init():
        m_scr[:] = jnp.full_like(m_scr, NEG_INF)
        l_scr[:] = jnp.zeros_like(l_scr)
        acc_scr[:] = jnp.zeros_like(acc_scr)

    @pl.when(pi * page_size < length)
    def _compute():
        q = q_ref[0, 0]                          # (group*s_q, d)
        k = k_page_ref[0]                        # (page, d) lane-block hk
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * scale  # (g*s_q, page)

        k_pos = pi * page_size + jax.lax.broadcasted_iota(
            jnp.int32, s.shape, 1)
        # row r = g*s_q + t holds query-head hk*group+g at window slot t;
        # its true position is length - s_q + t. Rows fully masked in a
        # page are safe: page 0 always has k_pos=0 <= q_pos (length>=s_q),
        # so m is finite before any all-masked page contributes.
        row_t = jax.lax.rem(
            jax.lax.broadcasted_iota(jnp.int32, s.shape, 0), s_q)
        q_pos = length - s_q + row_t
        if use_alibi:
            # per-row slope via 2-D selects (1-D stack/repeat don't lower)
            g_of_row = jax.lax.broadcasted_iota(
                jnp.int32, s.shape, 0) // s_q
            slope = jnp.zeros_like(s)
            for g in range(group):
                slope = jnp.where(g_of_row == g,
                                  slopes_ref[hk * group + g], slope)
            s = s + slope * (k_pos - q_pos).astype(jnp.float32)
        s = jnp.where(k_pos <= q_pos, s, NEG_INF)

        m_prev = m_scr[:, :1]
        m_cur = jnp.max(s, axis=-1, keepdims=True)
        m_new = jnp.maximum(m_prev, m_cur)
        alpha = jnp.exp(m_prev - m_new)
        p = jnp.exp(s - m_new)
        l_new = alpha * l_scr[:, :1] + jnp.sum(p, axis=-1, keepdims=True)
        acc_scr[:] = acc_scr[:] * alpha + jax.lax.dot_general(
            p.astype(v_page_ref.dtype), v_page_ref[0],
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        m_scr[:] = jnp.broadcast_to(m_new, m_scr.shape)
        l_scr[:] = jnp.broadcast_to(l_new, l_scr.shape)

    @pl.when(pi == n_pages - 1)
    def _finalize():
        l = l_scr[:, :1]
        l = jnp.where(l == 0.0, 1.0, l)
        out_ref[0, 0] = (acc_scr[:] / l).astype(out_ref.dtype)


def paged_attention_multi_blocked(
    q: jax.Array,            # (b, s_q, h, d) window queries per sequence
    k_pages: jax.Array, v_pages: jax.Array,
    lengths: jax.Array,      # (b,) INCLUDING the s_q window tokens
    page_tables: jax.Array, *,
    alibi_slopes: Optional[jax.Array] = None,
    scale: Optional[float] = None,
) -> jax.Array:
    """Multi-token paged attention for LARGE windows (chunked prefill).

    Same contract as :func:`paged_attention_dma_multi` (window K/V already
    in the pages; query t attends causally to positions <= lengths-s_q+t)
    but shaped like the decode BlockSpec kernel: grid (b, hkv, pages), a
    per-kv-head (group*s_q, d) query block, and (page, d) lane-sliced K/V
    page fetches managed by the pipeline. Unlike the block-diagonal DMA
    kernel it does flop-optimal per-head QK^T (no hkv x overcompute) and
    its VMEM footprint is O(group*s_q*(d + page)) — (group*s_q) must be a
    multiple of 8 sublanes. Returns (b, s_q, h, d)."""
    b, s_q, h, d = q.shape
    total_pages, page_size, packed = k_pages.shape
    hkv = packed // d
    assert h % hkv == 0
    group = h // hkv
    gs = group * s_q
    assert gs % 8 == 0, f"group*s_q={gs} must be a multiple of 8 sublanes"
    pages_per_seq = page_tables.shape[1]
    scale = scale if scale is not None else d ** -0.5
    use_alibi = alibi_slopes is not None
    if alibi_slopes is None:
        alibi_slopes = jnp.zeros((h,), jnp.float32)

    # (b, s_q, h, d) -> (b, hkv, group*s_q, d), row = g*s_q + t
    qg = (q.transpose(0, 2, 1, 3)
           .reshape(b, hkv, group, s_q, d)
           .reshape(b, hkv, gs, d))

    grid = (b, hkv, pages_per_seq)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1, gs, d),
                         lambda b_, h_, p_, lens, tables, sl: (b_, h_, 0, 0)),
            pl.BlockSpec((1, page_size, d),
                         lambda b_, h_, p_, lens, tables, sl:
                         (tables[b_, p_], 0, h_)),
            pl.BlockSpec((1, page_size, d),
                         lambda b_, h_, p_, lens, tables, sl:
                         (tables[b_, p_], 0, h_)),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, gs, d),
            lambda b_, h_, p_, lens, tables, sl: (b_, h_, 0, 0)),
        scratch_shapes=[
            pltpu.VMEM((gs, _LANES), jnp.float32),
            pltpu.VMEM((gs, _LANES), jnp.float32),
            pltpu.VMEM((gs, d), jnp.float32),
        ],
    )
    out = pl.pallas_call(
        functools.partial(
            _paged_multi_blocked_kernel, scale=scale, page_size=page_size,
            group=group, s_q=s_q, use_alibi=use_alibi),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, hkv, gs, d), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")),
    )(lengths.astype(jnp.int32), page_tables.astype(jnp.int32),
      alibi_slopes.astype(jnp.float32), qg, k_pages, v_pages)
    return (out.reshape(b, hkv, group, s_q, d)
               .transpose(0, 3, 1, 2, 4)
               .reshape(b, s_q, h, d))


def _paged_multi_blocked_q8_kernel(
    lengths_ref, page_tables_ref, slopes_ref,
    q_ref, k_page_ref, ks_page_ref, v_page_ref, vs_page_ref,
    out_ref,
    m_scr, l_scr, acc_scr,
    *, scale: float, page_size: int, group: int, s_q: int,
    stride: int, use_alibi: bool,
):
    b = pl.program_id(0)
    hk = pl.program_id(1)
    pi = pl.program_id(2)
    n_pages = pl.num_programs(2)
    length = lengths_ref[b]

    @pl.when(pi == 0)
    def _init():
        m_scr[:] = jnp.full_like(m_scr, NEG_INF)
        l_scr[:] = jnp.zeros_like(l_scr)
        acc_scr[:] = jnp.zeros_like(acc_scr)

    @pl.when(pi * page_size < length)
    def _compute():
        q = q_ref[0, 0]                          # (group*s_q, d)
        # head hk's per-token scale sits at lane hk*stride of the scale
        # page; extract it with a lane-mask reduction (single-lane
        # dynamic slices don't tile)
        ks = ks_page_ref[0]                      # (page, S) f32
        lane = jax.lax.broadcasted_iota(jnp.int32, ks.shape, 1)
        col = hk * stride
        k_scale = jnp.sum(jnp.where(lane == col, ks, 0.0), axis=1,
                          keepdims=True)         # (page, 1)
        v_scale = jnp.sum(jnp.where(lane == col, vs_page_ref[0], 0.0),
                          axis=1, keepdims=True)
        k = (k_page_ref[0].astype(jnp.float32) * k_scale
             ).astype(q.dtype)                   # (page, d)
        v = (v_page_ref[0].astype(jnp.float32) * v_scale
             ).astype(q.dtype)
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * scale

        k_pos = pi * page_size + jax.lax.broadcasted_iota(
            jnp.int32, s.shape, 1)
        row_t = jax.lax.rem(
            jax.lax.broadcasted_iota(jnp.int32, s.shape, 0), s_q)
        q_pos = length - s_q + row_t
        if use_alibi:
            g_of_row = jax.lax.broadcasted_iota(
                jnp.int32, s.shape, 0) // s_q
            slope = jnp.zeros_like(s)
            for g in range(group):
                slope = jnp.where(g_of_row == g,
                                  slopes_ref[hk * group + g], slope)
            s = s + slope * (k_pos - q_pos).astype(jnp.float32)
        s = jnp.where(k_pos <= q_pos, s, NEG_INF)

        m_prev = m_scr[:, :1]
        m_cur = jnp.max(s, axis=-1, keepdims=True)
        m_new = jnp.maximum(m_prev, m_cur)
        alpha = jnp.exp(m_prev - m_new)
        p = jnp.exp(s - m_new)
        l_new = alpha * l_scr[:, :1] + jnp.sum(p, axis=-1, keepdims=True)
        acc_scr[:] = acc_scr[:] * alpha + jax.lax.dot_general(
            p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        m_scr[:] = jnp.broadcast_to(m_new, m_scr.shape)
        l_scr[:] = jnp.broadcast_to(l_new, l_scr.shape)

    @pl.when(pi == n_pages - 1)
    def _finalize():
        l = l_scr[:, :1]
        l = jnp.where(l == 0.0, 1.0, l)
        out_ref[0, 0] = (acc_scr[:] / l).astype(out_ref.dtype)


def paged_attention_multi_blocked_q8(
    q: jax.Array,            # (b, s_q, h, d)
    k_values: jax.Array, k_scales: jax.Array,
    v_values: jax.Array, v_scales: jax.Array,
    lengths: jax.Array, page_tables: jax.Array, *,
    alibi_slopes: Optional[jax.Array] = None,
    scale: Optional[float] = None,
) -> jax.Array:
    """:func:`paged_attention_multi_blocked` over int8 pages: values
    dequantize per (page, kv-head) inside the kernel (strided scale-page
    layout, see :func:`_scale_row`). Serves chunked prefill against int8
    pools, where the BD q8 kernel's R x packed VMEM blocks don't fit."""
    b, s_q, h, d = q.shape
    total_pages, page_size, packed = k_values.shape
    hkv = packed // d
    assert h % hkv == 0
    group = h // hkv
    gs = group * s_q
    assert gs % 8 == 0, f"group*s_q={gs} must be a multiple of 8 sublanes"
    S = k_scales.shape[-1]
    stride = max(S // hkv, 1)
    pages_per_seq = page_tables.shape[1]
    scale = scale if scale is not None else d ** -0.5
    use_alibi = alibi_slopes is not None
    if alibi_slopes is None:
        alibi_slopes = jnp.zeros((h,), jnp.float32)

    qg = (q.transpose(0, 2, 1, 3)
           .reshape(b, hkv, group, s_q, d)
           .reshape(b, hkv, gs, d))

    grid = (b, hkv, pages_per_seq)
    page_map = lambda b_, h_, p_, lens, tables, sl: (tables[b_, p_], 0, h_)
    scale_map = lambda b_, h_, p_, lens, tables, sl: (tables[b_, p_], 0, 0)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1, gs, d),
                         lambda b_, h_, p_, lens, tables, sl: (b_, h_, 0, 0)),
            pl.BlockSpec((1, page_size, d), page_map),
            pl.BlockSpec((1, page_size, S), scale_map),
            pl.BlockSpec((1, page_size, d), page_map),
            pl.BlockSpec((1, page_size, S), scale_map),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, gs, d),
            lambda b_, h_, p_, lens, tables, sl: (b_, h_, 0, 0)),
        scratch_shapes=[
            pltpu.VMEM((gs, _LANES), jnp.float32),
            pltpu.VMEM((gs, _LANES), jnp.float32),
            pltpu.VMEM((gs, d), jnp.float32),
        ],
    )
    out = pl.pallas_call(
        functools.partial(
            _paged_multi_blocked_q8_kernel, scale=scale,
            page_size=page_size, group=group, s_q=s_q, stride=stride,
            use_alibi=use_alibi),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, hkv, gs, d), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")),
    )(lengths.astype(jnp.int32), page_tables.astype(jnp.int32),
      alibi_slopes.astype(jnp.float32), qg,
      k_values, k_scales, v_values, v_scales)
    return (out.reshape(b, hkv, group, s_q, d)
               .transpose(0, 3, 1, 2, 4)
               .reshape(b, s_q, h, d))


def paged_attention_multi_reference(q, k_pages, v_pages, lengths,
                                    page_tables, *, alibi_slopes=None,
                                    scale=None):
    """XLA reference for the multi-token path (tests/CPU fallback)."""
    b, s_q, h, d = q.shape
    _, page_size, packed = k_pages.shape
    hkv = packed // d
    group = h // hkv
    pages_per_seq = page_tables.shape[1]
    max_len = pages_per_seq * page_size
    scale = scale if scale is not None else d ** -0.5

    k_seq = k_pages[page_tables].reshape(b, max_len, hkv, d)
    v_seq = v_pages[page_tables].reshape(b, max_len, hkv, d)
    qg = q.reshape(b, s_q, hkv, group, d).astype(jnp.float32)
    s = jnp.einsum("bthgd,bkhd->bhgtk", qg,
                   k_seq.astype(jnp.float32)) * scale
    k_pos = jnp.arange(max_len)
    q_pos = (lengths[:, None] - s_q) + jnp.arange(s_q)[None]   # (b, s_q)
    if alibi_slopes is not None:
        slopes = alibi_slopes.reshape(hkv, group)
        dist = (k_pos[None, None, :] - q_pos[:, :, None]).astype(jnp.float32)
        s = s + slopes[None, :, :, None, None] * dist[:, None, None]
    mask = k_pos[None, None, :] <= q_pos[:, :, None]           # causal
    s = jnp.where(mask[:, None, None], s, NEG_INF)
    p = jax.nn.softmax(s, axis=-1)
    out = jnp.einsum("bhgtk,bkhd->bthgd", p, v_seq.astype(jnp.float32))
    return out.reshape(b, s_q, h, d).astype(q.dtype)


def _paged_dma_multi_q8_kernel(
    lengths_ref, page_tables_ref,
    qbd_ref, kv_onehot_ref, slope_rows_ref,
    k_hbm_ref, ks_hbm_ref, v_hbm_ref, vs_hbm_ref,
    out_ref,
    k_buf, ks_buf, v_buf, vs_buf, sems, m_scr, l_scr, acc_scr,
    *, scale: float, page_size: int, pages_per_block: int,
    max_blocks: int, hkv: int, group: int, d: int, s_q: int,
    use_alibi: bool,
):
    """int8 multi-token variant; covers GQA (the s_q==1 case of this
    kernel also replaces the MHA-only q8 DMA decode for grouped heads).

    Scales fold outside the matmuls via a ONE-HOT expansion: the static
    (R, 128) row->kv-head one-hot matmul'd with the (tokens, 128) scale
    buffer yields the (R, tokens) per-score scale — no dequantized
    (tokens, hkv*d) tile is ever materialized, and it works for any
    group size (the single-token q8 kernel's lane-slice trick was
    MHA-only)."""
    t = pl.program_id(0)
    total = pl.num_programs(0)
    R = s_q * hkv * group
    block_tokens = page_size * pages_per_block

    def unflatten(tt):
        return tt // max_blocks, jax.lax.rem(tt, max_blocks)

    def active(tt):
        b_t, blk_t = unflatten(tt)
        return blk_t * block_tokens < lengths_ref[b_t]

    def copies(tt, slot):
        b_t, blk_t = unflatten(tt)
        out = []
        for j in range(pages_per_block):
            page = page_tables_ref[b_t, blk_t * pages_per_block + j]
            out.append(pltpu.make_async_copy(
                k_hbm_ref.at[page], k_buf.at[slot, j], sems.at[0, slot, j]))
            out.append(pltpu.make_async_copy(
                v_hbm_ref.at[page], v_buf.at[slot, j], sems.at[1, slot, j]))
            out.append(pltpu.make_async_copy(
                ks_hbm_ref.at[page], ks_buf.at[slot, j], sems.at[2, slot, j]))
            out.append(pltpu.make_async_copy(
                vs_hbm_ref.at[page], vs_buf.at[slot, j], sems.at[3, slot, j]))
        return out

    b, blk = unflatten(t)
    length = lengths_ref[b]
    slot = jax.lax.rem(t, 2)

    @pl.when(t == 0)
    def _bootstrap():
        for c in copies(0, 0):
            c.start()

    @pl.when(jnp.logical_and(t + 1 < total, active(t + 1)))
    def _prefetch_next():
        for c in copies(t + 1, 1 - slot):
            c.start()

    @pl.when(blk == 0)
    def _init():
        m_scr[:] = jnp.full_like(m_scr, NEG_INF)
        l_scr[:] = jnp.zeros_like(l_scr)
        acc_scr[:] = jnp.zeros_like(acc_scr)

    @pl.when(active(t))
    def _compute():
        for c in copies(t, slot):
            c.wait()
        k = k_buf[slot].reshape(block_tokens, hkv * d).astype(jnp.bfloat16)
        v = v_buf[slot].reshape(block_tokens, hkv * d).astype(jnp.bfloat16)
        k_sc = ks_buf[slot].reshape(block_tokens, ks_buf.shape[-1])
        v_sc = vs_buf[slot].reshape(block_tokens, vs_buf.shape[-1])
        oh = kv_onehot_ref[0]                            # (R, S)

        s = jax.lax.dot_general(
            qbd_ref[0], k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)          # (R, tokens)
        # per-score k scale: one-hot (R, 128) @ (tokens, 128)^T
        k_row_sc = jax.lax.dot_general(
            oh, k_sc, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)          # (R, tokens)
        s = s * k_row_sc * scale
        k_pos = blk * block_tokens + jax.lax.broadcasted_iota(
            jnp.int32, s.shape, 1)
        row_t = jax.lax.rem(
            jax.lax.broadcasted_iota(jnp.int32, s.shape, 0), s_q)
        q_pos = length - s_q + row_t
        if use_alibi:
            s = s + slope_rows_ref[0][:, :1] * (
                k_pos - q_pos).astype(jnp.float32)
        s = jnp.where(k_pos <= q_pos, s, NEG_INF)

        m_prev = m_scr[:, :1]
        m_cur = jnp.max(s, axis=-1, keepdims=True)
        m_new = jnp.maximum(m_prev, m_cur)
        alpha = jnp.exp(m_prev - m_new)
        p = jnp.exp(s - m_new)
        l_new = alpha * l_scr[:, :1] + jnp.sum(p, axis=-1, keepdims=True)
        v_row_sc = jax.lax.dot_general(
            oh, v_sc, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)          # (R, tokens)
        acc_scr[:] = acc_scr[:] * alpha + jax.lax.dot_general(
            (p * v_row_sc).astype(jnp.bfloat16), v,
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        m_scr[:] = jnp.broadcast_to(m_new, m_scr.shape)
        l_scr[:] = jnp.broadcast_to(l_new, l_scr.shape)

    @pl.when(jnp.logical_and(
        active(t),
        jnp.logical_or(blk == max_blocks - 1,
                       (blk + 1) * block_tokens >= length)))
    def _finalize():
        l = l_scr[:, :1]
        l = jnp.where(l == 0.0, 1.0, l)
        acc = acc_scr[:] / l
        gs = group * s_q
        for hk in range(hkv):
            out_ref[0, hk * gs:(hk + 1) * gs, :] = (
                acc[hk * gs:(hk + 1) * gs, hk * d:hk * d + d]
                .astype(out_ref.dtype))


def paged_attention_dma_multi_q8(
    q: jax.Array, k_values: jax.Array, k_scales: jax.Array,
    v_values: jax.Array, v_scales: jax.Array,
    lengths: jax.Array, page_tables: jax.Array, *,
    alibi_slopes: Optional[jax.Array] = None,
    pages_per_block: Optional[int] = None, scale: Optional[float] = None,
) -> jax.Array:
    """Multi-token (or GQA single-token) paged attention over int8 pages.

    q: (b, s_q, h, d); k/v_values: (P, page, hkv*d) int8; k/v_scales:
    (P, page, S) f32, head i's scale at lane i*(S//hkv) (the strided
    layout keeps lane shards == head shards so int8 pools compose with
    tensor-parallel serving; under shard_map S and hkv are the LOCAL
    lane/head counts and the stride is unchanged). Returns
    (b, s_q, h, d)."""
    b, s_q, h, d = q.shape
    total_pages, page_size, packed = k_values.shape
    hkv = packed // d
    group = h // hkv
    R = s_q * h
    S = k_scales.shape[-1]
    stride = max(S // hkv, 1)
    pages_per_seq = page_tables.shape[1]
    page_bytes = page_size * (packed + 2 * S * 4)  # int8 + f32 scales
    fixed = R * packed * (2 + 4) + R * packed * 4
    # large windows (chunked prefill) route to the per-kv-head blocked
    # kernel — same VMEM wall as the bf16 BD kernel (see
    # paged_attention_dma_multi)
    if fixed > _DMA_VMEM_BUDGET // 2 and (group * s_q) % 8 == 0:
        return paged_attention_multi_blocked_q8(
            q, k_values, k_scales, v_values, v_scales, lengths,
            page_tables, alibi_slopes=alibi_slopes, scale=scale)
    cap = max(1, (_DMA_VMEM_BUDGET - min(fixed, _DMA_VMEM_BUDGET // 2))
              // (4 * page_bytes))
    pages_per_block = cap if pages_per_block is None else min(
        pages_per_block, cap)
    while pages_per_seq % pages_per_block:
        pages_per_block -= 1
    pages_per_block = max(pages_per_block, 1)
    max_blocks = pages_per_seq // pages_per_block
    scale = scale if scale is not None else d ** -0.5
    use_alibi = alibi_slopes is not None

    qbd = _pack_q_blockdiag_multi(q, hkv, group, jnp.bfloat16)
    _, qh_of_row = _mq_rows(s_q, h, group)
    kv_of_row = qh_of_row // group
    onehot = jnp.asarray(
        np.arange(S)[None, :] == kv_of_row[:, None] * stride,
        jnp.float32)[None]                               # (1, R, S)
    if use_alibi:
        slope_rows = jnp.broadcast_to(
            alibi_slopes.astype(jnp.float32)[qh_of_row][:, None],
            (R, _LANES))[None]
    else:
        slope_rows = jnp.zeros((1, R, _LANES), jnp.float32)

    def cell_map(t, lens, tables):
        return t // max_blocks, 0, 0

    const_map = lambda t, lens, tables: (0, 0, 0)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(b * max_blocks,),
        in_specs=[
            pl.BlockSpec((1, R, packed), cell_map),
            pl.BlockSpec((1, R, S), const_map),
            pl.BlockSpec((1, R, _LANES), const_map),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((1, R, d), cell_map),
        scratch_shapes=[
            pltpu.VMEM((2, pages_per_block, page_size, packed), jnp.int8),
            pltpu.VMEM((2, pages_per_block, page_size, S), jnp.float32),
            pltpu.VMEM((2, pages_per_block, page_size, packed), jnp.int8),
            pltpu.VMEM((2, pages_per_block, page_size, S), jnp.float32),
            pltpu.SemaphoreType.DMA((4, 2, pages_per_block)),
            pltpu.VMEM((R, _LANES), jnp.float32),
            pltpu.VMEM((R, _LANES), jnp.float32),
            pltpu.VMEM((R, packed), jnp.float32),
        ],
    )
    out = pl.pallas_call(
        functools.partial(
            _paged_dma_multi_q8_kernel, scale=scale, page_size=page_size,
            pages_per_block=pages_per_block, max_blocks=max_blocks,
            hkv=hkv, group=group, d=d, s_q=s_q, use_alibi=use_alibi),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, R, d), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
    )(lengths.astype(jnp.int32), page_tables.astype(jnp.int32),
      qbd, onehot, slope_rows, k_values, k_scales, v_values, v_scales)
    return _unpack_o_multi(out, s_q, h, group)


# ---------------------------------------------------------------------------
# int8-quantized pages (halves the page-load bandwidth; guide §13 pattern)
# ---------------------------------------------------------------------------

def _scale_row(sc: jax.Array, lanes: int) -> jax.Array:
    """(..., hkv) per-head scales -> (..., lanes) STRIDED scale row:
    head i's scale at lane i*(lanes//hkv), zeros elsewhere.

    The stride keeps lane blocks == head blocks, so scale pages shard
    over a tensor axis exactly like the head-packed value pages (a
    head==lane layout parks every head's scale in shard 0's lanes).
    Under shard_map hkv and lanes are the LOCAL counts and the stride is
    identical, so local writes land where global reads expect them."""
    hkv = sc.shape[-1]
    stride = max(lanes // hkv, 1)
    out = jnp.zeros(sc.shape[:-1] + (lanes,), sc.dtype)
    return out.at[..., 0:hkv * stride:stride].set(sc)


def quantize_pages(pages: jax.Array, head_dim: int
                   ) -> Tuple[jax.Array, jax.Array]:
    """(P, page, hkv*d) float -> (int8 values same shape,
    scales (P, page, 128)).

    Per-(token, head) absmax scaling: each cached token's d-vector per kv
    head gets one scale, stored in the strided lane layout
    (:func:`_scale_row`) padded to the 128-lane tile so scale pages ride
    DMAs / tiled VMEM buffers and shard like the value pages.
    """
    p_, page, packed = pages.shape
    hkv = packed // head_dim
    split = pages.astype(jnp.float32).reshape(p_, page, hkv, head_dim)
    absmax = jnp.max(jnp.abs(split), axis=-1, keepdims=True)
    scales = jnp.maximum(absmax / 127.0, 1e-8)
    values = jnp.clip(jnp.round(split / scales), -127, 127) \
        .astype(jnp.int8).reshape(p_, page, packed)
    sc = scales[..., 0].astype(jnp.float32)
    return values, _scale_row(sc, _LANES)


def dequantize_pages(values: jax.Array, scales: jax.Array,
                     head_dim: int, dtype=jnp.bfloat16) -> jax.Array:
    p_, page, packed = values.shape
    hkv = packed // head_dim
    stride = max(scales.shape[-1] // hkv, 1)
    split = values.astype(jnp.float32).reshape(p_, page, hkv, head_dim)
    sc = scales[..., 0:hkv * stride:stride]
    return (split * sc[..., None]).astype(dtype).reshape(p_, page, packed)


def _paged_q8_kernel(
    lengths_ref, page_tables_ref, slopes_ref,
    q_ref, k_page_ref, k_scale_ref, v_page_ref, v_scale_ref,
    out_ref,
    m_scr, l_scr, acc_scr,
    *, scale: float, page_size: int, group: int, hkv: int,
    scale_stride: int, use_alibi: bool,
):
    b = pl.program_id(0)
    hk = pl.program_id(1)
    pi = pl.program_id(2)
    n_pages = pl.num_programs(2)
    length = lengths_ref[b]

    @pl.when(pi == 0)
    def _init():
        m_scr[:] = jnp.full_like(m_scr, NEG_INF)
        l_scr[:] = jnp.zeros_like(l_scr)
        acc_scr[:] = jnp.zeros_like(acc_scr)

    def scale_col(scale_ref):
        # scales block is (page, S), head hk at lane hk*stride (strided
        # layout); a dynamic lane slice does not lower, so select the
        # column via one-hot reduce
        sc = scale_ref[0]                              # (page, S)
        oh = (jax.lax.broadcasted_iota(jnp.int32, (1, sc.shape[-1]), 1)
              == hk * scale_stride).astype(sc.dtype)
        return jnp.sum(sc * oh, axis=1, keepdims=True)  # (page, 1)

    @pl.when(pi * page_size < length)
    def _compute():
        q = q_ref[0, 0]
        # dequantize in VMEM: int8 payload rode the DMA, not floats
        k = (k_page_ref[0].astype(jnp.float32)
             * scale_col(k_scale_ref)).astype(q.dtype)
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * scale

        k_pos = pi * page_size + jax.lax.broadcasted_iota(
            jnp.int32, s.shape, 1)
        if use_alibi:
            slopes = jnp.stack(
                [slopes_ref[hk * group + g] for g in range(group)])
            s = s + slopes[:, None] * (
                k_pos - (length - 1)).astype(jnp.float32)
        s = jnp.where(k_pos < length, s, NEG_INF)

        m_prev = m_scr[:, :1]
        m_cur = jnp.max(s, axis=-1, keepdims=True)
        m_new = jnp.maximum(m_prev, m_cur)
        alpha = jnp.exp(m_prev - m_new)
        p = jnp.exp(s - m_new)
        l_new = alpha * l_scr[:, :1] + jnp.sum(p, axis=-1, keepdims=True)
        v = (v_page_ref[0].astype(jnp.float32)
             * scale_col(v_scale_ref)).astype(q.dtype)
        acc_scr[:] = acc_scr[:] * alpha + jax.lax.dot_general(
            p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        m_scr[:] = jnp.broadcast_to(m_new, m_scr.shape)
        l_scr[:] = jnp.broadcast_to(l_new, l_scr.shape)

    @pl.when(pi == n_pages - 1)
    def _finalize():
        l = l_scr[:, :1]
        l = jnp.where(l == 0.0, 1.0, l)
        out_ref[0, 0] = (acc_scr[:] / l).astype(out_ref.dtype)


def paged_attention_quantized(
    q: jax.Array,
    k_values: jax.Array, k_scales: jax.Array,
    v_values: jax.Array, v_scales: jax.Array,
    lengths: jax.Array, page_tables: jax.Array, *,
    alibi_slopes: Optional[jax.Array] = None,
    scale: Optional[float] = None,
) -> jax.Array:
    """Decode attention over int8 pages + per-(token, head) scales.

    k_values/v_values: (P, page, hkv*d) int8; k_scales/v_scales:
    (P, page, S) f32, strided lane layout. Returns (b, h, d)."""
    b, h, d = q.shape
    total_pages, page_size, packed = k_values.shape
    hkv = packed // d
    group = h // hkv
    S = k_scales.shape[-1]
    scale_stride = max(S // hkv, 1)
    pages_per_seq = page_tables.shape[1]
    scale = scale if scale is not None else d ** -0.5
    use_alibi = alibi_slopes is not None
    if alibi_slopes is None:
        alibi_slopes = jnp.zeros((h,), jnp.float32)

    qg = q.reshape(b, hkv, group, d)
    page_block = pl.BlockSpec(
        (1, page_size, d),
        lambda b_, h_, p_, lens, tables, sl: (tables[b_, p_], 0, h_))
    scale_block = pl.BlockSpec(
        (1, page_size, S),
        lambda b_, h_, p_, lens, tables, sl: (tables[b_, p_], 0, 0))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(b, hkv, pages_per_seq),
        in_specs=[
            pl.BlockSpec((1, 1, group, d),
                         lambda b_, h_, p_, lens, tables, sl: (b_, h_, 0, 0)),
            page_block, scale_block, page_block, scale_block,
        ],
        out_specs=pl.BlockSpec(
            (1, 1, group, d),
            lambda b_, h_, p_, lens, tables, sl: (b_, h_, 0, 0)),
        scratch_shapes=[
            pltpu.VMEM((group, _LANES), jnp.float32),
            pltpu.VMEM((group, _LANES), jnp.float32),
            pltpu.VMEM((group, d), jnp.float32),
        ],
    )
    out = pl.pallas_call(
        functools.partial(_paged_q8_kernel, scale=scale, page_size=page_size,
                          group=group, hkv=hkv, scale_stride=scale_stride,
                          use_alibi=use_alibi),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, hkv, group, d), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")),
    )(lengths.astype(jnp.int32), page_tables.astype(jnp.int32),
      alibi_slopes.astype(jnp.float32), qg, k_values, k_scales,
      v_values, v_scales)
    return out.reshape(b, h, d)


# ---------------------------------------------------------------------------
# Page allocator (host side)
# ---------------------------------------------------------------------------

class PagePool:
    """Fixed pool of KV pages + per-sequence page tables (vLLM-style,
    host-side bookkeeping; device arrays are updated functionally)."""

    def __init__(self, total_pages: int, page_size: int,
                 pages_per_seq: int):
        self.page_size = page_size
        self.pages_per_seq = pages_per_seq
        self._free = list(range(total_pages - 1, -1, -1))
        self.tables = {}   # seq id -> list of physical pages
        self.lengths = {}  # seq id -> tokens written

    def allocate(self, seq_id, num_tokens: int):
        """Reserve pages for `num_tokens`; returns the page table list.

        Atomic on failure: a MemoryError returns any newly-grabbed pages
        to the pool (and removes an empty table entry), so a failed
        reservation never leaves pages parked on a queued request."""
        needed = -(-num_tokens // self.page_size)
        if needed > self.pages_per_seq:
            raise ValueError("sequence exceeds pages_per_seq")
        table = self.tables.setdefault(seq_id, [])
        start = len(table)
        while len(table) < needed:
            if not self._free:
                self._free.extend(reversed(table[start:]))
                del table[start:]
                if not table:
                    self.tables.pop(seq_id, None)
                raise MemoryError("page pool exhausted")
            table.append(self._free.pop())
        self.lengths[seq_id] = num_tokens
        return table

    def extend(self, seq_id, new_tokens: int = 1):
        return self.allocate(seq_id, self.lengths[seq_id] + new_tokens)

    def release(self, seq_id):
        for page in self.tables.pop(seq_id, []):
            self._free.append(page)
        self.lengths.pop(seq_id, None)

    @property
    def free_pages(self) -> int:
        return len(self._free)

    def table_array(self, seq_ids) -> np.ndarray:
        """Padded (n, pages_per_seq) int32 table for the kernel; unused
        slots point at page 0 (masked out by lengths)."""
        out = np.zeros((len(seq_ids), self.pages_per_seq), np.int32)
        for i, sid in enumerate(seq_ids):
            t = self.tables.get(sid, [])
            out[i, : len(t)] = t
        return out


def write_token_to_pages(k_pages, v_pages, k_new, v_new, *, positions,
                         page_tables):
    """Scatter one decode step's K/V into the paged cache.

    k_new/v_new: (b, hkv, d); positions: (b,) token index per sequence;
    page_tables: (b, pages_per_seq). With the head-packed layout each
    token is ONE contiguous (hkv*d,) row write. Returns updated
    (k_pages, v_pages).
    """
    page_size = k_pages.shape[1]
    logical_page = positions // page_size
    offset = positions % page_size
    phys = jnp.take_along_axis(page_tables, logical_page[:, None],
                               axis=1)[:, 0]

    def write(pages, new):
        # pages: (P, page, hkv*d); new: (b, hkv, d) -> ONE batched scatter
        # (duplicate targets only occur on the trash page, where any
        # write order is acceptable)
        flat = new.reshape(new.shape[0], -1)
        return pages.at[phys, offset].set(flat.astype(pages.dtype))

    return write(k_pages, k_new), write(v_pages, v_new)


def write_tokens_to_pages(k_pages, v_pages, k_new, v_new, *,
                          start_positions, page_tables):
    """Scatter an s_q-token window's K/V into the paged cache.

    k_new/v_new: (b, s_q, hkv, d); start_positions: (b,) first token
    index per sequence (token j lands at start+j); page_tables:
    (b, pages_per_seq). One batched scatter of b*s_q head-packed rows.
    Returns updated (k_pages, v_pages)."""
    b, s_q = k_new.shape[:2]
    page_size = k_pages.shape[1]
    positions = start_positions[:, None] + jnp.arange(s_q)[None]  # (b, s_q)
    logical_page = positions // page_size
    offset = (positions % page_size).reshape(-1)
    phys = jnp.take_along_axis(page_tables, logical_page, axis=1) \
        .reshape(-1)

    def write(pages, new):
        flat = new.reshape(b * s_q, -1)
        return pages.at[phys, offset].set(flat.astype(pages.dtype))

    return write(k_pages, k_new), write(v_pages, v_new)


def write_tokens_to_pages_q8(k_pages, k_scales, v_pages, v_scales,
                             k_new, v_new, *, start_positions, page_tables):
    """int8 multi-token variant: quantize each token's per-head rows on
    write. k/v_new: (b, s_q, hkv, d). Returns the four updated arrays."""
    b, s_q, hkv, _ = k_new.shape
    page_size = k_pages.shape[1]
    positions = start_positions[:, None] + jnp.arange(s_q)[None]
    logical_page = positions // page_size
    offset = (positions % page_size).reshape(-1)
    phys = jnp.take_along_axis(page_tables, logical_page, axis=1) \
        .reshape(-1)

    def write(pages, scales, new):
        absmax = jnp.max(jnp.abs(new.astype(jnp.float32)), axis=-1)
        sc = jnp.maximum(absmax / 127.0, 1e-8)            # (b, s_q, hkv)
        q8 = jnp.clip(jnp.round(new.astype(jnp.float32) / sc[..., None]),
                      -127, 127).astype(jnp.int8)
        flat = q8.reshape(b * s_q, -1)
        row = _scale_row(sc.reshape(b * s_q, hkv), scales.shape[-1])
        return (pages.at[phys, offset].set(flat),
                scales.at[phys, offset].set(row))

    k_pages, k_scales = write(k_pages, k_scales, k_new)
    v_pages, v_scales = write(v_pages, v_scales, v_new)
    return k_pages, k_scales, v_pages, v_scales


def write_token_to_pages_q8(k_pages, k_scales, v_pages, v_scales,
                            k_new, v_new, *, positions, page_tables):
    """int8 variant: quantize each token's per-head rows on write.

    k/v_pages: (P, page, hkv*d) int8; k/v_scales: (P, page, S) f32 in
    the strided lane layout (:func:`_scale_row`); k/v_new: (b, hkv, d).
    Returns the four updated arrays."""
    page_size = k_pages.shape[1]
    logical_page = positions // page_size
    offset = positions % page_size
    phys = jnp.take_along_axis(page_tables, logical_page[:, None],
                               axis=1)[:, 0]

    def write(pages, scales, new):
        absmax = jnp.max(jnp.abs(new.astype(jnp.float32)), axis=-1)
        sc = jnp.maximum(absmax / 127.0, 1e-8)            # (b, hkv)
        q8 = jnp.clip(jnp.round(new.astype(jnp.float32) / sc[..., None]),
                      -127, 127).astype(jnp.int8)
        flat = q8.reshape(q8.shape[0], -1)
        row = _scale_row(sc, scales.shape[-1])
        return (pages.at[phys, offset].set(flat),
                scales.at[phys, offset].set(row))

    k_pages, k_scales = write(k_pages, k_scales, k_new)
    v_pages, v_scales = write(v_pages, v_scales, v_new)
    return k_pages, k_scales, v_pages, v_scales
