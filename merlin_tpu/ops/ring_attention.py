"""Ring attention: context parallelism over the mesh's ``seq`` axis.

The reference has NO sequence/context parallelism (SURVEY.md §2.6 — it
packs samples and stretches RoPE instead). The TPU build reserves a
``seq`` mesh axis; this module makes it real: Q/K/V shard over the
sequence, KV blocks rotate around the ring with ``jax.lax.ppermute`` while
each device computes attention on the block in front of it, and the
partial softmax statistics merge online (guide §16 pattern). Communication
is neighbor-to-neighbor over ICI and overlaps compute after the first hop.

Inside each (device, rotation) step the local block runs through the
existing attention stack — the Pallas flash kernel on TPU — so ring + flash
compose.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

NEG_INF = -1e30


def _local_attention_with_stats(q, k, v, *, scale, q_offset, k_offset,
                                causal, q_seg=None, k_seg=None):
    """Attention of local q against one kv block, returning unnormalized
    output and (m, l) statistics for cross-block merging.

    q: (b, sq, h, d); k/v: (b, sk, h, d). Positions are global via offsets;
    q_seg/k_seg are optional (b, s_local) packed-segment ids.
    """
    b, sq, h, d = q.shape
    sk = k.shape[1]
    s = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                   preferred_element_type=jnp.float32) * scale
    mask = None
    if causal:
        q_pos = q_offset + jnp.arange(sq)
        k_pos = k_offset + jnp.arange(sk)
        mask = (k_pos[None, :] <= q_pos[:, None])[None]
    if q_seg is not None:
        seg = q_seg[:, :, None] == k_seg[:, None, :]
        mask = seg if mask is None else (mask & seg)
    if mask is not None:
        s = jnp.where(mask[:, None], s, NEG_INF)
    m = jnp.max(s, axis=-1)                          # (b, h, q)
    p = jnp.exp(s - m[..., None])
    # fully-masked rows have m == NEG_INF and exp(s - m) == 1: zero them
    p = jnp.where(s > NEG_INF / 2, p, 0.0)
    l = jnp.sum(p, axis=-1)                          # (b, h, q)
    o = jnp.einsum("bhqk,bkhd->bqhd", p.astype(v.dtype), v,
                   preferred_element_type=jnp.float32)
    return o.astype(jnp.float32), m, l


def _merge(o1, m1, l1, o2, m2, l2):
    """Online-softmax merge of two partial attention results."""
    m = jnp.maximum(m1, m2)
    a1 = jnp.exp(m1 - m)
    a2 = jnp.exp(m2 - m)
    o = o1 * a1.transpose(0, 2, 1)[..., None] + \
        o2 * a2.transpose(0, 2, 1)[..., None]
    l = l1 * a1 + l2 * a2
    return o, m, l


def ring_self_attention(q, k, v, *, mesh: Mesh, axis: str = "seq",
                        causal: bool = True,
                        segment_ids: Optional[jax.Array] = None,
                        scale: Optional[float] = None):
    """Self-attention with Q/K/V sharded over ``axis`` along the sequence.

    q/k/v: (b, s, h, d) GLOBAL arrays (jit will shard per the mesh); output
    has the same sharding as q. Requires s % axis_size == 0.
    """
    d = q.shape[-1]
    scale = scale if scale is not None else d ** -0.5
    n = mesh.shape[axis]
    s_local = q.shape[1] // n

    def ring_fn(q_loc, k_loc, v_loc, qseg_loc):
        idx = jax.lax.axis_index(axis)
        q_off = idx * s_local

        def rotation(step, carry):
            o, m, l, k_blk, v_blk, kseg_blk = carry
            src = (idx - step) % n               # who produced this block
            o2, m2, l2 = _local_attention_with_stats(
                q_loc, k_blk, v_blk, scale=scale, q_offset=q_off,
                k_offset=src * s_local, causal=causal,
                q_seg=qseg_loc if segment_ids is not None else None,
                k_seg=kseg_blk if segment_ids is not None else None)
            o, m, l = _merge(o, m, l, o2, m2, l2)
            perm = [(i, (i + 1) % n) for i in range(n)]
            k_blk = jax.lax.ppermute(k_blk, axis, perm)
            v_blk = jax.lax.ppermute(v_blk, axis, perm)
            kseg_blk = jax.lax.ppermute(kseg_blk, axis, perm)
            return o, m, l, k_blk, v_blk, kseg_blk

        b, sq, h, _ = q_loc.shape
        # mark the zero-initialized stats as device-varying over the ring
        # axis (shard_map VMA typing for the fori carry)
        o = jax.lax.pcast(jnp.zeros((b, sq, h, d), jnp.float32), (axis,), to='varying')
        m = jax.lax.pcast(jnp.full((b, h, sq), NEG_INF, jnp.float32), (axis,), to='varying')
        l = jax.lax.pcast(jnp.zeros((b, h, sq), jnp.float32), (axis,), to='varying')
        o, m, l, _, _, _ = jax.lax.fori_loop(
            0, n, rotation, (o, m, l, k_loc, v_loc, qseg_loc))
        l = jnp.where(l == 0.0, 1.0, l)
        return (o / l.transpose(0, 2, 1)[..., None]).astype(q_loc.dtype)

    from jax import shard_map

    spec = P(None, axis, None, None)
    seg_spec = P(None, axis)
    if segment_ids is None:
        segment_ids = jnp.ones(q.shape[:2], jnp.int32)
    return shard_map(
        ring_fn, mesh=mesh, in_specs=(spec, spec, spec, seg_spec),
        out_specs=spec)(q, k, v, segment_ids)
