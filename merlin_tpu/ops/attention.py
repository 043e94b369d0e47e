"""Multi-head attention: dispatcher + XLA reference implementation.

Replaces the reference's flash-attn CUDA kernel and xformers
memory-efficient attention (``llama_flash_attn_monkey_patch.py``,
``baichuan2_*/modeling_baichuan.py`` — SURVEY.md §2.9) with:

  * :func:`flash_attention` — a Pallas TPU kernel
    (:mod:`merlin_tpu.ops.flash_attention`) for the training/prefill hot
    path: causal or bidirectional, packed-sequence segment ids (the
    reference packs merge_round pairs into one 2048-token sequence), and
    in-kernel ALiBi (Baichuan-13B family) so no O(s^2) bias is ever
    materialized.
  * :func:`mha_reference` — a pure-XLA implementation used on CPU/GPU
    backends, in tests, and as the recompute path for gradients.

Layout convention throughout the framework: ``(batch, seq, heads, head_dim)``.
GQA is supported (num_kv_heads divides num_heads).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp

NEG_INF = -1e30


def _build_mask(
    q_len: int,
    kv_len: int,
    *,
    causal: bool,
    q_offset,
    segment_ids_q: Optional[jax.Array],
    segment_ids_kv: Optional[jax.Array],
    batch: int,
) -> Optional[jax.Array]:
    """Boolean (b, 1, q, k) mask; True = attend."""
    mask = None
    if causal:
        q_pos = _q_positions(q_offset, q_len)        # (1 or b, q)
        k_pos = jnp.arange(kv_len)[None, None, :]
        mask = (k_pos <= q_pos[:, :, None])[:, None]  # (1 or b, 1, q, k)
        mask = jnp.broadcast_to(mask, (batch, 1, q_len, kv_len))
    if segment_ids_q is not None:
        seg = (segment_ids_q[:, :, None] == segment_ids_kv[:, None, :])[:, None]
        mask = seg if mask is None else (mask & seg)
    return mask


def _q_positions(q_offset, q_len: int) -> jax.Array:
    """Query positions as (1 or b, q). ``q_offset`` may be a scalar or a
    per-sequence (b,)/(b,1) array (ragged decode against padded caches)."""
    off = jnp.asarray(q_offset)
    if off.ndim == 0:
        return (off + jnp.arange(q_len))[None]
    off = off.reshape(off.shape[0], -1)[:, :1]
    return off + jnp.arange(q_len)[None]


def mha_reference(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    *,
    causal: bool = True,
    segment_ids_q: Optional[jax.Array] = None,
    segment_ids_kv: Optional[jax.Array] = None,
    alibi_slopes: Optional[jax.Array] = None,
    scale: Optional[float] = None,
    q_offset=0,
    k_positions: Optional[jax.Array] = None,
) -> jax.Array:
    """Pure-XLA attention. q: (b, sq, h, d); k/v: (b, skv, hkv, d).

    ``q_offset`` shifts query positions for decode steps against a longer
    KV cache; it may be per-sequence (b,). ``alibi_slopes``: (h,) per-head
    slopes; bias = slope * (k_pos - q_pos), the standard ALiBi causal form.
    ``k_positions`` (b, skv) overrides slot indices as the key positions for
    the ALiBi bias (ragged caches store keys at slots != positions).
    Softmax in float32 regardless of input dtype.
    """
    b, sq, h, d = q.shape
    skv, hkv = k.shape[1], k.shape[2]
    scale = scale if scale is not None else d ** -0.5
    if hkv != h:
        assert h % hkv == 0, (h, hkv)
        k = jnp.repeat(k, h // hkv, axis=2)
        v = jnp.repeat(v, h // hkv, axis=2)

    logits = jnp.einsum(
        "bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32
    ) * scale

    if alibi_slopes is not None:
        q_pos = _q_positions(q_offset, sq)      # (1 or b, q)
        if k_positions is not None:
            k_pos = k_positions[:, None, :]     # (b, 1, k)
        else:
            k_pos = jnp.arange(skv)[None, None, :]
        dist = k_pos - q_pos[:, :, None]        # (1 or b, q, k)
        logits = logits + alibi_slopes[None, :, None, None] * dist[:, None]

    mask = _build_mask(
        sq, skv, causal=causal, q_offset=q_offset,
        segment_ids_q=segment_ids_q, segment_ids_kv=segment_ids_kv, batch=b,
    )
    if mask is not None:
        logits = jnp.where(mask, logits, NEG_INF)

    probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
    out = jnp.einsum(
        "bhqk,bkhd->bqhd", probs.astype(v.dtype), v,
        preferred_element_type=jnp.float32,
    )
    return out.astype(q.dtype)


def _pick_block(seq: int, preferred: int) -> int:
    """Largest block <= preferred (multiple of 128) that keeps pad waste
    under ~13% (e.g. ViT-L/448's 1025 tokens: 512 -> pad 1536 (+50%),
    384 -> pad 1152 (+12%))."""
    if seq <= 128:
        return 128
    best = 128
    for cand in range(128, min(preferred, seq) + 1, 128):
        padded = -(-seq // cand) * cand
        if padded <= seq * 1.13:
            best = cand
    return best


def _pad_to(x: jax.Array, axis: int, multiple: int):
    size = x.shape[axis]
    pad = (-size) % multiple
    if pad == 0:
        return x, size
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths), size


def attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    *,
    causal: bool = True,
    segment_ids_q: Optional[jax.Array] = None,
    segment_ids_kv: Optional[jax.Array] = None,
    alibi_slopes: Optional[jax.Array] = None,
    scale: Optional[float] = None,
    use_flash: bool = True,
    block_q: int = 512,
    block_k: int = 512,
) -> jax.Array:
    """Attention dispatcher: ring attention under a seq-sharded mesh,
    Pallas flash kernel on TPU, XLA reference elsewhere.

    Deliberately NOT jitted itself: callers run it inside their own jit
    (models, train step, decode loops), and the routing reads the global
    mesh at trace time — an inner jit would cache a routing decision keyed
    only on shapes.

    Self-attention only (q_offset=0). For decode-step attention against a
    KV cache use :mod:`merlin_tpu.generate.decode`, which keeps the whole
    step in one jitted loop.
    """
    on_tpu = jax.default_backend() == "tpu"
    sq, skv = q.shape[1], k.shape[1]
    d = q.shape[-1]

    # Context parallelism: when the active mesh shards the seq axis,
    # self-attention runs as ring attention (KV blocks rotate over ICI).
    from merlin_tpu.core.mesh import get_global_mesh

    mesh = get_global_mesh()
    if (mesh is not None and mesh.shape.get("seq", 1) > 1
            and sq == skv and alibi_slopes is None
            and q.shape[2] == k.shape[2]
            and sq % mesh.shape["seq"] == 0):
        from merlin_tpu.ops.ring_attention import ring_self_attention

        return ring_self_attention(
            q, k, v, mesh=mesh, causal=causal,
            segment_ids=segment_ids_q, scale=scale)

    # Flash pays off above one block; tiny sequences run on XLA directly.
    if not (use_flash and on_tpu and sq >= 128 and d <= 256):
        return mha_reference(
            q, k, v, causal=causal,
            segment_ids_q=segment_ids_q, segment_ids_kv=segment_ids_kv,
            alibi_slopes=alibi_slopes, scale=scale,
        )

    # Bidirectional short-KV shapes (the ViT tower: s=1025, d=64) are
    # VPU/overhead-bound under online-softmax tiling — route them to the
    # single-pass whole-KV kernel (see onepass_attention.py for the numbers).
    if (not causal and alibi_slopes is None and segment_ids_q is None
            and q.shape[2] == k.shape[2] and skv <= 4096 and d <= 128):
        return _onepass_dispatch(q, k, v, scale=scale)

    from merlin_tpu.ops.flash_attention import flash_attention

    block_q = _pick_block(sq, block_q)
    block_k = _pick_block(skv, block_k)
    qp, orig_sq = _pad_to(q, 1, block_q)
    kp, orig_sk = _pad_to(k, 1, block_k)
    vp, _ = _pad_to(v, 1, block_k)
    if segment_ids_q is None and (qp.shape[1] != sq or kp.shape[1] != skv):
        # Padding keys must not be attended to: give real tokens segment 1,
        # padding segment 0 via explicit ids.
        segment_ids_q = jnp.ones((q.shape[0], sq), jnp.int32)
        segment_ids_kv = jnp.ones((k.shape[0], skv), jnp.int32)
    if segment_ids_q is not None:
        sq_pad = jnp.zeros((qp.shape[0], qp.shape[1]), jnp.int32)
        segment_ids_q = sq_pad.at[:, :orig_sq].set(segment_ids_q + 1)
        sk_pad = jnp.full((kp.shape[0], kp.shape[1]), -1, jnp.int32)
        segment_ids_kv = sk_pad.at[:, :orig_sk].set(segment_ids_kv + 1)

    kernel = functools.partial(
        flash_attention,
        causal=causal,
        scale=scale if scale is not None else d ** -0.5,
        block_q=block_q,
        block_k=block_k,
    )

    # Under a sharded mesh, pallas_call has no SPMD rule (XLA would gather
    # the operands to every device) — run the kernel per shard via
    # shard_map: batch over (data, fsdp), heads over tensor. Attention is
    # embarrassingly parallel across both, so no collectives are needed.
    from merlin_tpu.core.mesh import get_global_mesh

    mesh = get_global_mesh()
    wrap = False
    if mesh is not None:
        dp = mesh.shape.get("data", 1) * mesh.shape.get("fsdp", 1)
        tp = mesh.shape.get("tensor", 1)
        h, hkv = qp.shape[2], kp.shape[2]
        wrap = (dp * tp > 1 and qp.shape[0] % dp == 0
                and h % tp == 0 and hkv % tp == 0)
    if wrap:
        from jax.sharding import PartitionSpec as P
        from jax import shard_map

        qkv_spec = P(("data", "fsdp"), None, "tensor", None)
        seg_spec = P(("data", "fsdp"), None)

        def sharded(q_, k_, v_, sq_, skv_, slopes_):
            return kernel(q_, k_, v_, segment_ids_q=sq_, segment_ids_kv=skv_,
                          alibi_slopes=slopes_)

        if segment_ids_q is None:
            segment_ids_q = jnp.ones(qp.shape[:2], jnp.int32)
            segment_ids_kv = jnp.ones(kp.shape[:2], jnp.int32)
        slopes = (alibi_slopes if alibi_slopes is not None
                  else jnp.zeros((qp.shape[2],), jnp.float32))
        out = shard_map(
            sharded, mesh=mesh,
            in_specs=(qkv_spec, qkv_spec, qkv_spec, seg_spec, seg_spec,
                      P("tensor")),
            out_specs=qkv_spec, check_vma=False,
        )(qp, kp, vp, segment_ids_q, segment_ids_kv, slopes)
    else:
        out = kernel(qp, kp, vp, segment_ids_q=segment_ids_q,
                     segment_ids_kv=segment_ids_kv,
                     alibi_slopes=alibi_slopes)
    return out[:, :orig_sq]


def _onepass_dispatch(q, k, v, *, scale):
    """Run the single-pass whole-KV kernel (it pads/masks internally),
    sharded over the active mesh when one is set (batch over data/fsdp,
    heads over tensor — no collectives needed)."""
    import functools as _ft

    from merlin_tpu.ops.onepass_attention import onepass_attention
    from merlin_tpu.core.mesh import get_global_mesh

    kernel = _ft.partial(onepass_attention, scale=scale)

    mesh = get_global_mesh()
    wrap = False
    if mesh is not None:
        dp = mesh.shape.get("data", 1) * mesh.shape.get("fsdp", 1)
        tp = mesh.shape.get("tensor", 1)
        wrap = (dp * tp > 1 and q.shape[0] % dp == 0
                and q.shape[2] % tp == 0)
    if wrap:
        from jax.sharding import PartitionSpec as P
        from jax import shard_map

        spec = P(("data", "fsdp"), None, "tensor", None)
        return shard_map(kernel, mesh=mesh, in_specs=(spec, spec, spec),
                         out_specs=spec, check_vma=False)(q, k, v)
    return kernel(q, k, v)
