"""Attention op tests (CPU: XLA reference path + dispatcher semantics).

The Pallas kernel itself is validated on TPU hardware (tests_tpu/ suite and
bench.py); interpret mode is too slow for CI-sized shapes. What we verify
here: mask semantics, GQA, ALiBi, decode offsets, and that the dispatcher
on a non-TPU backend returns the reference result.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from merlin_tpu.ops.attention import attention, mha_reference


def _rand(shape, seed=0, dtype=jnp.float32):
    return jnp.asarray(np.random.default_rng(seed).normal(size=shape), dtype)


def _naive(q, k, v, mask):
    logits = jnp.einsum("bqhd,bkhd->bhqk", q, k) / np.sqrt(q.shape[-1])
    logits = jnp.where(mask, logits, -1e30)
    p = jax.nn.softmax(logits, axis=-1)
    return jnp.einsum("bhqk,bkhd->bqhd", p, v)


def test_causal_matches_naive():
    b, s, h, d = 2, 16, 2, 8
    q, k, v = _rand((b, s, h, d), 0), _rand((b, s, h, d), 1), _rand((b, s, h, d), 2)
    causal = jnp.tril(jnp.ones((s, s), bool))[None, None]
    expected = _naive(q, k, v, causal)
    np.testing.assert_allclose(
        mha_reference(q, k, v, causal=True), expected, atol=1e-5)


def test_segment_mask_blocks_cross_attention():
    b, s, h, d = 1, 8, 1, 4
    q, k, v = _rand((b, s, h, d), 0), _rand((b, s, h, d), 1), _rand((b, s, h, d), 2)
    seg = jnp.asarray([[0, 0, 0, 0, 1, 1, 1, 1]], jnp.int32)
    out = mha_reference(q, k, v, causal=True, segment_ids_q=seg, segment_ids_kv=seg)
    # Second segment's first token attends only to itself -> output == its v
    np.testing.assert_allclose(out[0, 4, 0], v[0, 4, 0], atol=1e-5)


def test_gqa_repeat_equivalence():
    b, s, h, d = 1, 8, 4, 4
    q = _rand((b, s, h, d), 0)
    k = _rand((b, s, 2, d), 1)
    v = _rand((b, s, 2, d), 2)
    out = mha_reference(q, k, v, causal=True)
    k_rep = jnp.repeat(k, 2, axis=2)
    v_rep = jnp.repeat(v, 2, axis=2)
    expected = mha_reference(q, k_rep, v_rep, causal=True)
    np.testing.assert_allclose(out, expected, atol=1e-6)


def test_alibi_prefers_recent_tokens():
    b, s, h, d = 1, 32, 1, 4
    q = jnp.zeros((b, s, h, d))
    k = jnp.zeros((b, s, h, d))
    v = jnp.broadcast_to(jnp.arange(s, dtype=jnp.float32)[None, :, None, None],
                         (b, s, h, d))
    slopes = jnp.asarray([1.0])
    out = mha_reference(q, k, v, causal=True, alibi_slopes=slopes)
    out_flat = mha_reference(q, k, v, causal=True)
    # With equal logits, ALiBi shifts weight toward recent (higher-index) v.
    assert float(out[0, -1, 0, 0]) > float(out_flat[0, -1, 0, 0])


def test_decode_q_offset():
    b, s, h, d = 1, 8, 2, 4
    q_full = _rand((b, s, h, d), 0)
    k, v = _rand((b, s, h, d), 1), _rand((b, s, h, d), 2)
    full = mha_reference(q_full, k, v, causal=True)
    # Decoding position 5 with the same KV should reproduce row 5.
    step = mha_reference(q_full[:, 5:6], k, v, causal=True, q_offset=5)
    np.testing.assert_allclose(step[:, 0], full[:, 5], atol=1e-5)


def test_dispatcher_on_cpu_uses_reference():
    assert jax.default_backend() == "cpu"
    b, s, h, d = 1, 64, 2, 8
    q, k, v = _rand((b, s, h, d), 0), _rand((b, s, h, d), 1), _rand((b, s, h, d), 2)
    out = attention(q, k, v, causal=True)
    expected = mha_reference(q, k, v, causal=True)
    np.testing.assert_allclose(out, expected, atol=1e-6)


def test_softmax_fp32_in_bf16():
    b, s, h, d = 1, 16, 1, 8
    q = _rand((b, s, h, d), 0, jnp.bfloat16)
    k = _rand((b, s, h, d), 1, jnp.bfloat16)
    v = _rand((b, s, h, d), 2, jnp.bfloat16)
    out = mha_reference(q, k, v, causal=True)
    assert out.dtype == jnp.bfloat16
    ref = mha_reference(q.astype(jnp.float32), k.astype(jnp.float32),
                        v.astype(jnp.float32), causal=True)
    np.testing.assert_allclose(out.astype(jnp.float32), ref, atol=0.05)
