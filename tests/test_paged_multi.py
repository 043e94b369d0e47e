"""Multi-token paged attention (verify windows / chunked prefill), CPU.

Covers the XLA reference semantics, the block-diagonal pack/unpack
helpers shared with the Pallas kernels, and the multi-token page writes.
Kernel-vs-reference parity on hardware lives in tests_tpu/test_paged_tpu.py.
"""

import jax
import jax.numpy as jnp
import numpy as np

from merlin_tpu.ops.paged_attention import (
    _mq_rows,
    _pack_q_blockdiag_multi,
    _unpack_o_multi,
    dequantize_pages,
    paged_attention_multi_reference,
    paged_attention_reference,
    quantize_pages,
    write_token_to_pages,
    write_token_to_pages_q8,
    write_tokens_to_pages,
    write_tokens_to_pages_q8,
)


def _make_pages(rng, b, pages_per_seq, page_size, hkv, d):
    total = b * pages_per_seq + 1
    kp = jnp.asarray(rng.normal(size=(total, page_size, hkv * d)),
                     jnp.float32)
    vp = jnp.asarray(rng.normal(size=(total, page_size, hkv * d)),
                     jnp.float32)
    # arbitrary (non-identity) tables: shuffled disjoint pages, page 0 free
    perm = rng.permutation(total - 1) + 1
    tables = jnp.asarray(perm[: b * pages_per_seq]
                         .reshape(b, pages_per_seq), jnp.int32)
    return kp, vp, tables


def _dense_causal(q, k_seq, v_seq, lengths, s_q):
    """Gold: per-row causal attention over the gathered dense sequence."""
    b, _, h, d = q.shape
    hkv = k_seq.shape[2]
    group = h // hkv
    kf = jnp.repeat(k_seq.astype(jnp.float32), group, axis=2)
    vf = jnp.repeat(v_seq.astype(jnp.float32), group, axis=2)
    s = jnp.einsum("bthd,bkhd->bhtk", q.astype(jnp.float32), kf) * d ** -0.5
    k_pos = jnp.arange(k_seq.shape[1])
    q_pos = (lengths[:, None] - s_q) + jnp.arange(s_q)[None]
    mask = k_pos[None, None, :] <= q_pos[:, :, None]
    s = jnp.where(mask[:, None], s, -1e30)
    p = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("bhtk,bkhd->bthd", p, vf)


def test_multi_reference_matches_dense_gather():
    rng = np.random.default_rng(0)
    b, s_q, h, hkv, d = 2, 4, 4, 2, 8
    pages_per_seq, page_size = 3, 8
    kp, vp, tables = _make_pages(rng, b, pages_per_seq, page_size, hkv, d)
    q = jnp.asarray(rng.normal(size=(b, s_q, h, d)), jnp.float32)
    lengths = jnp.asarray([11, 22], jnp.int32)   # include the window

    out = paged_attention_multi_reference(q, kp, vp, lengths, tables)

    max_len = pages_per_seq * page_size
    k_seq = kp[tables].reshape(b, max_len, hkv, d)
    v_seq = vp[tables].reshape(b, max_len, hkv, d)
    gold = _dense_causal(q, k_seq, v_seq, lengths, s_q)
    np.testing.assert_allclose(np.asarray(out), np.asarray(gold),
                               rtol=1e-5, atol=1e-5)


def test_multi_reference_sq1_matches_decode_reference():
    rng = np.random.default_rng(1)
    b, h, hkv, d = 2, 4, 4, 8
    pages_per_seq, page_size = 2, 8
    kp, vp, tables = _make_pages(rng, b, pages_per_seq, page_size, hkv, d)
    q = jnp.asarray(rng.normal(size=(b, h, d)), jnp.float32)
    lengths = jnp.asarray([5, 13], jnp.int32)
    one = paged_attention_reference(q, kp, vp, lengths, tables)
    multi = paged_attention_multi_reference(
        q[:, None], kp, vp, lengths, tables)[:, 0]
    np.testing.assert_allclose(np.asarray(one), np.asarray(multi),
                               rtol=1e-5, atol=1e-5)


def test_multi_reference_alibi_true_positions():
    rng = np.random.default_rng(2)
    b, s_q, h, hkv, d = 1, 3, 2, 2, 8
    pages_per_seq, page_size = 2, 8
    kp, vp, tables = _make_pages(rng, b, pages_per_seq, page_size, hkv, d)
    q = jnp.asarray(rng.normal(size=(b, s_q, h, d)), jnp.float32)
    lengths = jnp.asarray([9], jnp.int32)
    slopes = jnp.asarray([0.5, 0.25], jnp.float32)
    out = paged_attention_multi_reference(
        q, kp, vp, lengths, tables, alibi_slopes=slopes)

    max_len = pages_per_seq * page_size
    k_seq = kp[tables].reshape(b, max_len, hkv, d)
    v_seq = vp[tables].reshape(b, max_len, hkv, d)
    kf = k_seq.astype(jnp.float32)
    s = jnp.einsum("bthd,bkhd->bhtk", q.astype(jnp.float32), kf) * d ** -0.5
    k_pos = jnp.arange(max_len)
    q_pos = (lengths[:, None] - s_q) + jnp.arange(s_q)[None]
    dist = (k_pos[None, None, :] - q_pos[:, :, None]).astype(jnp.float32)
    s = s + slopes[None, :, None, None] * dist[:, None]
    mask = k_pos[None, None, :] <= q_pos[:, :, None]
    s = jnp.where(mask[:, None], s, -1e30)
    p = jax.nn.softmax(s, axis=-1)
    gold = jnp.einsum("bhtk,bkhd->bthd", p, v_seq.astype(jnp.float32))
    np.testing.assert_allclose(np.asarray(out), np.asarray(gold),
                               rtol=1e-5, atol=1e-5)


def test_blockdiag_pack_unpack_roundtrip():
    rng = np.random.default_rng(3)
    b, s_q, h, hkv, d = 2, 3, 4, 2, 8
    group = h // hkv
    q = jnp.asarray(rng.normal(size=(b, s_q, h, d)), jnp.float32)
    qbd = _pack_q_blockdiag_multi(q, hkv, group, jnp.float32)
    assert qbd.shape == (b, s_q * h, hkv * d)
    t_of_row, qh_of_row = _mq_rows(s_q, h, group)
    for r in range(s_q * h):
        kv = qh_of_row[r] // group
        row = np.asarray(qbd[0, r])
        np.testing.assert_allclose(
            row[kv * d:(kv + 1) * d],
            np.asarray(q[0, t_of_row[r], qh_of_row[r]]))
        zeroed = row.copy()
        zeroed[kv * d:(kv + 1) * d] = 0
        assert np.all(zeroed == 0)
    # unpack: rows laid back to (b, s_q, h, d) by (t, qh)
    rows = qbd.sum(-1)  # row-identifying scalar
    fake_o = jnp.broadcast_to(rows[..., None], (b, s_q * h, d))
    o = _unpack_o_multi(fake_o, s_q, h, group)
    for r in range(s_q * h):
        np.testing.assert_allclose(
            np.asarray(o[0, t_of_row[r], qh_of_row[r]]),
            np.asarray(fake_o[0, r]))


def test_write_tokens_matches_sequential_single_writes():
    rng = np.random.default_rng(4)
    b, s_q, hkv, d = 2, 3, 2, 8
    kp0 = jnp.zeros((7, 4, hkv * d), jnp.float32)
    vp0 = jnp.zeros_like(kp0)
    tables = jnp.asarray([[3, 1, 5], [2, 6, 4]], jnp.int32)
    start = jnp.asarray([2, 7], jnp.int32)
    knew = jnp.asarray(rng.normal(size=(b, s_q, hkv, d)), jnp.float32)
    vnew = jnp.asarray(rng.normal(size=(b, s_q, hkv, d)), jnp.float32)

    kp_m, vp_m = write_tokens_to_pages(
        kp0, vp0, knew, vnew, start_positions=start, page_tables=tables)
    kp_s, vp_s = kp0, vp0
    for j in range(s_q):
        kp_s, vp_s = write_token_to_pages(
            kp_s, vp_s, knew[:, j], vnew[:, j],
            positions=start + j, page_tables=tables)
    np.testing.assert_allclose(np.asarray(kp_m), np.asarray(kp_s))
    np.testing.assert_allclose(np.asarray(vp_m), np.asarray(vp_s))


def test_write_tokens_q8_matches_sequential():
    rng = np.random.default_rng(5)
    b, s_q, hkv, d = 1, 2, 2, 8
    kp0 = jnp.zeros((5, 4, hkv * d), jnp.int8)
    ks0 = jnp.zeros((5, 4, 128), jnp.float32)
    vp0 = jnp.zeros_like(kp0)
    vs0 = jnp.zeros_like(ks0)
    tables = jnp.asarray([[1, 4, 2]], jnp.int32)
    start = jnp.asarray([3], jnp.int32)
    knew = jnp.asarray(rng.normal(size=(b, s_q, hkv, d)), jnp.float32)
    vnew = jnp.asarray(rng.normal(size=(b, s_q, hkv, d)), jnp.float32)

    m = write_tokens_to_pages_q8(kp0, ks0, vp0, vs0, knew, vnew,
                                 start_positions=start, page_tables=tables)
    s = (kp0, ks0, vp0, vs0)
    for j in range(s_q):
        s = write_token_to_pages_q8(*s, knew[:, j], vnew[:, j],
                                    positions=start + j, page_tables=tables)
    for got, want in zip(m, s):
        np.testing.assert_allclose(np.asarray(got), np.asarray(want))


def test_multi_q8_roundtrip_reference():
    """int8 pages + multi-token reference: write a window quantized, then
    dequantize and attend — close to the float path."""
    rng = np.random.default_rng(6)
    b, s_q, h, hkv, d = 1, 3, 4, 2, 8
    pages_per_seq, page_size = 2, 8
    kp, vp, tables = _make_pages(rng, b, pages_per_seq, page_size, hkv, d)
    kq, ks = quantize_pages(kp, d)
    vq, vs = quantize_pages(vp, d)
    q = jnp.asarray(rng.normal(size=(b, s_q, h, d)), jnp.float32)
    lengths = jnp.asarray([10], jnp.int32)
    kd = dequantize_pages(kq, ks, d, jnp.float32)
    vd = dequantize_pages(vq, vs, d, jnp.float32)
    out_q = paged_attention_multi_reference(q, kd, vd, lengths, tables)
    out_f = paged_attention_multi_reference(q, kp, vp, lengths, tables)
    np.testing.assert_allclose(np.asarray(out_q), np.asarray(out_f),
                               rtol=0.1, atol=0.1)
