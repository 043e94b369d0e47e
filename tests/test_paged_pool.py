"""Page allocator + paged cache writer (host-side, CPU).

Pages are head-packed: (total_pages, page_size, hkv*d)."""

import jax.numpy as jnp
import numpy as np
import pytest

from merlin_tpu.ops.paged_attention import (
    PagePool, paged_attention_reference, write_token_to_pages)


def test_page_pool_alloc_extend_release():
    pool = PagePool(total_pages=16, page_size=4, pages_per_seq=4)
    t = pool.allocate("a", 6)
    assert len(t) == 2
    pool.extend("a", 3)  # 9 tokens -> 3 pages
    assert len(pool.tables["a"]) == 3
    arr = pool.table_array(["a"])
    assert arr.shape == (1, 4)
    pool.release("a")
    assert pool.free_pages == 16
    with pytest.raises(ValueError):
        pool.allocate("b", 100)


def test_page_pool_exhaustion():
    pool = PagePool(total_pages=2, page_size=4, pages_per_seq=4)
    pool.allocate("a", 8)
    with pytest.raises(MemoryError):
        pool.allocate("b", 4)


def test_write_token_to_pages():
    hkv, d = 2, 8
    kp = jnp.zeros((4, 4, hkv * d), jnp.float32)   # (P, page, hkv*d)
    vp = jnp.zeros_like(kp)
    knew = jnp.ones((1, hkv, d))
    vnew = 2 * jnp.ones((1, hkv, d))
    tbl = jnp.asarray([[3, 1, 0, 0]], jnp.int32)
    kp1, vp1 = write_token_to_pages(kp, vp, knew, vnew,
                                    positions=jnp.asarray([5]),
                                    page_tables=tbl)
    # position 5 -> logical page 1 -> physical page 1, offset 1
    assert float(kp1[1, 1, 0]) == 1.0
    assert float(vp1[1, 1, hkv * d - 1]) == 2.0
    assert float(kp1.sum()) == hkv * d  # exactly one token row written


def test_reference_lengths_masking():
    rng = np.random.default_rng(0)
    b, h, hkv, d = 1, 2, 2, 8
    kp = jnp.asarray(rng.normal(size=(4, 4, hkv * d)), jnp.float32)
    vp = jnp.asarray(rng.normal(size=(4, 4, hkv * d)), jnp.float32)
    q = jnp.asarray(rng.normal(size=(b, h, d)), jnp.float32)
    tbl = jnp.asarray([[0, 1, 2, 3]], jnp.int32)
    # length 4 == first page only; changing later pages must not matter
    out1 = paged_attention_reference(q, kp, vp, jnp.asarray([4]), tbl)
    kp2 = kp.at[3].set(99.0)
    out2 = paged_attention_reference(q, kp2, vp, jnp.asarray([4]), tbl)
    np.testing.assert_allclose(np.asarray(out1), np.asarray(out2))


def test_quantize_dequantize_roundtrip():
    from merlin_tpu.ops.paged_attention import dequantize_pages, quantize_pages

    rng = np.random.default_rng(0)
    hkv, d = 4, 8
    pages = jnp.asarray(rng.normal(size=(2, 3, hkv * d)) * 5, jnp.float32)
    values, scales = quantize_pages(pages, d)
    assert values.dtype == jnp.int8 and values.shape == pages.shape
    assert scales.shape == (2, 3, 128)  # lane per kv head, tile-padded
    back = dequantize_pages(values, scales, d, jnp.float32)
    rel = float(jnp.linalg.norm(back - pages) / jnp.linalg.norm(pages))
    assert rel < 0.01
    # zero rows stay finite
    z = jnp.zeros((1, 1, hkv * d))
    vq, sq = quantize_pages(z, d)
    assert jnp.isfinite(dequantize_pages(vq, sq, d)).all()
