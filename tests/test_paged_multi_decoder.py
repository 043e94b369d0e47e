"""Decoder-level multi-token paged windows (cfg.paged_multi_query).

A verify window's logits must equal teacher-forced sequential s_q=1 paged
decode — including over NON-identity page tables (the continuous-batching
engine scatters prompts into arbitrary pool pages), under scan_layers, with
GQA, with ALiBi, and with int8 pages (loose tolerance).
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from merlin_tpu.models.convert import stack_layer_params
from merlin_tpu.models.decoder import CausalLM, init_kv_cache
from merlin_tpu.models.families import tiny


def _params(model, ids):
    return nn.unbox(model.init(jax.random.key(0), ids)["params"])


# jit per (config, tag): eager apply dispatches thousands of tiny
# per-primitive compiles (minutes per case on a 1-CPU runner); one jit
# per signature makes the whole file compile a handful of programs
_JIT_CACHE = {}


def _jitted(model, tag, make):
    key = (repr(model.cfg), tag)
    if key not in _JIT_CACHE:
        _JIT_CACHE[key] = make()
    return _JIT_CACHE[key]


def _prefill(model, params, ids, cache):
    def make():
        def fn(p, i, c):
            b, s = i.shape
            positions = jnp.broadcast_to(jnp.arange(s), (b, s))
            seg = jnp.ones((b, s), jnp.int32)
            return model.apply({"params": p}, i, segment_ids=seg,
                               positions=positions, kv_cache=c)
        return jax.jit(fn)
    return _jitted(model, "prefill", make)(params, ids, cache)


def _decode_step(model, params, tok, cache):
    def make():
        def fn(p, t, c):
            return model.apply({"params": p}, t,
                               positions=c["lengths"][:, None], kv_cache=c)
        return jax.jit(fn)
    return _jitted(model, "step", make)(params, tok, cache)


def _window(model, params, toks, cache):
    def make():
        def fn(p, t, c):
            positions = c["lengths"][:, None] + jnp.arange(t.shape[1])[None]
            return model.apply({"params": p}, t, positions=positions,
                               kv_cache=c)
        return jax.jit(fn)
    return _jitted(model, f"window{toks.shape[1]}", make)(
        params, toks, cache)


def _shuffle_pages(cache, seed=0):
    """Permute physical pages + rewrite tables: engine-style arbitrary
    layout. Keeps logical content identical."""
    layers = cache["layers"]
    stacked = isinstance(layers, dict)
    total = (layers["k_pages"].shape[1] if stacked
             else layers[0]["k_pages"].shape[0])
    perm = np.random.default_rng(seed).permutation(total)
    inv = np.argsort(perm)

    def move(x, axis):
        return jnp.take(x, jnp.asarray(inv), axis=axis)

    if stacked:
        new_layers = {k: move(v, 1) for k, v in layers.items()}
    else:
        new_layers = tuple({k: move(v, 0) for k, v in layer.items()}
                           for layer in layers)
    tables = jnp.asarray(perm)[cache["page_tables"]]
    return dict(cache, layers=new_layers, page_tables=tables)


def _run_case(cfg, *, scan=False, cache_dtype=jnp.float32, shuffle=True,
              atol=2e-4):
    rng = np.random.default_rng(3)
    b, prompt, window = 2, 8, 4
    ids = jnp.asarray(rng.integers(3, 90, (b, prompt)), jnp.int32)
    nxt = jnp.asarray(rng.integers(3, 90, (b, window)), jnp.int32)

    base_cfg = dataclasses.replace(cfg, scan_layers=scan)
    model = CausalLM(base_cfg)
    multi = CausalLM(dataclasses.replace(base_cfg, paged_multi_query=True))
    p = _params(CausalLM(cfg), ids)
    if scan:
        p = stack_layer_params(dict(p), cfg.num_layers)

    def fresh():
        c = init_kv_cache(base_cfg, b, max_len=32, layout="paged",
                          page_size=8, dtype=cache_dtype)
        _, c = _prefill(model, p, ids, c)
        return _shuffle_pages(c) if shuffle else c

    # sequential: teacher-force the window one token at a time
    cache = fresh()
    seq_logits = []
    for j in range(window):
        lg, cache = _decode_step(model, p, nxt[:, j:j + 1], cache)
        seq_logits.append(lg[:, 0])
    seq_logits = jnp.stack(seq_logits, axis=1)          # (b, window, V)

    # one multi-token window
    cache2 = fresh()
    lens = cache2["lengths"]
    win_logits, cache3 = _window(multi, p, nxt, cache2)
    np.testing.assert_allclose(np.asarray(win_logits),
                               np.asarray(seq_logits), atol=atol, rtol=1e-4)
    np.testing.assert_array_equal(np.asarray(cache3["lengths"]),
                                  np.asarray(lens) + window)


def test_window_matches_sequential_mha():
    _run_case(tiny())


def test_window_matches_sequential_gqa():
    _run_case(tiny(num_kv_heads=2))


def test_window_matches_sequential_alibi():
    _run_case(tiny(positional="alibi"))


def test_window_matches_sequential_scan_layers():
    _run_case(tiny(), scan=True)


def test_window_matches_sequential_int8_pages():
    _run_case(tiny(), cache_dtype=jnp.int8, atol=0.35)


def test_window_identity_tables_equals_shuffled():
    """Same logical cache, identity vs shuffled physical pages -> same
    window logits (the kernel path must not depend on page placement)."""
    cfg = tiny()
    rng = np.random.default_rng(5)
    b, prompt, window = 2, 8, 3
    ids = jnp.asarray(rng.integers(3, 90, (b, prompt)), jnp.int32)
    nxt = jnp.asarray(rng.integers(3, 90, (b, window)), jnp.int32)
    model = CausalLM(cfg)
    multi = CausalLM(dataclasses.replace(cfg, paged_multi_query=True))
    p = _params(model, ids)
    c = init_kv_cache(cfg, b, max_len=32, layout="paged", page_size=8)
    _, c = _prefill(model, p, ids, c)
    lg_id, _ = _window(multi, p, nxt, c)
    lg_sh, _ = _window(multi, p, nxt, _shuffle_pages(c, seed=7))
    np.testing.assert_allclose(np.asarray(lg_id), np.asarray(lg_sh),
                               atol=1e-5)
