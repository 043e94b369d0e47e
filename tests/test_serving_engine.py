"""Continuous-batching engine: outputs match the plain Generator, slots
recycle across more requests than slots, streaming callbacks fire."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp
from flax import linen as nn

from merlin_tpu.generate.decode import GenerateConfig, Generator
from merlin_tpu.models.decoder import CausalLM
from merlin_tpu.models.families import tiny
from merlin_tpu.serve.engine import ServingEngine

EOS, PAD = 2, 0


@pytest.fixture(scope="module")
def model_params():
    cfg = tiny()
    model = CausalLM(cfg)
    params = nn.unbox(model.init(jax.random.key(0),
                                 jnp.ones((1, 4), jnp.int32))["params"])
    return model, params


def _reference(model, params, prompt, max_new):
    gen = Generator(model, GenerateConfig(
        max_new_tokens=max_new, eos_id=EOS, pad_id=PAD,
        kv_layout="paged", cache_dtype=jnp.float32, prompt_bucket=16))
    out = gen(params, np.asarray([prompt], np.int32))[0].tolist()
    trimmed = []
    for t in out:
        trimmed.append(t)
        if t == EOS:
            break
    while trimmed and trimmed[-1] == PAD:
        trimmed.pop()
    return trimmed


@pytest.mark.parametrize("chunk_steps", [8, 1])
def test_engine_matches_generator(model_params, chunk_steps):
    """chunk_steps=1 exercises the no-scan decode path (donated cache, no
    scan-carry pool copy — how full-7B serving fits one chip)."""
    model, params = model_params
    engine = ServingEngine(model, params, num_slots=2, max_len=64,
                           eos_id=EOS, pad_id=PAD, prompt_bucket=16,
                           page_size=16, cache_dtype=jnp.float32,
                           chunk_steps=chunk_steps)
    prompts = [[5, 17, 33, 41], [7, 9, 11], [21, 22], [3, 4, 5, 6, 8]]
    reqs = [engine.submit(p, max_new_tokens=6) for p in prompts]
    engine.run_until_idle()
    for req, prompt in zip(reqs, prompts):
        assert req.done
        expected = _reference(model, params, prompt, 6)
        assert req.generated == expected, (prompt, req.generated, expected)


@pytest.mark.parametrize("C,wps", [(8, 4), (16, 4), (16, 1)])
def test_engine_chunked_prefill_matches_generator(model_params, C, wps):
    """prefill_chunk=C admits prompts in (1, C) windows through the
    multi-token paged path straight into pool pages (no small cache, no
    insert scatter, one compiled prompt shape). Token-exact vs the plain
    Generator, including ragged tails (plen % C != 0), multi-window
    prompts (plen > C), MULTI-PAGE windows (C=2*page_size — the bench's
    longprompt row runs C=512 over 128-token pages), and the
    stall-bounding one-window-per-step budget (wps=1)."""
    model, params = model_params
    engine = ServingEngine(model, params, num_slots=2, max_len=64,
                           eos_id=EOS, pad_id=PAD, prompt_bucket=16,
                           page_size=8, cache_dtype=jnp.float32,
                           prefill_chunk=C, prefill_windows_per_step=wps)
    prompts = [[5, 17, 33, 41], [7, 9, 11], list(range(3, 3 + C + 5)),
               list(range(40, 40 + 2 * C))]
    reqs = [engine.submit(p, max_new_tokens=6) for p in prompts]
    engine.run_until_idle()
    for req, prompt in zip(reqs, prompts):
        assert req.done
        expected = _reference(model, params, prompt, 6)
        assert req.generated == expected, (prompt, req.generated, expected)


def test_engine_hybrid_prefill_routes_by_length(model_params):
    """prefill_chunk_min=T keeps short prompts (len <= T) on the
    whole-prompt prefill+insert path (measured faster at short lengths)
    while longer prompts still admit in (1, C) windows. Both routes
    token-exact vs the plain Generator."""
    model, params = model_params
    C = 8
    engine = ServingEngine(model, params, num_slots=2, max_len=64,
                           eos_id=EOS, pad_id=PAD, prompt_bucket=16,
                           page_size=8, cache_dtype=jnp.float32,
                           prefill_chunk=C, prefill_chunk_min=C)
    whole_calls, window_calls = [], []
    real_prefill, real_window = engine._prefill, engine._prefill_window
    engine._prefill = lambda *a: (whole_calls.append(1),
                                  real_prefill(*a))[1]
    engine._prefill_window = lambda *a: (window_calls.append(1),
                                         real_window(*a))[1]
    short, long_ = [5, 17, 33, 41], list(range(7, 7 + 2 * C + 5))
    reqs = [engine.submit(p, max_new_tokens=6) for p in (short, long_)]
    engine.run_until_idle()
    assert len(whole_calls) == 1          # short prompt: one prefill
    assert len(window_calls) == 3         # long prompt: ceil(21/8) windows
    for req, prompt in zip(reqs, (short, long_)):
        assert req.done
        expected = _reference(model, params, prompt, 6)
        assert req.generated == expected, (prompt, req.generated, expected)


def test_engine_chunked_prefill_interleaves_with_decode(model_params):
    """A long prompt admits window-by-window WHILE another slot decodes;
    decode steps during the admission scatter their masked token into
    the trash page (the slot's global tables row stays 0 until the
    prompt is fully written) and both outputs stay token-exact."""
    model, params = model_params
    engine = ServingEngine(model, params, num_slots=2, max_len=96,
                           eos_id=EOS, pad_id=PAD, prompt_bucket=16,
                           page_size=8, cache_dtype=jnp.float32,
                           prefill_chunk=8, chunk_steps=1,
                           prefill_windows_per_step=1)
    r1 = engine.submit([5, 17, 33, 41], max_new_tokens=12)
    engine.step()
    engine.step()  # r1 decoding
    long_prompt = list(range(7, 7 + 37))  # 5 windows of 8
    r2 = engine.submit(long_prompt, max_new_tokens=6)
    # r2's admission spreads across steps; r1 keeps decoding each step
    mid_prefill = False
    for _ in range(4):
        engine.step()
        mid_prefill = mid_prefill or bool(engine._prefilling)
    engine.run_until_idle()
    assert mid_prefill  # the interleaved path actually engaged
    assert r1.generated == _reference(model, params, [5, 17, 33, 41], 12)
    assert r2.generated == _reference(model, params, long_prompt, 6)


def test_engine_chunked_prefill_with_speculative(model_params):
    """Chunked prefill composes with engine-integrated speculative
    decoding (both ride the paged_multi_query forward)."""
    model, params = model_params
    engine = ServingEngine(model, params, num_slots=2, max_len=64,
                           eos_id=EOS, pad_id=PAD, prompt_bucket=16,
                           page_size=8, cache_dtype=jnp.float32,
                           prefill_chunk=8, spec_draft=2, chunk_steps=2)
    prompts = [[5, 17, 33, 41, 5, 17, 33], [7, 9, 11, 7, 9, 11, 7, 9, 11]]
    reqs = [engine.submit(p, max_new_tokens=8) for p in prompts]
    engine.run_until_idle()
    for req, prompt in zip(reqs, prompts):
        assert req.done
        expected = _reference(model, params, prompt, 8)
        assert req.generated == expected, (prompt, req.generated, expected)


def test_engine_tp_chunked_prefill_matches_single(model_params):
    """TP x chunked prefill compose: the (1, C) prefill windows ride the
    same shard_map'd paged_multi_query step as decode (decoder.py
    multi_query shard_map gate), so a tensor-sharded pool admits prompts
    window-by-window with outputs equal to the unsharded path."""
    model, params = model_params
    if len(jax.devices()) < 2:
        pytest.skip("needs >= 2 devices")
    from merlin_tpu.core.mesh import MeshConfig, create_mesh
    from merlin_tpu.core.partitioning import sharding_for_tree

    mesh = create_mesh(MeshConfig(data=1, fsdp=1, tensor=2),
                       devices=jax.devices()[:2])
    abstract = jax.eval_shape(
        lambda: model.init(jax.random.key(0), jnp.ones((1, 4), jnp.int32))
    )["params"]
    logical = nn.get_partition_spec(abstract)
    shardings = sharding_for_tree(logical, mesh)

    engine = ServingEngine(model, params, num_slots=2, max_len=64,
                           eos_id=EOS, pad_id=PAD, prompt_bucket=16,
                           page_size=8, cache_dtype=jnp.float32,
                           prefill_chunk=8, mesh=mesh,
                           param_shardings=shardings)
    try:
        prompts = [[5, 17, 33, 41], list(range(3, 3 + 13)),
                   list(range(40, 40 + 16))]
        reqs = [engine.submit(p, max_new_tokens=6) for p in prompts]
        engine.run_until_idle()
        for req, prompt in zip(reqs, prompts):
            assert req.generated == _reference(model, params, prompt, 6), \
                (prompt, req.generated)
    finally:
        engine.close()


def test_engine_recycles_slots_and_streams(model_params):
    model, params = model_params
    engine = ServingEngine(model, params, num_slots=1, max_len=64,
                           eos_id=EOS, pad_id=PAD, prompt_bucket=16,
                           page_size=16, cache_dtype=jnp.float32)
    streamed = {}

    def emit_for(rid):
        def emit(tok, done):
            streamed.setdefault(rid, []).append((tok, done))
        return emit

    reqs = [engine.submit([5 + i, 17, 33], max_new_tokens=4,
                          emit=emit_for(i)) for i in range(3)]
    engine.run_until_idle()
    assert all(r.done for r in reqs)
    for i, r in enumerate(reqs):
        toks = [t for t, _ in streamed[i]]
        assert toks == r.generated
        assert streamed[i][-1][1] is True  # final callback marks done


def test_engine_int8_cache_matches_int8_generator(model_params):
    """cache_dtype=int8: pages quantize per-token-per-head on write and
    the engine's outputs equal the Generator's over the same int8 cache
    (identical math on the XLA path)."""
    model, params = model_params
    engine = ServingEngine(model, params, num_slots=2, max_len=64,
                           eos_id=EOS, pad_id=PAD, prompt_bucket=16,
                           page_size=16, cache_dtype=jnp.int8)
    prompts = [[5, 17, 33, 41], [7, 9, 11]]
    reqs = [engine.submit(p, max_new_tokens=6) for p in prompts]
    engine.run_until_idle()
    for req, prompt in zip(reqs, prompts):
        assert req.done
        gen = Generator(model, GenerateConfig(
            max_new_tokens=6, eos_id=EOS, pad_id=PAD, kv_layout="paged",
            cache_dtype=jnp.int8, prompt_bucket=16))
        out = gen(params, np.asarray([prompt], np.int32))[0].tolist()
        expected = []
        for t in out:
            expected.append(t)
            if t == EOS:
                break
        while expected and expected[-1] == PAD:
            expected.pop()
        assert req.generated == expected, (prompt, req.generated, expected)


def test_engine_scan_decoder_matches_loop(model_params):
    """The engine over a scan_layers model + STACKED paged cache (the 7B
    serving configuration: one paged-kernel instance for the whole stack)
    produces exactly the loop-decoder engine's tokens."""
    import dataclasses
    from merlin_tpu.models.convert import stack_layer_params
    from merlin_tpu.models.families import tiny as tiny_cfg

    model, params = model_params
    scan_model = CausalLM(dataclasses.replace(tiny_cfg(), scan_layers=True))
    scan_params = stack_layer_params(dict(params),
                                     tiny_cfg().num_layers)
    engine = ServingEngine(scan_model, scan_params, num_slots=2, max_len=64,
                           eos_id=EOS, pad_id=PAD, prompt_bucket=16,
                           page_size=16, cache_dtype=jnp.float32,
                           chunk_steps=4)
    assert engine._stacked
    prompts = [[5, 17, 33, 41], [7, 9, 11], [21, 22], [3, 4, 5, 6, 8]]
    reqs = [engine.submit(p, max_new_tokens=6) for p in prompts]
    engine.run_until_idle()
    for req, prompt in zip(reqs, prompts):
        assert req.done
        expected = _reference(model, params, prompt, 6)
        assert req.generated == expected, (prompt, req.generated, expected)


def test_engine_oversized_prompt_fails_request_only(model_params):
    """A prompt that can never fit a slot fails that request (error set,
    emit fired with done) while the engine keeps serving others."""
    model, params = model_params
    engine = ServingEngine(model, params, num_slots=2, max_len=64,
                           eos_id=EOS, pad_id=PAD, prompt_bucket=16,
                           page_size=16, cache_dtype=jnp.float32)
    events = []
    big = engine.submit(list(range(5, 5 + 200)), max_new_tokens=4,
                        emit=lambda t, d: events.append((t, d)))
    ok = engine.submit([5, 17, 33, 41], max_new_tokens=6)
    engine.run_until_idle()
    assert big.done and big.error and "pages_per_seq" in big.error
    assert events == [(-1, True)]  # error sentinel, not a decodable token
    assert ok.generated == _reference(model, params, [5, 17, 33, 41], 6)


def test_engine_preemption_recovers(model_params):
    """When the page pool can't grow a sequence, the youngest other request
    is preempted (pages released, recompute-requeued) and BOTH requests
    still finish with correct outputs. Regression: a slot preempted inside
    _grow_pages must not be decoded/recorded in the same chunk."""
    model, params = model_params
    engine = ServingEngine(model, params, num_slots=2, max_len=64,
                           eos_id=EOS, pad_id=PAD, prompt_bucket=16,
                           page_size=16, cache_dtype=jnp.float32,
                           chunk_steps=4)
    preempts = []
    orig = engine._preempt_youngest
    engine._preempt_youngest = lambda exclude: (preempts.append(exclude),
                                                orig(exclude))[1]
    free_at_init = engine.pool.free_pages  # pool idle: every page released
    # two 40-token prompts on a pool one page too small (2 slots x 4 pages
    # - trash) so growth must preempt
    prompts = [list(range(5, 45)), list(range(7, 47))]
    reqs = [engine.submit(p, max_new_tokens=8) for p in prompts]
    engine.run_until_idle()
    assert all(r.done for r in reqs)
    assert preempts, "pool was sized to force preemption"
    assert engine.pool.free_pages == free_at_init  # fully drained back
    for req, prompt in zip(reqs, prompts):
        assert req.generated == _reference(model, params, prompt, 8), \
            (req.generated,)


def test_engine_preemption_reroutes_hybrid_prefill(model_params):
    """A preempted request re-admits with prompt+generated as its new
    prompt; the hybrid router re-decides from the GROWN length, so a
    request admitted whole-prompt can legitimately re-admit chunked.
    Outputs stay exact through the route change."""
    model, params = model_params
    C = 8
    engine = ServingEngine(model, params, num_slots=2, max_len=64,
                           eos_id=EOS, pad_id=PAD, prompt_bucket=16,
                           page_size=16, cache_dtype=jnp.float32,
                           chunk_steps=4, prefill_chunk=C,
                           prefill_chunk_min=45)
    preempts, routes = [], []
    orig_p, orig_r = engine._preempt_youngest, engine._route_chunked
    engine._preempt_youngest = lambda exclude: (preempts.append(exclude),
                                                orig_p(exclude))[1]
    engine._route_chunked = lambda ids: (routes.append(len(ids)),
                                         orig_r(ids))[1]
    free_at_init = engine.pool.free_pages
    # 40-token prompts admit whole-prompt (<= 45); a preempted victim
    # re-admits at 40 + generated > 45 -> chunked
    prompts = [list(range(5, 45)), list(range(7, 47))]
    reqs = [engine.submit(p, max_new_tokens=8) for p in prompts]
    engine.run_until_idle()
    assert all(r.done for r in reqs)
    assert preempts, "pool was sized to force preemption"
    assert any(n > 45 for n in routes), "re-admission saw the grown prompt"
    assert engine.pool.free_pages == free_at_init  # no page leak
    for req, prompt in zip(reqs, prompts):
        assert req.generated == _reference(model, params, prompt, 8), \
            (req.generated,)


def test_engine_interleaved_admission(model_params):
    """A request submitted mid-flight joins without disturbing others."""
    model, params = model_params
    engine = ServingEngine(model, params, num_slots=2, max_len=64,
                           eos_id=EOS, pad_id=PAD, prompt_bucket=16,
                           page_size=16, cache_dtype=jnp.float32)
    r1 = engine.submit([5, 17, 33, 41], max_new_tokens=6)
    engine.step()
    engine.step()
    r2 = engine.submit([7, 9, 11], max_new_tokens=6)
    engine.run_until_idle()
    assert r1.generated == _reference(model, params, [5, 17, 33, 41], 6)
    assert r2.generated == _reference(model, params, [7, 9, 11], 6)


def test_engine_close_releases_buffers(model_params):
    """close() drops every device-buffer reference (params, pool, jitted
    closures) so back-to-back engines fit on one chip — the jitted step
    closures otherwise hold the engine in a reference cycle until a full
    GC pass (at 7B that is ~15 GB still resident when the next engine's
    params load). Idempotent; serving first must not change the result."""
    model, params = model_params
    engine = ServingEngine(model, params, num_slots=2, max_len=64,
                           eos_id=EOS, pad_id=PAD, prompt_bucket=16,
                           page_size=16, cache_dtype=jnp.float32)
    r = engine.submit([5, 17, 33], max_new_tokens=6)
    engine.run_until_idle()
    assert r.done
    engine.close()
    assert engine.cache is None and engine.params is None
    assert engine._prefill is None and engine._decode is None
    assert engine._decode_chunk is None and engine._tokens_dev is None
    engine.close()  # idempotent


@pytest.mark.slow
def test_engine_tensor_sharded_matches_single(model_params):
    """TP serving: params sharded by the logical rules, the paged pool's
    head-packed lane dim sharded over 'tensor', the decoder's paged token
    step running per head-shard via shard_map — outputs match the
    unsharded reference path."""
    model, params = model_params
    if len(jax.devices()) < 2:
        pytest.skip("needs >= 2 devices")
    from merlin_tpu.core.mesh import MeshConfig, create_mesh, get_global_mesh
    from merlin_tpu.core.partitioning import sharding_for_tree

    mesh = create_mesh(MeshConfig(data=1, fsdp=1, tensor=2),
                       devices=jax.devices()[:2])
    abstract = jax.eval_shape(
        lambda: model.init(jax.random.key(0), jnp.ones((1, 4), jnp.int32))
    )["params"]
    logical = nn.get_partition_spec(abstract)
    shardings = sharding_for_tree(logical, mesh)

    engine = ServingEngine(model, params, num_slots=2, max_len=64,
                           eos_id=EOS, pad_id=PAD, prompt_bucket=16,
                           page_size=16, cache_dtype=jnp.float32,
                           mesh=mesh, param_shardings=shardings)
    try:
        assert get_global_mesh() is mesh
        # the pool's lane dim actually landed sharded
        kp = (engine.cache["layers"]["k_pages"]
              if engine._stacked else engine.cache["layers"][0]["k_pages"])
        assert not kp.sharding.is_fully_replicated
        prompts = [[5, 17, 33, 41], [7, 9, 11], [23, 29]]
        reqs = [engine.submit(p, max_new_tokens=6) for p in prompts]
        engine.run_until_idle()
        for req, prompt in zip(reqs, prompts):
            assert req.generated == _reference(model, params, prompt, 6), \
                (prompt, req.generated)
    finally:
        engine.close()
    assert get_global_mesh() is None  # close() restores the global mesh


def test_engine_tp_int8_matches_single(model_params):
    """TP x int8 pools compose: the strided scale-lane layout
    (ops/paged_attention._scale_row) keeps each tensor shard's scale
    lanes aligned with its value-page head lanes, so int8 caches shard
    like bf16 ones. Outputs must equal the single-device int8 path."""
    model, params = model_params
    if len(jax.devices()) < 2:
        pytest.skip("needs >= 2 devices")
    from merlin_tpu.core.mesh import MeshConfig, create_mesh
    from merlin_tpu.core.partitioning import sharding_for_tree

    mesh = create_mesh(MeshConfig(data=1, fsdp=1, tensor=2),
                       devices=jax.devices()[:2])
    abstract = jax.eval_shape(
        lambda: model.init(jax.random.key(0), jnp.ones((1, 4), jnp.int32))
    )["params"]
    logical = nn.get_partition_spec(abstract)
    shardings = sharding_for_tree(logical, mesh)

    engine = ServingEngine(model, params, num_slots=2, max_len=64,
                           eos_id=EOS, pad_id=PAD, prompt_bucket=16,
                           page_size=16, cache_dtype=jnp.int8,
                           mesh=mesh, param_shardings=shardings)
    try:
        ks = (engine.cache["layers"]["k_scales"]
              if engine._stacked else engine.cache["layers"][0]["k_scales"])
        assert not ks.sharding.is_fully_replicated  # scales shard too
        prompts = [[5, 17, 33, 41], [7, 9, 11]]
        reqs = [engine.submit(p, max_new_tokens=6) for p in prompts]
        engine.run_until_idle()
        for req, prompt in zip(reqs, prompts):
            gen = Generator(model, GenerateConfig(
                max_new_tokens=6, eos_id=EOS, pad_id=PAD,
                kv_layout="paged", cache_dtype=jnp.int8, prompt_bucket=16))
            out = gen(params, np.asarray([prompt], np.int32))[0].tolist()
            expected = []
            for t in out:
                expected.append(t)
                if t == EOS:
                    break
            while expected and expected[-1] == PAD:
                expected.pop()
            assert req.generated == expected, (prompt, req.generated)
    finally:
        engine.close()


def test_engine_fail_all_recovers(model_params):
    """A device-path failure mid-serving fails every in-flight request
    with the error sentinel, drains the pool, and the engine serves new
    requests afterwards (the worker loop's recovery path)."""
    model, params = model_params
    engine = ServingEngine(model, params, num_slots=2, max_len=64,
                           eos_id=EOS, pad_id=PAD, prompt_bucket=16,
                           page_size=16, cache_dtype=jnp.float32)
    events = []
    r1 = engine.submit([5, 17, 33], max_new_tokens=6,
                       emit=lambda t, d: events.append((t, d)))
    r2 = engine.submit([7, 9, 11], max_new_tokens=6)   # queued
    engine.step()  # r1 active (r2 admitted too with 2 slots)
    total_free_when_empty = engine.num_slots * engine.pages_per_slot - 1
    engine.fail_all("synthetic device loss")
    assert r1.done and "device loss" in r1.error
    assert r2.done and r2.error
    assert events[-1] == (-1, True)
    assert all(s is None for s in engine.slots)
    # pool fully drained (only the trash page stays pinned)
    assert engine.pool.free_pages == total_free_when_empty

    r3 = engine.submit([5, 17, 33, 41], max_new_tokens=6)
    engine.run_until_idle()
    assert r3.done and not r3.error
    assert r3.generated == _reference(model, params, [5, 17, 33, 41], 6)


def test_engine_int8_chunked_spec_composes(model_params):
    """The serving_full configuration: int8 KV pool + chunked prefill +
    speculative verify windows all composed. int8 pages round the KV, so
    compare against an int8-cache Generator (token-exact at equal
    quantization) rather than the f32 reference."""
    model, params = model_params
    engine = ServingEngine(model, params, num_slots=2, max_len=64,
                           eos_id=EOS, pad_id=PAD, prompt_bucket=16,
                           page_size=8, cache_dtype=jnp.int8,
                           prefill_chunk=8, spec_draft=2, chunk_steps=2)
    prompts = [[5, 17, 33, 41, 5, 17, 33], [7, 9, 11, 7, 9, 11, 7, 9, 11],
               list(range(3, 3 + 21))]
    reqs = [engine.submit(p, max_new_tokens=8) for p in prompts]
    engine.run_until_idle()

    def reference_q8(prompt):
        gen = Generator(model, GenerateConfig(
            max_new_tokens=8, eos_id=EOS, pad_id=PAD,
            kv_layout="paged", cache_dtype=jnp.int8, prompt_bucket=16))
        out = gen(params, np.asarray([prompt], np.int32))[0].tolist()
        trimmed = []
        for t in out:
            trimmed.append(t)
            if t == EOS:
                break
        while trimmed and trimmed[-1] == PAD:
            trimmed.pop()
        return trimmed

    for req, prompt in zip(reqs, prompts):
        assert req.done
        expected = reference_q8(prompt)
        assert req.generated == expected, (prompt, req.generated, expected)
