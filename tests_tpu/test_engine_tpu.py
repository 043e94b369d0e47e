"""Continuous-batching engine on TPU hardware: the Pallas paged decode
path (head-packed DMA kernel) + pipelined recording, parity vs the
Generator over the same cache layout."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.skipif(
    jax.default_backend() != "tpu", reason="requires TPU hardware")


def test_engine_pallas_paged_matches_generator():
    import dataclasses
    from flax import linen as nn
    from merlin_tpu.generate.decode import GenerateConfig, Generator
    from merlin_tpu.models.decoder import CausalLM
    from merlin_tpu.models.families import tiny
    from merlin_tpu.serve.engine import ServingEngine

    # d=128 so the head-packed kernel gets aligned lane blocks
    cfg = dataclasses.replace(tiny(), num_heads=4, num_kv_heads=4,
                              hidden_size=512, num_layers=2,
                              dtype=jnp.float32)
    model = CausalLM(cfg)
    params = nn.unbox(model.init(jax.random.key(0),
                                 jnp.ones((1, 4), jnp.int32))["params"])

    engine = ServingEngine(model, params, num_slots=2, max_len=512,
                           eos_id=2, pad_id=0, prompt_bucket=128,
                           page_size=128, cache_dtype=jnp.float32,
                           chunk_steps=4, pipeline=2)
    prompts = [list(range(5, 45)), list(range(7, 31))]
    reqs = [engine.submit(p, max_new_tokens=8) for p in prompts]
    engine.run_until_idle()

    for req, prompt in zip(reqs, prompts):
        assert req.done
        gen = Generator(model, GenerateConfig(
            max_new_tokens=8, eos_id=2, pad_id=0, kv_layout="paged",
            cache_dtype=jnp.float32, prompt_bucket=128))
        out = gen(params, np.asarray([prompt], np.int32))[0].tolist()
        expected = []
        for t in out:
            expected.append(t)
            if t == 2:
                break
        while expected and expected[-1] == 0:
            expected.pop()
        assert req.generated == expected, (req.generated, expected)


def _tiny_model():
    import dataclasses
    from flax import linen as nn
    from merlin_tpu.models.decoder import CausalLM
    from merlin_tpu.models.families import tiny

    cfg = dataclasses.replace(tiny(), num_heads=4, num_kv_heads=4,
                              hidden_size=512, num_layers=2,
                              dtype=jnp.float32)
    model = CausalLM(cfg)
    params = nn.unbox(model.init(jax.random.key(0),
                                 jnp.ones((1, 4), jnp.int32))["params"])
    return cfg, model, params


def test_engine_scanned_pallas_matches_loop_on_tpu():
    """The 7B serving configuration in miniature: scan_layers + STACKED
    paged cache, ONE Pallas kernel instance for the stack. Token-exact vs
    the loop-decoder engine (f32: no bf16 argmax tie flips)."""
    import dataclasses
    from merlin_tpu.models.convert import stack_layer_params
    from merlin_tpu.models.decoder import CausalLM
    from merlin_tpu.serve.engine import ServingEngine

    cfg, model, params = _tiny_model()
    scan_model = CausalLM(dataclasses.replace(cfg, scan_layers=True))
    scan_params = stack_layer_params(dict(params), cfg.num_layers)
    prompts = [list(range(5, 45)), list(range(7, 31)), [3, 9, 11, 200]]

    def run(m, p):
        eng = ServingEngine(m, p, num_slots=2, max_len=512, eos_id=2,
                            pad_id=0, prompt_bucket=128, page_size=128,
                            cache_dtype=jnp.float32, chunk_steps=4,
                            pipeline=2)
        reqs = [eng.submit(pr, max_new_tokens=8) for pr in prompts]
        eng.run_until_idle()
        return [r.generated for r in reqs]

    scan_out = run(scan_model, scan_params)
    loop_out = run(model, params)
    assert scan_out == loop_out


def test_engine_int8_pages_on_tpu():
    """int8 paged serving over the scanned stack: quantized write +
    q8 DMA kernel. Outputs must match the Generator on the same int8
    layout (identical math on the kernel path)."""
    import dataclasses
    from merlin_tpu.generate.decode import GenerateConfig, Generator
    from merlin_tpu.models.convert import stack_layer_params
    from merlin_tpu.models.decoder import CausalLM
    from merlin_tpu.serve.engine import ServingEngine

    cfg, model, params = _tiny_model()
    scan_model = CausalLM(dataclasses.replace(cfg, scan_layers=True))
    scan_params = stack_layer_params(dict(params), cfg.num_layers)
    eng = ServingEngine(scan_model, scan_params, num_slots=2, max_len=512,
                        eos_id=2, pad_id=0, prompt_bucket=128,
                        page_size=128, cache_dtype=jnp.int8,
                        chunk_steps=4, pipeline=2)
    prompts = [list(range(5, 45)), list(range(7, 31))]
    reqs = [eng.submit(p, max_new_tokens=8) for p in prompts]
    eng.run_until_idle()
    for req, prompt in zip(reqs, prompts):
        assert req.done
        gen = Generator(scan_model, GenerateConfig(
            max_new_tokens=8, eos_id=2, pad_id=0, kv_layout="paged",
            cache_dtype=jnp.int8, prompt_bucket=128))
        out = gen(scan_params, np.asarray([prompt], np.int32))[0].tolist()
        expected = []
        for t in out:
            expected.append(t)
            if t == 2:
                break
        while expected and expected[-1] == 0:
            expected.pop()
        assert req.generated == expected, (req.generated, expected)


def test_engine_preemption_under_pallas_kernel():
    """Page-pressure preemption while decoding through the Pallas kernel
    (scanned stack): every request still finishes, pool fully drains."""
    import dataclasses
    from merlin_tpu.models.convert import stack_layer_params
    from merlin_tpu.models.decoder import CausalLM
    from merlin_tpu.serve.engine import ServingEngine

    cfg, model, params = _tiny_model()
    scan_model = CausalLM(dataclasses.replace(cfg, scan_layers=True))
    scan_params = stack_layer_params(dict(params), cfg.num_layers)
    # 2 slots x 4 pages - trash = 7 usable pages of 64 tokens
    eng = ServingEngine(scan_model, scan_params, num_slots=2, max_len=256,
                        eos_id=-1, pad_id=0, prompt_bucket=64,
                        page_size=64, cache_dtype=jnp.float32,
                        chunk_steps=4, pipeline=1)
    preempts = []
    orig = eng._preempt_youngest
    eng._preempt_youngest = lambda exclude: (preempts.append(exclude),
                                             orig(exclude))[1]
    prompts = [list(range(5, 165)), list(range(7, 167))]
    reqs = [eng.submit(p, max_new_tokens=60) for p in prompts]
    eng.run_until_idle()
    assert all(r.done for r in reqs)
    assert preempts, "pool was sized to force preemption"
    assert eng.pool.free_pages == 7
    assert all(len(r.generated) == 60 for r in reqs)
