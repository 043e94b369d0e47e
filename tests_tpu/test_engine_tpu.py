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
