"""Engine-integrated speculative decoding: token-exact vs the plain engine.

VERDICT r3 #1 done-criterion: the speculative engine (prompt-lookup drafts
+ multi-token paged verify windows) must emit EXACTLY the tokens the plain
continuous-batching engine emits for greedy requests — acceptance only
changes how many forwards it takes.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp
from flax import linen as nn

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


def _run(model, params, prompts, max_new, **engine_kw):
    engine_kw.setdefault("cache_dtype", jnp.float32)
    # max_len comfortably above prompt+max_new+chunk margin: the engine
    # conservatively ends requests whose slot could overflow within
    # (1+pipeline) chunks, and spec chunks reserve windows*(k+1) tokens
    engine = ServingEngine(model, params, num_slots=2, max_len=128,
                           eos_id=EOS, pad_id=PAD, prompt_bucket=16,
                           page_size=16, **engine_kw)
    reqs = [engine.submit(p, max_new_tokens=max_new) for p in prompts]
    engine.run_until_idle()
    assert all(r.done for r in reqs)
    return [r.generated for r in reqs]


# prompts with internal repetition so prompt-lookup actually accepts
PROMPTS = [
    [5, 17, 33, 41, 5, 17, 33],
    [7, 9, 11, 7, 9],
    [21, 22, 21, 22, 21],
    [3, 4, 5, 6, 8, 3, 4, 5],
]


@pytest.mark.parametrize("spec_draft,chunk_steps", [(3, 4), (4, 1), (2, 8)])
def test_spec_engine_token_exact(model_params, spec_draft, chunk_steps):
    model, params = model_params
    plain = _run(model, params, PROMPTS, 8, chunk_steps=4)
    spec = _run(model, params, PROMPTS, 8,
                chunk_steps=chunk_steps, spec_draft=spec_draft)
    assert spec == plain


def test_spec_engine_more_requests_than_slots(model_params):
    """Slot recycling + re-admission resets the per-slot history."""
    model, params = model_params
    prompts = PROMPTS + [[11, 12, 13, 11, 12], [9, 9, 9, 9]]
    plain = _run(model, params, prompts, 6, chunk_steps=4)
    spec = _run(model, params, prompts, 6, chunk_steps=2, spec_draft=3)
    assert spec == plain


def test_spec_engine_pipeline_and_preemption_path(model_params):
    """pipeline=1 (token recording lags a chunk) composes with spec."""
    model, params = model_params
    plain = _run(model, params, PROMPTS, 8, chunk_steps=4, pipeline=0)
    spec = _run(model, params, PROMPTS, 8, chunk_steps=2, spec_draft=3,
                pipeline=1)
    assert spec == plain


def test_spec_engine_sampled_slots_ride_along(model_params):
    """temperature>0 requests still complete (1 token/window) next to
    greedy ones; greedy outputs stay exact."""
    model, params = model_params
    engine = ServingEngine(model, params, num_slots=2, max_len=64,
                           eos_id=EOS, pad_id=PAD, prompt_bucket=16,
                           page_size=16, cache_dtype=jnp.float32,
                           chunk_steps=2, spec_draft=3)
    greedy = engine.submit(PROMPTS[0], max_new_tokens=8)
    sampled = engine.submit(PROMPTS[1], max_new_tokens=8, temperature=0.9)
    engine.run_until_idle()
    assert greedy.done and sampled.done
    assert len(sampled.generated) >= 1
    plain = _run(model, params, [PROMPTS[0]], 8, chunk_steps=4)
    assert greedy.generated == plain[0]


def test_spec_engine_scan_layers(model_params):
    """Verify windows compose with the scanned decoder + stacked pool
    (flat-pool table offsets)."""
    import dataclasses

    from merlin_tpu.models.convert import stack_layer_params

    model, params = model_params
    cfg = dataclasses.replace(tiny(), scan_layers=True)
    scan_model = CausalLM(cfg)
    scan_params = stack_layer_params(dict(params), cfg.num_layers)
    plain = _run(model, params, PROMPTS, 8, chunk_steps=4)
    spec = _run(scan_model, scan_params, PROMPTS, 8, chunk_steps=2,
                spec_draft=3)
    assert spec == plain


@pytest.mark.parametrize("tensor", [1, 2])
def test_spec_engine_token_exact_on_mesh(model_params, tensor):
    """Same-prompt spec-vs-plain A/B ON A TP MESH (VERDICT r4 #4): the CPU
    single-device tests prove spec==plain, but the shard_map'd multi-token
    step is a different code path — greedy streams must stay token-exact
    when the pool/params are tensor-sharded."""
    model, params = model_params
    if len(jax.devices()) < tensor:
        pytest.skip("needs >= %d devices" % tensor)
    from merlin_tpu.core.mesh import MeshConfig, create_mesh
    from merlin_tpu.core.partitioning import sharding_for_tree

    mesh = create_mesh(MeshConfig(data=1, fsdp=1, tensor=tensor),
                       devices=jax.devices()[:tensor])
    abstract = jax.eval_shape(
        lambda: model.init(jax.random.key(0), jnp.ones((1, 4), jnp.int32))
    )["params"]
    shardings = sharding_for_tree(nn.get_partition_spec(abstract), mesh)

    outs = []
    for kw in ({"chunk_steps": 4},
               {"chunk_steps": 2, "spec_draft": 3, "prefill_chunk": 8}):
        engine = ServingEngine(model, params, num_slots=2, max_len=128,
                               eos_id=EOS, pad_id=PAD, prompt_bucket=16,
                               page_size=16, cache_dtype=jnp.float32,
                               mesh=mesh, param_shardings=shardings, **kw)
        try:
            reqs = [engine.submit(p, max_new_tokens=8) for p in PROMPTS]
            engine.run_until_idle()
            assert all(r.done for r in reqs)
            outs.append([r.generated for r in reqs])
        finally:
            engine.close()
    assert outs[1] == outs[0], (outs[1], outs[0])


def test_spec_engine_int8_pages(model_params):
    """int8 KV pool + verify windows: completes and stays plausible (the
    quantized cache shifts logits, so token-exactness is vs ITSELF on a
    second run, not vs the float engine)."""
    model, params = model_params
    a = _run(model, params, PROMPTS, 6, chunk_steps=2, spec_draft=3,
             cache_dtype=jnp.int8)
    b = _run(model, params, PROMPTS, 6, chunk_steps=4, spec_draft=2,
             cache_dtype=jnp.int8)
    assert a == b  # window size must not change emitted tokens
