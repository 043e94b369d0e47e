"""scan_layers: the nn.scan'd layer stack must match the loop decoder
bit-for-bit given stacked weights, and train end-to-end.

Why it exists: each Pallas kernel instance costs ~12 s in this env's AOT
compile helper, so a 32-layer loop decoder pays ~6 minutes of compile per
jit signature; the scanned stack compiles ONE block regardless of depth.
"""

import dataclasses

import numpy as np
import pytest
import jax
import jax.numpy as jnp
from flax import linen as nn

from merlin_tpu.models.convert import (
    stack_layer_params, unstack_layer_params)
from merlin_tpu.models.decoder import CausalLM, cross_entropy_loss
from merlin_tpu.models.families import tiny


def _params(model, ids):
    return nn.unbox(model.init(jax.random.key(0), ids)["params"])


def test_scan_layers_matches_loop():
    cfg = tiny()
    ids = jnp.asarray(np.random.default_rng(0).integers(3, 90, (2, 16)),
                      jnp.int32)
    loop = CausalLM(cfg)
    p_loop = _params(loop, ids)
    logits_loop, _ = loop.apply({"params": p_loop}, ids)

    scan = CausalLM(dataclasses.replace(cfg, scan_layers=True))
    p_scan = stack_layer_params(dict(p_loop), cfg.num_layers)
    logits_scan, _ = scan.apply({"params": p_scan}, ids)
    np.testing.assert_allclose(np.asarray(logits_scan),
                               np.asarray(logits_loop), atol=1e-5)

    # roundtrip back to the loop layout
    back = unstack_layer_params(p_scan)
    logits_back, _ = loop.apply({"params": back}, ids)
    np.testing.assert_allclose(np.asarray(logits_back),
                               np.asarray(logits_loop), atol=0)


def test_scan_layers_init_tree_shape():
    """Fresh init produces the stacked tree directly (leading layers axis),
    and remat composes."""
    cfg = dataclasses.replace(tiny(), scan_layers=True, remat=True)
    model = CausalLM(cfg)
    ids = jnp.ones((1, 8), jnp.int32)
    p = nn.unbox(model.init(jax.random.key(0), ids)["params"])
    qk = p["layers"]["block"]["attn"]["q_proj"]["kernel"]
    assert qk.shape[0] == cfg.num_layers
    # gradients flow through the scanned stack
    def loss(p):
        logits, _ = model.apply({"params": p}, ids)
        return cross_entropy_loss(logits, ids)[0]
    g = jax.grad(loss)(p)
    gn = sum(float(jnp.abs(x).sum()) for x in jax.tree_util.tree_leaves(g))
    assert np.isfinite(gn) and gn > 0


def test_scan_layers_trains_on_sharded_mesh():
    """The scanned stack under dp2 x fsdp2 x tp2: stacked params take the
    ('layers', ...) logical axes and the step executes on the mesh — the
    multichip case scan_layers exists for (deep-model compile times)."""
    from merlin_tpu.core.mesh import MeshConfig, create_mesh, set_global_mesh
    from merlin_tpu.train.arguments import TrainingArguments
    from merlin_tpu.train.optimizer import build_optimizer
    from merlin_tpu.train.step import TrainState, make_train_step

    devices = jax.devices()[:8]
    if len(devices) < 8:
        pytest.skip("needs 8 virtual devices")
    cfg = dataclasses.replace(tiny(), scan_layers=True, remat=True)
    model = CausalLM(cfg)
    ids = jnp.asarray(np.random.default_rng(0).integers(3, 90, (4, 16)),
                      jnp.int32)
    params = model.init(jax.random.key(0), ids[:1])["params"]
    mesh = create_mesh(MeshConfig(data=2, fsdp=2, tensor=2),
                       devices=devices)
    set_global_mesh(mesh)
    try:
        targs = TrainingArguments(learning_rate=1e-3, warmup_ratio=0.0,
                                  num_train_steps=2)
        tx, _ = build_optimizer(targs, n_vit_layers=0,
                                n_llm_layers=cfg.num_layers)

        class _M:
            # make_train_step expects the MMGPT interface:
            # apply(..., labels=...) -> (logits, cache, loss)
            def apply(self, variables, input_ids, **kw):
                logits, cache = model.apply(
                    variables, input_ids, segment_ids=kw.get("segment_ids"))
                loss, _ = cross_entropy_loss(logits, kw["labels"])
                return logits, cache, loss

        step_fn = make_train_step(_M(), tx, mesh=mesh, donate=False)
        batch = dict(input_ids=np.asarray(ids), labels=np.asarray(ids),
                     segment_ids=np.ones((4, 16), np.int32),
                     attention_mask=np.ones((4, 16), np.int32))
        batch = {k: v[None] for k, v in batch.items()}  # 1 microbatch
        with mesh:
            state = TrainState.create(nn.unbox(params), tx)
            state, metrics = step_fn(state, batch)
            assert np.isfinite(float(metrics["loss"]))
    finally:
        set_global_mesh(None)


def test_scan_layers_rejects_unstacked_cache():
    from merlin_tpu.models.decoder import init_kv_cache

    cfg = dataclasses.replace(tiny(), scan_layers=True)
    model = CausalLM(cfg)
    ids = jnp.ones((1, 8), jnp.int32)
    p = nn.unbox(model.init(jax.random.key(0), ids)["params"])
    cache = init_kv_cache(tiny(), 1, max_len=16, stacked=False)
    with pytest.raises(ValueError, match="STACKED"):
        model.apply({"params": p}, ids, kv_cache=cache)


@pytest.mark.parametrize("layout", ["dense", "paged"])
def test_scan_decode_matches_loop(layout):
    """Scanned decode over a STACKED KV cache (the 7B serving path: one
    paged-attention kernel instance for the whole stack) must match the
    loop decoder token-for-token: prefill + several decode steps."""
    from merlin_tpu.models.decoder import init_kv_cache

    cfg = tiny()
    rng = np.random.default_rng(1)
    b, s, steps = 2, 12, 5
    ids = jnp.asarray(rng.integers(3, 90, (b, s)), jnp.int32)
    mask = np.ones((b, s), np.int32)
    mask[1, 9:] = 0   # ragged prompt
    mask = jnp.asarray(mask)

    loop = CausalLM(cfg)
    p_loop = _params(loop, ids)
    scan = CausalLM(dataclasses.replace(cfg, scan_layers=True))
    p_scan = stack_layer_params(dict(p_loop), cfg.num_layers)

    def run(model, params, stacked):
        cache = init_kv_cache(cfg, b, max_len=s + steps, layout=layout,
                              stacked=stacked)
        positions = jnp.broadcast_to(jnp.arange(s), (b, s))
        logits, cache = model.apply(
            {"params": params}, ids, segment_ids=mask, positions=positions,
            kv_cache=cache)
        lengths = mask.sum(axis=1).astype(jnp.int32)
        nxt = jnp.take_along_axis(
            logits, (lengths - 1)[:, None, None], axis=1)[:, 0]
        toks = [jnp.argmax(nxt, axis=-1).astype(jnp.int32)]
        pos = lengths
        for _ in range(steps - 1):
            if layout == "paged":
                pos = cache["lengths"]
            logits, cache = model.apply(
                {"params": params}, toks[-1][:, None],
                positions=pos[:, None], kv_cache=cache)
            if layout == "dense":
                pos = pos + 1
            toks.append(jnp.argmax(logits[:, 0], -1).astype(jnp.int32))
        return np.stack([np.asarray(t) for t in toks], 1)

    out_loop = run(loop, p_loop, stacked=False)
    out_scan = run(scan, p_scan, stacked=True)
    np.testing.assert_array_equal(out_scan, out_loop)
