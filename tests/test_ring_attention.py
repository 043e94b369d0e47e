"""Ring attention (context parallelism over the seq mesh axis) vs the
dense reference, on the 8-device virtual CPU mesh."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from merlin_tpu.core.mesh import MeshConfig, create_mesh
from merlin_tpu.ops.attention import mha_reference
from merlin_tpu.ops.ring_attention import ring_self_attention


def _rand(shape, seed):
    return jnp.asarray(np.random.default_rng(seed).normal(size=shape),
                       jnp.float32)


@pytest.mark.parametrize("causal", [True, False])
def test_ring_matches_dense(eight_devices, causal):
    mesh = create_mesh(MeshConfig(data=1, fsdp=1, seq=4, tensor=2),
                       devices=eight_devices)
    b, s, h, d = 2, 32, 4, 8
    q, k, v = _rand((b, s, h, d), 0), _rand((b, s, h, d), 1), _rand((b, s, h, d), 2)
    ref = mha_reference(q, k, v, causal=causal)
    with mesh:
        out = ring_self_attention(q, k, v, mesh=mesh, causal=causal)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=1e-4)


def test_ring_full_seq_axis(eight_devices):
    mesh = create_mesh(MeshConfig(data=1, fsdp=1, seq=8, tensor=1),
                       devices=eight_devices)
    b, s, h, d = 1, 64, 2, 8
    q, k, v = _rand((b, s, h, d), 3), _rand((b, s, h, d), 4), _rand((b, s, h, d), 5)
    ref = mha_reference(q, k, v, causal=True)
    with mesh:
        out = ring_self_attention(q, k, v, mesh=mesh, causal=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=1e-4)


def test_ring_with_segment_ids(eight_devices):
    mesh = create_mesh(MeshConfig(data=1, fsdp=1, seq=4, tensor=2),
                       devices=eight_devices)
    b, s, h, d = 1, 32, 2, 8
    q, k, v = _rand((b, s, h, d), 6), _rand((b, s, h, d), 7), _rand((b, s, h, d), 8)
    seg = jnp.asarray(np.sort(
        np.random.default_rng(9).integers(0, 3, size=(b, s)), axis=1),
        jnp.int32)
    ref = mha_reference(q, k, v, causal=True, segment_ids_q=seg,
                        segment_ids_kv=seg)
    with mesh:
        out = ring_self_attention(q, k, v, mesh=mesh, causal=True,
                                  segment_ids=seg)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=1e-4)


def test_train_step_on_seq_sharded_mesh(eight_devices):
    """A full training step with the mesh's seq axis active: the attention
    dispatcher routes through ring attention (context parallelism)."""
    from merlin_tpu.core.mesh import set_global_mesh
    from merlin_tpu.models.builder import (
        build_model_tokenizer, init_or_load_params)
    from merlin_tpu.train.arguments import (
        DataArguments, ModelArguments, TrainingArguments)
    from merlin_tpu.train.optimizer import build_optimizer
    from merlin_tpu.train.step import (
        TrainState, make_train_step, stack_microbatches)

    targs = TrainingArguments(
        gradient_checkpointing=False, model_max_length=32,
        num_train_steps=2, learning_rate=1e-3, warmup_ratio=0.0,
        gradient_accumulation_steps=1, per_device_train_batch_size=1)
    bundle = build_model_tokenizer(
        ModelArguments(), DataArguments(image_size=16), targs, tiny=True)
    init_or_load_params(bundle)
    mesh = create_mesh(MeshConfig(data=2, fsdp=1, seq=2, tensor=2),
                       devices=eight_devices)
    set_global_mesh(mesh)
    try:
        tx, _ = build_optimizer(targs, n_vit_layers=2, n_llm_layers=2)
        step_fn = make_train_step(bundle.model, tx, mesh=mesh, donate=False)
        rng = np.random.default_rng(0)
        ids = rng.integers(4, 90, size=(2, 24)).astype(np.int32)
        batch = dict(input_ids=ids, labels=ids.copy(),
                     segment_ids=np.ones_like(ids),
                     attention_mask=np.ones_like(ids),
                     images=rng.integers(0, 255, size=(2, 1, 16, 16, 3))
                     .astype(np.uint8))
        with mesh:
            state = TrainState.create(bundle.params, tx)
            state, metrics = step_fn(state, stack_microbatches(batch, 1))
        assert np.isfinite(float(metrics["loss"]))
    finally:
        set_global_mesh(None)
