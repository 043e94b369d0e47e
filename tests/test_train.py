"""End-to-end training tests on the 8-device virtual mesh: loss decreases,
freeze semantics hold, LLRD scales apply, checkpoint roundtrip works."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from merlin_tpu.core.mesh import MeshConfig, create_mesh
from merlin_tpu.models.builder import build_model_tokenizer, init_or_load_params
from merlin_tpu.train.arguments import (
    DataArguments, ModelArguments, TrainingArguments)
from merlin_tpu.train.optimizer import (
    build_optimizer, lr_scale_for_path, weight_decay_mask)
from merlin_tpu.train.step import TrainState, make_train_step, stack_microbatches
from merlin_tpu.train.trainer import Trainer
from merlin_tpu.train.checkpoint import (
    latest_checkpoint, restore_checkpoint, save_checkpoint)


def _bundle(**kw):
    margs = ModelArguments(**kw)
    dargs = DataArguments(image_size=16)
    targs = TrainingArguments(
        gradient_checkpointing=False, model_max_length=32,
        num_train_steps=4, learning_rate=1e-2, warmup_ratio=0.25,
        gradient_accumulation_steps=2, per_device_train_batch_size=1,
        logging_steps=1, save_steps=0, mesh_data=2, mesh_fsdp=2,
        mesh_tensor=2)
    bundle = build_model_tokenizer(margs, dargs, targs, tiny=True)
    init_or_load_params(bundle)
    return bundle, targs


def _fake_batch(bundle, b=4, s=24, n_img=1, seed=0):
    rng = np.random.default_rng(seed)
    ids = rng.integers(4, 90, size=(b, s)).astype(np.int32)
    tok_len = bundle.config.image_token_len
    ids[:, 1] = bundle.config.im_start_id
    ids[:, 2:2 + tok_len] = bundle.config.image_patch_id
    ids[:, 2 + tok_len] = bundle.config.im_end_id
    labels = ids.copy()
    labels[:, :2 + tok_len + 1] = -100
    return dict(
        input_ids=ids, labels=labels,
        segment_ids=np.ones((b, s), np.int32),
        attention_mask=np.ones((b, s), np.int32),
        images=rng.integers(0, 255, size=(b, n_img, 16, 16, 3)).astype(np.uint8))


@pytest.mark.slow
def test_train_step_loss_decreases(eight_devices):
    bundle, targs = _bundle()
    mesh = create_mesh(MeshConfig(data=2, fsdp=2, tensor=2),
                       devices=eight_devices)
    tx, _ = build_optimizer(targs, n_vit_layers=2, n_llm_layers=2,
                            trainable_fn=bundle.trainable_mask,
                            embed_row_mask=bundle.embed_row_trainable)
    step_fn = make_train_step(bundle.model, tx, mesh=mesh, donate=False)
    with mesh:
        state = TrainState.create(bundle.params, tx)
        batch = stack_microbatches(_fake_batch(bundle), 2)
        losses = []
        for _ in range(5):
            state, metrics = step_fn(state, batch)
            losses.append(float(metrics["loss"]))
    assert all(np.isfinite(losses))
    assert losses[-1] < losses[0]


def test_frozen_params_do_not_move(eight_devices):
    bundle, targs = _bundle(freeze_vision_tower=True, freeze_lm_model=True)
    mesh = create_mesh(MeshConfig(data=2, fsdp=2, tensor=2),
                       devices=eight_devices)
    tx, _ = build_optimizer(targs, n_vit_layers=2, n_llm_layers=2,
                            trainable_fn=bundle.trainable_mask,
                            embed_row_mask=bundle.embed_row_trainable)
    # structural freeze: stop_gradient the frozen subtrees so their
    # backward is never computed (what the Trainer wires)
    step_fn = make_train_step(bundle.model, tx, mesh=mesh, donate=False,
                              trainable_fn=bundle.trainable_mask)
    with mesh:
        state = TrainState.create(bundle.params, tx)
        before_tower = np.asarray(
            state.params["vision_tower"]["vit"]["layers_0"]["q_proj"]["kernel"])
        before_lm = np.asarray(
            state.params["lm"]["layers_0"]["attn"]["q_proj"]["kernel"])
        before_embed = np.asarray(
            state.params["lm"]["embed_tokens"]["embedding"])
        # two steps: warmup lr is 0 at step 0
        state, _ = step_fn(state, stack_microbatches(_fake_batch(bundle), 2))
        state, _ = step_fn(state, stack_microbatches(_fake_batch(bundle), 2))
    np.testing.assert_array_equal(
        np.asarray(state.params["vision_tower"]["vit"]["layers_0"]["q_proj"]["kernel"]),
        before_tower)
    np.testing.assert_array_equal(
        np.asarray(state.params["lm"]["layers_0"]["attn"]["q_proj"]["kernel"]),
        before_lm)
    after_embed = np.asarray(state.params["lm"]["embed_tokens"]["embedding"])
    mask = bundle.embed_row_trainable.astype(bool)
    np.testing.assert_array_equal(after_embed[~mask], before_embed[~mask])
    # new-token rows (the image special tokens, present in the batch) moved
    assert np.abs(after_embed[mask] - before_embed[mask]).max() > 0


def test_projector_trains_when_rest_frozen(eight_devices):
    bundle, targs = _bundle(freeze_vision_tower=True, freeze_lm_model=True,
                            tune_im_start_end=False)
    mesh = create_mesh(MeshConfig(data=2, fsdp=2, tensor=2),
                       devices=eight_devices)
    tx, _ = build_optimizer(targs, n_vit_layers=2, n_llm_layers=2,
                            trainable_fn=bundle.trainable_mask)
    step_fn = make_train_step(bundle.model, tx, mesh=mesh, donate=False,
                              trainable_fn=bundle.trainable_mask)
    with mesh:
        state = TrainState.create(bundle.params, tx)
        before = np.asarray(state.params["projector"]["conv"]["kernel"])
        state, _ = step_fn(state, stack_microbatches(_fake_batch(bundle), 2))
        state, _ = step_fn(state, stack_microbatches(_fake_batch(bundle), 2))
    assert np.abs(np.asarray(
        state.params["projector"]["conv"]["kernel"]) - before).max() > 0


@pytest.mark.slow
def test_structural_freeze_matches_optax_freeze(eight_devices):
    """stop_gradient freezing (skips the frozen backward entirely) must
    produce bit-identical updates to optax-only set_to_zero freezing:
    multi_transform partitions per label, so the train group's clipping
    never saw frozen grads either."""
    bundle, targs = _bundle(freeze_vision_tower=True)
    mesh = create_mesh(MeshConfig(data=2, fsdp=2, tensor=2),
                       devices=eight_devices)
    tx, _ = build_optimizer(targs, n_vit_layers=2, n_llm_layers=2,
                            trainable_fn=bundle.trainable_mask,
                            embed_row_mask=bundle.embed_row_trainable)
    batch = stack_microbatches(_fake_batch(bundle), 2)
    outs = []
    for fn in (None, bundle.trainable_mask):
        step_fn = make_train_step(bundle.model, tx, mesh=mesh,
                                  donate=False, trainable_fn=fn)
        with mesh:
            state = TrainState.create(bundle.params, tx)
            state, _ = step_fn(state, batch)
            state, m = step_fn(state, batch)
        outs.append((jax.tree.map(np.asarray, state.params),
                     float(m["loss"])))
    (p_opt, l_opt), (p_stop, l_stop) = outs
    assert l_opt == pytest.approx(l_stop, rel=1e-5)
    flat_a = jax.tree_util.tree_leaves_with_path(p_opt)
    flat_b = jax.tree_util.tree_leaves_with_path(p_stop)
    for (pa, a), (_, b) in zip(flat_a, flat_b):
        np.testing.assert_allclose(a, b, atol=1e-6, err_msg=str(pa))


def test_llrd_scales():
    # ViT: layer i of 24 -> 0.9**(24-i-2); non-layer vision -> 0.1
    assert np.isclose(
        lr_scale_for_path(("vision_tower", "vit", "layers_0", "k"),
                          llrd=True, llm_llrd=False, n_vit_layers=24,
                          n_llm_layers=32), 0.9 ** 22)
    assert lr_scale_for_path(("vision_tower", "vit", "pre_norm", "scale"),
                             llrd=True, llm_llrd=False, n_vit_layers=24,
                             n_llm_layers=32) == 0.1
    # LLM: layer 31 of 32 -> 1.0
    assert lr_scale_for_path(("lm", "layers_31", "attn"), llrd=False,
                             llm_llrd=True, n_vit_layers=24,
                             n_llm_layers=32) == 0.931 ** 0
    assert lr_scale_for_path(("lm", "embed_tokens", "embedding"), llrd=True,
                             llm_llrd=True, n_vit_layers=24,
                             n_llm_layers=32) == 1.0


def test_weight_decay_mask():
    params = {"w": np.zeros((3, 3)), "bias": np.zeros(3),
              "norm": {"scale": np.zeros(3)}}
    mask = weight_decay_mask(params)
    assert mask["w"] and not mask["bias"] and not mask["norm"]["scale"]


def test_checkpoint_roundtrip(tmp_path, eight_devices):
    bundle, targs = _bundle()
    tx, _ = build_optimizer(targs, n_vit_layers=2, n_llm_layers=2)
    state = TrainState.create(bundle.params, tx)
    path = save_checkpoint(str(tmp_path), 7, state,
                           data_state={"step": 7}, save_total_limit=2)
    assert latest_checkpoint(str(tmp_path)) == path
    abstract = jax.eval_shape(lambda: state)
    restored, ds = restore_checkpoint(path, abstract)
    assert ds == {"step": 7}
    np.testing.assert_array_equal(
        np.asarray(restored.params["lm"]["embed_tokens"]["embedding"]),
        np.asarray(state.params["lm"]["embed_tokens"]["embedding"]))


def test_checkpoint_rotation(tmp_path):
    bundle, targs = _bundle()
    tx, _ = build_optimizer(targs, n_vit_layers=2, n_llm_layers=2)
    state = TrainState.create(bundle.params, tx)
    for step in (1, 2, 3):
        save_checkpoint(str(tmp_path), step, state, save_total_limit=2)
    from merlin_tpu.train.checkpoint import list_checkpoints
    steps = [s for s, _ in list_checkpoints(str(tmp_path))]
    assert steps == [2, 3]
