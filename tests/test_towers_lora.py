"""SAM ViTDet parity vs HF SamModel, tower dispatch, and functional LoRA."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp
from flax import linen as nn

from merlin_tpu.models.sam_vit import (
    SAMImageEncoder, SAMViTConfig, sam_params_from_torch, tiny_sam,
    window_partition, window_unpartition)
from merlin_tpu.models.vision_builder import (
    build_vision_tower, default_vision_config, vision_kind_from_name)


def test_window_partition_roundtrip():
    x = jnp.asarray(np.random.default_rng(0).normal(size=(2, 10, 12, 4)),
                    jnp.float32)
    windows, pad_hw = window_partition(x, 4)
    back = window_unpartition(windows, 4, pad_hw, (10, 12))
    np.testing.assert_allclose(np.asarray(back), np.asarray(x))


def _hf_to_official(sd):
    """HF SamVisionEncoder names -> official SAM names the converter expects."""
    out = {}
    for k, v in sd.items():
        k = k.replace("neck.conv1", "neck.0").replace("neck.layer_norm1", "neck.1")
        k = k.replace("neck.conv2", "neck.2").replace("neck.layer_norm2", "neck.3")
        k = k.replace("layers.", "blocks.")
        k = k.replace("patch_embed.projection", "patch_embed.proj")
        k = k.replace("layer_norm1", "norm1").replace("layer_norm2", "norm2")
        out[k] = v
    return out


def test_sam_parity_vs_hf():
    import torch
    from transformers import SamVisionConfig
    from transformers.models.sam.modeling_sam import SamVisionEncoder

    torch.manual_seed(0)
    hf_cfg = SamVisionConfig(
        hidden_size=16, num_hidden_layers=2, num_attention_heads=2,
        image_size=32, patch_size=4, window_size=4,
        global_attn_indexes=[1], use_rel_pos=True, output_channels=8,
        mlp_ratio=4.0, layer_norm_eps=1e-6, use_abs_pos=True)
    hf = SamVisionEncoder(hf_cfg).eval()

    cfg = tiny_sam()
    params = jax.tree.map(
        jnp.asarray,
        sam_params_from_torch(_hf_to_official(hf.state_dict()), cfg))
    pixels = np.random.default_rng(0).normal(size=(2, 32, 32, 3)).astype(np.float32)
    ours = SAMImageEncoder(cfg).apply({"params": params}, jnp.asarray(pixels))

    with torch.no_grad():
        theirs = hf(torch.tensor(pixels.transpose(0, 3, 1, 2))).last_hidden_state
    theirs = theirs.permute(0, 2, 3, 1).reshape(2, -1, cfg.out_chans).numpy()
    np.testing.assert_allclose(np.asarray(ours), theirs, atol=5e-4, rtol=5e-3)


def test_vision_kind_dispatch():
    assert vision_kind_from_name("openai/clip-vit-large-patch14") == "clip"
    assert vision_kind_from_name("Qwen-VL-vision") == "qwen"
    assert vision_kind_from_name("facebook/sam-vit-base") == "sam"
    assert vision_kind_from_name("metaclip-h14") == "metaclip"


def test_tower_builder_shapes():
    from merlin_tpu.models.vit import tiny_vit

    tower = build_vision_tower("clip", tiny_vit())
    pixels = jnp.ones((1, 16, 16, 3))
    variables = tower.init(jax.random.key(0), pixels)
    out = tower.apply(variables, pixels)
    assert out.shape == (1, 16, 32)

    sam = build_vision_tower("sam", tiny_sam())
    pixels = jnp.ones((1, 32, 32, 3))
    variables = sam.init(jax.random.key(0), pixels)
    out = sam.apply(variables, pixels)
    assert out.shape == (1, 64, 8)


# --- LoRA ---------------------------------------------------------------

def _tiny_bundle():
    from merlin_tpu.models.builder import (
        build_model_tokenizer, init_or_load_params)
    from merlin_tpu.train.arguments import (
        DataArguments, ModelArguments, TrainingArguments)

    bundle = build_model_tokenizer(
        ModelArguments(), DataArguments(image_size=16),
        TrainingArguments(gradient_checkpointing=False, model_max_length=64),
        tiny=True)
    init_or_load_params(bundle)
    return bundle


def test_lora_targets_and_zero_init_identity():
    from merlin_tpu.train.lora import (
        find_lora_targets, init_lora_params, merge_lora)

    bundle = _tiny_bundle()
    targets = find_lora_targets(bundle.params)
    assert any("attn/q_proj/kernel" in t for t in targets)
    assert all(t.startswith("lm/") for t in targets)
    assert not any("lm_head" in t for t in targets)

    lora = init_lora_params(bundle.params, rank=4)
    merged = merge_lora(bundle.params, lora, rank=4, alpha=16)
    # b is zero-init: merged == base exactly
    q0 = bundle.params["lm"]["layers_0"]["attn"]["q_proj"]["kernel"]
    np.testing.assert_array_equal(
        np.asarray(merged["lm"]["layers_0"]["attn"]["q_proj"]["kernel"]),
        np.asarray(q0))


def test_lora_training_moves_only_factors():
    import optax
    from merlin_tpu.train.lora import init_lora_params, make_lora_loss_fn

    bundle = _tiny_bundle()
    lora = init_lora_params(bundle.params, rank=2)
    loss_fn = make_lora_loss_fn(bundle.model, bundle.params, rank=2, alpha=8)

    rng = np.random.default_rng(0)
    ids = rng.integers(4, 90, size=(2, 12)).astype(np.int32)
    batch = dict(input_ids=ids, labels=ids,
                 segment_ids=np.ones_like(ids),
                 attention_mask=np.ones_like(ids), images=None)
    batch = {k: v for k, v in batch.items() if v is not None}

    tx = optax.adam(1e-2)
    state = tx.init(lora)
    loss0 = float(loss_fn(lora, batch))
    for _ in range(5):
        grads = jax.grad(loss_fn)(lora, batch)
        updates, state = tx.update(grads, state)
        lora = optax.apply_updates(lora, updates)
    loss1 = float(loss_fn(lora, batch))
    assert loss1 < loss0
    # factors actually moved
    first = sorted(lora)[0]
    assert np.abs(np.asarray(lora[first]["b"])).max() > 0


def test_qwen_tower_with_resampler_end_to_end():
    """vision_kind='qwen' + resampler projector through MMGPT."""
    import dataclasses
    import jax
    import jax.numpy as jnp
    from merlin_tpu.models.families import tiny as tiny_lm
    from merlin_tpu.models.mmgpt import MMGPT, MMGPTConfig
    from merlin_tpu.models.vit import tiny_vit

    vit = dataclasses.replace(tiny_vit(), use_class_token=False)
    cfg = MMGPTConfig(lm=tiny_lm(), vit=vit, projector="resampler",
                      vision_kind="qwen", image_patch_id=100,
                      im_start_id=101, im_end_id=102)
    assert cfg.image_token_len == 256
    model = MMGPT(cfg)
    ids = jnp.ones((1, 8), jnp.int32)
    images = jnp.zeros((1, 1, 16, 16, 3), jnp.float32)
    variables = model.init(jax.random.key(0), ids, images=images)
    logits, _ = model.apply(variables, ids, images=images)
    assert logits.shape == (1, 8, cfg.lm.vocab_size)


def test_sincos2d_positions():
    import dataclasses
    import jax
    import jax.numpy as jnp
    from merlin_tpu.models.vit import ViT, tiny_vit

    cfg = dataclasses.replace(tiny_vit(), use_class_token=False,
                              pos_embed="sincos2d")
    model = ViT(cfg)
    pixels = jnp.ones((1, 16, 16, 3))
    variables = model.init(jax.random.key(0), pixels)
    assert "position_embedding" not in variables["params"]
    out = model.apply(variables, pixels)
    assert out[-1].shape == (1, cfg.num_patches, cfg.hidden_size)
    # positions are non-trivial: two different patches differ pre-attention
    h0 = out[0]
    assert float(jnp.abs(h0[0, 0] - h0[0, 1]).max()) > 0
