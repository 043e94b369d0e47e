"""Composite-checkpoint loading end-to-end (VERDICT r2 #4 + #8).

The reference prefix-loads the tower (clip_encoder.py:26-62) and ANY
projector kind (base_projector.py:12-48) out of a full model save — a
sharded ``pytorch_model.bin.index.json`` checkpoint holding the LM plus
``model.vision_tower.*`` / ``model.projector.*`` keys. These tests
synthesize exactly that on disk (reference key names, torch tensors,
multi-shard index) and drive the full ``build_model_tokenizer`` →
``init_or_load_params`` path for every projector kind.
"""

import json
import os

import numpy as np
import pytest
import jax.numpy as jnp

torch = pytest.importorskip("torch")

from merlin_tpu.models.builder import build_model_tokenizer, init_or_load_params
from merlin_tpu.train.arguments import (
    DataArguments, ModelArguments, TrainingArguments)


def _r(rng, *shape):
    return rng.normal(scale=0.05, size=shape).astype(np.float32)


def _llama_sd(cfg, rng):
    """Full HF-llama state dict at the tiny geometry."""
    H, I, V = cfg.hidden_size, cfg.intermediate_size, cfg.vocab_size
    hkv_dim = cfg.kv_heads * cfg.head_size
    sd = {
        "model.embed_tokens.weight": _r(rng, V, H),
        "model.norm.weight": _r(rng, H),
        "lm_head.weight": _r(rng, V, H),
    }
    for i in range(cfg.num_layers):
        lb = f"model.layers.{i}."
        sd.update({
            lb + "self_attn.q_proj.weight": _r(rng, H, H),
            lb + "self_attn.k_proj.weight": _r(rng, hkv_dim, H),
            lb + "self_attn.v_proj.weight": _r(rng, hkv_dim, H),
            lb + "self_attn.o_proj.weight": _r(rng, H, H),
            lb + "mlp.gate_proj.weight": _r(rng, I, H),
            lb + "mlp.up_proj.weight": _r(rng, I, H),
            lb + "mlp.down_proj.weight": _r(rng, H, I),
            lb + "input_layernorm.weight": _r(rng, H),
            lb + "post_attention_layernorm.weight": _r(rng, H),
        })
    return sd


def _clip_tower_sd(vit, rng):
    """HF CLIPVisionModel-format keys at the tiny tower geometry,
    prefixed model.vision_tower. like the reference composite save."""
    H, I = vit.hidden_size, vit.intermediate_size
    grid = vit.image_size // vit.patch_size
    npos = grid * grid + (1 if vit.use_class_token else 0)
    sd = {
        "embeddings.class_embedding": _r(rng, H),
        "embeddings.position_embedding.weight": _r(rng, npos, H),
        "embeddings.patch_embedding.weight": _r(
            rng, H, 3, vit.patch_size, vit.patch_size),
        "pre_layrnorm.weight": _r(rng, H),
        "pre_layrnorm.bias": _r(rng, H),
    }
    for i in range(vit.num_layers):
        lb = f"encoder.layers.{i}."
        sd.update({
            lb + "layer_norm1.weight": _r(rng, H),
            lb + "layer_norm1.bias": _r(rng, H),
            lb + "layer_norm2.weight": _r(rng, H),
            lb + "layer_norm2.bias": _r(rng, H),
            lb + "self_attn.q_proj.weight": _r(rng, H, H),
            lb + "self_attn.q_proj.bias": _r(rng, H),
            lb + "self_attn.k_proj.weight": _r(rng, H, H),
            lb + "self_attn.k_proj.bias": _r(rng, H),
            lb + "self_attn.v_proj.weight": _r(rng, H, H),
            lb + "self_attn.v_proj.bias": _r(rng, H),
            lb + "self_attn.out_proj.weight": _r(rng, H, H),
            lb + "self_attn.out_proj.bias": _r(rng, H),
            lb + "mlp.fc1.weight": _r(rng, I, H),
            lb + "mlp.fc1.bias": _r(rng, I),
            lb + "mlp.fc2.weight": _r(rng, H, I),
            lb + "mlp.fc2.bias": _r(rng, H),
        })
    return {"model.vision_tower." + k: v for k, v in sd.items()}


def _projector_sd(kind, cfg, rng):
    """Reference projector state dicts (each module's own key names)."""
    lm_h = cfg.lm.hidden_size
    c = cfg.vit.hidden_size
    if kind == "conv":
        sd = {"conv.weight": _r(rng, lm_h, c, 3, 3), "conv.bias": _r(rng, lm_h)}
    elif kind == "mlp":
        sd = {"projector.weight": _r(rng, lm_h, c),
              "projector.bias": _r(rng, lm_h)}
    elif kind == "qwen":
        sd = {"projector": _r(rng, c, lm_h)}
    elif kind == "sam":
        sd = {"projector.0.weight": _r(rng, 2 * c, c, 3, 3),
              "projector.1.weight": _r(rng, 4 * c, 2 * c, 3, 3),
              "mlp.weight": _r(rng, lm_h, 4 * c),
              "mlp.bias": _r(rng, lm_h)}
    elif kind == "resampler":
        E, nq = c, 256
        sd = {"attn_pool.query": _r(rng, nq, E),
              "attn_pool.pos_embed": _r(rng, nq, E),
              "attn_pool.kv_proj.weight": _r(rng, E, c),
              "attn_pool.ln_q.weight": _r(rng, E),
              "attn_pool.ln_q.bias": _r(rng, E),
              "attn_pool.ln_kv.weight": _r(rng, E),
              "attn_pool.ln_kv.bias": _r(rng, E),
              "attn_pool.attn.in_proj_weight": _r(rng, 3 * E, E),
              "attn_pool.attn.in_proj_bias": _r(rng, 3 * E),
              "attn_pool.attn.out_proj.weight": _r(rng, E, E),
              "attn_pool.attn.out_proj.bias": _r(rng, E),
              "ln_post.weight": _r(rng, E),
              "ln_post.bias": _r(rng, E),
              "proj": _r(rng, E, lm_h)}
    else:
        raise AssertionError(kind)
    return {"model.projector." + k: v for k, v in sd.items()}


def _write_sharded(path, sd, n_shards=2):
    """Write a sharded pytorch_model.bin.index.json checkpoint: keys split
    across shards like a real multi-GB HF save."""
    os.makedirs(path, exist_ok=True)
    keys = sorted(sd)
    weight_map = {}
    for s in range(n_shards):
        shard = f"pytorch_model-{s + 1:05d}-of-{n_shards:05d}.bin"
        chunk = {k: torch.tensor(sd[k]) for k in keys[s::n_shards]}
        torch.save(chunk, os.path.join(path, shard))
        weight_map.update({k: shard for k in chunk})
    with open(os.path.join(path, "pytorch_model.bin.index.json"), "w") as f:
        json.dump({"weight_map": weight_map,
                   "metadata": {"total_size": 0}}, f)


@pytest.mark.parametrize("kind", ["conv", "mlp", "qwen", "sam", "resampler"])
def test_composite_sharded_checkpoint_loads_every_projector(tmp_path, kind):
    rng = np.random.default_rng(7)
    margs = ModelArguments(projector=kind)
    dargs = DataArguments(image_size=16)
    targs = TrainingArguments(gradient_checkpointing=False,
                              model_max_length=64)
    bundle = build_model_tokenizer(margs, dargs, targs, tiny=True)
    cfg = bundle.config

    sd = {}
    sd.update(_llama_sd(cfg.lm, rng))
    sd.update(_clip_tower_sd(cfg.vit, rng))
    proj_sd = _projector_sd(kind, cfg, rng)
    sd.update(proj_sd)
    ckpt = str(tmp_path / "composite")
    _write_sharded(ckpt, sd)

    params = init_or_load_params(bundle, composite_checkpoint=ckpt)

    # LM weights arrived (transposed into the einsum layout)
    np.testing.assert_allclose(
        np.asarray(params["lm"]["layers_0"]["mlp"]["gate_proj"]["kernel"]),
        sd["model.layers.0.mlp.gate_proj.weight"].T, atol=0)
    # tower weights arrived through the prefix re-extraction
    np.testing.assert_allclose(
        np.asarray(params["vision_tower"]["vit"]["pre_norm"]["scale"]),
        sd["model.vision_tower.pre_layrnorm.weight"], atol=0)
    # projector weights arrived — spot-check one leaf per kind bit-exact
    proj = params["projector"]
    if kind == "conv":
        np.testing.assert_allclose(
            np.asarray(proj["conv"]["kernel"]),
            sd["model.projector.conv.weight"].transpose(2, 3, 1, 0), atol=0)
    elif kind == "mlp":
        np.testing.assert_allclose(
            np.asarray(proj["proj"]["kernel"]),
            sd["model.projector.projector.weight"].T, atol=0)
    elif kind == "qwen":
        np.testing.assert_allclose(np.asarray(proj["proj"]),
                                   sd["model.projector.projector"], atol=0)
    elif kind == "sam":
        np.testing.assert_allclose(
            np.asarray(proj["conv1"]["kernel"]),
            sd["model.projector.projector.0.weight"].transpose(2, 3, 1, 0),
            atol=0)
    elif kind == "resampler":
        np.testing.assert_allclose(
            np.asarray(proj["pos_embed"]),
            sd["model.projector.attn_pool.pos_embed"], atol=0)

    # and the loaded tree is structurally complete: a multimodal forward
    # (tower + projector + LM) runs
    ids = jnp.asarray(rng.integers(1, 90, size=(1, 8)), jnp.int32)
    images = jnp.asarray(rng.normal(size=(1, 1, 16, 16, 3)), jnp.float32)
    logits, _ = bundle.model.apply({"params": params}, ids, images=images)
    assert np.isfinite(np.asarray(logits)).all()


def test_composite_load_into_scanned_stack(tmp_path):
    """ModelArguments(scan_layers=True): the checkpoint converts into the
    stacked layers/block layout at load (host-side stacking — the serving
    path's one-kernel-instance decoder), with logits identical to the
    loop-decoder load."""
    import jax.numpy as jnp

    rng = np.random.default_rng(9)
    dargs = DataArguments(image_size=16)
    targs = TrainingArguments(gradient_checkpointing=False,
                              model_max_length=64)
    loop_b = build_model_tokenizer(
        ModelArguments(projector="conv"), dargs, targs, tiny=True)
    scan_b = build_model_tokenizer(
        ModelArguments(projector="conv", scan_layers=True), dargs, targs,
        tiny=True)
    assert scan_b.config.lm.scan_layers

    sd = {}
    sd.update(_llama_sd(loop_b.config.lm, rng))
    sd.update(_clip_tower_sd(loop_b.config.vit, rng))
    sd.update(_projector_sd("conv", loop_b.config, rng))
    ckpt = str(tmp_path / "composite")
    _write_sharded(ckpt, sd)

    p_loop = init_or_load_params(loop_b, composite_checkpoint=ckpt)
    p_scan = init_or_load_params(scan_b, composite_checkpoint=ckpt)
    qk = p_scan["lm"]["layers"]["block"]["attn"]["q_proj"]["kernel"]
    assert qk.shape[0] == scan_b.config.lm.num_layers

    ids = jnp.asarray(rng.integers(1, 90, size=(1, 8)), jnp.int32)
    a, _ = loop_b.model.apply({"params": p_loop}, ids)
    b, _ = scan_b.model.apply({"params": p_scan}, ids)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_composite_single_file_checkpoint(tmp_path):
    """The single-file pytorch_model.bin form loads through the same path
    (reference clip_encoder.py:50-62 fallback branch)."""
    rng = np.random.default_rng(8)
    margs = ModelArguments(projector="conv")
    dargs = DataArguments(image_size=16)
    targs = TrainingArguments(gradient_checkpointing=False,
                              model_max_length=64)
    bundle = build_model_tokenizer(margs, dargs, targs, tiny=True)
    sd = {}
    sd.update(_llama_sd(bundle.config.lm, rng))
    sd.update(_projector_sd("conv", bundle.config, rng))
    ckpt = tmp_path / "single"
    ckpt.mkdir()
    torch.save({k: torch.tensor(v) for k, v in sd.items()},
               ckpt / "pytorch_model.bin")
    params = init_or_load_params(bundle, composite_checkpoint=str(ckpt))
    np.testing.assert_allclose(
        np.asarray(params["projector"]["conv"]["bias"]),
        sd["model.projector.conv.bias"], atol=0)
