"""Real-checkpoint-layout smoke tests (VERDICT r3 #8).

The composite tests cover the multi-shard ``pytorch_model.bin.index.json``
happy path; these cover the remaining shapes a real Vicuna/Baichuan/CLIP
download can take before first production contact:

  * tied word embeddings (no ``lm_head.weight`` key at all — Baichuan-7B
    and many small HF saves),
  * vocab-resized loads where the model grew special tokens past the
    checkpoint's vocab (mean-init rows, reference base_mmgpt.py:62-76) —
    including the NormHead bare-kernel head (Baichuan2,
    baichuan2_7b/modeling_baichuan.py:495-502),
  * the ``model.safetensors.index.json`` sharded-safetensors layout newer
    HF snapshots ship instead of torch .bin shards.
"""

import dataclasses
import json
import os

import numpy as np
import pytest
import jax.numpy as jnp

torch = pytest.importorskip("torch")

from merlin_tpu.models.builder import build_model_tokenizer, init_or_load_params
from merlin_tpu.models.convert import load_torch_state_dict
from merlin_tpu.models.mmgpt import MMGPT
from merlin_tpu.train.arguments import (
    DataArguments, ModelArguments, TrainingArguments)


def _r(rng, *shape):
    return rng.normal(scale=0.05, size=shape).astype(np.float32)


def _tiny_bundle(**lm_overrides):
    margs = ModelArguments(projector="mlp")
    dargs = DataArguments(image_size=16)
    targs = TrainingArguments(gradient_checkpointing=False,
                              model_max_length=64)
    bundle = build_model_tokenizer(margs, dargs, targs, tiny=True)
    if lm_overrides:
        lm_cfg = dataclasses.replace(bundle.config.lm, **lm_overrides)
        bundle.config = dataclasses.replace(bundle.config, lm=lm_cfg)
        bundle.model = MMGPT(bundle.config)
    return bundle


def _llama_sd(cfg, rng, *, vocab, tied):
    H, I = cfg.hidden_size, cfg.intermediate_size
    hkv_dim = cfg.kv_heads * cfg.head_size
    sd = {"model.embed_tokens.weight": _r(rng, vocab, H),
          "model.norm.weight": _r(rng, H)}
    if not tied:
        sd["lm_head.weight"] = _r(rng, vocab, H)
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


def _baichuan_sd(cfg, rng, *, vocab):
    """Baichuan2-style: fused W_pack QKV + bare lm_head (NormHead)."""
    H, I = cfg.hidden_size, cfg.intermediate_size
    sd = {"model.embed_tokens.weight": _r(rng, vocab, H),
          "model.norm.weight": _r(rng, H),
          "lm_head.weight": _r(rng, vocab, H)}
    for i in range(cfg.num_layers):
        lb = f"model.layers.{i}."
        sd.update({
            lb + "self_attn.W_pack.weight": _r(rng, 3 * H, H),
            lb + "self_attn.o_proj.weight": _r(rng, H, H),
            lb + "mlp.gate_proj.weight": _r(rng, I, H),
            lb + "mlp.up_proj.weight": _r(rng, I, H),
            lb + "mlp.down_proj.weight": _r(rng, H, I),
            lb + "input_layernorm.weight": _r(rng, H),
            lb + "post_attention_layernorm.weight": _r(rng, H),
        })
    return sd


def _write_bin_sharded(path, sd, n_shards=2):
    os.makedirs(path, exist_ok=True)
    keys = sorted(sd)
    weight_map = {}
    total = sum(v.nbytes for v in sd.values())
    for s in range(n_shards):
        shard = f"pytorch_model-{s + 1:05d}-of-{n_shards:05d}.bin"
        chunk = {k: torch.tensor(sd[k]) for k in keys[s::n_shards]}
        torch.save(chunk, os.path.join(path, shard))
        weight_map.update({k: shard for k in chunk})
    with open(os.path.join(path, "pytorch_model.bin.index.json"), "w") as f:
        json.dump({"metadata": {"total_size": total},
                   "weight_map": weight_map}, f)


def _write_safetensors_sharded(path, sd, n_shards=2):
    from safetensors.numpy import save_file

    os.makedirs(path, exist_ok=True)
    keys = sorted(sd)
    weight_map = {}
    total = sum(v.nbytes for v in sd.values())
    for s in range(n_shards):
        shard = f"model-{s + 1:05d}-of-{n_shards:05d}.safetensors"
        chunk = {k: sd[k] for k in keys[s::n_shards]}
        save_file(chunk, os.path.join(path, shard))
        weight_map.update({k: shard for k in chunk})
    with open(os.path.join(path, "model.safetensors.index.json"), "w") as f:
        json.dump({"metadata": {"total_size": total},
                   "weight_map": weight_map}, f)


def test_tied_embeddings_resized_load(tmp_path):
    """No lm_head.weight in the checkpoint; model vocab > checkpoint
    vocab. Embedding grows with mean-init rows and the tied head follows
    automatically."""
    rng = np.random.default_rng(3)
    bundle = _tiny_bundle(tie_word_embeddings=True)
    cfg = bundle.config.lm
    ck_vocab = cfg.vocab_size - 8   # checkpoint predates 8 added tokens
    sd = _llama_sd(cfg, rng, vocab=ck_vocab, tied=True)
    ckpt = str(tmp_path / "tied")
    _write_bin_sharded(ckpt, sd)

    params = init_or_load_params(bundle, lm_checkpoint=ckpt)
    emb = np.asarray(params["lm"]["embed_tokens"]["embedding"])
    assert emb.shape == (cfg.vocab_size, cfg.hidden_size)
    np.testing.assert_allclose(emb[:ck_vocab],
                               sd["model.embed_tokens.weight"], atol=0)
    # new rows are the mean of the checkpoint rows
    np.testing.assert_allclose(
        emb[ck_vocab:],
        np.broadcast_to(sd["model.embed_tokens.weight"].mean(0),
                        (8, cfg.hidden_size)), rtol=1e-6)
    assert "lm_head" not in params["lm"]
    ids = jnp.asarray(rng.integers(1, ck_vocab, size=(1, 6)), jnp.int32)
    logits, _ = bundle.model.apply({"params": params}, ids)
    assert logits.shape[-1] == cfg.vocab_size
    assert np.isfinite(np.asarray(logits)).all()


def test_normhead_resized_load(tmp_path):
    """Baichuan2-format load (W_pack fused QKV, NormHead bare kernel):
    the (H, V) head kernel grows new COLUMNS alongside the embedding's
    new rows, and a forward renormalizes per call."""
    rng = np.random.default_rng(4)
    bundle = _tiny_bundle(normhead=True, tie_word_embeddings=False,
                          num_kv_heads=None)   # baichuan is MHA
    cfg = bundle.config.lm
    ck_vocab = cfg.vocab_size - 8
    sd = _baichuan_sd(cfg, rng, vocab=ck_vocab)
    ckpt = str(tmp_path / "baichuan2")
    _write_bin_sharded(ckpt, sd)

    params = init_or_load_params(bundle, lm_checkpoint=ckpt,
                                 family="baichuan")
    head = np.asarray(params["lm"]["lm_head_kernel"])
    assert head.shape == (cfg.hidden_size, cfg.vocab_size)
    np.testing.assert_allclose(head[:, :ck_vocab],
                               sd["lm_head.weight"].T, atol=0)
    np.testing.assert_allclose(
        head[:, ck_vocab:],
        np.broadcast_to(sd["lm_head.weight"].mean(0)[:, None],
                        (cfg.hidden_size, 8)), rtol=1e-6)
    # W_pack split landed: q kernel == first H rows of W_pack transposed
    q = np.asarray(params["lm"]["layers_0"]["attn"]["q_proj"]["kernel"])
    H = cfg.hidden_size
    np.testing.assert_allclose(
        q.reshape(H, H),
        sd["model.layers.0.self_attn.W_pack.weight"][:H].T, atol=0)
    ids = jnp.asarray(rng.integers(1, ck_vocab, size=(1, 6)), jnp.int32)
    logits, _ = bundle.model.apply({"params": params}, ids)
    assert np.isfinite(np.asarray(logits)).all()


def test_safetensors_sharded_index_load(tmp_path):
    """model.safetensors.index.json shards load identically to .bin
    shards through load_torch_state_dict."""
    rng = np.random.default_rng(5)
    bundle = _tiny_bundle()
    cfg = bundle.config.lm
    sd = _llama_sd(cfg, rng, vocab=cfg.vocab_size, tied=False)
    st = str(tmp_path / "st")
    _write_safetensors_sharded(st, sd)
    loaded = load_torch_state_dict(st)
    assert sorted(loaded) == sorted(sd)
    for k in sd:
        np.testing.assert_allclose(loaded[k], sd[k], atol=0)

    params = init_or_load_params(bundle, lm_checkpoint=st)
    np.testing.assert_allclose(
        np.asarray(params["lm"]["layers_0"]["mlp"]["up_proj"]["kernel"]),
        sd["model.layers.0.mlp.up_proj.weight"].T, atol=0)
