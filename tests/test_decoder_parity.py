"""Logit-parity tests: unified decoder vs HF transformers (torch CPU) on
tiny random configs, plus KV-cache decode consistency and head variants.

This is the tiny-config forward parity tier SURVEY.md §4 calls for.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp
from flax import linen as nn

from merlin_tpu.models.decoder import CausalLM, cross_entropy_loss, init_kv_cache
from merlin_tpu.models.families import tiny
from merlin_tpu.models.convert import decoder_params_from_hf

B, S, V = 2, 12, 128


def _ids(seed=0):
    return np.random.default_rng(seed).integers(1, V, size=(B, S))


def _hf_logits(model, ids):
    import torch
    with torch.no_grad():
        return model(torch.tensor(ids)).logits.numpy()


def _flax_logits(cfg, params, ids, **kw):
    model = CausalLM(cfg)
    logits, _ = model.apply({"params": params}, jnp.asarray(ids), **kw)
    return np.asarray(logits)


def test_llama_parity():
    import torch
    from transformers import LlamaConfig, LlamaForCausalLM

    torch.manual_seed(0)
    hf_cfg = LlamaConfig(
        vocab_size=V, hidden_size=32, intermediate_size=64,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=64, rms_norm_eps=1e-6, attention_bias=False)
    hf = LlamaForCausalLM(hf_cfg).eval()

    cfg = tiny(num_kv_heads=2)
    params = jax.tree.map(
        jnp.asarray,
        decoder_params_from_hf(hf.state_dict(), cfg, family="llama"))
    ids = _ids()
    ours = _flax_logits(cfg, params, ids)
    theirs = _hf_logits(hf, ids)
    np.testing.assert_allclose(ours, theirs, atol=2e-4, rtol=2e-3)


def test_phi_parity():
    import torch
    from transformers import PhiConfig, PhiForCausalLM

    torch.manual_seed(0)
    hf_cfg = PhiConfig(
        vocab_size=V, hidden_size=32, intermediate_size=64,
        num_hidden_layers=2, num_attention_heads=4,
        max_position_embeddings=64, partial_rotary_factor=0.5,
        layer_norm_eps=1e-5, attn_pdrop=0.0, resid_pdrop=0.0, embd_pdrop=0.0)
    hf = PhiForCausalLM(hf_cfg).eval()

    cfg = tiny(norm="ln", norm_eps=1e-5, mlp="gelu_new", parallel_block=True,
               attention_bias=True, lm_head_bias=True,
               partial_rotary_factor=0.5)
    params = jax.tree.map(
        jnp.asarray, decoder_params_from_hf(hf.state_dict(), cfg, family="phi"))
    ids = _ids(1)
    ours = _flax_logits(cfg, params, ids)
    theirs = _hf_logits(hf, ids)
    np.testing.assert_allclose(ours, theirs, atol=3e-4, rtol=2e-3)


def test_opt_parity():
    import torch
    from transformers import OPTConfig, OPTForCausalLM

    torch.manual_seed(0)
    hf_cfg = OPTConfig(
        vocab_size=V, hidden_size=32, ffn_dim=64, num_hidden_layers=2,
        num_attention_heads=4, max_position_embeddings=64,
        do_layer_norm_before=True, word_embed_proj_dim=32, dropout=0.0)
    hf = OPTForCausalLM(hf_cfg).eval()

    cfg = tiny(positional="learned", norm="ln", norm_eps=1e-5, mlp="relu",
               attention_bias=True, tie_word_embeddings=True,
               max_position_embeddings=64)
    params = jax.tree.map(
        jnp.asarray, decoder_params_from_hf(hf.state_dict(), cfg, family="opt"))
    ids = _ids(2)
    ours = _flax_logits(cfg, params, ids)
    theirs = _hf_logits(hf, ids)
    np.testing.assert_allclose(ours, theirs, atol=3e-4, rtol=2e-3)


def test_kv_cache_decode_matches_full_forward():
    cfg = tiny()
    model = CausalLM(cfg)
    ids = jnp.asarray(_ids(3))
    params = nn.unbox(model.init(jax.random.key(0), ids)["params"])

    full_logits, _ = model.apply({"params": params}, ids)

    cache = init_kv_cache(cfg, B, max_len=32, dtype=jnp.float32)
    prefill = 8
    logits_p, cache = model.apply({"params": params}, ids[:, :prefill],
                                  kv_cache=cache)
    np.testing.assert_allclose(np.asarray(logits_p),
                               np.asarray(full_logits[:, :prefill]),
                               atol=1e-4, rtol=1e-3)
    for t in range(prefill, S):
        step_logits, cache = model.apply(
            {"params": params}, ids[:, t:t + 1],
            positions=jnp.full((B, 1), t, jnp.int32), kv_cache=cache)
        np.testing.assert_allclose(np.asarray(step_logits[:, 0]),
                                   np.asarray(full_logits[:, t]),
                                   atol=1e-4, rtol=1e-3)


def test_alibi_decode_consistency():
    cfg = tiny(positional="alibi")
    model = CausalLM(cfg)
    ids = jnp.asarray(_ids(4))
    params = nn.unbox(model.init(jax.random.key(0), ids)["params"])
    full_logits, _ = model.apply({"params": params}, ids)

    cache = init_kv_cache(cfg, B, max_len=32, dtype=jnp.float32)
    logits_p, cache = model.apply({"params": params}, ids[:, :S - 1],
                                  kv_cache=cache)
    step, cache = model.apply({"params": params}, ids[:, S - 1:],
                              positions=jnp.full((B, 1), S - 1, jnp.int32),
                              kv_cache=cache)
    np.testing.assert_allclose(np.asarray(step[:, 0]),
                               np.asarray(full_logits[:, -1]),
                               atol=1e-4, rtol=1e-3)


def test_normhead_logits_unit_norm_invariance():
    cfg = tiny(normhead=True)
    model = CausalLM(cfg)
    ids = jnp.asarray(_ids(5))
    params = nn.unbox(model.init(jax.random.key(0), ids)["params"])
    logits1, _ = model.apply({"params": params}, ids)
    # Scaling the head kernel must not change logits (it's normalized away).
    params2 = dict(params)
    params2["lm_head_kernel"] = params["lm_head_kernel"] * 7.5
    logits2, _ = model.apply({"params": params2}, ids)
    np.testing.assert_allclose(np.asarray(logits1), np.asarray(logits2),
                               atol=1e-4)


def test_cross_entropy_ignore_and_zloss():
    logits = jnp.asarray(np.random.default_rng(0).normal(size=(1, 4, 8)),
                         jnp.float32)
    labels = jnp.asarray([[1, -100, 3, -100]])
    loss, n = cross_entropy_loss(logits, labels)
    assert int(n) == 2
    loss_z, _ = cross_entropy_loss(logits, labels, z_loss_weight=1e-2)
    assert float(loss_z) > float(loss)


def test_segment_ids_isolate_packed_sequences():
    """Packing two docs with segment ids == running them separately."""
    cfg = tiny()
    model = CausalLM(cfg)
    rng = np.random.default_rng(6)
    a = rng.integers(1, V, size=(1, 6))
    b = rng.integers(1, V, size=(1, 6))
    packed = jnp.asarray(np.concatenate([a, b], axis=1))
    seg = jnp.asarray([[0] * 6 + [1] * 6], jnp.int32)
    pos = jnp.asarray([list(range(6)) + list(range(6))], jnp.int32)
    params = nn.unbox(model.init(jax.random.key(0), packed)["params"])

    packed_logits, _ = model.apply({"params": params}, packed,
                                   positions=pos, segment_ids=seg)
    sep_logits, _ = model.apply({"params": params}, jnp.asarray(b))
    np.testing.assert_allclose(np.asarray(packed_logits[:, 6:]),
                               np.asarray(sep_logits), atol=1e-4, rtol=1e-3)
