"""int8 weight-only serving: the quantized model computes exactly
x @ (q8 * scale) (post-matmul per-output-channel rescale), so its logits
match a full-precision model holding the DEQUANTIZED kernels; the
quantizer handles loop and scanned (stacked) trees; generation runs
end-to-end through the Generator and the ServingEngine."""

import dataclasses

import numpy as np
import pytest
import jax
import jax.numpy as jnp
from flax import linen as nn

from merlin_tpu.models.convert import (
    quantize_decoder_params_int8, stack_layer_params)
from merlin_tpu.models.decoder import CausalLM
from merlin_tpu.models.families import tiny

EOS, PAD = 2, 0


def _f32(cfg=None):
    cfg = cfg or dataclasses.replace(tiny(), dtype=jnp.float32)
    model = CausalLM(cfg)
    ids = jnp.asarray(np.random.default_rng(0).integers(3, 120, (2, 9)))
    params = nn.unbox(model.init(jax.random.PRNGKey(1), ids)["params"])
    return cfg, model, params, ids


def _dequantize_like(qparams, params):
    """Rebuild a plain-kernel tree holding q8*scale (what the q8 model
    must compute with)."""
    out = {}
    for k, v in qparams.items():
        if isinstance(v, dict):
            if "kernel_q8" in v:
                q = np.asarray(v["kernel_q8"], np.float32)
                s = np.asarray(v["kernel_scale"], np.float32)
                deq = q * s.reshape((1,) * (q.ndim - s.ndim) + s.shape)
                out[k] = dict(v, kernel=deq)
                out[k].pop("kernel_q8")
                out[k].pop("kernel_scale")
            else:
                out[k] = _dequantize_like(v, params.get(k, {}))
        else:
            out[k] = v
    return out


def test_q8_logits_match_dequantized_reference():
    cfg, model, params, ids = _f32()
    qcfg = dataclasses.replace(cfg, weight_dtype="int8")
    qmodel = CausalLM(qcfg)
    qparams = quantize_decoder_params_int8(params)
    # tree matches the q8 model's own init structure
    ref_tree = nn.unbox(qmodel.init(jax.random.PRNGKey(0), ids)["params"])
    assert (jax.tree_util.tree_structure(qparams)
            == jax.tree_util.tree_structure(ref_tree))
    for got, want in zip(jax.tree_util.tree_leaves(qparams),
                         jax.tree_util.tree_leaves(ref_tree)):
        assert got.shape == want.shape and got.dtype == want.dtype

    qlogits, _ = qmodel.apply({"params": qparams}, ids)
    deq = _dequantize_like(qparams, params)
    dlogits, _ = model.apply({"params": deq}, ids)
    np.testing.assert_allclose(np.asarray(qlogits), np.asarray(dlogits),
                               rtol=1e-5, atol=1e-4)
    # and quantization error vs the original weights is bounded
    flogits, _ = model.apply({"params": params}, ids)
    err = float(jnp.max(jnp.abs(qlogits - flogits)))
    mag = float(jnp.max(jnp.abs(flogits)))
    assert err < 0.05 * max(mag, 1.0), (err, mag)


def test_q8_quantizer_handles_stacked_tree():
    cfg, model, params, ids = _f32()
    scan_cfg = dataclasses.replace(cfg, scan_layers=True,
                                   weight_dtype="int8")
    qmodel = CausalLM(scan_cfg)
    stacked = stack_layer_params(dict(params), cfg.num_layers)
    qstacked = quantize_decoder_params_int8(stacked)
    ref_tree = nn.unbox(qmodel.init(jax.random.PRNGKey(0), ids)["params"])
    got = {jax.tree_util.keystr(k): v.shape for k, v in
           jax.tree_util.tree_leaves_with_path(qstacked)}
    want = {jax.tree_util.keystr(k): v.shape for k, v in
            jax.tree_util.tree_leaves_with_path(ref_tree)}
    assert got == want
    # per-layer scales differ across the stacked axis (not one global)
    sc = qstacked["layers"]["block"]["attn"]["q_proj"]["kernel_scale"]
    assert sc.shape[0] == cfg.num_layers

    # logits match the loop-decoder q8 model exactly (same math)
    loop_q = CausalLM(dataclasses.replace(cfg, weight_dtype="int8"))
    ql, _ = qmodel.apply(
        {"params": qstacked}, ids)
    ll, _ = loop_q.apply(
        {"params": quantize_decoder_params_int8(params)}, ids)
    np.testing.assert_allclose(np.asarray(ql), np.asarray(ll),
                               rtol=1e-5, atol=1e-4)


def test_q8_generation_end_to_end():
    from merlin_tpu.generate.decode import GenerateConfig, Generator
    from merlin_tpu.serve.engine import ServingEngine

    cfg, model, params, _ = _f32()
    qcfg = dataclasses.replace(cfg, weight_dtype="int8")
    qmodel = CausalLM(qcfg)
    qparams = quantize_decoder_params_int8(params)

    gen = Generator(qmodel, GenerateConfig(
        max_new_tokens=6, eos_id=EOS, pad_id=PAD, prompt_bucket=8,
        cache_dtype=jnp.float32))
    out = gen(qparams, np.asarray([[5, 17, 33, 41]], np.int32))
    assert out.shape == (1, 6)

    eng = ServingEngine(qmodel, qparams, num_slots=2, max_len=64,
                        eos_id=EOS, pad_id=PAD, prompt_bucket=16,
                        page_size=16, cache_dtype=jnp.float32)
    reqs = [eng.submit([5, 17, 33, 41], max_new_tokens=6),
            eng.submit([7, 9, 11], max_new_tokens=6)]
    eng.run_until_idle()
    assert all(r.done and r.generated for r in reqs)
    # engine tokens equal the Generator's over the same quantized model
    want = gen(qparams, np.asarray([[5, 17, 33, 41]], np.int32))[0].tolist()
    trimmed = []
    for t in want:
        trimmed.append(t)
        if t == EOS:
            break
    while trimmed and trimmed[-1] == PAD:
        trimmed.pop()
    # Generator used a DENSE cache; engine uses paged — compare via the
    # paged Generator for exactness
    pgen = Generator(qmodel, GenerateConfig(
        max_new_tokens=6, eos_id=EOS, pad_id=PAD, prompt_bucket=16,
        kv_layout="paged", cache_dtype=jnp.float32))
    pw = pgen(qparams, np.asarray([[5, 17, 33, 41]], np.int32))[0].tolist()
    ptr = []
    for t in pw:
        ptr.append(t)
        if t == EOS:
            break
    while ptr and ptr[-1] == PAD:
        ptr.pop()
    assert reqs[0].generated == ptr


def test_q8_speculative_matches_q8_greedy():
    """int8 weights + speculative decode (the combination that un-gates
    7B speculative): tokens equal the plain greedy run of the SAME
    quantized model."""
    from merlin_tpu.generate.decode import GenerateConfig, Generator
    from merlin_tpu.generate.speculative import SpeculativeGenerator

    cfg, model, params, _ = _f32()
    qmodel = CausalLM(dataclasses.replace(cfg, weight_dtype="int8"))
    qparams = quantize_decoder_params_int8(params)
    gcfg = GenerateConfig(max_new_tokens=12, eos_id=EOS, pad_id=PAD,
                          prompt_bucket=8, cache_dtype=jnp.float32)
    ids = np.asarray([[5, 17, 33, 41, 9]], np.int32)
    want = Generator(qmodel, gcfg)(qparams, ids)
    got, _, _ = SpeculativeGenerator(qmodel, gcfg, draft_len=3)(qparams, ids)
    np.testing.assert_array_equal(got, want)


def test_q8_weights_tensor_sharded_engine():
    """int8 WEIGHTS under tensor-parallel serving (bf16 KV pool): the
    q8 kernels and their per-channel scales shard by the same logical
    rules; outputs match the unsharded quantized engine."""
    from merlin_tpu.serve.engine import ServingEngine
    from merlin_tpu.core.mesh import MeshConfig, create_mesh
    from merlin_tpu.core.partitioning import sharding_for_tree

    if len(jax.devices()) < 2:
        pytest.skip("needs >= 2 devices")
    cfg, model, params, _ = _f32()
    qcfg = dataclasses.replace(cfg, weight_dtype="int8")
    qmodel = CausalLM(qcfg)
    qparams = quantize_decoder_params_int8(params)

    def run(mesh=None, shardings=None):
        eng = ServingEngine(qmodel, qparams, num_slots=2, max_len=64,
                            eos_id=EOS, pad_id=PAD, prompt_bucket=16,
                            page_size=16, cache_dtype=jnp.float32,
                            mesh=mesh, param_shardings=shardings)
        try:
            reqs = [eng.submit(p, max_new_tokens=6)
                    for p in ([5, 17, 33, 41], [7, 9, 11])]
            eng.run_until_idle()
            return [r.generated for r in reqs]
        finally:
            eng.close()

    want = run()
    mesh = create_mesh(MeshConfig(data=1, fsdp=1, tensor=2),
                       devices=jax.devices()[:2])
    ids = jnp.ones((1, 4), jnp.int32)
    abstract = jax.eval_shape(
        lambda: qmodel.init(jax.random.PRNGKey(0), ids))["params"]
    shardings = sharding_for_tree(nn.get_partition_spec(abstract), mesh)
    got = run(mesh=mesh, shardings=shardings)
    assert got == want


def test_q8_simple_mlp_family():
    """phi/opt-style decoders (SimpleMLP fc1/fc2, biases, LN) quantize
    too: logits match the dequantized reference."""
    cfg = dataclasses.replace(
        tiny(), dtype=jnp.float32, mlp="gelu_new", norm="ln",
        parallel_block=True, attention_bias=True, lm_head_bias=True,
        partial_rotary_factor=0.5)
    model = CausalLM(cfg)
    ids = jnp.asarray(np.random.default_rng(2).integers(3, 120, (1, 7)))
    params = nn.unbox(model.init(jax.random.PRNGKey(4), ids)["params"])
    qmodel = CausalLM(dataclasses.replace(cfg, weight_dtype="int8"))
    qparams = quantize_decoder_params_int8(params)
    ref_tree = nn.unbox(qmodel.init(jax.random.PRNGKey(0), ids)["params"])
    assert (jax.tree_util.tree_structure(qparams)
            == jax.tree_util.tree_structure(ref_tree))
    qlogits, _ = qmodel.apply({"params": qparams}, ids)
    dlogits, _ = model.apply({"params": _dequantize_like(qparams, params)},
                             ids)
    np.testing.assert_allclose(np.asarray(qlogits), np.asarray(dlogits),
                               rtol=1e-5, atol=1e-4)


def test_q8_donate_frees_source_kernels():
    """donate=True strips and deletes each source kernel as its int8
    replacement lands (a 7B tree and its copy cannot coexist on chip);
    the quantized model still computes correctly afterwards."""
    cfg, model, params, ids = _f32()
    dparams = jax.tree.map(jnp.asarray, params)  # device tree
    keep = jax.tree.map(np.asarray, dparams)     # host copy for reference
    qparams = quantize_decoder_params_int8(dparams, donate=True)
    # source kernels stripped from the input tree
    assert "kernel" not in dparams["layers_0"]["attn"]["q_proj"]
    assert "kernel" not in dparams["lm_head"]
    qmodel = CausalLM(dataclasses.replace(cfg, weight_dtype="int8"))
    qlogits, _ = qmodel.apply({"params": qparams}, ids)
    dlogits, _ = model.apply(
        {"params": _dequantize_like(jax.tree.map(np.asarray, qparams),
                                    keep)}, ids)
    np.testing.assert_allclose(np.asarray(qlogits), np.asarray(dlogits),
                               rtol=1e-5, atol=1e-4)
