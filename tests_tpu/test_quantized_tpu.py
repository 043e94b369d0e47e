"""int8 weight-only kernels and speculative decoding on TPU hardware:
the q8 matmul + post-rescale path under the MXU, and the speculative
slot-sparse cache under the real attention kernels."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import linen as nn

pytestmark = pytest.mark.skipif(
    jax.default_backend() != "tpu", reason="requires TPU hardware")

EOS, PAD = 2, 0


def _f32_model():
    from merlin_tpu.models.decoder import CausalLM
    from merlin_tpu.models.families import tiny

    cfg = dataclasses.replace(tiny(), dtype=jnp.float32)
    model = CausalLM(cfg)
    ids = jnp.asarray(np.random.default_rng(0).integers(3, 120, (1, 9)))
    params = nn.unbox(model.init(jax.random.PRNGKey(1), ids)["params"])
    return cfg, model, params, ids


def test_q8_weights_logits_on_tpu():
    """Quantized logits equal a full-precision model holding q8*scale —
    on the MXU, where the int8->f32 convert must fuse into the matmul."""
    from merlin_tpu.models.convert import quantize_decoder_params_int8
    from merlin_tpu.models.decoder import CausalLM

    cfg, model, params, ids = _f32_model()
    qmodel = CausalLM(dataclasses.replace(cfg, weight_dtype="int8"))
    qparams = quantize_decoder_params_int8(params)
    # pin TRUE-f32 matmuls on both sides: at the MXU's default precision
    # the operands are bf16-rounded, which is EXACT for int8-valued
    # weights (<= 8 significand bits) but LOSSY for the reference's
    # dequantized q*scale f32 weights — the comparison would measure the
    # reference's own rounding, not the quantized path (first observed on
    # the r4 toolchain: 0.04 logit diffs, all from the dequant side)
    with jax.default_matmul_precision("highest"):
        qlogits, _ = jax.jit(lambda p, i: qmodel.apply({"params": p}, i))(
            qparams, ids)

    deq = jax.tree_util.tree_map(np.asarray, qparams)

    def dequant(node):
        if isinstance(node, dict):
            if "kernel_q8" in node:
                q = np.asarray(node["kernel_q8"], np.float32)
                s = np.asarray(node["kernel_scale"], np.float32)
                out = {k: v for k, v in node.items()
                       if k not in ("kernel_q8", "kernel_scale")}
                out["kernel"] = q * s.reshape(
                    (1,) * (q.ndim - s.ndim) + s.shape)
                return out
            return {k: dequant(v) for k, v in node.items()}
        return node

    with jax.default_matmul_precision("highest"):
        dlogits, _ = jax.jit(lambda p, i: model.apply({"params": p}, i))(
            dequant(deq), ids)
    np.testing.assert_allclose(np.asarray(qlogits), np.asarray(dlogits),
                               rtol=2e-4, atol=2e-3)


def test_speculative_matches_greedy_on_tpu():
    """Slot-sparse speculative decode under the hardware attention path
    produces the plain Generator's greedy tokens (f32 model: no bf16
    tie-flips)."""
    from merlin_tpu.generate.decode import GenerateConfig, Generator
    from merlin_tpu.generate.speculative import SpeculativeGenerator

    cfg, model, params, _ = _f32_model()
    gcfg = GenerateConfig(max_new_tokens=16, eos_id=EOS, pad_id=PAD,
                          prompt_bucket=8, cache_dtype=jnp.float32)
    ids = np.random.default_rng(5).integers(3, 120, (2, 6)).astype(np.int32)
    want = Generator(model, gcfg)(params, ids)
    got, nw, _ = SpeculativeGenerator(model, gcfg, draft_len=4)(params, ids)
    np.testing.assert_array_equal(got, want)
    assert nw <= gcfg.max_new_tokens
