"""Hardware parity tests for the single-pass whole-KV attention kernel
(the ViT tower hot path — reference clip_encoder.py:64-72 shapes)."""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from merlin_tpu.ops.attention import attention, mha_reference
from merlin_tpu.ops.onepass_attention import onepass_attention

pytestmark = pytest.mark.skipif(
    jax.default_backend() != "tpu", reason="needs TPU hardware")


def _rand(shape, seed):
    return jnp.asarray(
        np.random.default_rng(seed).normal(size=shape), jnp.bfloat16)


@pytest.mark.parametrize("seq", [1024, 1025, 256])
def test_onepass_forward_parity(seq):
    b, h, d = 4, 8, 64
    q, k, v = (_rand((b, seq, h, d), i) for i in range(3))
    ref = mha_reference(q.astype(jnp.float32), k.astype(jnp.float32),
                        v.astype(jnp.float32), causal=False)
    out = jax.jit(functools.partial(attention, causal=False))(q, k, v)
    err = jnp.max(jnp.abs(out.astype(jnp.float32) - ref))
    assert float(err) < 5e-3, float(err)


def test_onepass_padding_masked():
    """Garbage in the padded KV tail must not leak into the output."""
    from merlin_tpu.ops.onepass_attention import _onepass_fwd

    b, s, pad, h, d = 2, 1024, 1152, 4, 64
    q, k, v = (_rand((b, s, h, d), i) for i in range(3))

    @functools.partial(jax.jit, static_argnames=("fill",))
    def run(q, k, v, fill):
        qp = jnp.pad(q, ((0, 0), (0, pad - s), (0, 0), (0, 0)))
        kp = jnp.pad(k, ((0, 0), (0, pad - s), (0, 0), (0, 0)),
                     constant_values=fill)
        vp = jnp.pad(v, ((0, 0), (0, pad - s), (0, 0), (0, 0)),
                     constant_values=fill)
        out, _ = _onepass_fwd(qp, kp, vp, scale=d ** -0.5, kv_len=s,
                              emit_lse=False)
        return out[:, :s]

    outs = [run(q, k, v, fill) for fill in (0.0, 7.0)]
    assert float(jnp.max(jnp.abs(outs[0] - outs[1]))) == 0.0


def test_onepass_mxu_sum_denominator_parity():
    """The MXU-summed softmax denominator (inference path) must match the
    VPU lane-reduce within bf16 rounding."""
    from merlin_tpu.ops.onepass_attention import _onepass_fwd

    b, s, h, d = 4, 1025, 8, 64
    q, k, v = (_rand((b, s, h, d), i + 10) for i in range(3))
    pad = 1032 - s

    @functools.partial(jax.jit, static_argnames=("mxu",))
    def run(q, k, v, mxu):
        qp = jnp.pad(q, ((0, 0), (0, pad), (0, 0), (0, 0)))
        kp = jnp.pad(k, ((0, 0), (0, pad), (0, 0), (0, 0)))
        vp = jnp.pad(v, ((0, 0), (0, pad), (0, 0), (0, 0)))
        out, _ = _onepass_fwd(qp, kp, vp, scale=d ** -0.5, kv_len=s,
                              emit_lse=False, mxu_sum=mxu)
        return out[:, :s]

    a = run(q, k, v, True).astype(jnp.float32)
    b_ = run(q, k, v, False).astype(jnp.float32)
    assert float(jnp.max(jnp.abs(a - b_))) < 2e-2


def test_onepass_grad_parity():
    b, s, h, d = 2, 1025, 4, 64
    q, k, v = (_rand((b, s, h, d), i) for i in range(3))

    def loss_op(q, k, v):
        return (attention(q, k, v, causal=False).astype(jnp.float32) ** 2).sum()

    def loss_ref(q, k, v):
        return (mha_reference(q.astype(jnp.float32), k.astype(jnp.float32),
                              v.astype(jnp.float32), causal=False) ** 2).sum()

    g_op = jax.jit(jax.grad(loss_op, argnums=(0, 1, 2)))(q, k, v)
    g_rf = jax.jit(jax.grad(loss_ref, argnums=(0, 1, 2)))(q, k, v)
    for a, b_ in zip(g_op, g_rf):
        rel = float(jnp.max(jnp.abs(a.astype(jnp.float32) - b_))
                    / (jnp.max(jnp.abs(b_)) + 1e-9))
        assert rel < 2e-2, rel
