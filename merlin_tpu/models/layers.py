"""Shared neural-net building blocks (flax.linen, logical-axis annotated).

Every parameter is created through :func:`param_with_axes`-style logical
partitioning (``nn.with_logical_partitioning``) so the physical sharding is
decided centrally by :mod:`merlin_tpu.core.partitioning` rules — models never
mention mesh axes.

Numerics: norms and softmax statistics in float32, matmuls in the policy
compute dtype (bf16 on TPU) with float32 MXU accumulation.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Any, Callable, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

Dtype = Any
Initializer = Callable[..., Any]

default_kernel_init = nn.initializers.lecun_normal()
default_embed_init = nn.initializers.normal(stddev=0.02)


class RMSNorm(nn.Module):
    """Root-mean-square norm (Llama/Baichuan families). f32 statistics."""

    eps: float = 1e-6
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        orig_dtype = x.dtype
        x32 = x.astype(jnp.float32)
        var = jnp.mean(jnp.square(x32), axis=-1, keepdims=True)
        norm = x32 * jax.lax.rsqrt(var + self.eps)
        scale = self.param(
            "scale", nn.with_logical_partitioning(nn.initializers.ones, ("norm",)),
            (x.shape[-1],), jnp.float32)
        return (norm * scale).astype(orig_dtype)


class LayerNorm(nn.Module):
    """Standard layer norm with bias (Phi-2/OPT families). f32 statistics."""

    eps: float = 1e-5
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        orig_dtype = x.dtype
        x32 = x.astype(jnp.float32)
        mean = jnp.mean(x32, axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(x32 - mean), axis=-1, keepdims=True)
        norm = (x32 - mean) * jax.lax.rsqrt(var + self.eps)
        dim = x.shape[-1]
        scale = self.param(
            "scale", nn.with_logical_partitioning(nn.initializers.ones, ("norm",)),
            (dim,), jnp.float32)
        bias = self.param(
            "bias", nn.with_logical_partitioning(nn.initializers.zeros, ("norm",)),
            (dim,), jnp.float32)
        return (norm * scale + bias).astype(orig_dtype)


class DenseGeneral(nn.Module):
    """Einsum dense layer with arbitrary kernel shape + logical axis names.

    ``weight_q8=True`` stores the kernel as INT8 with a per-output-channel
    f32 scale (weight-only quantization for serving): HBM reads halve —
    and decode forwards are parameter-read-bound, so so does the decode
    step floor. Exact post-matmul rescale: y = (x @ q8) * scale equals
    x @ (q8 * scale) because the scale varies only along output channels.
    Build the param tree from a trained f32 tree with
    :func:`merlin_tpu.models.convert.quantize_decoder_params_int8`.
    """

    features: Tuple[int, ...]          # output feature dims
    axis: Tuple[int, ...] = (-1,)      # input axes to contract
    kernel_axes: Tuple[Optional[str], ...] = ()
    use_bias: bool = False
    dtype: Dtype = jnp.bfloat16
    kernel_init: Initializer = default_kernel_init
    weight_q8: bool = False

    @nn.compact
    def __call__(self, x):
        features = (self.features,) if isinstance(self.features, int) else tuple(self.features)
        axis = (self.axis,) if isinstance(self.axis, int) else tuple(self.axis)
        axis = tuple(a % x.ndim for a in axis)
        in_shape = tuple(x.shape[a] for a in axis)
        kernel_shape = in_shape + features
        out_axes = self.kernel_axes[len(in_shape):] if self.kernel_axes \
            else ()
        if self.weight_q8:
            kernel = self.param(
                "kernel_q8",
                nn.with_logical_partitioning(
                    lambda key, shape, dtype=jnp.int8:
                    jnp.zeros(shape, jnp.int8),
                    self.kernel_axes),
                kernel_shape, jnp.int8)
            scale = self.param(
                "kernel_scale",
                nn.with_logical_partitioning(
                    nn.initializers.ones, out_axes),
                features, jnp.float32)
            # the int8->compute-dtype convert fuses into the matmul's
            # operand read; the tensor resident in HBM stays int8
            kernel = kernel.astype(self.dtype)
        else:
            kernel = self.param(
                "kernel",
                nn.with_logical_partitioning(self.kernel_init,
                                              self.kernel_axes),
                kernel_shape, jnp.float32)
            kernel = kernel.astype(self.dtype)
            scale = None

        # contraction: batch dims of x stay, `axis` dims contract with kernel
        x = x.astype(self.dtype)
        contract = ((axis, tuple(range(len(axis)))), ((), ()))
        out = jax.lax.dot_general(x, kernel, contract,
                                  preferred_element_type=jnp.float32)
        if scale is not None:
            out = out * scale  # (..., *features) broadcast
        if self.use_bias:
            bias = self.param(
                "bias",
                nn.with_logical_partitioning(
                    nn.initializers.zeros, self.kernel_axes[len(in_shape):]),
                features, jnp.float32)
            out = out + bias
        return out.astype(self.dtype)


class Embed(nn.Module):
    """Token embedding with optional decode-to-logits tie."""

    num_embeddings: int
    features: int
    dtype: Dtype = jnp.bfloat16

    def setup(self):
        self.embedding = self.param(
            "embedding",
            nn.with_logical_partitioning(default_embed_init, ("vocab", "embed")),
            (self.num_embeddings, self.features), jnp.float32)

    def __call__(self, ids):
        return jnp.take(self.embedding, ids, axis=0).astype(self.dtype)

    def attend(self, x):
        """Tied decode: hidden @ embedding^T -> logits."""
        return jax.lax.dot_general(
            x.astype(self.dtype), self.embedding.astype(self.dtype).T,
            (((x.ndim - 1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)


# ---------------------------------------------------------------------------
# Rotary position embeddings (with linear scaling + partial rotary)
# ---------------------------------------------------------------------------

def rope_frequencies(head_dim: int, theta: float = 10000.0,
                     rotary_dim: Optional[int] = None) -> jax.Array:
    """Inverse frequencies (rotary_dim/2,) f32."""
    rotary_dim = rotary_dim or head_dim
    exponent = jnp.arange(0, rotary_dim, 2, dtype=jnp.float32) / rotary_dim
    return 1.0 / (theta ** exponent)


def apply_rope(x: jax.Array, positions: jax.Array, *, theta: float = 10000.0,
               linear_scale: float = 1.0,
               rotary_dim: Optional[int] = None) -> jax.Array:
    """Rotate q or k. x: (b, s, h, d); positions: (b, s) int32.

    ``linear_scale`` implements position-interpolation context stretching:
    effective position = position / linear_scale (reference Baichuan RoPE
    scaling, model/builder.py:37-42). ``rotary_dim < d`` gives Phi-2-style
    partial rotary: only the first rotary_dim channels rotate.

    Uses the half-split convention (HF Llama): d-dim vector split as
    [x1, x2], rotated = [x1*cos - x2*sin, x2*cos + x1*sin].
    """
    d = x.shape[-1]
    rotary_dim = rotary_dim or d
    inv_freq = rope_frequencies(d, theta, rotary_dim)
    pos = positions.astype(jnp.float32) / linear_scale
    angles = pos[..., None] * inv_freq[None, None, :]      # (b, s, rd/2)
    cos = jnp.cos(angles)[:, :, None, :]                   # (b, s, 1, rd/2)
    sin = jnp.sin(angles)[:, :, None, :]

    x_rot = x[..., :rotary_dim].astype(jnp.float32)
    x_pass = x[..., rotary_dim:]
    half = rotary_dim // 2
    x1, x2 = x_rot[..., :half], x_rot[..., half:]
    rotated = jnp.concatenate(
        [x1 * cos - x2 * sin, x2 * cos + x1 * sin], axis=-1).astype(x.dtype)
    if rotary_dim == d:
        return rotated
    return jnp.concatenate([rotated, x_pass], axis=-1)


# ---------------------------------------------------------------------------
# ALiBi (Baichuan-13B family)
# ---------------------------------------------------------------------------

def alibi_slopes(num_heads: int) -> jax.Array:
    """Standard ALiBi slope schedule (Press et al.): geometric in 2^(-8/n),
    with the non-power-of-two interleave rule."""
    def pow2_slopes(n):
        start = 2.0 ** (-(2.0 ** -(math.log2(n) - 3)))
        return [start * (start ** i) for i in range(n)]

    if math.log2(num_heads).is_integer():
        slopes = pow2_slopes(num_heads)
    else:
        closest = 2 ** math.floor(math.log2(num_heads))
        slopes = pow2_slopes(closest)
        extra = pow2_slopes(2 * closest)[0::2][: num_heads - closest]
        slopes = slopes + extra
    return jnp.asarray(slopes, jnp.float32)


# ---------------------------------------------------------------------------
# MLPs
# ---------------------------------------------------------------------------

class GatedMLP(nn.Module):
    """SiLU-gated MLP (Llama/Baichuan): down(silu(gate(x)) * up(x))."""

    intermediate: int
    dtype: Dtype = jnp.bfloat16
    weight_q8: bool = False

    @nn.compact
    def __call__(self, x):
        q8 = self.weight_q8
        gate = DenseGeneral((self.intermediate,), kernel_axes=("embed", "mlp"),
                            dtype=self.dtype, weight_q8=q8,
                            name="gate_proj")(x)
        up = DenseGeneral((self.intermediate,), kernel_axes=("embed", "mlp"),
                          dtype=self.dtype, weight_q8=q8, name="up_proj")(x)
        hidden = nn.silu(gate) * up
        return DenseGeneral((x.shape[-1],), kernel_axes=("mlp", "embed"),
                            dtype=self.dtype, weight_q8=q8,
                            name="down_proj")(hidden)


class SimpleMLP(nn.Module):
    """Two-layer MLP with configurable activation (Phi-2 gelu, OPT relu,
    ViT gelu), with biases."""

    intermediate: int
    activation: str = "gelu_new"
    dtype: Dtype = jnp.bfloat16
    weight_q8: bool = False

    @nn.compact
    def __call__(self, x):
        h = DenseGeneral((self.intermediate,), kernel_axes=("embed", "mlp"),
                         use_bias=True, dtype=self.dtype,
                         weight_q8=self.weight_q8, name="fc1")(x)
        if self.activation == "gelu_new":
            h = nn.gelu(h, approximate=True)
        elif self.activation == "gelu":
            h = nn.gelu(h, approximate=False)
        elif self.activation == "quick_gelu":
            h = h * nn.sigmoid(1.702 * h)
        elif self.activation == "relu":
            h = nn.relu(h)
        else:
            raise ValueError(f"unknown activation {self.activation}")
        return DenseGeneral((x.shape[-1],), kernel_axes=("mlp", "embed"),
                            use_bias=True, dtype=self.dtype,
                            weight_q8=self.weight_q8, name="fc2")(h)
