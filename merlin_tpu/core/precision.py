"""Mixed-precision policy.

TPU-first defaults: params in float32, compute in bfloat16 (feeds the MXU
at full rate), softmax/normalization statistics and the loss in float32.
The reference trains with torch bf16+tf32 (pretrain.sh:28-29); on TPU the
MXU natively accumulates bf16 matmuls in f32 so we keep
``preferred_element_type=float32`` on every hot matmul instead of tf32.
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class Policy:
    param_dtype: jnp.dtype = jnp.float32
    compute_dtype: jnp.dtype = jnp.bfloat16
    # dtype for numerically sensitive reductions (norms, softmax, loss)
    reduce_dtype: jnp.dtype = jnp.float32

    def cast_to_compute(self, x):
        return jnp.asarray(x, self.compute_dtype)

    def cast_to_reduce(self, x):
        return jnp.asarray(x, self.reduce_dtype)


DEFAULT_POLICY = Policy()
FULL_PRECISION = Policy(compute_dtype=jnp.float32)
HALF_PARAMS = Policy(param_dtype=jnp.bfloat16)
