"""Logit-warping + sampling ops (jit-friendly, static shapes).

Replaces the HF LogitsProcessor stack the reference leans on through
``model.generate`` (SURVEY.md §2.9 "CUDA paged generation"): temperature,
top-k, top-p (nucleus), greedy; all pure functions over (b, V) logits.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

NEG_INF = -1e10


def apply_temperature(logits: jax.Array, temperature: float) -> jax.Array:
    return logits / jnp.maximum(temperature, 1e-6)


def apply_top_k(logits: jax.Array, k: int) -> jax.Array:
    """Mask everything below the k-th largest logit."""
    if k <= 0:
        return logits
    k = min(k, logits.shape[-1])
    kth = jax.lax.top_k(logits, k)[0][..., -1:]
    return jnp.where(logits < kth, NEG_INF, logits)


def apply_top_p(logits: jax.Array, p: float) -> jax.Array:
    """Nucleus filtering: keep the smallest set of tokens whose cumulative
    probability exceeds p (the top token always survives)."""
    if p >= 1.0:
        return logits
    sorted_logits = jnp.sort(logits, axis=-1)[..., ::-1]
    probs = jax.nn.softmax(sorted_logits, axis=-1)
    cum = jnp.cumsum(probs, axis=-1)
    # keep tokens where the cumulative mass *before* them is < p
    keep_sorted = (cum - probs) < p
    threshold = jnp.min(
        jnp.where(keep_sorted, sorted_logits, jnp.inf), axis=-1, keepdims=True)
    return jnp.where(logits < threshold, NEG_INF, logits)


def sample_token(rng: jax.Array, logits: jax.Array, *,
                 temperature: float = 1.0, top_k: int = 0,
                 top_p: float = 1.0, do_sample: bool = True) -> jax.Array:
    """(b, V) logits -> (b,) token ids."""
    if not do_sample:
        return jnp.argmax(logits, axis=-1)
    logits = apply_temperature(logits.astype(jnp.float32), temperature)
    logits = apply_top_k(logits, top_k)
    logits = apply_top_p(logits, top_p)
    return jax.random.categorical(rng, logits, axis=-1)
