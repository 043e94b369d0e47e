"""Benchmark: full-size Vicuna-7B autoregressive decode, tokens/sec/chip.

Prints ONE JSON line {"metric", "value", "unit", "vs_baseline"}.

The north-star target (BASELINE.json) is parity with an A100 running the
reference's HF-transformers decode path; the reference publishes no number,
so vs_baseline uses A100_REFERENCE_TPS below (7B fp16 single-stream HF
generate on A100 is ~30 tok/s in public measurements; the theoretical
single-stream ceiling is bandwidth/params: A100 2.0TB/s / 13.5GB = 148,
v5e 0.82TB/s / 13.5GB = 61).

Params are materialized leaf-by-leaf directly in bf16 on device (13.5 GB,
fits one v5e next to the KV cache); the decode loop is the production
jitted lax.while_loop engine from merlin_tpu.generate.
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

A100_REFERENCE_TPS = 30.0

PREFILL = 128
NEW_TOKENS = 128
BATCH = 1


def materialize_bf16_params(model, sample_ids, **init_kwargs):
    """Random bf16 params without ever holding an f32 tree (and without
    executing the model forward, which linen init would)."""
    return materialize_params(model, sample_ids, dtype=jnp.bfloat16,
                              **init_kwargs)


def materialize_params(model, sample_ids, *, dtype=jnp.bfloat16,
                       **init_kwargs):
    abstract = jax.eval_shape(
        lambda: model.init(jax.random.key(0), sample_ids, **init_kwargs)
    )["params"]
    from flax import linen as nn
    abstract = nn.unbox(abstract)

    leaves, treedef = jax.tree_util.tree_flatten(abstract)
    out = []
    key = jax.random.key(0)
    make = jax.jit(
        lambda k, shape=None, dt=None: (jax.random.normal(k, shape, dt)
                                        * 0.02),
        static_argnames=("shape", "dt"))
    for leaf in leaves:
        key, sub = jax.random.split(key)
        out.append(make(sub, shape=tuple(leaf.shape), dt=dtype))
    return jax.tree_util.tree_unflatten(treedef, out)


def main():
    import dataclasses
    from merlin_tpu.models.decoder import CausalLM
    from merlin_tpu.models.families import vicuna_7b
    from merlin_tpu.generate.decode import GenerateConfig, Generator

    cfg = dataclasses.replace(vicuna_7b(), dtype=jnp.bfloat16)
    model = CausalLM(cfg)
    sample_ids = jnp.zeros((1, 8), jnp.int32)
    params = materialize_bf16_params(model, sample_ids)
    jax.block_until_ready(params)

    prompt = np.random.default_rng(0).integers(
        10, 31000, size=(BATCH, PREFILL)).astype(np.int32)
    gen = Generator(model, GenerateConfig(
        max_new_tokens=NEW_TOKENS, do_sample=False,
        eos_id=-1, pad_id=0))  # eos -1: never stop early, fixed work

    # warmup (compiles prefill + decode loop)
    out = gen(params, prompt)
    _ = out.sum()

    runs = 3
    t0 = time.perf_counter()
    for _ in range(runs):
        out = gen(params, prompt)
        _ = out.sum()  # host sync
    dt = (time.perf_counter() - t0) / runs
    tps = NEW_TOKENS * BATCH / dt

    print(json.dumps({
        "metric": "vicuna7b_decode_tokens_per_sec_chip",
        "value": round(tps, 2),
        "unit": "tokens/s",
        "vs_baseline": round(tps / A100_REFERENCE_TPS, 3),
    }))


if __name__ == "__main__":
    main()
