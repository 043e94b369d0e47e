"""Probe the XLA weight-relayout cliff and try layout pinning (VERDICT r3 #5).

Round-3 finding (CLAUDE.md): at 7B bf16, ANY 2..64-token decode forward
(the speculative verify window) makes XLA relayout every matmul weight —
~3 GB of hoisted copies next to 13.5 GB of params kills the 16 GB chip.
s_q == 1 and s_q >= 128 use the canonical layout.

This probe measures the cliff WITHOUT running (AOT memory analysis) and
tests the documented untried lever: pin the multi-token jit's parameter
input layouts to the layouts the s_q==1 executable chose
(`jax.experimental.layout.Format` via in_shardings), so XLA must consume
the weights as-is instead of hoisting relayout copies.

Run ON TPU: python tools/layout_probe.py [--layers N] [--sq 8]
Writes findings to stdout; paste the result into CLAUDE.md / BENCHMARKS.md.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def build(num_layers, scan=False):
    from flax import linen as nn

    from merlin_tpu.models.decoder import CausalLM, init_kv_cache
    from merlin_tpu.models.families import vicuna_7b
    import dataclasses

    cfg = dataclasses.replace(vicuna_7b(), num_layers=num_layers,
                              scan_layers=scan)
    model = CausalLM(cfg)
    import merlin_tpu.models.decoder as dec

    multi = CausalLM(dataclasses.replace(cfg, paged_multi_query=True))

    # ABSTRACT params: .lower() accepts ShapeDtypeStructs, so the probe
    # never allocates 13.5 GB on the chip — full-7B (--layers 32) probes
    # are compile-helper-only and safe to run beside other chip work
    abstract = jax.eval_shape(
        lambda: model.init(jax.random.key(0), jnp.ones((1, 4), jnp.int32))
    )["params"]
    params = jax.tree.map(
        lambda x: jax.ShapeDtypeStruct(x.shape, jnp.bfloat16),
        nn.unbox(abstract))
    cache = jax.tree.map(
        lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype),
        jax.eval_shape(lambda: init_kv_cache(
            cfg, 1, max_len=512, layout="paged",
            page_size=128, dtype=jnp.bfloat16)))
    return model, multi, params, cache


def mem(compiled):
    m = compiled.memory_analysis()
    return dict(temp_gb=round(m.temp_size_in_bytes / 2**30, 3),
                arg_gb=round(m.argument_size_in_bytes / 2**30, 3),
                out_gb=round(m.output_size_in_bytes / 2**30, 3))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--layers", type=int, default=8,
                    help="decoder layers (8 shows the cliff at ~1/4 scale; "
                         "32 = full 7B, needs the whole chip)")
    ap.add_argument("--sq", type=int, default=8)
    ap.add_argument("--scan", action="store_true",
                    help="scan_layers=True (the serving config — the r3 "
                         "cliff may be scan-specific)")
    args = ap.parse_args()

    model, multi, params, cache = build(args.layers, scan=args.scan)

    def decode1(p, tok, c):
        return model.apply({"params": p}, tok,
                           positions=c["lengths"][:, None], kv_cache=c)

    def decode_multi(p, toks, c):
        positions = c["lengths"][:, None] + jnp.arange(toks.shape[1])[None]
        return multi.apply({"params": p}, toks, positions=positions,
                           kv_cache=c)

    tok1 = jnp.ones((1, 1), jnp.int32)
    tokN = jnp.ones((1, args.sq), jnp.int32)

    c1 = jax.jit(decode1).lower(params, tok1, cache).compile()
    print("s_q=1   :", mem(c1), flush=True)
    cN = jax.jit(decode_multi).lower(params, tokN, cache).compile()
    print(f"s_q={args.sq:<4}:", mem(cN), flush=True)

    # --- the lever: pin the multi-token jit's param layouts to the
    # layouts the s_q==1 executable chose --------------------------------
    try:
        in_fmts = c1.input_formats
    except AttributeError:
        in_fmts = getattr(c1, "input_layouts", None)
    if in_fmts is None:
        print("NO input_formats/input_layouts API on compiled; "
              "fall back: pin to the arrays' current committed formats")
        param_fmt = jax.tree.map(lambda x: x.format, params)
    else:
        param_fmt = in_fmts[0][0]  # (args, kwargs) -> params pytree
    try:
        cP = (jax.jit(decode_multi,
                      in_shardings=(param_fmt,
                                    jax.tree.map(lambda x: x.format, tokN),
                                    jax.tree.map(lambda x: x.format, cache)))
              .lower(params, tokN, cache).compile())
        print(f"s_q={args.sq} PINNED:", mem(cP), flush=True)
    except Exception as e:  # noqa: BLE001 — record the failure verbatim
        print("pinning failed:", type(e).__name__, e)
        # second attempt: with_layout_constraint inside the function
        from jax.experimental.layout import with_layout_constraint

        def decode_multi_pinned(p, toks, c):
            p = jax.tree.map(with_layout_constraint, p, param_fmt)
            return decode_multi(p, toks, c)

        cP = jax.jit(decode_multi_pinned).lower(
            params, tokN, cache).compile()
        print(f"s_q={args.sq} CONSTRAINED:", mem(cP), flush=True)


if __name__ == "__main__":
    main()
