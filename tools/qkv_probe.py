"""Fused-QKV A/B for the ViT tower (r5 re-test of an r2 rejection).

The r2 "apply-time QKV fusion" A/B read -13% and was rejected — but that
measurement predates the r5 finding that every single-sync window carries
~45-49 ms of tunnel RTT (tools/vit_ab_probe.py RESOLVED note). The
structural argument for fusion is HBM traffic: three separate
(b*s, 1024) @ (1024, 1024) projections each re-read the 33 MB bf16
activation once per layer; one (b*s, 1024) @ (1024, 3072) matmul reads it
once — ~1.5 GB less HBM traffic per 16-frame encode across 23 layers
(~1.9 ms at 819 GB/s, ~+4 fps) IF XLA's dot merger is not already doing
the merge.

This probe monkeypatches ViTBlock.__call__ with a fused variant (one
DenseGeneral((3, h, d)); random-param A/B, so the param-tree difference
is irrelevant) and interleaves RTT-cancelled windows stock-vs-fused in
ONE process with chained calibration adjacent to every window.

Run ON TPU: python tools/qkv_probe.py [--cycles 3]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cycles", type=int, default=3)
    ap.add_argument("--frames", type=int, default=16)
    ap.add_argument("--runs", type=int, default=4)
    args = ap.parse_args()

    from flax import linen as nn

    import merlin_tpu.models.vit as vit
    from merlin_tpu.models.layers import DenseGeneral, LayerNorm, SimpleMLP
    from merlin_tpu.models.projectors import ConvProjector
    from merlin_tpu.ops.image_ops import preprocess_images
    from bench import bench_calibration, materialize_params

    stock_block = vit.ViTBlock

    class FusedViTBlock(nn.Module):
        cfg: vit.ViTConfig

        @nn.compact
        def __call__(self, x):
            cfg = self.cfg
            h, d = cfg.num_heads, cfg.hidden_size // cfg.num_heads
            res = x
            x = LayerNorm(eps=cfg.layer_norm_eps, dtype=cfg.dtype,
                          name="norm1")(x)
            # flat 3*h*d output, q/k/v as STATIC LANE SLICES (a (3,h,d)
            # output dim forces relayouts when the middle dim is sliced:
            # measured 154.7-155.5 fps vs 177.6-178.2 stock)
            w = cfg.hidden_size
            qkv = DenseGeneral((3 * w,),
                               kernel_axes=("vit_embed", "vit_heads"),
                               use_bias=True, dtype=cfg.dtype,
                               name="qkv_proj")(x)
            b, s, _ = qkv.shape
            q, k, v = (qkv[..., i * w:(i + 1) * w].reshape(b, s, h, d)
                       for i in range(3))
            attn = vit.shared_attention(q, k, v, causal=False)
            attn = DenseGeneral((cfg.hidden_size,), axis=(-2, -1),
                                kernel_axes=("vit_heads", "kv", "vit_embed"),
                                use_bias=True, dtype=cfg.dtype,
                                name="o_proj")(attn)
            x = res + attn
            res = x
            x = LayerNorm(eps=cfg.layer_norm_eps, dtype=cfg.dtype,
                          name="norm2")(x)
            x = SimpleMLP(cfg.intermediate_size, activation=cfg.activation,
                          dtype=cfg.dtype, name="mlp")(x)
            return res + x

    class TowerProj(nn.Module):
        @nn.compact
        def __call__(self, pixels):
            feats = vit.CLIPVisionTower(vit.clip_vit_l14(448),
                                        name="tower")(pixels)
            return ConvProjector(4096, conv_stride=2, name="proj")(feats)

    frames_u8 = np.random.default_rng(0).integers(
        0, 255, size=(args.frames, 448, 448, 3)).astype(np.uint8)
    raw = jnp.asarray(frames_u8)

    encoders = {}
    for kind, block in (("stock", stock_block), ("fused", FusedViTBlock)):
        vit.ViTBlock = block  # ViT.__call__ resolves the module global
        model = TowerProj()
        params = materialize_params(model, jnp.asarray(frames_u8,
                                                       jnp.bfloat16))

        @jax.jit
        def encode(p, r, _m=model, _block=block):
            vit.ViTBlock = _block  # trace-time dispatch
            pixels = preprocess_images(r, image_size=448,
                                       aspect_mode="resize")
            return _m.apply({"params": p}, pixels.astype(jnp.bfloat16)).sum()

        float(encode(params, raw))  # compile
        encoders[kind] = (encode, params)
    vit.ViTBlock = stock_block

    bench_calibration(samples=1)  # compile cal chains
    for cyc in range(args.cycles):
        for kind, (encode, params) in encoders.items():
            cal = bench_calibration()

            def timed(n):
                t0 = time.perf_counter()
                for _ in range(n):
                    out = encode(params, raw)
                float(out)
                return time.perf_counter() - t0

            t_s, t_l = timed(args.runs), timed(4 * args.runs)
            if t_l <= t_s:
                continue
            fps = args.frames * 3 * args.runs / (t_l - t_s)
            print(f"cycle {cyc} {kind:5s}: {fps:6.1f} fps  "
                  f"cal {cal:6.1f} TF/s", flush=True)


if __name__ == "__main__":
    main()
