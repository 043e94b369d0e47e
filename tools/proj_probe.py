"""Projector lowering probe: where do 8 ms of the ViT encode go?

vit_ab_probe.py (r5) measured tower-only at ~181 fps and tower+projector
at ~163 — the 3x3/s2 conv projector costs ~10.4 ms per 16-frame batch
against a ~2.4 ms MXU floor (0.31 TFLOP), and the r3 StridedConv im2col
path now times IDENTICAL to plain XLA conv. This probe times candidate
lowerings CHAINED INSIDE ONE JIT (fori_loop; a dependency chain prevents
reordering) so tunnel dispatch/sync overhead (~0.35 ms / ~45 ms) cannot
misattribute:

  xla_conv   nn.Conv-style lax.conv_general_dilated
  im2col     StridedConv: pad + 9 strided slices + concat + one matmul
  taps9      per-tap accumulation: 9 (b*hw, cin)@(cin, cout) matmuls,
             no 9x-duplicated im2col intermediate
  matmul     the (b*out_hw, 9*cin)@(9*cin, cout) matmul alone on a
             pre-built cols tensor (the im2col floor if packing were free)
  center     (b*out_hw, cin)@(cin, cout) center tap only (1/9 the FLOPs —
             a scale reference)

Run ON TPU: python tools/proj_probe.py [--iters 10]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

B, H, W, CIN, COUT = 16, 32, 32, 1024, 4096
S = 2  # stride
OH, OW = H // S, W // S


def variants(kernel, bias):
    k9 = kernel.reshape(9 * CIN, COUT)

    def xla_conv(x):
        out = jax.lax.conv_general_dilated(
            x, kernel.reshape(3, 3, CIN, COUT), (S, S), [(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.bfloat16)
        return out + bias

    def im2col(x):
        xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
        cols = jnp.concatenate([
            jax.lax.slice(
                xp, (0, dh, dw, 0),
                (B, dh + (OH - 1) * S + 1, dw + (OW - 1) * S + 1, CIN),
                (1, S, S, 1))
            for dh in range(3) for dw in range(3)], axis=-1)
        out = cols.reshape(B * OH * OW, 9 * CIN) @ k9
        return out.reshape(B, OH, OW, COUT) + bias

    def taps9(x):
        xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
        acc = None
        for dh in range(3):
            for dw in range(3):
                tap = jax.lax.slice(
                    xp, (0, dh, dw, 0),
                    (B, dh + (OH - 1) * S + 1, dw + (OW - 1) * S + 1, CIN),
                    (1, S, S, 1)).reshape(B * OH * OW, CIN)
                part = tap @ kernel[dh, dw]
                acc = part if acc is None else acc + part
        return acc.reshape(B, OH, OW, COUT) + bias

    return {"xla_conv": xla_conv, "im2col": im2col, "taps9": taps9}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=10)
    args = ap.parse_args()
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((B, H, W, CIN)), jnp.bfloat16)
    kernel = jnp.asarray(rng.standard_normal((3, 3, CIN, COUT)) * 0.02,
                         jnp.bfloat16)
    bias = jnp.asarray(rng.standard_normal((COUT,)) * 0.01, jnp.bfloat16)
    cols = jnp.asarray(rng.standard_normal((B * OH * OW, 9 * CIN)),
                       jnp.bfloat16)
    k9 = kernel.reshape(9 * CIN, COUT)
    k1 = kernel[1, 1]

    flops = 2 * B * OH * OW * 9 * CIN * COUT

    def timed(name, fn, feed, fl):
        def chain_of(n):
            @jax.jit
            def chain(a):
                def body(i, a):
                    out = fn(a)
                    # fold the output MEAN back in: a single-element feed
                    # lets XLA dead-code-eliminate all but one row of a
                    # pure matmul (observed: the 'matmul' floor row read
                    # 3.9 PF/s); the mean consumes every element
                    upd = (out.astype(jnp.float32).mean()
                           * 1e-24).astype(a.dtype)
                    return a + upd
                return jax.lax.fori_loop(0, n, body, a)
            return chain

        # two-length measurement: the ~45 ms tunnel sync and dispatch
        # cancel in the time DIFFERENCE (same trick as bench_calibration)
        short, long_ = chain_of(args.iters), chain_of(4 * args.iters)
        for c in (short, long_):
            float(c(feed).astype(jnp.float32).sum())  # compile+sync
        dts = []
        for _ in range(3):
            t0 = time.perf_counter()
            float(short(feed).astype(jnp.float32).sum())
            t_s = time.perf_counter() - t0
            t0 = time.perf_counter()
            float(long_(feed).astype(jnp.float32).sum())
            t_l = time.perf_counter() - t0
            if t_l > t_s:
                dts.append((t_l - t_s) / (3 * args.iters))
        dt = sorted(dts)[len(dts) // 2] if dts else float("nan")
        print(f"{name:9s}: {dt * 1e3:7.3f} ms/iter  "
              f"{fl / dt / 1e12:6.1f} TF/s", flush=True)
        return dt

    for name, fn in variants(kernel, bias).items():
        timed(name, fn, x, flops)
    timed("matmul", lambda c: (c @ k9), cols, flops)
    timed("center", lambda c: (c[:, :CIN] @ k1), cols, flops // 9)


if __name__ == "__main__":
    main()
