"""Same-process ViT encode A/B with per-window calibration (VERDICT r4 #1).

The driver-captured ViT encode number moved 172.2 fps @ cal 100.5 (r2) ->
164.2 fps @ cal 101.2 (r4) even though the r3 StridedConv projector won
+12 fps in its own same-window measurement. Two hypotheses:
  (1) throttle aliasing — one calibration sample per run does not
      represent the throttle state of the ViT windows minutes later;
  (2) a real encode-path regression between r2 and r4.

This probe settles it the way commit b4a91ca settled hybrid admission:
ONE process, interleaved timing windows of
  (a) strided  — today's path (StridedConv im2col projector),
  (b) xlaconv  — the plain XLA nn.Conv projector (the r2-era path),
  (c) tower    — tower only, no projector,
with the 8192^3 bf16 calibration matmul sampled IMMEDIATELY BEFORE every
window. Within a cycle the three variants see (nearly) the same throttle
state, so a/b is a true A/B; across cycles the cal samples give the
fps-vs-clock relation that decides whether calibration can normalize fps
at all.

RESOLVED (r5): the answer was (3) — neither. The fps measurement itself
carried one ~49 ms tunnel sync per window (~12% of a 4-run window) and
the dispatch-style calibration was RTT-dominated; with both made
RTT-immune (two-length chained timing) the chip shows NO meaningful
throttle (chained cal 165-171 TF/s all session) and encode fps agree to
~±0.5% across windows. The r2->r4 "regression" and the r3 StridedConv
"win" were both tunnel weather.

Run ON TPU:  python tools/vit_ab_probe.py [--cycles 6] [--gap 15]
Emits one JSON line per window and a summary; paste into BENCHMARKS.md.

Reference comparator: the tower forward the A100 baseline times is
/root/reference/mmgpt/model/vision_encoder/clip_encoder.py:74-82.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def build_encoders(frames: int):
    from flax import linen as nn

    from merlin_tpu.models.projectors import ConvProjector
    from merlin_tpu.models.vit import CLIPVisionTower, clip_vit_l14
    from merlin_tpu.ops.image_ops import preprocess_images

    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    from bench import materialize_params

    class XLAConvProjector(nn.Module):
        """The r2-era projector: plain nn.Conv 3x3/s2/p1 (XLA lowering)."""

        out_features: int

        @nn.compact
        def __call__(self, x):
            b, p, c = x.shape
            side = int(p ** 0.5)
            grid = x.reshape(b, side, side, c)
            out = nn.Conv(self.out_features, (3, 3), strides=2, padding=1,
                          dtype=jnp.bfloat16, name="conv")(grid)
            return out.reshape(b, -1, self.out_features)

    class Strided(nn.Module):
        @nn.compact
        def __call__(self, pixels):
            feats = CLIPVisionTower(clip_vit_l14(448), name="tower")(pixels)
            return ConvProjector(4096, conv_stride=2, name="proj")(feats)

    class Taps(nn.Module):
        @nn.compact
        def __call__(self, pixels):
            feats = CLIPVisionTower(clip_vit_l14(448), name="tower")(pixels)
            return ConvProjector(4096, conv_stride=2, lowering="taps",
                                 name="proj")(feats)

    class XLAConv(nn.Module):
        @nn.compact
        def __call__(self, pixels):
            feats = CLIPVisionTower(clip_vit_l14(448), name="tower")(pixels)
            return XLAConvProjector(4096, name="proj")(feats)

    class TowerOnly(nn.Module):
        @nn.compact
        def __call__(self, pixels):
            return CLIPVisionTower(clip_vit_l14(448), name="tower")(pixels)

    frames_u8 = np.random.default_rng(0).integers(
        0, 255, size=(frames, 448, 448, 3)).astype(np.uint8)
    raw = jnp.asarray(frames_u8)
    encoders = {}
    for kind, cls in [("strided", Strided), ("taps", Taps),
                      ("xlaconv", XLAConv), ("tower", TowerOnly)]:
        model = cls()
        params = materialize_params(
            model, jnp.asarray(frames_u8, jnp.bfloat16))

        @jax.jit
        def encode(p, r, _model=model):
            pixels = preprocess_images(r, image_size=448,
                                       aspect_mode="resize")
            return _model.apply({"params": p},
                                pixels.astype(jnp.bfloat16)).sum()

        float(encode(params, raw))  # compile
        encoders[kind] = (encode, params)
    return encoders, raw


def make_cal():
    """bench.bench_calibration: the two-length chained measurement that
    cancels dispatch + sync RTT (this probe's first run exposed the old
    dispatch-style calibration as RTT-dominated — it read 67-77 TF/s
    while the tower was demonstrably running at ~131 TF/s effective)."""
    from bench import bench_calibration

    bench_calibration(samples=1)  # compile both chain lengths
    return bench_calibration


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cycles", type=int, default=6)
    ap.add_argument("--gap", type=float, default=15.0,
                    help="seconds between cycles (sample throttle states)")
    ap.add_argument("--frames", type=int, default=16)
    ap.add_argument("--runs", type=int, default=4)
    args = ap.parse_args()

    encoders, raw = build_encoders(args.frames)
    cal = make_cal()

    rows = []
    for cyc in range(args.cycles):
        if cyc:
            time.sleep(args.gap)
        for kind, (encode, params) in encoders.items():
            c = cal()

            def timed(n):
                t0 = time.perf_counter()
                for _ in range(n):
                    out = encode(params, raw)
                float(out)
                return time.perf_counter() - t0

            # RTT-cancelling two-length window (see bench.bench_vit_encode):
            # the single ~45-49 ms tunnel sync per window was ~12% of a
            # 4-run window and under-reported every r2-r4 fps number
            t_short = timed(args.runs)
            t_long = timed(4 * args.runs)
            if t_long <= t_short:
                continue
            fps = args.frames * 3 * args.runs / (t_long - t_short)
            row = dict(cycle=cyc, kind=kind, fps=round(fps, 1),
                       cal_tflops=round(c, 1))
            rows.append(row)
            print(json.dumps(row), flush=True)

    # summary: per-kind best/median + per-cycle a-vs-b delta + fps/cal fit
    summary = {}
    for kind in ("strided", "taps", "xlaconv", "tower"):
        fps = sorted(r["fps"] for r in rows if r["kind"] == kind)
        summary[kind] = dict(best=fps[-1], median=fps[len(fps) // 2])
    deltas = []
    for cyc in range(args.cycles):
        by = {r["kind"]: r["fps"] for r in rows if r["cycle"] == cyc}
        if "strided" in by and "xlaconv" in by:
            deltas.append(round(by["strided"] - by["xlaconv"], 1))
    summary["strided_minus_xlaconv_per_cycle"] = deltas
    # linear fit fps = m*cal + b over the strided windows: if fps tracks
    # the calibration clock, normalization is sound
    s_rows = [r for r in rows if r["kind"] == "strided"]
    xs = np.array([r["cal_tflops"] for r in s_rows], np.float64)
    ys = np.array([r["fps"] for r in s_rows], np.float64)
    if len(xs) >= 2 and np.ptp(xs) > 1.0:
        m, b = np.polyfit(xs, ys, 1)
        pred126 = m * 126.0 + b
        pred101 = m * 101.0 + b
        summary["fit"] = dict(slope=round(float(m), 3),
                              intercept=round(float(b), 1),
                              r2=round(float(np.corrcoef(xs, ys)[0, 1] ** 2),
                                       3),
                              fps_at_cal_101=round(float(pred101), 1),
                              fps_at_cal_126=round(float(pred126), 1))
    else:
        summary["fit"] = "cal spread too small for a fit"
    print(json.dumps({"summary": summary}), flush=True)


if __name__ == "__main__":
    main()
