"""Re-run only the bench rows the r4 OOM cascade lost, merging into
BENCH_DETAILS.json (the full `bench.py` rewrites the file from scratch;
this targeted runner preserves the rows already measured this session).

Rows: serving_int8w, serving_spec, serving_chunked, vit_retime.
"""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax.numpy as jnp  # noqa: E402

import bench  # noqa: E402


def main():
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "BENCH_DETAILS.json")
    with open(path) as f:
        details = json.load(f)

    def flush():
        with open(path, "w") as f:
            json.dump(details, f, indent=1)

    err = bench._wait_for_backend()
    if err is not None:
        print("backend unavailable:", err, flush=True)
        return 1

    def update_vit(bm):
        best = max(bm[0], details.get("vit_l14_448_encode_frames_per_sec", 0))
        details.update(
            vit_l14_448_encode_frames_per_sec=round(best, 1),
            vit_vs_2x_a100=round(best / (2 * bench.A100_REFERENCE_VIT_FPS), 3))

    rows = [
        ("train_multimodal_sft", lambda: (lambda r: details.update(
            train_tokens_per_sec_multimodal_sft=round(r[0]),
            train_mfu_multimodal_sft=round(r[1], 3)))(
            bench.bench_train_multimodal(freeze_tower=True))),
        ("serving_int8w", lambda: (lambda r: details.update(
            vicuna7b_serving_int8w_tokens_per_sec_8slots=round(
                r["tokens_per_sec"], 1),
            serving_int8w_p50_inter_token_ms=round(
                r["p50_inter_token_ms"], 1),
            serving_int8w_p50_ttft_under_load_ms=round(
                r["p50_ttft_under_load_ms"], 1)))(
            bench.bench_serving_7b(cache_dtype=jnp.int8, num_slots=8,
                                   weight_q8=True))),
        ("serving_spec", lambda: (lambda r: details.update(
            vicuna7b_serving_spec_tokens_per_sec_8slots=round(
                r["tokens_per_sec"], 1),
            serving_spec_steady_tokens_per_sec=round(
                r["steady_tokens_per_sec"], 1),
            serving_spec_tokens_per_forward=r["decode_tokens_per_forward"],
            serving_spec_p50_inter_token_ms=round(
                r["p50_inter_token_ms"], 1),
            serving_spec_p50_ttft_under_load_ms=round(
                r["p50_ttft_under_load_ms"], 1)))(
            bench.bench_serving_7b(cache_dtype=jnp.int8, num_slots=8,
                                   weight_q8=True, spec_draft=4))),
        ("serving_full", lambda: (lambda r: details.update(
            vicuna7b_serving_full_tokens_per_sec_8slots=round(
                r["tokens_per_sec"], 1),
            serving_full_p50_ttft_under_load_ms=round(
                r["p50_ttft_under_load_ms"], 1),
            serving_full_p50_inter_token_ms=round(
                r["p50_inter_token_ms"], 1),
            serving_full_tokens_per_forward=r["decode_tokens_per_forward"]
            ))(
            bench.bench_serving_7b(cache_dtype=jnp.int8, num_slots=8,
                                   weight_q8=True, spec_draft=4,
                                   prefill_chunk=128,
                                   prefill_chunk_min=512))),
        # 7B bf16 speculative serving: the r3 weight-relayout cliff does
        # not reproduce on the current toolchain (layout probe: temp 0.0
        # GB at s_q=8, 32 layers, scan+no-scan) — this row is the
        # execution proof
        ("serving_spec_bf16", lambda: (lambda r: details.update(
            vicuna7b_serving_spec_bf16_tokens_per_sec_4slots=round(
                r["tokens_per_sec"], 1),
            serving_spec_bf16_tokens_per_forward=r[
                "decode_tokens_per_forward"],
            serving_spec_bf16_p50_inter_token_ms=round(
                r["p50_inter_token_ms"], 1)))(
            bench.bench_serving_7b(spec_draft=4))),
        ("serving_chunked", lambda: (lambda r: details.update(
            serving_chunked_tokens_per_sec=round(r["tokens_per_sec"], 1),
            serving_chunked_p50_ttft_under_load_ms=round(
                r["p50_ttft_under_load_ms"], 1),
            serving_chunked_p50_inter_token_ms=round(
                r["p50_inter_token_ms"], 1)))(
            bench.bench_serving_7b(prefill_chunk=128))),
        ("vit_retime",
         lambda: update_vit(bench.bench_vit_encode(windows=4, gap_s=20.0))),
        ("calibration_recheck", lambda: details.update(
            calibration_matmul_tflops_retime=round(
                bench.bench_calibration(), 1))),
    ]
    want = set(sys.argv[1:])
    for name, fn in rows:
        if want and name not in want:
            continue
        print(f"=== {name} ===", flush=True)
        try:
            fn()
            details.pop(name + "_error", None)
        except Exception as e:
            details[name + "_error"] = f"{type(e).__name__}: {e}"
            print(f"{name} FAILED: {e}", flush=True)
        flush()
        print(json.dumps({k: v for k, v in details.items()
                          if name.split('_')[0] in k or 'vit' in k}),
              flush=True)
    print(json.dumps(details, indent=1))
    return 0


if __name__ == "__main__":
    sys.exit(main())
