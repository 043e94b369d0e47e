"""Attribute the multimodal-vs-text MFU gap (VERDICT r3 weak #4).

bench.py measures train_mfu_multimodal ~0.552 vs text-only 0.635: ~8 MFU
points vanish when the tower + projector + splice join the step, and
nobody has measured WHERE. This probe times the same step with pieces of
the backward pruned via jax.lax.stop_gradient on param subtrees (a
stopped subtree whose other inputs carry no gradient lets XLA delete its
whole backward cone):

  full          tower fwd+bwd, projector fwd+bwd, splice, LM fwd/bwd
  tower_nograd  tower fwd only            -> delta = tower BACKWARD
  vision_nograd tower+projector fwd only  -> delta = projector backward
  embeds_stop   spliced embeds stopped    -> delta = splice backward path

Run ON TPU: python tools/mm_mfu_probe.py [--steps 8]
Deltas print in ms/step and MFU points; paste into BENCHMARKS.md.
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def build():
    from merlin_tpu.models.decoder import DecoderConfig
    from merlin_tpu.models.mmgpt import MMGPT, MMGPTConfig
    from merlin_tpu.models.vit import clip_vit_l14
    from bench import materialize_params

    lm_cfg = DecoderConfig(
        vocab_size=32128, hidden_size=1280, intermediate_size=3456,
        num_layers=12, num_heads=10, max_position_embeddings=2048,
        dtype=jnp.bfloat16, remat=True)
    cfg = MMGPTConfig(
        lm=lm_cfg, vit=clip_vit_l14(448), projector="conv", conv_stride=2,
        image_patch_id=32000, im_start_id=32001, im_end_id=32002)
    model = MMGPT(cfg)

    B, S = 4, 2048
    rng = np.random.default_rng(0)
    tok_len = cfg.image_token_len
    ids = rng.integers(10, 31000, size=(B, S)).astype(np.int32)
    ids[:, 1] = cfg.im_start_id
    ids[:, 2: 2 + tok_len] = cfg.image_patch_id
    ids[:, 2 + tok_len] = cfg.im_end_id
    batch = dict(
        input_ids=jnp.asarray(ids), labels=jnp.asarray(ids),
        images=jnp.asarray(
            rng.integers(0, 255, (B, 1, 448, 448, 3)).astype(np.uint8)))
    params = materialize_params(
        model, jnp.asarray(ids[:1, :8]), dtype=jnp.float32,
        images=jnp.asarray(batch["images"][:1, :1], jnp.float32))
    return model, params, batch, B * S


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=8)
    args = ap.parse_args()
    model, params, batch, tokens = build()

    def make_step(stop):
        def loss_fn(p):
            p = dict(p)
            for name in stop:
                p[name] = jax.tree.map(jax.lax.stop_gradient, p[name])
            logits, _ = model.apply(
                {"params": p}, batch["input_ids"],
                images=batch["images"].astype(jnp.float32))
            logp = jax.nn.log_softmax(logits[:, :-1].astype(jnp.float32))
            tgt = batch["labels"][:, 1:]
            ll = jnp.take_along_axis(logp, tgt[..., None], axis=-1)
            return -jnp.mean(ll)

        @jax.jit
        def step(p):
            loss, grads = jax.value_and_grad(loss_fn)(p)
            # touch every grad so nothing dead-codes away
            gnorm = sum(jnp.sum(jnp.square(g))
                        for g in jax.tree_util.tree_leaves(grads))
            return loss, gnorm

        return step

    variants = [
        ("full", ()),
        ("tower_nograd", ("vision_tower",)),
        ("vision_nograd", ("vision_tower", "projector")),
    ]
    results = {}
    for name, stop in variants:
        step = make_step(stop)
        loss, g = step(params)
        float(loss); float(g)   # compile + sync
        t0 = time.perf_counter()
        for _ in range(args.steps):
            loss, g = step(params)
        float(loss); float(g)
        dt = (time.perf_counter() - t0) / args.steps
        results[name] = dt
        print(f"{name:14s}: {dt * 1e3:8.2f} ms/step "
              f"({tokens / dt:,.0f} tok/s)", flush=True)

    full = results["full"]
    print(f"\ntower backward : {(full - results['tower_nograd']) * 1e3:7.2f} ms")
    print(f"proj backward  : "
          f"{(results['tower_nograd'] - results['vision_nograd']) * 1e3:7.2f} ms")
    print("(remaining gap vs text-only = tower/projector FORWARD + splice "
          "+ image preprocess; compare vs bench_train_step's text row)")


if __name__ == "__main__":
    main()
