"""Attribute the multimodal-vs-text MFU gap (VERDICT r3 weak #4, r4 #6).

bench.py r4: train_mfu_multimodal_sft 0.61 vs text-only 0.635 — the tower
BACKWARD (57 ms, r4 finding) is gone in the sft row (reference freezes the
tower in both recipe stages), so ~2.5 MFU points remain unattributed.

Two probe families, both timing the FULL jitted step (micro-timing the
components in isolation carries ~2-3 ms of dispatch overhead through the
tunnel and misattributes — r4 lesson):

BACKWARD ablations (stop_gradient on param subtrees; a stopped subtree
whose other inputs carry no gradient lets XLA delete its backward cone):
  full          tower fwd+bwd, projector fwd+bwd, splice, LM fwd/bwd
  tower_nograd  tower fwd only            -> delta = tower BACKWARD
  vision_nograd tower+projector fwd only  -> delta = projector backward

FORWARD ablations (tower frozen throughout — the sft-row configuration):
  sft_full      the bench train_multimodal_sft step
  feats_const   projected features fed as a constant
                                       -> delta = tower+projector FORWARD
                                          (incl. on-device preprocess)
  no_splice     vision runs, splice gather/where skipped
                                       -> delta = splice marginal
  pre_f32       images arrive normalized f32 (no on-device uint8
                normalize; NOTE: 4x the host->device bytes)
                                       -> delta = preprocess marginal

Run ON TPU: python tools/mm_mfu_probe.py [--steps 8]
Deltas print in ms/step; paste into BENCHMARKS.md.
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def build(tiny: bool = False):
    from merlin_tpu.models.decoder import DecoderConfig
    from merlin_tpu.models.mmgpt import MMGPT, MMGPTConfig
    from merlin_tpu.models.vit import ViTConfig, clip_vit_l14
    from bench import materialize_params

    if tiny:  # CPU smoke of the probe machinery, not a measurement
        lm_cfg = DecoderConfig(
            vocab_size=512, hidden_size=64, intermediate_size=128,
            num_layers=2, num_heads=2, max_position_embeddings=128,
            dtype=jnp.float32)
        vit = ViTConfig(image_size=32, patch_size=8, hidden_size=32,
                        intermediate_size=64, num_layers=2, num_heads=2)
        B, S, img = 2, 64, 32
    else:
        lm_cfg = DecoderConfig(
            vocab_size=32128, hidden_size=1280, intermediate_size=3456,
            num_layers=12, num_heads=10, max_position_embeddings=2048,
            dtype=jnp.bfloat16, remat=True)
        vit = clip_vit_l14(448)
        B, S, img = 4, 2048, 448
    cfg = MMGPTConfig(
        lm=lm_cfg, vit=vit, projector="conv", conv_stride=2,
        image_patch_id=lm_cfg.vocab_size - 128,
        im_start_id=lm_cfg.vocab_size - 127,
        im_end_id=lm_cfg.vocab_size - 126)
    model = MMGPT(cfg)
    rng = np.random.default_rng(0)
    tok_len = cfg.image_token_len
    ids = rng.integers(10, cfg.image_patch_id - 2,
                       size=(B, S)).astype(np.int32)
    ids[:, 1] = cfg.im_start_id
    ids[:, 2: 2 + tok_len] = cfg.image_patch_id
    ids[:, 2 + tok_len] = cfg.im_end_id
    batch = dict(
        input_ids=jnp.asarray(ids), labels=jnp.asarray(ids),
        images=jnp.asarray(
            rng.integers(0, 255, (B, 1, img, img, 3)).astype(np.uint8)))
    params = materialize_params(
        model, jnp.asarray(ids[:1, :8]), dtype=jnp.float32,
        images=jnp.asarray(batch["images"][:1, :1], jnp.float32))
    return model, cfg, params, batch, B * S


def time_step(step, params, steps):
    loss, g = step(params)
    float(loss); float(g)   # compile + sync
    t0 = time.perf_counter()
    for _ in range(steps):
        loss, g = step(params)
    float(loss); float(g)
    return (time.perf_counter() - t0) / steps


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=8)
    ap.add_argument("--tiny", action="store_true",
                    help="tiny shapes (CPU smoke of the probe machinery)")
    args = ap.parse_args()
    model, cfg, params, batch, tokens = build(tiny=args.tiny)
    from merlin_tpu.models.mmgpt import splice_image_embeds
    from merlin_tpu.ops.image_ops import normalize as normalize_images

    B, n_img = batch["images"].shape[:2]
    feat_shape = (B, n_img * cfg.image_token_len, cfg.lm.hidden_size)
    const_feats = jnp.zeros(feat_shape, jnp.bfloat16)
    images_f32 = normalize_images(batch["images"])
    jax.block_until_ready(images_f32)

    def make_step(stop=(), mode="model", freeze_tower=False):
        """mode: model | feats_const | no_splice | pre_f32."""

        def forward(p):
            if mode == "model":
                logits, _ = model.apply(
                    {"params": p}, batch["input_ids"],
                    images=normalize_images(batch["images"]))
                return logits

            def fwd(m, ids, images):
                embeds = m.lm.embed(ids)
                if mode == "feats_const":
                    feats = const_feats
                else:
                    b, n = images.shape[:2]
                    feats = m.encode_images(
                        images.reshape((b * n,) + images.shape[2:]))
                    feats = feats.reshape(b, n * feats.shape[1],
                                          feats.shape[2])
                if mode == "no_splice":
                    # keep the vision cone alive without the gather
                    # (x*0 could be algebraically simplified away; 1e-30
                    # cannot and is numerically invisible)
                    embeds = embeds + (
                        feats.mean(axis=1, keepdims=True) * 1e-30
                    ).astype(embeds.dtype)
                else:
                    mask = ids == m.cfg.image_patch_id
                    embeds = splice_image_embeds(embeds, mask, feats)
                logits, _ = m.lm(inputs_embeds=embeds)
                return logits

            images = (images_f32 if mode == "pre_f32"
                      else normalize_images(batch["images"]))
            return model.apply({"params": p}, batch["input_ids"], images,
                               method=fwd)

        def loss_fn(p):
            p = dict(p)
            stops = set(stop) | ({"vision_tower"} if freeze_tower else set())
            for name in stops:
                p[name] = jax.tree.map(jax.lax.stop_gradient, p[name])
            logits = forward(p)
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

    results = {}
    print("== backward ablations (unfrozen full-tune row) ==", flush=True)
    for name, stop in [("full", ()), ("tower_nograd", ("vision_tower",)),
                       ("vision_nograd", ("vision_tower", "projector"))]:
        dt = time_step(make_step(stop=stop), params, args.steps)
        results[name] = dt
        print(f"{name:14s}: {dt * 1e3:8.2f} ms/step "
              f"({tokens / dt:,.0f} tok/s)", flush=True)

    print("\n== forward ablations (tower frozen — the sft row) ==",
          flush=True)
    for name, mode in [("sft_full", "model"), ("feats_const", "feats_const"),
                       ("no_splice", "no_splice"), ("pre_f32", "pre_f32")]:
        dt = time_step(make_step(mode=mode, freeze_tower=True),
                       params, args.steps)
        results[name] = dt
        print(f"{name:14s}: {dt * 1e3:8.2f} ms/step "
              f"({tokens / dt:,.0f} tok/s)", flush=True)

    full = results["full"]
    sft = results["sft_full"]
    print(f"\ntower backward    : "
          f"{(full - results['tower_nograd']) * 1e3:7.2f} ms")
    print(f"projector backward: "
          f"{(results['tower_nograd'] - results['vision_nograd']) * 1e3:7.2f}"
          f" ms")
    print(f"vision fwd cone   : "
          f"{(sft - results['feats_const']) * 1e3:7.2f} ms "
          f"(tower+projector forward incl. preprocess)")
    print(f"splice marginal   : "
          f"{(sft - results['no_splice']) * 1e3:7.2f} ms")
    print(f"preprocess marginal: "
          f"{(sft - results['pre_f32']) * 1e3:7.2f} ms "
          f"(negative = fused normalize cheaper than shipping f32)")


if __name__ == "__main__":
    main()
