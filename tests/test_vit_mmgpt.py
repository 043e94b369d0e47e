"""ViT parity vs HF CLIPVisionModel, projector geometry, and the
vectorized MMGPT image-embed splice."""

import numpy as np
import jax
import jax.numpy as jnp
from flax import linen as nn

from merlin_tpu.models.vit import (
    CLIPVisionTower, ViT, ViTConfig, interpolate_pos_embedding, tiny_vit,
    vit_params_from_hf)
from merlin_tpu.models.projectors import (
    ConvProjector, MLPProjector, QWenProjector, Resampler, SAMProjector)
from merlin_tpu.models.mmgpt import MMGPT, MMGPTConfig, splice_image_embeds
from merlin_tpu.models.families import tiny as tiny_lm


def test_clip_vit_parity_vs_hf():
    import torch
    from transformers import CLIPVisionConfig, CLIPVisionModel

    torch.manual_seed(0)
    hf_cfg = CLIPVisionConfig(
        hidden_size=32, intermediate_size=64, num_hidden_layers=2,
        num_attention_heads=4, image_size=16, patch_size=4,
        layer_norm_eps=1e-5, hidden_act="quick_gelu")
    hf = CLIPVisionModel(hf_cfg).eval()

    cfg = tiny_vit()
    params = jax.tree.map(jnp.asarray, vit_params_from_hf(hf.state_dict(), cfg))

    pixels = np.random.default_rng(0).normal(size=(2, 16, 16, 3)).astype(np.float32)
    hidden = ViT(cfg).apply({"params": params}, jnp.asarray(pixels))

    import torch as t
    with t.no_grad():
        out = hf(t.tensor(pixels.transpose(0, 3, 1, 2)),
                 output_hidden_states=True)
    for li in (0, 1, 2):
        np.testing.assert_allclose(
            np.asarray(hidden[li]), out.hidden_states[li].numpy(),
            atol=3e-4, rtol=2e-3)


def test_feature_select_penultimate_drops_cls():
    cfg = tiny_vit()
    tower = CLIPVisionTower(cfg, select_layer=-2, select_feature="patch")
    pixels = jnp.ones((1, 16, 16, 3))
    variables = tower.init(jax.random.key(0), pixels)
    feats = tower.apply(variables, pixels)
    assert feats.shape == (1, cfg.num_patches, cfg.hidden_size)


def test_pos_embed_interpolation():
    pos = np.random.default_rng(0).normal(size=(5, 8)).astype(np.float32)  # 2x2+cls
    out = interpolate_pos_embedding(pos, 17)  # -> 4x4+cls
    assert out.shape == (17, 8)
    np.testing.assert_allclose(out[0], pos[0])  # cls passthrough


def test_projector_shapes():
    x = jnp.ones((2, 64, 16))  # 8x8 grid of 16-dim features
    for proj, expect_tokens in [
        (MLPProjector(32, dtype=jnp.float32), 64),
        (ConvProjector(32, conv_stride=2, dtype=jnp.float32), 16),
        (QWenProjector(32, dtype=jnp.float32), 64),
        (SAMProjector(32, dtype=jnp.float32), 4),
        (Resampler(32, num_queries=4, num_heads=4, dtype=jnp.float32), 4),
    ]:
        variables = proj.init(jax.random.key(0), x)
        out = proj.apply(variables, x)
        assert out.shape == (2, expect_tokens, 32), type(proj).__name__


def test_strided_conv_matches_nn_conv():
    """StridedConv (im2col+matmul, the TPU-fast lowering) must compute the
    SAME function as nn.Conv with the same kernel/bias params, including
    odd grids and stride 1."""
    from flax import linen as nn
    from merlin_tpu.models.projectors import StridedConv

    rng = np.random.default_rng(3)
    for lowering in ("im2col", "taps", "xla"):
        for (H, W, cin, cout, k, s) in [(8, 8, 16, 24, 3, 2),
                                        (7, 7, 8, 8, 3, 1),
                                        (6, 6, 4, 12, 3, 3)]:
            x = jnp.asarray(rng.normal(size=(2, H, W, cin)), jnp.float32)
            mine = StridedConv(cout, kernel_size=(k, k), stride=s, padding=1,
                               use_bias=True, dtype=jnp.float32,
                               lowering=lowering)
            vars_ = nn.unbox(mine.init(jax.random.key(0), x))
            ref = nn.Conv(cout, (k, k), strides=(s, s),
                          padding=((1, 1), (1, 1)),
                          use_bias=True, dtype=jnp.float32,
                          param_dtype=jnp.float32)
            got = mine.apply(vars_, x)
            want = ref.apply(vars_, x)
            np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                       rtol=1e-5, atol=1e-5,
                                       err_msg=lowering)


def test_strided_conv_grad_matches_nn_conv():
    """StridedConv sits in the multimodal TRAIN path (projector fwd+bwd):
    its VJP (matmul transpose + slice scatter) must match nn.Conv's."""
    from flax import linen as nn
    from merlin_tpu.models.projectors import StridedConv

    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.normal(size=(2, 8, 8, 6)), jnp.float32)
    ref = nn.Conv(10, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)),
                  use_bias=True, dtype=jnp.float32, param_dtype=jnp.float32)

    def loss(fn, v, x):
        return jnp.sum(jnp.sin(fn.apply(v, x)))

    gr_v = gr_x = gm_v = gm_x = None
    for lowering in ("im2col", "taps"):
        mine = StridedConv(10, kernel_size=(3, 3), stride=2, padding=1,
                           use_bias=True, dtype=jnp.float32,
                           lowering=lowering)
        vars_ = nn.unbox(mine.init(jax.random.key(0), x))
        gm_v, gm_x = jax.grad(lambda v, x: loss(mine, v, x),
                              argnums=(0, 1))(vars_, x)
        gr_v, gr_x = jax.grad(lambda v, x: loss(ref, v, x),
                              argnums=(0, 1))(vars_, x)
        jax.tree.map(lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-5), gm_v, gr_v)
    jax.tree.map(lambda a, b: np.testing.assert_allclose(
        np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-5), gm_v, gr_v)
    np.testing.assert_allclose(np.asarray(gm_x), np.asarray(gr_x),
                               rtol=1e-5, atol=1e-5)


def test_splice_gathers_in_order():
    b, s, d = 2, 10, 4
    embeds = jnp.zeros((b, s, d))
    # row 0: patches at positions 2,3; row 1: none
    mask = jnp.asarray([[0, 0, 1, 1, 0, 0, 0, 0, 0, 0],
                        [0] * 10], bool)
    feats = jnp.arange(b * 3 * d, dtype=jnp.float32).reshape(b, 3, d)
    out = splice_image_embeds(embeds, mask, feats)
    np.testing.assert_allclose(out[0, 2], feats[0, 0])
    np.testing.assert_allclose(out[0, 3], feats[0, 1])
    np.testing.assert_allclose(out[1], np.zeros((s, d)))  # untouched
    np.testing.assert_allclose(out[0, 4], np.zeros(d))


def _tiny_mmgpt():
    lm = tiny_lm()
    vit = tiny_vit()
    return MMGPTConfig(lm=lm, vit=vit, projector="conv", conv_stride=2,
                       image_patch_id=100, im_start_id=101, im_end_id=102)


def test_mmgpt_forward_and_loss():
    cfg = _tiny_mmgpt()
    model = MMGPT(cfg)
    tok_len = cfg.image_token_len  # (16/4/2)^2 = 4
    assert tok_len == 4

    b, s = 2, 16
    rng = np.random.default_rng(0)
    ids = rng.integers(1, 90, size=(b, s))
    # row 0 has one image: <im_start> 4x<im_patch> <im_end> at pos 1..6
    ids[0, 1] = 101
    ids[0, 2:6] = 100
    ids[0, 6] = 102
    ids = jnp.asarray(ids)
    images = jnp.asarray(rng.normal(size=(b, 1, 16, 16, 3)), jnp.float32)
    labels = jnp.asarray(rng.integers(1, 90, size=(b, s)))

    variables = model.init(jax.random.key(0), ids, images=images, labels=labels)
    logits, cache, loss = model.apply(variables, ids, images=images,
                                      labels=labels)
    assert logits.shape == (b, s, cfg.lm.vocab_size)
    assert cache is None
    assert np.isfinite(float(loss))


def test_mmgpt_text_only_keeps_tower_params_in_grad():
    """Zero-image batches must still produce (zero) grads for the tower --
    the structural equivalent of the reference's dummy-feature trick."""
    cfg = _tiny_mmgpt()
    model = MMGPT(cfg)
    b, s = 1, 8
    ids = jnp.asarray(np.random.default_rng(1).integers(1, 90, size=(b, s)))
    images = jnp.zeros((b, 1, 16, 16, 3), jnp.float32)
    labels = ids
    variables = model.init(jax.random.key(0), ids, images=images, labels=labels)
    params = nn.unbox(variables["params"])

    def loss_fn(p):
        _, _, loss = model.apply({"params": p}, ids, images=images,
                                 labels=labels)
        return loss

    grads = jax.grad(loss_fn)(params)
    assert "vision_tower" in grads  # tower stays in the graph
    lm_grad_norm = float(
        jnp.linalg.norm(grads["lm"]["embed_tokens"]["embedding"]))
    assert lm_grad_norm > 0
