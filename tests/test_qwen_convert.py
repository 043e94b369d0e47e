"""Qwen-VL tower + Resampler checkpoint-converter parity (VERDICT r1 #10).

No HF equivalent of the reference's vendored Qwen visual stack exists in
this environment, so each test builds a tiny torch module implementing the
REFERENCE semantics from spec (qwen_nosampler_encoder.py): the tower's
VisualAttention packs qkv interleaved per head (:202-212) and adds a
learned absolute pos table; the Resampler is a standard
nn.MultiheadAttention cross-attend with sincos positions on query/key only
(:152-162). Converting the torch state dict must reproduce outputs.
"""

import math

import numpy as np
import pytest
import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")


# --- tiny torch replica of the reference tower semantics -------------------

class _TorchQwenBlock(torch.nn.Module):
    def __init__(self, width, heads, mlp):
        super().__init__()
        from collections import OrderedDict
        self.ln_1 = torch.nn.LayerNorm(width, eps=1e-6)
        self.attn = torch.nn.Module()
        self.attn.in_proj = torch.nn.Linear(width, 3 * width)
        self.attn.out_proj = torch.nn.Linear(width, width)
        self.ln_2 = torch.nn.LayerNorm(width, eps=1e-6)
        self.mlp = torch.nn.Sequential(OrderedDict([
            ("c_fc", torch.nn.Linear(width, mlp)),
            ("gelu", torch.nn.GELU()),
            ("c_proj", torch.nn.Linear(mlp, width))]))
        self.heads = heads
        self.hd = width // heads

    def _attention(self, x):
        # reference VisualAttention: (s, b, np, 3*hn) split on the LAST dim
        # -> qkv interleaved per head
        b, s, w = x.shape
        mixed = self.attn.in_proj(x).view(b, s, self.heads, 3 * self.hd)
        q, k, v = mixed.split(self.hd, dim=-1)      # each (b, s, np, hn)
        q = q.permute(0, 2, 1, 3) / math.sqrt(self.hd)
        k = k.permute(0, 2, 1, 3)
        v = v.permute(0, 2, 1, 3)
        p = torch.softmax(q @ k.transpose(-2, -1), dim=-1)
        o = (p @ v).permute(0, 2, 1, 3).reshape(b, s, w)
        return self.attn.out_proj(o)

    def forward(self, x):
        x = x + self._attention(self.ln_1(x))
        return x + self.mlp(self.ln_2(x))


class _TorchQwenViT(torch.nn.Module):
    def __init__(self, width=16, layers=2, heads=2, mlp=32, patch=4, img=16):
        super().__init__()
        grid = img // patch
        self.conv1 = torch.nn.Conv2d(3, width, patch, patch, bias=False)
        self.positional_embedding = torch.nn.Parameter(
            0.02 * torch.randn(grid * grid, width))
        self.ln_pre = torch.nn.LayerNorm(width, eps=1e-6)
        self.transformer = torch.nn.Module()
        self.transformer.resblocks = torch.nn.ModuleList(
            [_TorchQwenBlock(width, heads, mlp) for _ in range(layers)])

    def forward(self, x):
        x = self.conv1(x).flatten(2).permute(0, 2, 1)   # (b, P, w)
        x = x + self.positional_embedding
        x = self.ln_pre(x)
        for blk in self.transformer.resblocks:
            x = blk(x)
        return x


def test_qwen_tower_converter_parity():
    from merlin_tpu.models.vit import (
        ViT, ViTConfig, qwen_vit_params_from_torch)

    torch.manual_seed(0)
    tm = _TorchQwenViT().eval()
    cfg = ViTConfig(hidden_size=16, num_layers=2, num_heads=2,
                    intermediate_size=32, patch_size=4, image_size=16,
                    activation="gelu", use_class_token=False,
                    pos_embed="learned", dtype=jnp.float32)
    params = jax.tree.map(jnp.asarray,
                          qwen_vit_params_from_torch(tm.state_dict(), cfg))
    pixels = np.random.default_rng(0).normal(size=(2, 16, 16, 3)) \
        .astype(np.float32)
    ours = ViT(cfg).apply({"params": params}, jnp.asarray(pixels))[-1]
    with torch.no_grad():
        theirs = tm(torch.tensor(pixels.transpose(0, 3, 1, 2))).numpy()
    np.testing.assert_allclose(np.asarray(ours), theirs, atol=2e-4, rtol=1e-3)


def test_qwen_tower_interleave_matters():
    """A block-packed (wrong) split must NOT match — guards the per-head
    interleave against 'simplification' to the usual [q;k;v] blocks."""
    from merlin_tpu.models.vit import (
        ViT, ViTConfig, qwen_vit_params_from_torch)

    torch.manual_seed(0)
    tm = _TorchQwenViT().eval()
    cfg = ViTConfig(hidden_size=16, num_layers=2, num_heads=2,
                    intermediate_size=32, patch_size=4, image_size=16,
                    activation="gelu", use_class_token=False,
                    pos_embed="learned", dtype=jnp.float32)
    params = qwen_vit_params_from_torch(tm.state_dict(), cfg)
    # corrupt: re-pack layer 0 q/k/v as if block-packed
    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
    w = sd["transformer.resblocks.0.attn.in_proj.weight"]
    params["layers_0"]["q_proj"]["kernel"] = w[:16].T.reshape(16, 2, 8)
    pixels = np.random.default_rng(0).normal(size=(1, 16, 16, 3)) \
        .astype(np.float32)
    ours = ViT(cfg).apply({"params": jax.tree.map(jnp.asarray, params)},
                          jnp.asarray(pixels))[-1]
    with torch.no_grad():
        theirs = tm(torch.tensor(pixels.transpose(0, 3, 1, 2))).numpy()
    assert not np.allclose(np.asarray(ours), theirs, atol=2e-4)


def test_resampler_converter_parity():
    from merlin_tpu.models.projectors import (
        Resampler, _sincos_2d_pos_embed, resampler_params_from_torch)

    dim, heads, c_in, grid = 16, 2, 12, 4
    nq = grid * grid
    torch.manual_seed(1)

    kv_proj = torch.nn.Linear(c_in, dim, bias=False)
    ln_q = torch.nn.LayerNorm(dim)
    ln_kv = torch.nn.LayerNorm(dim)
    ln_post = torch.nn.LayerNorm(dim)
    attn = torch.nn.MultiheadAttention(dim, heads)
    query = torch.nn.Parameter(0.02 * torch.randn(nq, dim))
    proj = torch.nn.Parameter(0.1 * torch.randn(dim, dim))
    pos = torch.tensor(np.asarray(_sincos_2d_pos_embed(dim, grid),
                                  np.float32))

    x = np.random.default_rng(0).normal(size=(2, nq, c_in)).astype(np.float32)
    with torch.no_grad():
        xt = ln_kv(kv_proj(torch.tensor(x))).permute(1, 0, 2)  # (P, b, dim)
        n = xt.shape[1]
        q = ln_q(query).unsqueeze(1).repeat(1, n, 1)
        # resampler forward: pos on query and KEY only (:155-162); official
        # Qwen-VL then applies ln_post + proj (the reference's are
        # commented out, :384-387)
        theirs = attn(q + pos.unsqueeze(1), xt + pos.unsqueeze(1), xt)[0]
        theirs = (ln_post(theirs.permute(1, 0, 2)) @ proj).numpy()

    sd = {"query": query, "kv_proj.weight": kv_proj.weight,
          "ln_q.weight": ln_q.weight, "ln_q.bias": ln_q.bias,
          "ln_kv.weight": ln_kv.weight, "ln_kv.bias": ln_kv.bias,
          "ln_post.weight": ln_post.weight, "ln_post.bias": ln_post.bias,
          "proj": proj,
          "attn.in_proj_weight": attn.in_proj_weight,
          "attn.in_proj_bias": attn.in_proj_bias,
          "attn.out_proj.weight": attn.out_proj.weight,
          "attn.out_proj.bias": attn.out_proj.bias}
    params = jax.tree.map(
        jnp.asarray,
        resampler_params_from_torch(sd, dim=dim, num_heads=heads))

    model = Resampler(out_features=dim, num_queries=nq, num_heads=heads,
                      dtype=jnp.float32)
    ours = model.apply({"params": params}, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(ours), theirs, atol=2e-4, rtol=1e-3)


def test_resampler_trained_pos_embed_survives_conversion():
    """The reference's pos_embed is a LEARNABLE parameter
    (qwen_nosampler_encoder.py:117-123): a trained checkpoint can hold
    non-sincos values and they must survive conversion BIT-EXACT and be
    used by the forward (VERDICT r2 #3)."""
    from merlin_tpu.models.projectors import (
        Resampler, _sincos_2d_pos_embed, resampler_params_from_torch)

    dim, heads, c_in, grid = 16, 2, 12, 4
    nq = grid * grid
    torch.manual_seed(2)

    kv_proj = torch.nn.Linear(c_in, dim, bias=False)
    ln_q = torch.nn.LayerNorm(dim)
    ln_kv = torch.nn.LayerNorm(dim)
    ln_post = torch.nn.LayerNorm(dim)
    attn = torch.nn.MultiheadAttention(dim, heads)
    query = torch.nn.Parameter(0.02 * torch.randn(nq, dim))
    proj = torch.nn.Parameter(0.1 * torch.randn(dim, dim))
    # "trained" pos_embed: sincos plus a visible perturbation
    pos = torch.nn.Parameter(
        torch.tensor(np.asarray(_sincos_2d_pos_embed(dim, grid), np.float32))
        + 0.3 * torch.randn(nq, dim))

    x = np.random.default_rng(3).normal(size=(2, nq, c_in)).astype(np.float32)
    with torch.no_grad():
        xt = ln_kv(kv_proj(torch.tensor(x))).permute(1, 0, 2)
        n = xt.shape[1]
        q = ln_q(query).unsqueeze(1).repeat(1, n, 1)
        theirs = attn(q + pos.unsqueeze(1), xt + pos.unsqueeze(1), xt)[0]
        theirs = (ln_post(theirs.permute(1, 0, 2)) @ proj).numpy()

    sd = {"query": query, "pos_embed": pos, "kv_proj.weight": kv_proj.weight,
          "ln_q.weight": ln_q.weight, "ln_q.bias": ln_q.bias,
          "ln_kv.weight": ln_kv.weight, "ln_kv.bias": ln_kv.bias,
          "ln_post.weight": ln_post.weight, "ln_post.bias": ln_post.bias,
          "proj": proj,
          "attn.in_proj_weight": attn.in_proj_weight,
          "attn.in_proj_bias": attn.in_proj_bias,
          "attn.out_proj.weight": attn.out_proj.weight,
          "attn.out_proj.bias": attn.out_proj.bias}
    params = resampler_params_from_torch(sd, dim=dim, num_heads=heads)
    np.testing.assert_array_equal(params["pos_embed"],
                                  pos.detach().numpy())  # bit-exact
    model = Resampler(out_features=dim, num_queries=nq, num_heads=heads,
                      dtype=jnp.float32)
    ours = model.apply({"params": jax.tree.map(jnp.asarray, params)},
                       jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(ours), theirs, atol=2e-4, rtol=1e-3)


def test_resampler_pos_embed_interpolates_to_key_grid():
    """Keys on a different grid see the pos_embed bicubic-resized
    (get_abs_pos, qwen_nosampler_encoder.py:28-44), not a freshly
    computed table."""
    from merlin_tpu.models.projectors import Resampler

    dim, heads, c_in = 16, 2, 12
    model = Resampler(out_features=dim, num_queries=16, num_heads=heads,
                      dtype=jnp.float32)
    x64 = jnp.asarray(np.random.default_rng(4).normal(size=(1, 64, c_in)),
                      jnp.float32)
    params = model.init(jax.random.key(0), x64)["params"]
    from flax import linen as nn
    params = nn.unbox(params)
    out = model.apply({"params": params}, x64)
    assert out.shape == (1, 16, dim)
    # perturbing pos_embed must change the output (it feeds the keys)
    params2 = dict(params)
    params2["pos_embed"] = params["pos_embed"] + 1.0
    out2 = model.apply({"params": params2}, x64)
    assert not np.allclose(np.asarray(out), np.asarray(out2))
