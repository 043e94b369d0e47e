"""PyTorch (HF) checkpoint -> flax param-tree conversion.

The reference loads HF `pytorch_model.bin` checkpoints (sharded or single)
and re-extracts tower/projector weights by key prefix
(clip_encoder.py:26-62, base_projector.py:12-48). Here, conversion maps HF
state-dict keys into the :class:`merlin_tpu.models.decoder.CausalLM` /
vision-tower param trees, reshaping 2D (out,in) kernels into the
(in, heads, head_dim) einsum layouts the TPU models use.

All functions take a ``state_dict``-like mapping of numpy arrays (use
:func:`load_torch_state_dict` to read .bin/.safetensors without GPU torch).
"""

from __future__ import annotations

import os
from typing import Any, Dict, Mapping, Optional

import numpy as np

from merlin_tpu.models.decoder import DecoderConfig


def _np(x) -> np.ndarray:
    if isinstance(x, np.ndarray):
        return x
    try:  # torch tensor without importing torch at module scope
        return x.detach().cpu().float().numpy()
    except AttributeError:
        return np.asarray(x)


def load_torch_state_dict(path: str) -> Dict[str, np.ndarray]:
    """Load a single/sharded HF checkpoint directory or file into numpy."""
    import json

    def load_one(p):
        if p.endswith(".safetensors"):
            from safetensors.numpy import load_file
            return load_file(p)
        import torch
        sd = torch.load(p, map_location="cpu", weights_only=True)
        return {k: _np(v) for k, v in sd.items()}

    if os.path.isfile(path):
        return load_one(path)

    out: Dict[str, np.ndarray] = {}
    index_files = [f for f in os.listdir(path) if f.endswith(".index.json")]
    if index_files:
        with open(os.path.join(path, index_files[0])) as f:
            shards = sorted(set(json.load(f)["weight_map"].values()))
        for shard in shards:
            out.update(load_one(os.path.join(path, shard)))
        return out
    for fname in sorted(os.listdir(path)):
        if fname.endswith((".bin", ".safetensors")) and "training_args" not in fname:
            out.update(load_one(os.path.join(path, fname)))
    return out


def extract_by_prefix(state_dict: Mapping[str, Any], prefix: str) -> Dict[str, Any]:
    """Sub-dict of keys under ``prefix`` (reference composite-checkpoint
    re-extraction, e.g. 'model.vision_tower.')."""
    return {k[len(prefix):]: v for k, v in state_dict.items()
            if k.startswith(prefix)}


def stack_layer_params(params: Dict[str, Any], num_layers: int
                       ) -> Dict[str, Any]:
    """Loop-decoder param tree (layers_{i} subtrees) -> scan_layers tree
    (one 'layers/block' subtree with a stacked leading axis). Inverse of
    :func:`unstack_layer_params`."""
    import jax

    p = dict(params)
    layers = [p.pop(f"layers_{i}") for i in range(num_layers)]
    p["layers"] = {"block": jax.tree.map(
        lambda *xs: np.stack([np.asarray(x) for x in xs]), *layers)}
    return p


def unstack_layer_params(params: Dict[str, Any]) -> Dict[str, Any]:
    """scan_layers param tree -> loop-decoder tree (for serving/decode,
    which keeps the per-layer KV-cache structure)."""
    import jax

    p = dict(params)
    stacked = p.pop("layers")["block"]
    num_layers = jax.tree_util.tree_leaves(stacked)[0].shape[0]
    for i in range(num_layers):
        p[f"layers_{i}"] = jax.tree.map(
            lambda x, i=i: np.asarray(x)[i], stacked)
    return p


# modules whose kernels quantize for int8 weight-only serving, mapped to
# the number of CONTRACTION (input) axes of their kernel; the remaining
# trailing axes are output channels (one scale each). A leading stacked
# layer axis (scan_layers trees: layers/block/...) is handled by position.
_Q8_KERNELS = {"q_proj": 1, "k_proj": 1, "v_proj": 1, "o_proj": 2,
               "gate_proj": 1, "up_proj": 1, "down_proj": 1,
               "fc1": 1, "fc2": 1, "lm_head": 1}


import functools


@functools.lru_cache(maxsize=None)
def _quantize_jax_fn(n_contract: int, stacked: bool):
    import jax
    import jax.numpy as jnp

    def one(k):
        k = k.astype(jnp.float32)
        axes = tuple(range(n_contract))
        s = jnp.max(jnp.abs(k), axis=axes, keepdims=True) / 127.0
        s = jnp.maximum(s, 1e-12)
        q = jnp.clip(jnp.rint(k / s), -127, 127).astype(jnp.int8)
        return q, jnp.squeeze(s, axis=axes).astype(jnp.float32)

    return jax.jit((lambda k: jax.lax.map(one, k)) if stacked else one)


def _quantize_jax(kernel, n_contract: int, stacked: bool):
    """On-device per-out-channel absmax int8 quantization, O(slice) temps."""
    return _quantize_jax_fn(n_contract, stacked)(kernel)


def quantize_decoder_params_int8(params: Dict[str, Any],
                                 donate: bool = False) -> Dict[str, Any]:
    """Trained f32 decoder tree -> the ``weight_dtype='int8'`` tree.

    Per-output-channel symmetric absmax quantization: each matmul kernel
    becomes ``kernel_q8`` (int8) + ``kernel_scale`` (f32 over the output
    dims), with y = (x @ q8) * scale == x @ (q8 * scale) exactly.
    Embeddings, norms, and biases stay full precision. Works on loop
    (layers_{i}) and scanned (layers/block, stacked leading axis) trees.

    ``donate=True`` frees each source kernel's device buffer as soon as
    its int8 replacement is materialized (and strips it from the INPUT
    tree, which becomes unusable). Without it a 7B bf16 tree (13.5 GB)
    plus its int8 copy (~6.75 GB) cannot coexist on a 16 GB chip — with
    it the peak is the source tree plus one kernel's f32 temp.
    """
    import jax

    def quantize(kernel, n_contract: int, stacked: bool):
        # device arrays quantize on-device (a 7B tree would otherwise
        # round-trip ~27 GB of f32 through the host), jitted so the f32
        # temp never materializes whole: for scan_layers trees the stacked
        # MLP kernel is (32, 4096, 11008) and an eager .astype(f32) is a
        # 5.8 GB buffer on top of the 13.5 GB resident source tree — the
        # r4 serving_int8w OOM. lax.map over the layer axis keeps the
        # temp at one layer slice (~180 MB).
        if isinstance(kernel, jax.Array):
            return _quantize_jax(kernel, n_contract, stacked)
        kernel = np.asarray(kernel)
        k = kernel.astype(np.float32)
        axes = tuple(range(1, 1 + n_contract) if stacked
                     else range(n_contract))
        s = np.max(np.abs(k), axis=axes, keepdims=True) / 127.0
        s = np.maximum(s, 1e-12)
        q = np.clip(np.rint(k / s), -127, 127).astype(np.int8)
        return q, np.squeeze(s, axis=axes).astype(np.float32)

    def walk(node, name: str, stacked: bool):
        if isinstance(node, dict):
            if name in _Q8_KERNELS and "kernel" in node:
                src = node["kernel"]
                q, s = quantize(src, _Q8_KERNELS[name], stacked)
                out = {k: v for k, v in node.items() if k != "kernel"}
                out["kernel_q8"] = q
                out["kernel_scale"] = s
                if donate and isinstance(src, jax.Array):
                    jax.block_until_ready(q)   # q must land before src dies
                    node.pop("kernel")
                    src.delete()
                return out
            return {k: walk(v, k, stacked or k == "block")
                    for k, v in node.items()}
        return node

    return walk(dict(params), "", False)


def _qkv_kernel(w: np.ndarray, heads: int, head_dim: int) -> np.ndarray:
    """HF (out=h*d, in) -> (in, h, d)."""
    out_dim, in_dim = w.shape
    return w.T.reshape(in_dim, heads, head_dim)


def _o_kernel(w: np.ndarray, heads: int, head_dim: int) -> np.ndarray:
    """HF (out=hidden, in=h*d) -> (h, d, hidden)."""
    out_dim, in_dim = w.shape
    return w.T.reshape(heads, head_dim, out_dim)


def decoder_params_from_hf(
    state_dict: Mapping[str, Any],
    cfg: DecoderConfig,
    *,
    family: str = "llama",
) -> Dict[str, Any]:
    """Map HF decoder weights -> CausalLM flax params dict.

    Supported families: 'llama' (Vicuna/Llama), 'phi' (HF PhiForCausalLM),
    'opt', 'baichuan' (W_pack fused QKV).
    """
    sd = {k: _np(v) for k, v in state_dict.items()}
    h, hkv, d = cfg.num_heads, cfg.kv_heads, cfg.head_size
    p: Dict[str, Any] = {}

    def key(*cands):
        for c in cands:
            if c in sd:
                return sd[c]
        raise KeyError(f"none of {cands} in checkpoint (have {len(sd)} keys)")

    if family == "opt":
        base = "model.decoder."
        p["embed_tokens"] = {"embedding": key(base + "embed_tokens.weight")}
        p["embed_positions"] = {"embedding": key(base + "embed_positions.weight")}
    else:
        base = "model."
        p["embed_tokens"] = {"embedding": key(base + "embed_tokens.weight",
                                              "transformer.embed_tokens.weight")}

    for i in range(cfg.num_layers):
        lp: Dict[str, Any] = {}
        if family == "llama":
            lb = f"model.layers.{i}."
            attn = {
                "q_proj": {"kernel": _qkv_kernel(key(lb + "self_attn.q_proj.weight"), h, d)},
                "k_proj": {"kernel": _qkv_kernel(key(lb + "self_attn.k_proj.weight"), hkv, d)},
                "v_proj": {"kernel": _qkv_kernel(key(lb + "self_attn.v_proj.weight"), hkv, d)},
                "o_proj": {"kernel": _o_kernel(key(lb + "self_attn.o_proj.weight"), h, d)},
            }
            lp["attn"] = attn
            lp["mlp"] = {
                "gate_proj": {"kernel": key(lb + "mlp.gate_proj.weight").T},
                "up_proj": {"kernel": key(lb + "mlp.up_proj.weight").T},
                "down_proj": {"kernel": key(lb + "mlp.down_proj.weight").T},
            }
            lp["input_norm"] = {"scale": key(lb + "input_layernorm.weight")}
            lp["post_attn_norm"] = {"scale": key(lb + "post_attention_layernorm.weight")}
        elif family == "baichuan":
            lb = f"model.layers.{i}."
            wpack = key(lb + "self_attn.W_pack.weight")  # (3*hidden, hidden)
            hd = h * d
            wq, wk, wv = wpack[:hd], wpack[hd:2 * hd], wpack[2 * hd:]
            lp["attn"] = {
                "q_proj": {"kernel": _qkv_kernel(wq, h, d)},
                "k_proj": {"kernel": _qkv_kernel(wk, hkv, d)},
                "v_proj": {"kernel": _qkv_kernel(wv, hkv, d)},
                "o_proj": {"kernel": _o_kernel(key(lb + "self_attn.o_proj.weight"), h, d)},
            }
            lp["mlp"] = {
                "gate_proj": {"kernel": key(lb + "mlp.gate_proj.weight").T},
                "up_proj": {"kernel": key(lb + "mlp.up_proj.weight").T},
                "down_proj": {"kernel": key(lb + "mlp.down_proj.weight").T},
            }
            lp["input_norm"] = {"scale": key(lb + "input_layernorm.weight")}
            lp["post_attn_norm"] = {"scale": key(lb + "post_attention_layernorm.weight")}
        elif family == "phi":
            lb = f"model.layers.{i}."
            lp["attn"] = {
                "q_proj": {"kernel": _qkv_kernel(key(lb + "self_attn.q_proj.weight"), h, d),
                           "bias": key(lb + "self_attn.q_proj.bias").reshape(h, d)},
                "k_proj": {"kernel": _qkv_kernel(key(lb + "self_attn.k_proj.weight"), hkv, d),
                           "bias": key(lb + "self_attn.k_proj.bias").reshape(hkv, d)},
                "v_proj": {"kernel": _qkv_kernel(key(lb + "self_attn.v_proj.weight"), hkv, d),
                           "bias": key(lb + "self_attn.v_proj.bias").reshape(hkv, d)},
                "o_proj": {"kernel": _o_kernel(key(lb + "self_attn.dense.weight"), h, d),
                           "bias": key(lb + "self_attn.dense.bias")},
            }
            lp["mlp"] = {
                "fc1": {"kernel": key(lb + "mlp.fc1.weight").T,
                        "bias": key(lb + "mlp.fc1.bias")},
                "fc2": {"kernel": key(lb + "mlp.fc2.weight").T,
                        "bias": key(lb + "mlp.fc2.bias")},
            }
            lp["input_norm"] = {"scale": key(lb + "input_layernorm.weight"),
                                "bias": key(lb + "input_layernorm.bias")}
        elif family == "opt":
            lb = f"model.decoder.layers.{i}."
            lp["attn"] = {
                "q_proj": {"kernel": _qkv_kernel(key(lb + "self_attn.q_proj.weight"), h, d),
                           "bias": key(lb + "self_attn.q_proj.bias").reshape(h, d)},
                "k_proj": {"kernel": _qkv_kernel(key(lb + "self_attn.k_proj.weight"), hkv, d),
                           "bias": key(lb + "self_attn.k_proj.bias").reshape(hkv, d)},
                "v_proj": {"kernel": _qkv_kernel(key(lb + "self_attn.v_proj.weight"), hkv, d),
                           "bias": key(lb + "self_attn.v_proj.bias").reshape(hkv, d)},
                "o_proj": {"kernel": _o_kernel(key(lb + "self_attn.out_proj.weight"), h, d),
                           "bias": key(lb + "self_attn.out_proj.bias")},
            }
            lp["mlp"] = {
                "fc1": {"kernel": key(lb + "fc1.weight").T, "bias": key(lb + "fc1.bias")},
                "fc2": {"kernel": key(lb + "fc2.weight").T, "bias": key(lb + "fc2.bias")},
            }
            lp["input_norm"] = {"scale": key(lb + "self_attn_layer_norm.weight"),
                                "bias": key(lb + "self_attn_layer_norm.bias")}
            lp["post_attn_norm"] = {"scale": key(lb + "final_layer_norm.weight"),
                                    "bias": key(lb + "final_layer_norm.bias")}
        else:
            raise ValueError(f"unknown family {family}")
        p[f"layers_{i}"] = lp

    # final norm
    if family == "llama" or family == "baichuan":
        p["final_norm"] = {"scale": key("model.norm.weight")}
    elif family == "phi":
        p["final_norm"] = {"scale": key("model.final_layernorm.weight"),
                           "bias": key("model.final_layernorm.bias")}
    elif family == "opt":
        p["final_norm"] = {"scale": key("model.decoder.final_layer_norm.weight"),
                           "bias": key("model.decoder.final_layer_norm.bias")}

    # lm head
    if not cfg.tie_word_embeddings:
        w = key("lm_head.weight")
        if cfg.normhead:
            p["lm_head_kernel"] = w.T
        else:
            head = {"kernel": w.T}
            if cfg.lm_head_bias:
                head["bias"] = key("lm_head.bias")
            p["lm_head"] = head
    return p
