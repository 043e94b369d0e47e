"""Functional LoRA (reference PEFT usage rebuilt: model/builder.py:116-129,
utils/peft_utils.py).

Instead of wrapping modules (torch PEFT), LoRA lives at the param level:
a parallel tree of (a, b) factors for every targeted kernel. The forward
merges ``W + (alpha/r) * a @ b`` inside jit — one rank-r matmul per target,
XLA fuses the add — and gradients flow only through the factors, so the
optimizer state is rank-r too.

Targets follow the reference's ``find_all_linear_names`` (peft_utils.py:58-69):
every LM linear except the lm_head, never the vision tower or projector.
"""

from __future__ import annotations

import re
from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

DEFAULT_TARGET_RE = re.compile(
    r"^lm/layers_\d+/(attn/(q|k|v|o)_proj|mlp/(gate|up|down)_proj|mlp/fc[12])"
    r"/kernel$")


def _path_str(path) -> str:
    from merlin_tpu.train.optimizer import path_names
    return "/".join(path_names(path))


def find_lora_targets(params, target_re=DEFAULT_TARGET_RE) -> List[str]:
    """Kernel paths to adapt (reference find_all_linear_names semantics)."""
    out = []
    for path, leaf in jax.tree_util.tree_leaves_with_path(params):
        name = _path_str(path)
        if target_re.match(name) and leaf.ndim >= 2:
            out.append(name)
    return sorted(out)


def init_lora_params(params, *, rank: int = 64, rng: Optional[jax.Array] = None,
                     target_re=DEFAULT_TARGET_RE) -> Dict[str, Dict[str, Any]]:
    """{kernel path: {a: (in, r), b: (r, out)}}; b zero-init so the adapted
    model starts exactly at the base model."""
    rng = rng if rng is not None else jax.random.key(0)
    lora: Dict[str, Dict[str, Any]] = {}
    for path, leaf in jax.tree_util.tree_leaves_with_path(params):
        name = _path_str(path)
        if not (target_re.match(name) and leaf.ndim >= 2):
            continue
        in_dim = leaf.shape[0]
        out_dim = int(np.prod(leaf.shape[1:]))
        rng, sub = jax.random.split(rng)
        lora[name] = {
            "a": jax.random.normal(sub, (in_dim, rank), jnp.float32)
            * (1.0 / rank),
            "b": jnp.zeros((rank, out_dim), jnp.float32),
        }
    return lora


def merge_lora(params, lora: Dict[str, Dict[str, Any]], *,
               rank: int = 64, alpha: float = 16.0):
    """params with adapted kernels: W + (alpha/rank) * a@b (reshaped)."""
    scale = alpha / rank

    def merge(path, leaf):
        name = _path_str(path)
        entry = lora.get(name)
        if entry is None:
            return leaf
        delta = (entry["a"] @ entry["b"]).reshape(leaf.shape) * scale
        return leaf + delta.astype(leaf.dtype)

    return jax.tree_util.tree_map_with_path(merge, params)


def make_lora_loss_fn(model, base_params, *, rank: int, alpha: float,
                      use_packing_segments: bool = False):
    """loss(lora_params, batch): base params are closed over (frozen)."""
    from merlin_tpu.train.step import make_loss_fn

    inner = make_loss_fn(model, use_packing_segments=use_packing_segments)

    def loss_fn(lora_params, batch):
        merged = merge_lora(base_params, lora_params, rank=rank, alpha=alpha)
        return inner(merged, batch)

    return loss_fn


def split_lora_state(params, lora) -> Tuple[Dict, Dict]:
    """(lora_state, non_lora_trainables) for the reference's split save
    (train.py:64-77): lora factors separately from other trainables
    (projector, new embeddings)."""
    non_lora = {
        "projector": params.get("projector"),
    }
    return dict(lora), non_lora
