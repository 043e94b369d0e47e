"""Optimizer: AdamW + cosine/warmup schedule + layer-wise LR decay + the
freeze matrix, as optax transforms over the param-path tree.

Reference parity:
  * AdamW(b2=0.95, eps=1e-8, wd=0.05) with no decay on biases/rank-1 params
    (llrd_utils.get_param_groups default condition)
  * LLRD: ViT encoder layer i scaled 0.9**(n_vit-1-i-1)... precisely
    0.9**(n_vit - i - 2) matching ``vit_lr_scale_func`` (0.9**(23-i-1) for
    the 24-layer CLIP-L), other vision params 0.1; LLM layer i scaled
    0.931**(n_llm - i - 1) (``llm_lr_scale_func``)
  * frozen subtrees get no updates and no Adam state (optax.multi_transform
    with set_to_zero)
  * "frozen LM but trainable new-token rows": a per-row gradient mask on
    the embedding (base_mmgpt.py:78-97 restore-orig-embeddings trick,
    implemented the functional way)
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax


def path_names(path) -> Tuple[str, ...]:
    """jax key-path -> plain name tuple."""
    out = []
    for p in path:
        if hasattr(p, "key"):
            out.append(str(p.key))
        elif hasattr(p, "name"):
            out.append(str(p.name))
        else:
            out.append(str(p))
    return tuple(out)


def _layer_index(names: Tuple[str, ...]) -> Optional[int]:
    for n in names:
        if n.startswith("layers_"):
            return int(n.split("_")[1])
    return None


def lr_scale_for_path(names: Tuple[str, ...], *, llrd: bool, llm_llrd: bool,
                      n_vit_layers: int, n_llm_layers: int) -> float:
    if llrd and names[0] == "vision_tower":
        idx = _layer_index(names)
        if idx is not None:
            return 0.9 ** (n_vit_layers - idx - 2)
        return 0.1
    if llm_llrd and names[0] == "lm":
        idx = _layer_index(names)
        if idx is not None:
            return 0.931 ** (n_llm_layers - idx - 1)
    return 1.0


def weight_decay_mask(params) -> Any:
    """No decay on biases / rank<=1 params (norm scales, embeddings keep
    decay? reference: rank-1 excluded; embeddings are rank-2 -> decayed)."""
    return jax.tree_util.tree_map_with_path(
        lambda path, x: not (path_names(path)[-1] == "bias" or x.ndim <= 1),
        params)


def make_lr_schedule(args) -> optax.Schedule:
    total = args.max_steps if args.max_steps > 0 else args.num_train_steps
    warmup = max(int(total * args.warmup_ratio), 1)
    if args.lr_scheduler_type == "cosine":
        return optax.warmup_cosine_decay_schedule(
            0.0, args.learning_rate, warmup, max(total, warmup + 1), 0.0)
    if args.lr_scheduler_type == "linear":
        return optax.join_schedules(
            [optax.linear_schedule(0.0, args.learning_rate, warmup),
             optax.linear_schedule(args.learning_rate, 0.0, total - warmup)],
            [warmup])
    return lambda _: args.learning_rate  # constant


def scale_by_path(scale_fn: Callable[[Tuple[str, ...]], float]
                  ) -> optax.GradientTransformation:
    def init(params):
        del params
        return optax.EmptyState()

    def update(updates, state, params=None):
        del params
        updates = jax.tree_util.tree_map_with_path(
            lambda path, u: u * scale_fn(path_names(path)), updates)
        return updates, state

    return optax.GradientTransformation(init, update)


def mask_embedding_rows(row_mask: Optional[np.ndarray]
                        ) -> optax.GradientTransformation:
    """Zero gradient rows of lm/embed_tokens/embedding where row_mask==0."""
    def init(params):
        del params
        return optax.EmptyState()

    def update(updates, state, params=None):
        del params
        if row_mask is None:
            return updates, state
        mask = jnp.asarray(row_mask)

        def apply(path, u):
            names = path_names(path)
            if names[-2:] == ("embed_tokens", "embedding"):
                return u * mask[:, None]
            return u

        return jax.tree_util.tree_map_with_path(apply, updates), state

    return optax.GradientTransformation(init, update)


def build_optimizer(args, *, n_vit_layers: int = 24, n_llm_layers: int = 32,
                    trainable_fn: Optional[Callable] = None,
                    embed_row_mask: Optional[np.ndarray] = None,
                    max_grad_norm: Optional[float] = None
                    ) -> Tuple[optax.GradientTransformation, optax.Schedule]:
    schedule = make_lr_schedule(args)
    if max_grad_norm is None:
        max_grad_norm = getattr(args, "max_grad_norm", 1.0)

    def scale_fn(names):
        return lr_scale_for_path(
            names, llrd=args.llrd, llm_llrd=args.llm_llrd,
            n_vit_layers=n_vit_layers, n_llm_layers=n_llm_layers)

    inner = optax.chain(
        optax.clip_by_global_norm(max_grad_norm),
        optax.scale_by_adam(b1=args.adam_beta1, b2=args.adam_beta2,
                            eps=args.adam_epsilon),
        optax.add_decayed_weights(args.weight_decay, mask=weight_decay_mask),
        scale_by_path(scale_fn),
        optax.scale_by_learning_rate(schedule),
        # last: the row mask must also stop weight decay on frozen rows
        mask_embedding_rows(embed_row_mask),
    )

    if trainable_fn is None:
        return inner, schedule

    def labels(params):
        return jax.tree_util.tree_map_with_path(
            lambda path, _: "train" if trainable_fn(path_names(path))
            else "freeze", params)

    tx = optax.multi_transform(
        {"train": inner, "freeze": optax.set_to_zero()}, labels)
    return tx, schedule
