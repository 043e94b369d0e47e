"""Logical-axis partitioning rules.

Models annotate parameters and activations with *logical* axis names
(``embed``, ``heads``, ``mlp``, ``vocab``, ``batch`` ...). This module maps
them to *physical* mesh axes (``data``/``fsdp``/``seq``/``tensor``). The
parallelism strategy is therefore a table, not code spread through models:

  * FSDP       = shard ``embed`` on the fsdp axis (params gathered on use)
  * TP         = shard ``heads``/``mlp``/``vocab`` on the tensor axis
  * DP         = shard ``batch`` on (data, fsdp)
  * SP         = shard ``act_seq`` on the seq axis (activation sequence dim)

This replaces the reference's FSDP auto-wrap policy + NCCL with sharding
annotations that XLA lowers to ICI collectives (SURVEY.md §2.6).
"""

from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple

import jax
from flax import linen as nn
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

# (logical axis name, physical mesh axis (or tuple, or None=replicated))
DEFAULT_LOGICAL_AXIS_RULES: Tuple[Tuple[str, Any], ...] = (
    # --- parameter axes ---
    ("embed", "fsdp"),          # row dim of most weights: FSDP shard
    ("heads", "tensor"),        # attention heads: TP shard
    ("kv", None),               # per-head dim: never sharded
    ("mlp", "tensor"),          # MLP hidden: TP shard
    ("vocab", "tensor"),        # embedding/lm_head vocab dim: TP shard
    ("norm", None),
    ("layers", None),           # scan_layers stacked-layer dim: replicated
    # vision tower
    ("vit_embed", "fsdp"),
    ("vit_mlp", "tensor"),
    ("vit_heads", "tensor"),
    ("vit_patches", None),
    ("conv_hw", None),
    ("conv_in", None),
    ("conv_out", "tensor"),
    # --- activation axes ---
    ("batch", ("data", "fsdp")),
    ("act_seq", "seq"),
    ("act_embed", None),
    ("act_heads", "tensor"),
    ("act_mlp", "tensor"),
    ("act_vocab", "tensor"),
    # --- optimizer/expert ---
    ("expert", "expert"),
)


def logical_axis_rules(overrides: Optional[Sequence[Tuple[str, Any]]] = None):
    """Default rules with optional overrides prepended (first match wins)."""
    if not overrides:
        return DEFAULT_LOGICAL_AXIS_RULES
    return tuple(overrides) + DEFAULT_LOGICAL_AXIS_RULES


def spec_for_logical(logical_axes: Sequence[Optional[str]],
                     rules=DEFAULT_LOGICAL_AXIS_RULES) -> P:
    """(logical names per dim) -> PartitionSpec via the rules table."""
    table = dict(rules)
    return P(*(table.get(name) if name is not None else None
               for name in logical_axes))


def sharding_for_tree(logical_tree, mesh: Mesh,
                      rules=DEFAULT_LOGICAL_AXIS_RULES):
    """Map a pytree of logical-axis tuples to NamedShardings on ``mesh``.

    ``logical_tree`` is what ``nn.get_partition_spec`` returns for a model
    whose params are wrapped in ``nn.with_logical_partitioning`` — a pytree
    with PartitionSpecs of *logical* names at the leaves.
    """
    with mesh, nn.logical_axis_rules(rules):
        return jax.tree_util.tree_map(
            lambda spec: NamedSharding(mesh, nn.logical_to_mesh(spec))
            if isinstance(spec, P)
            else NamedSharding(mesh, P()),
            logical_tree,
            is_leaf=lambda x: isinstance(x, P),
        )


def shard_logical(x, logical_axes: Sequence[Optional[str]], mesh: Mesh,
                  rules=DEFAULT_LOGICAL_AXIS_RULES):
    """Constrain an activation inside jit to a logical sharding."""
    spec = spec_for_logical(logical_axes, rules)
    return jax.lax.with_sharding_constraint(x, NamedSharding(mesh, spec))
