"""Checkpoint surgery tools (reference utils/interpolate_model.py,
make_delta.py, apply_delta.py rebuilt).

* position-embedding interpolation for resolution upgrades (224->448) —
  also applied automatically at load time by vit_params_from_hf; this CLI
  rewrites a saved param tree like the reference's offline surgery
* weight deltas for license-safe release: delta = finetuned - base;
  apply = base + delta (LLaVA-style make/apply, both of which import a
  nonexistent llava package in the reference)
"""

from __future__ import annotations

import os
from typing import Any, Dict

import jax
import numpy as np


def tree_sub(fine: Any, base: Any) -> Any:
    """delta = fine - base (make_delta.py behavior)."""
    return jax.tree.map(lambda f, b: np.asarray(f) - np.asarray(b),
                        fine, base)


def tree_add(base: Any, delta: Any) -> Any:
    """fine = base + delta (apply_delta.py behavior)."""
    return jax.tree.map(lambda b, d: np.asarray(b) + np.asarray(d),
                        base, delta)


def save_params(path: str, params: Any) -> None:
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    ckptr.save(os.path.abspath(path), params, force=True)
    ckptr.wait_until_finished()


def load_params(path: str, abstract: Any = None) -> Any:
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    return ckptr.restore(os.path.abspath(path), abstract)


def make_delta(base_path: str, finetuned_path: str, delta_path: str) -> None:
    base = load_params(base_path)
    fine = load_params(finetuned_path)
    save_params(delta_path, tree_sub(fine, base))


def apply_delta(base_path: str, delta_path: str, out_path: str) -> None:
    base = load_params(base_path)
    delta = load_params(delta_path)
    save_params(out_path, tree_add(base, delta))


def interpolate_checkpoint_pos_embed(params: Dict, new_positions: int) -> Dict:
    """Bicubic-resize the vision tower's position table inside a param tree
    (interpolate_model.py:8-32 equivalent, tree-level)."""
    from merlin_tpu.models.vit import interpolate_pos_embedding

    params = jax.tree.map(lambda x: x, params)  # shallow copy
    vit = params["vision_tower"]["vit"]
    vit["position_embedding"] = interpolate_pos_embedding(
        np.asarray(vit["position_embedding"]), new_positions)
    return params


def main():
    import argparse

    p = argparse.ArgumentParser(description="checkpoint surgery")
    sub = p.add_subparsers(dest="cmd", required=True)
    mk = sub.add_parser("make-delta")
    mk.add_argument("--base", required=True)
    mk.add_argument("--finetuned", required=True)
    mk.add_argument("--delta", required=True)
    ap = sub.add_parser("apply-delta")
    ap.add_argument("--base", required=True)
    ap.add_argument("--delta", required=True)
    ap.add_argument("--out", required=True)
    args = p.parse_args()
    if args.cmd == "make-delta":
        make_delta(args.base, args.finetuned, args.delta)
    else:
        apply_delta(args.base, args.delta, args.out)


if __name__ == "__main__":
    main()
