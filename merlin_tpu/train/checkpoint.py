"""Orbax checkpointing: step checkpoints with rotation + auto-resume.

Replaces the reference's HF-Trainer checkpoints / DeepSpeed ZeRO-3 gather /
``_safe_save`` CPU offload (trainer.py:29-43, peft_utils.py:4-15): orbax
writes each process's param shards directly (no gather needed), and — an
improvement the reference lacks (SURVEY.md §5 "data-stream state is NOT
checkpointed") — the data-iterator/sampler state rides along as JSON.
"""

from __future__ import annotations

import json
import os
import re
import shutil
from typing import Any, Dict, Optional, Tuple

import jax

CKPT_RE = re.compile(r"checkpoint-(\d+)$")


def _checkpointer():
    import orbax.checkpoint as ocp
    return ocp.StandardCheckpointer()


def list_checkpoints(output_dir: str):
    if not os.path.isdir(output_dir):
        return []
    out = []
    for name in os.listdir(output_dir):
        m = CKPT_RE.match(name)
        if m:
            out.append((int(m.group(1)), os.path.join(output_dir, name)))
    return sorted(out)


def latest_checkpoint(output_dir: str) -> Optional[str]:
    ckpts = list_checkpoints(output_dir)
    return ckpts[-1][1] if ckpts else None


def save_checkpoint(output_dir: str, step: int, state,
                    data_state: Optional[Dict] = None,
                    save_total_limit: int = 0) -> str:
    """Write checkpoint-{step}/ with the train state + data-iterator JSON;
    rotate old checkpoints beyond save_total_limit (pretrain.sh:21-22)."""
    path = os.path.join(os.path.abspath(output_dir), f"checkpoint-{step}")
    ckptr = _checkpointer()
    ckptr.save(os.path.join(path, "state"), state, force=True)
    ckptr.wait_until_finished()
    if data_state is not None and jax.process_index() == 0:
        with open(os.path.join(path, "data_state.json"), "w") as f:
            json.dump(data_state, f)
    if save_total_limit > 0:
        ckpts = list_checkpoints(output_dir)
        for _, old in ckpts[:-save_total_limit]:
            if os.path.abspath(old) != path:
                shutil.rmtree(old, ignore_errors=True)
    return path


def restore_checkpoint(path: str, abstract_state
                       ) -> Tuple[Any, Optional[Dict]]:
    """Restore (state, data_state) from a checkpoint-{step} dir. Pass an
    abstract/shaped state (e.g. jax.eval_shape of create) so orbax restores
    with the right shardings."""
    ckptr = _checkpointer()
    state = ckptr.restore(os.path.join(os.path.abspath(path), "state"),
                          abstract_state)
    data_state = None
    ds_path = os.path.join(path, "data_state.json")
    if os.path.exists(ds_path):
        with open(ds_path) as f:
            data_state = json.load(f)
    return state, data_state
