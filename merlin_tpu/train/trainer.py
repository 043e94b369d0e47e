"""Trainer: the loop around the jitted step (reference MMGPTTrainer +
engine/train/train.py behavior, TPU-native).

Responsibilities: mesh setup, param/optimizer sharding by the logical
rules, host->device batch feed, step timing + loss logging, checkpoint
save/rotate/auto-resume (incl. data-iterator state), final save.
"""

from __future__ import annotations

import logging
import time
from typing import Any, Dict, Iterator, Optional

import jax
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from merlin_tpu.core.mesh import MeshConfig, create_mesh
from merlin_tpu.core.partitioning import DEFAULT_LOGICAL_AXIS_RULES
from merlin_tpu.train.checkpoint import (
    latest_checkpoint, restore_checkpoint, save_checkpoint)
from merlin_tpu.train.optimizer import build_optimizer
from merlin_tpu.train.step import TrainState, make_train_step, stack_microbatches

logger = logging.getLogger("merlin_tpu.train")


def shard_params_by_rules(model, params, mesh, sample_batch,
                          rules=DEFAULT_LOGICAL_AXIS_RULES):
    """Derive NamedShardings from the model's logical annotations and
    device_put the params accordingly."""
    from flax import linen as nn
    from merlin_tpu.core.partitioning import sharding_for_tree

    def init_fn():
        return model.init(jax.random.key(0), sample_batch["input_ids"][:1],
                          images=None)

    abstract = jax.eval_shape(init_fn)["params"]
    logical = nn.get_partition_spec(abstract)
    shardings = sharding_for_tree(logical, mesh, rules)
    # params may be unboxed already; match tree structures
    flat_s = jax.tree_util.tree_leaves_with_path(shardings)
    spec_by_path = {tuple(str(k) for k in path): s for path, s in flat_s}

    def put(path, x):
        s = spec_by_path.get(tuple(str(k) for k in path))
        if s is None:
            s = NamedSharding(mesh, P())
        return jax.device_put(x, s)

    return jax.tree_util.tree_map_with_path(put, params)


class Trainer:
    def __init__(self, bundle, training_args, *, mesh=None,
                 use_packing_segments: Optional[bool] = None):
        self.bundle = bundle
        self.args = training_args
        self.mesh = mesh or create_mesh(MeshConfig(
            data=training_args.mesh_data, fsdp=training_args.mesh_fsdp,
            seq=training_args.mesh_seq, tensor=training_args.mesh_tensor,
            dcn_data_parallelism=training_args.dcn_data_parallelism))
        from merlin_tpu.core.mesh import set_global_mesh
        set_global_mesh(self.mesh)  # lets kernels shard_map themselves
        n_vit = bundle.config.vit.num_layers
        n_llm = bundle.config.lm.num_layers
        self.tx, self.schedule = build_optimizer(
            training_args, n_vit_layers=n_vit, n_llm_layers=n_llm,
            trainable_fn=bundle.trainable_mask,
            embed_row_mask=bundle.embed_row_trainable)
        if use_packing_segments is None:
            use_packing_segments = getattr(
                training_args, "packing_segment_mask", False)
        self._train_step = make_train_step(
            bundle.model, self.tx, mesh=self.mesh,
            use_packing_segments=use_packing_segments,
            trainable_fn=bundle.trainable_mask)
        self.state: Optional[TrainState] = None

    # ------------------------------------------------------------------
    def init_state(self, params=None) -> TrainState:
        params = params if params is not None else self.bundle.params
        assert params is not None, "call init_or_load_params first"
        with self.mesh:
            create = jax.jit(lambda p: TrainState.create(p, self.tx))
            self.state = create(params)
        return self.state

    def maybe_resume(self) -> int:
        """Auto-resume from the newest checkpoint-* dir
        (train.py:56-59 behavior). Returns the resumed step (0 if fresh)."""
        path = self.args.resume_from_checkpoint or latest_checkpoint(
            self.args.output_dir)
        if not path:
            return 0
        abstract = jax.eval_shape(lambda: self.state)
        self.state, data_state = restore_checkpoint(path, abstract)
        step = int(self.state.step)
        logger.info("resumed from %s at step %d", path, step)
        self._resumed_data_state = data_state
        return step

    # ------------------------------------------------------------------
    def train(self, batches: Iterator[Dict[str, np.ndarray]],
              *, num_steps: Optional[int] = None,
              log_fn=None) -> Dict[str, float]:
        args = self.args
        assert self.state is not None, "call init_state first"
        total = num_steps or (args.max_steps if args.max_steps > 0
                              else args.num_train_steps)
        start_step = int(self.state.step)
        accum = max(args.gradient_accumulation_steps, 1)
        last_metrics: Dict[str, float] = {}

        # throughput/MFU tracking (utils/profiling: SURVEY.md §5 subsystem)
        from merlin_tpu.utils.profiling import StepTimer, train_step_flops
        n_params = sum(int(x.size) for x in
                       jax.tree_util.tree_leaves(self.state.params))
        tokens_per_step = (args.per_device_train_batch_size * accum
                           * jax.device_count() * args.model_max_length)
        timer = StepTimer(
            tokens_per_step=tokens_per_step,
            flops_per_step=train_step_flops(
                n_params, tokens_per_step, args.gradient_checkpointing))

        batches = self._device_prefetch(batches, accum)
        t0 = time.perf_counter()
        for step in range(start_step, total):
            batch = next(batches)
            self.state, metrics = self._train_step(self.state, batch)

            if args.logging_steps and (step + 1) % args.logging_steps == 0:
                metrics = {k: float(v) for k, v in metrics.items()}
                dt = time.perf_counter() - t0
                t0 = time.perf_counter()
                metrics["lr"] = float(self.schedule(step))
                metrics["step_time_s"] = dt / args.logging_steps
                metrics.update(timer.tick())
                last_metrics = metrics
                msg = " ".join(f"{k}={v:.4g}" for k, v in metrics.items())
                logger.info("step %d: %s", step + 1, msg)
                if log_fn:
                    log_fn(step + 1, metrics)

            if args.save_steps and (step + 1) % args.save_steps == 0:
                save_checkpoint(args.output_dir, step + 1, self.state,
                                data_state=self._data_state(step + 1),
                                save_total_limit=args.save_total_limit)
        return last_metrics

    def _data_state(self, step: int) -> Dict:
        """seed+step (replay fallback) + the exact stream cursor of the
        last consumed batch when the pipeline provides one."""
        out = {"step": step, "seed": self.args.seed}
        cursor = getattr(self, "_consumed_data_state", None)
        if cursor is not None:
            out["datasets"] = cursor
        return out

    def _device_prefetch(self, batches, accum: int, depth: int = 2):
        """Stack microbatches and device_put ahead of consumption so H2D
        transfer overlaps the previous step (the reference relies on torch
        DataLoader pin_memory + workers for this). Each batch's attached
        resume cursor (``__data_state__``) is recorded when the batch is
        YIELDED, so checkpoints never run ahead of consumption."""
        import collections

        sharding = NamedSharding(self.mesh, P(None, ("data", "fsdp")))
        queue = collections.deque()

        def pop(entry):
            batch, state = entry
            if state is not None:
                self._consumed_data_state = state
            return batch

        for batch in batches:
            state = batch.pop("__data_state__", None) \
                if isinstance(batch, dict) else None
            batch = stack_microbatches(batch, accum)
            queue.append((jax.device_put(batch, sharding), state))
            if len(queue) >= depth:
                yield pop(queue.popleft())
        while queue:
            yield pop(queue.popleft())

    def save_final(self):
        return save_checkpoint(
            self.args.output_dir, int(self.state.step), self.state,
            data_state=self._data_state(int(self.state.step)),
            save_total_limit=0)
