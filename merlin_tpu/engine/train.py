"""Training entry point (reference engine/train/train.py:32 parity).

    python -m merlin_tpu.engine.train \
        --model_name_or_path lmsys/vicuna-7b-v1.5 \
        --pair_datasets laion2b_10m_6merge \
        --interpair_datasets track_1m_v2_2merge+det_5m_v1_en_4merge \
        --output_dir output/pretrain ...

Flow: parse the three dataclass flag groups -> logger -> model+tokenizer ->
params (init or checkpoint) -> dataloader -> Trainer (auto-resume from the
newest checkpoint-* like train.py:56-59) -> train -> final save.
"""

from __future__ import annotations

import os
from typing import Optional, Sequence

import jax

from merlin_tpu.data.builder import batch_iterator, build_dataloader
from merlin_tpu.models.builder import build_model_tokenizer, init_or_load_params
from merlin_tpu.train.arguments import parse_args
from merlin_tpu.train.trainer import Trainer
from merlin_tpu.utils.logging import log_model_parameters, setup_logger


def train(argv: Optional[Sequence[str]] = None, *, tiny: bool = False):
    model_args, data_args, training_args = parse_args(argv)
    logger = setup_logger(training_args.output_dir, jax.process_index())
    logger.info("devices: %s (%d processes)", jax.device_count(),
                jax.process_count())

    bundle = build_model_tokenizer(model_args, data_args, training_args,
                                   tiny=tiny)
    init_or_load_params(
        bundle,
        lm_checkpoint=model_args.model_name_or_path
        if os.path.isdir(model_args.model_name_or_path) else None,
        vision_checkpoint=model_args.vision_tower
        if model_args.vision_tower and os.path.isdir(model_args.vision_tower)
        else None,
        composite_checkpoint=model_args.pretrain_model)
    log_model_parameters(logger, bundle.params, bundle.trainable_mask)

    data = build_dataloader(bundle.tokenizer, bundle.special_ids, data_args,
                            training_args,
                            process_index=jax.process_index(),
                            process_count=jax.process_count())
    global_batch = (training_args.per_device_train_batch_size
                    * training_args.gradient_accumulation_steps
                    * jax.local_device_count())

    trainer = Trainer(bundle, training_args)
    trainer.init_state()
    resumed = trainer.maybe_resume()
    # restore the exact data-stream cursor BEFORE the producer thread
    # starts pulling samples (falls back to seed+step replay when absent)
    data_state = getattr(trainer, "_resumed_data_state", None) or {}
    if resumed and data_state.get("datasets") is not None and \
            hasattr(data["train_dataset"], "load_data_state"):
        data["train_dataset"].load_data_state(data_state["datasets"])

    batches = batch_iterator(
        data["train_dataset"], data["collator"],
        batch_size=global_batch, sampler=data["sampler"])
    metrics = trainer.train(batches)
    trainer.save_final()
    logger.info("done: %s", metrics)
    return metrics


if __name__ == "__main__":
    train()
