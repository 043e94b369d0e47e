"""Dataset factory + host dataloader (reference data/builder.py:13-79).

``build_dataloader`` instantiates one dataset per '+'-separated registry
name per family flag, concatenates them, and returns the training iterator
pieces. The loader itself is a thread-prefetched Python iterator (the
TPU-side equivalent of torch DataLoader workers): batches are numpy; the
train step moves them to device and runs the fused image normalization
there.
"""

from __future__ import annotations

import queue
import threading
from typing import Dict, Iterator, List, Optional, Sequence

from merlin_tpu.data.collator import Collator
from merlin_tpu.data.conversation_dataset import ConversationDataset
from merlin_tpu.data.registry import parse_dataset_flag
from merlin_tpu.data.sampler import LengthGroupedSampler
from merlin_tpu.data.webdatasets import (
    InterleaveWebDataset, InterPairWebDataset, MultimodalCfg,
    PairTokenWebDataset, PairWebDataset)


class ConcatDataset:
    def __init__(self, datasets: Sequence):
        self.datasets = list(datasets)
        self._sizes = [len(d) for d in self.datasets]

    def __len__(self):
        return sum(self._sizes)

    def __getitem__(self, i):
        for d, n in zip(self.datasets, self._sizes):
            if i < n:
                return d[i]
            i -= n
        raise IndexError(i)

    @property
    def lengths(self):
        out = []
        for d in self.datasets:
            out.extend(getattr(d, "lengths", [1] * len(d)))
        return out

    @property
    def modality_lengths(self):
        out = []
        for d in self.datasets:
            out.extend(getattr(d, "modality_lengths", [1] * len(d)))
        return out

    # -- resume cursor: one entry per child (None where unsupported) ------
    def data_state(self):
        return [d.data_state() if hasattr(d, "data_state") else None
                for d in self.datasets]

    def load_data_state(self, states):
        for d, s in zip(self.datasets, states or []):
            if s is not None and hasattr(d, "load_data_state"):
                d.load_data_state(s)


def build_dataloader(tokenizer, special_ids, data_args, training_args,
                     *, process_index: Optional[int] = None,
                     process_count: Optional[int] = None) -> Dict:
    """Returns {train_dataset, collator, sampler} (reference returns trainer
    kwargs the same way, data/builder.py:77-79)."""
    mm_cfg = MultimodalCfg(
        image_token_len=data_args.num_patches,
        use_im_start_end=True,
        image_size=data_args.image_size,
        image_aspect_ratio=data_args.image_aspect_ratio,
        box_limit=data_args.box_limit)
    common = dict(model_max_length=training_args.model_max_length,
                  seed=training_args.seed)
    stream_common = dict(process_index=process_index,
                         process_count=process_count,
                         resumable=getattr(training_args, "resumable_data",
                                           True),
                         **common)

    datasets: List = []
    if data_args.conversation_datasets:
        datasets.append(ConversationDataset(
            data_args.conversation_datasets, tokenizer, special_ids, mm_cfg,
            **common))
    for flag, cls in [(data_args.pair_datasets, PairWebDataset),
                      (data_args.pair_token_datasets, PairTokenWebDataset),
                      (data_args.interpair_datasets, InterPairWebDataset),
                      (data_args.interleave_datasets, InterleaveWebDataset)]:
        if flag:
            for name in parse_dataset_flag(flag):
                datasets.append(cls(name, tokenizer, special_ids, mm_cfg,
                                    **stream_common))
    if not datasets:
        raise ValueError("no datasets specified")
    train_dataset = (datasets[0] if len(datasets) == 1
                     else ConcatDataset(datasets))

    collator = Collator(
        pad_id=tokenizer.pad_token_id,
        max_length=training_args.model_max_length,
        max_images=getattr(data_args, "max_images", None),
        image_size=data_args.image_size,
        use_packing_segments=getattr(training_args, "packing_segment_mask",
                                     False))

    sampler = None
    if getattr(training_args, "group_by_modality_length", False) and \
            hasattr(train_dataset, "modality_lengths"):
        sampler = LengthGroupedSampler(
            training_args.per_device_train_batch_size,
            world_size=process_count or 1,
            lengths=train_dataset.modality_lengths,
            group_by_modality=True, seed=training_args.seed)
    return dict(train_dataset=train_dataset, collator=collator,
                sampler=sampler)


def batch_iterator(dataset, collator: Collator, *, batch_size: int,
                   sampler=None, prefetch: int = 2,
                   max_images: Optional[int] = None) -> Iterator[Dict]:
    """Batches forever (streaming datasets are infinite by construction);
    a background thread keeps `prefetch` collated batches ready.

    When the dataset exposes a resume cursor (``data_state``), every batch
    carries a ``__data_state__`` snapshot taken right after its samples
    were drawn — the state rides WITH the batch through the prefetch
    queues, so the trainer checkpoints the cursor matching the batches it
    actually consumed (not the ones sitting in flight)."""
    if max_images is not None:
        collator.max_images = max_images
    track_state = hasattr(dataset, "data_state")

    def indices():
        while True:
            it = iter(sampler) if sampler is not None else iter(
                range(len(dataset)))
            yield from it

    def produce(q: queue.Queue):
        batch = []
        for i in indices():
            try:
                batch.append(dataset[i])
            except StopIteration:
                return
            if len(batch) == batch_size:
                out = collator(batch)
                if track_state:
                    out["__data_state__"] = dataset.data_state()
                q.put(out)
                batch = []

    q: queue.Queue = queue.Queue(maxsize=prefetch)
    t = threading.Thread(target=produce, args=(q,), daemon=True)
    t.start()
    while True:
        yield q.get()
