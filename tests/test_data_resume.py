"""Exact mid-shard resume for the streaming data pipeline (VERDICT r1 #7).

The reference cannot checkpoint webdataset state at all (SURVEY.md §5) — a
resume replays the stream from zero. ResumableSampleStream checkpoints a
tiny cursor (rng state + shard/sample coordinates + the shuffle reservoir
as coordinates) and restores bit-identically: the continuation after
set_state equals the uninterrupted stream, sample for sample.
"""

import io
import json
import tarfile

import numpy as np
import pytest

from merlin_tpu.data import registry
from merlin_tpu.data.shards import (
    ResumableSampleStream, shard_sample_stream)
from merlin_tpu.data.webdatasets import MultimodalCfg, PairWebDataset

from test_data_pipeline import _jpg_bytes  # reuse the jpeg fixture


def _make_tagged_shard(path, tag: str, n=10):
    with tarfile.open(path, "w") as tf:
        for i in range(n):
            for ext, data in [
                    ("jpg", _jpg_bytes(((i * 20) % 255, 0, 0))),
                    ("txt", f"caption {tag} {i}".encode())]:
                info = tarfile.TarInfo(f"{tag}{i:04d}.{ext}")
                info.size = len(data)
                tf.addfile(info, io.BytesIO(data))


@pytest.fixture()
def shard_set(tmp_path):
    paths = []
    for t in "abcd":
        p = tmp_path / f"{t}.tar"
        _make_tagged_shard(p, t, n=10)
        paths.append(str(p))
    return paths


def _keys(stream, n):
    return [next(stream)["__key__"] for _ in range(n)]


def test_stream_resume_exact(shard_set):
    buf = 8
    ref = ResumableSampleStream(shard_set, sample_buffer=buf)
    _ = _keys(ref, 17)
    state = json.loads(json.dumps(ref.get_state()))   # checkpoint roundtrip
    expected = _keys(ref, 15)                         # the continuation

    fresh = ResumableSampleStream(shard_set, sample_buffer=buf)
    fresh.set_state(state)
    assert _keys(fresh, 15) == expected


def test_stream_resume_mid_shard_cursor(shard_set):
    """The state is a mid-shard cursor, not a shard boundary: raw_idx
    is inside shard 0 after a few samples."""
    stream = ResumableSampleStream(shard_set, sample_buffer=4)
    _ = _keys(stream, 3)
    st = stream.get_state()
    assert st["shard_pos"] >= 0
    assert 0 < st["raw_idx"] <= 10 or st["shard_pos"] > 0
    assert len(st["buffer"]) == 4


def test_stream_matches_nonresumable(shard_set):
    """Same stages + seeds => the resumable stream yields the identical
    sequence as the composed-generator pipeline."""
    a = ResumableSampleStream(shard_set, sample_buffer=8)
    b = iter(shard_sample_stream(shard_set, sample_buffer=8,
                                 use_native=False))
    assert _keys(a, 30) == _keys(b, 30)


def test_dataset_resume_identical_next_batch(shard_set):
    """PairWebDataset-level: save cursor, rebuild the dataset, restore,
    and get the IDENTICAL next packed sample."""
    from test_data_pipeline import _tiny_tokenizer_with_mm_tokens

    tok, ids, _ = _tiny_tokenizer_with_mm_tokens(256)
    spec = registry.WebdataSpec(path=shard_set[0].replace("a.tar", "*.tar"),
                                size=40, merge_round=2)
    cfg = MultimodalCfg(image_token_len=2, image_size=16)

    ds = PairWebDataset("synthetic", tok, ids, cfg, model_max_length=128,
                        spec=spec, resumable=True)
    for _ in range(5):
        _ = ds[0]
    state = json.loads(json.dumps(ds.data_state()))
    expected = ds[0]

    # same tokenizer instance: TinyTokenizer ids are lazily assigned, and
    # the tokenizer is not part of the stream cursor
    ds2 = PairWebDataset("synthetic", tok, ids, cfg, model_max_length=128,
                         spec=spec, resumable=True)
    ds2.load_data_state(state)
    got = ds2[0]
    np.testing.assert_array_equal(got["input_ids"], expected["input_ids"])
    np.testing.assert_array_equal(got["labels"], expected["labels"])
    np.testing.assert_array_equal(got["images"], expected["images"])


def test_batch_iterator_tags_state(shard_set):
    """Batches carry the cursor snapshot taken after their samples."""
    from test_data_pipeline import _tiny_tokenizer_with_mm_tokens
    from merlin_tpu.data.builder import batch_iterator
    from merlin_tpu.data.collator import Collator

    tok, ids, _ = _tiny_tokenizer_with_mm_tokens(256)
    spec = registry.WebdataSpec(path=shard_set[0].replace("a.tar", "*.tar"),
                                size=40, merge_round=1)
    ds = PairWebDataset("synthetic", tok, ids,
                        MultimodalCfg(image_token_len=2, image_size=16),
                        model_max_length=64, spec=spec, resumable=True)
    collator = Collator(pad_id=tok.pad_token_id, max_length=64, image_size=16)
    it = batch_iterator(ds, collator, batch_size=2)
    b1 = next(it)
    b2 = next(it)
    assert "__data_state__" in b1 and "__data_state__" in b2
    assert b1["__data_state__"] != b2["__data_state__"]
