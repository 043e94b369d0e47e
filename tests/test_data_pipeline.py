"""Data-layer tests: tar streaming, packing golden behavior, conversation
masking, collator static shapes, modality sampler."""

import io
import json
import os
import tarfile

import numpy as np
import pytest

from merlin_tpu.data import registry
from merlin_tpu.data.collator import Collator
from merlin_tpu.data.packing import PairPacker, make_replace_token
from merlin_tpu.data.sampler import (
    LengthGroupedSampler, get_modality_length_grouped_indices,
    split_to_even_chunks)
from merlin_tpu.data.shards import (
    buffer_shuffle, infinite_shard_list, shard_sample_stream, tar_to_samples)
from merlin_tpu.data.webdatasets import (
    InterPairWebDataset, MultimodalCfg, PairWebDataset)
from merlin_tpu.data.conversation_dataset import (
    ConversationDataset, mask_conversation_targets)
from merlin_tpu.models.builder import _tiny_tokenizer_with_mm_tokens
from merlin_tpu.utils.constants import IGNORE_INDEX
from merlin_tpu.utils.conversation import conv_vicuna_v1


def _jpg_bytes(color=(255, 0, 0), size=(20, 30)):
    from PIL import Image
    buf = io.BytesIO()
    Image.new("RGB", size, color).save(buf, format="JPEG")
    return buf.getvalue()


def _make_pair_shard(path, n=8):
    with tarfile.open(path, "w") as tf:
        for i in range(n):
            for ext, data in [("jpg", _jpg_bytes((i * 20 % 255, 0, 0))),
                              ("txt", f"caption number {i}".encode())]:
                info = tarfile.TarInfo(f"{i:06d}.{ext}")
                info.size = len(data)
                tf.addfile(info, io.BytesIO(data))


def _make_interpair_shard(path, n=4):
    with tarfile.open(path, "w") as tf:
        for i in range(n):
            members = {
                "frame0.jpg": _jpg_bytes((0, 100, 0)),
                "frame1.jpg": _jpg_bytes((0, 0, 100)),
                "json": json.dumps({
                    "image_name_list": [f"{i}-frame0", f"{i}-frame1"],
                    "prompt": "Given image0<image> and image1<image>, track"
                              " image0:<Id1>[100, 100, 200, 200]</Id1> in image1.",
                    "txt": "<Id1>[110, 105, 210, 205]</Id1>",
                }).encode(),
            }
            for ext, data in members.items():
                info = tarfile.TarInfo(f"{i:06d}.{ext}")
                info.size = len(data)
                tf.addfile(info, io.BytesIO(data))


@pytest.fixture()
def tok_ids():
    return _tiny_tokenizer_with_mm_tokens(256)


def test_infinite_shard_list_deterministic():
    shards = [f"s{i}" for i in range(5)]
    a = [s for s, _ in zip(infinite_shard_list(shards, 7), range(12))]
    b = [s for s, _ in zip(infinite_shard_list(shards, 7), range(12))]
    assert a == b
    assert set(a[:5]) == set(shards)  # full epoch before repeat


def test_buffer_shuffle_preserves_multiset():
    items = list(range(100))
    out = list(buffer_shuffle(iter(items), bufsize=10, seed=1))
    assert sorted(out) == items and out != items


def test_tar_to_samples(tmp_path):
    shard = tmp_path / "a.tar"
    _make_pair_shard(shard, n=5)
    samples = list(tar_to_samples(iter([str(shard)])))
    assert len(samples) == 5
    assert all("jpg" in s and "txt" in s for s in samples)


def test_pair_packer_golden(tok_ids):
    tok, ids, _ = tok_ids
    packer = PairPacker(tok, ids, image_token_len=2, use_im_start_end=True,
                        model_max_length=256)
    packed = packer.pack([(None, "a cat"), ("describe <image>", "a dog")])
    toks = tok.decode(packed.input_ids).split()
    # pair 0: image placeholder prepended; pair 1: prompt contains it
    assert toks.count("<im_patch>") == 4
    # prompt tokens and image tokens masked; caption tokens kept
    lab = packed.labels
    kept = [tok._inv[i] for i in packed.input_ids[lab != IGNORE_INDEX].tolist()]
    assert "cat" in kept and "dog" in kept and "describe" not in kept
    assert "<im_patch>" not in kept and "<im_start>" not in kept
    # eos ends each pair
    assert kept.count("</s>") == 2
    # segments: one id per pair
    assert set(packed.segment_ids.tolist()) == {0, 1}
    assert packed.num_images_used == 2


def test_pair_packer_overflow_clips_images(tok_ids):
    tok, ids, _ = tok_ids
    packer = PairPacker(tok, ids, image_token_len=2, use_im_start_end=True,
                        model_max_length=16)
    long_caption = " ".join(f"w{i}" for i in range(30))
    packed = packer.pack([(None, "short"), (None, long_caption)])
    assert packed.num_pairs_used == 1
    assert packed.num_images_used == 1
    assert len(packed.input_ids) <= 16


def test_pair_webdataset_end_to_end(tmp_path, tok_ids):
    tok, ids, _ = tok_ids
    shard = tmp_path / "pair.tar"
    _make_pair_shard(shard, n=8)
    spec = registry.WebdataSpec(path=str(shard), size=8, merge_round=2)
    ds = PairWebDataset("synthetic", tok, ids,
                        MultimodalCfg(image_token_len=2, image_size=16),
                        model_max_length=128, spec=spec)
    assert len(ds) == 4
    sample = ds[0]
    assert sample["images"].shape[1:] == (16, 16, 3)
    assert sample["num_images"] == 2
    assert (sample["input_ids"] == ids.image_patch).sum() == 4


def test_interpair_end_to_end(tmp_path, tok_ids):
    tok, ids, _ = tok_ids
    shard = tmp_path / "inter.tar"
    _make_interpair_shard(shard, n=4)
    spec = registry.WebdataSpec(path=str(shard), size=4, merge_round=2)
    ds = InterPairWebDataset("synthetic", tok, ids,
                             MultimodalCfg(image_token_len=2, image_size=16),
                             model_max_length=512, spec=spec)
    sample = ds[0]
    # 2 merged pairs x 2 frames each
    assert sample["num_images"] == 4
    assert (sample["input_ids"] == ids.image_patch).sum() == 8


def test_conversation_masking_golden(tok_ids):
    tok, ids, _ = tok_ids
    conv = conv_vicuna_v1.copy()
    conv.append_message("USER", "what is this")
    conv.append_message("ASSISTANT", "a red cat")
    conv.append_message("USER", "and now")
    conv.append_message("ASSISTANT", "a blue dog")
    text = conv.get_prompt()
    enc = np.asarray(tok.encode(text), np.int32)
    labels = mask_conversation_targets(text, enc, tok,
                                       pad_id=tok.pad_token_id,
                                       instruction_offset=-1)
    kept = [tok._inv[i] for i in enc[labels != IGNORE_INDEX].tolist()]
    assert kept == ["a", "red", "cat", "</s>", "a", "blue", "dog", "</s>"]


def test_conversation_dataset_end_to_end(tmp_path, tok_ids):
    tok, ids, _ = tok_ids
    from PIL import Image
    img_dir = tmp_path / "images"
    img_dir.mkdir()
    Image.new("RGB", (32, 24), (10, 200, 30)).save(img_dir / "img0.jpg")
    ann = [
        {"image": "img0.jpg",
         "conversations": [
             {"from": "human", "value": "<image>\nwhere is the <box> ?"},
             {"from": "gpt", "value": "at <box>"}],
         "boxes": [[2, 2, 10, 10], [5, 5, 10, 10]]},
        {"conversations": [
            {"from": "human", "value": "hello"},
            {"from": "gpt", "value": "hi there"}]},
    ]
    ann_path = tmp_path / "ann.json"
    ann_path.write_text(json.dumps(ann))
    registry.register("conversation", "synthetic_conv",
                      registry.ConversationSpec(annotations=str(ann_path),
                                                images=str(img_dir)))
    ds = ConversationDataset(
        "synthetic_conv", tok, ids,
        MultimodalCfg(image_token_len=2, image_size=16),
        model_max_length=128, instruction_offset=-1)
    assert len(ds) == 2
    s0 = ds[0]
    assert s0["num_images"] == 1
    assert (s0["input_ids"] == ids.image_patch).sum() == 2
    # box serialized into digits: "[...]" tokens present
    text = tok.decode(s0["input_ids"])
    assert "[" in text
    s1 = ds[1]  # text-only -> zero image
    assert s1["num_images"] == 1
    assert s1["images"].sum() == 0
    assert ds.modality_lengths[0] > 0 > ds.modality_lengths[1]


def test_collator_static_shapes(tok_ids):
    tok, ids, _ = tok_ids
    col = Collator(pad_id=tok.pad_token_id, max_length=32, max_images=3,
                   image_size=8)
    mk = lambda n, k: dict(
        input_ids=np.arange(4, 4 + n, dtype=np.int32),
        labels=np.arange(4, 4 + n, dtype=np.int32),
        segment_ids=np.zeros(n, np.int32),
        images=np.ones((k, 8, 8, 3), np.uint8), num_images=k)
    batch = col([mk(5, 1), mk(9, 2)])
    assert batch["input_ids"].shape == (2, 32)
    assert batch["images"].shape == (2, 3, 8, 8, 3)
    assert batch["attention_mask"][0].sum() == 5
    assert batch["segment_ids"][1, :9].min() == 1
    assert batch["segment_ids"][1, 9:].max() == 0


def test_modality_sampler_separates():
    lengths = [10, 20, -5, -8, 30, -2, 15, -9]
    rng = np.random.default_rng(0)
    idx = get_modality_length_grouped_indices(lengths, batch_size=2,
                                              world_size=1, rng=rng)
    assert sorted(idx) == list(range(8))
    # first megabatch (size 2) is single-modality
    first = [lengths[i] > 0 for i in idx[:2]]
    assert all(first) or not any(first)


def test_split_to_even_chunks_balanced():
    # indices arrive length-sorted desc (as in real megabatches)
    lengths = [10, 10, 1, 1]
    chunks = split_to_even_chunks([0, 1, 2, 3], lengths, 2)
    totals = [sum(abs(lengths[i]) for i in c) for c in chunks]
    assert totals == [11, 11]
    # non-divisible case falls back to strided split
    assert split_to_even_chunks([0, 1, 2], lengths, 2) == [[0, 2], [1]]


def test_length_grouped_sampler_epochs_differ():
    s = LengthGroupedSampler(2, 1, [5, 6, 7, 8, 9, 10, 11, 12])
    a = list(iter(s))
    s.set_epoch(1)
    b = list(iter(s))
    assert sorted(a) == sorted(b) == list(range(8))


def _make_interleave_shard(path, n=4):
    with tarfile.open(path, "w") as tf:
        for i in range(n):
            members = {
                "0.jpg": _jpg_bytes((10, 200, 10)),
                "json": json.dumps({
                    "text_list": ["first paragraph", "second paragraph"],
                    "image_info": [
                        {"image_name": f"{i:06d}-0.jpg", "matched_sim": 0.9,
                         "matched_text_index": 1},
                        {"image_name": f"{i:06d}-1.jpg", "matched_sim": 0.1,
                         "matched_text_index": 0},  # below 0.25: filtered
                    ],
                }).encode(),
            }
            for ext, data in members.items():
                info = tarfile.TarInfo(f"{i:06d}.{ext}")
                info.size = len(data)
                tf.addfile(info, io.BytesIO(data))


def test_interleave_end_to_end(tmp_path, tok_ids):
    from merlin_tpu.data.webdatasets import InterleaveWebDataset

    tok, ids, _ = tok_ids
    shard = tmp_path / "inter.tar"
    _make_interleave_shard(shard)
    spec = registry.WebdataSpec(path=str(shard), size=4, merge_round=1)
    ds = InterleaveWebDataset("synthetic", tok, ids,
                              MultimodalCfg(image_token_len=2, image_size=16),
                              model_max_length=128, spec=spec)
    sample = ds[0]
    # one image passed the similarity filter; inserted before text index 1
    assert sample["num_images"] == 1
    assert (sample["input_ids"] == ids.image_patch).sum() == 2
    text = tok.decode(sample["input_ids"])
    assert text.index("first") < text.index("<im_start>") < text.index("second")
    # image tokens masked in labels, real text kept
    from merlin_tpu.utils.constants import IGNORE_INDEX
    lab = sample["labels"]
    kept = [tok._inv[i] for i in sample["input_ids"][lab != IGNORE_INDEX].tolist()]
    assert "paragraph" in kept and "<im_patch>" not in kept


def test_conversation_merge_round(tmp_path, tok_ids):
    """merge_round chunks consecutive samples' conversations together
    (base_dataset.py:102-140 behavior)."""
    tok, ids, _ = tok_ids
    ann = [{"conversations": [
        {"from": "human", "value": f"q{i}"},
        {"from": "gpt", "value": f"a{i}"}]} for i in range(4)]
    ann_path = tmp_path / "merge.json"
    ann_path.write_text(json.dumps(ann))
    registry.register("conversation", "synthetic_merge",
                      registry.ConversationSpec(
                          annotations=str(ann_path), images="",
                          merge_round=2))
    ds = ConversationDataset(
        "synthetic_merge", tok, ids,
        MultimodalCfg(image_token_len=2, image_size=16),
        model_max_length=128, instruction_offset=-1)
    assert len(ds) == 2  # 4 samples -> 2 merged
    s = ds[0]
    text = tok.decode(s["input_ids"])
    assert "q0" in text and "a0" in text and "q1" in text and "a1" in text


def test_split_by_host_and_worker():
    from merlin_tpu.data.shards import split_by_host, split_by_worker

    shards = [f"s{i}" for i in range(12)]
    h0 = list(split_by_host(iter(shards), process_index=0, process_count=3))
    h1 = list(split_by_host(iter(shards), process_index=1, process_count=3))
    h2 = list(split_by_host(iter(shards), process_index=2, process_count=3))
    assert sorted(h0 + h1 + h2) == sorted(shards)  # partition
    assert not (set(h0) & set(h1))                 # disjoint
    w0 = list(split_by_worker(iter(h0), worker_id=0, num_workers=2))
    w1 = list(split_by_worker(iter(h0), worker_id=1, num_workers=2))
    assert sorted(w0 + w1) == sorted(h0)

