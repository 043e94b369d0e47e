"""End-to-end engine test: the real `train()` entry point over synthetic
tar shards + conversation JSON, tiny model, 3 optimizer steps on the
8-device virtual mesh, then auto-resume from the written checkpoint."""

import io
import json
import os
import tarfile

import numpy as np
import pytest


def _make_pair_shard(path, n=32):
    from PIL import Image

    with tarfile.open(path, "w") as tf:
        for i in range(n):
            buf = io.BytesIO()
            Image.new("RGB", (20, 20), (i * 7 % 255, 30, 60)).save(
                buf, format="JPEG")
            data = buf.getvalue()
            info = tarfile.TarInfo(f"{i:06d}.jpg")
            info.size = len(data)
            tf.addfile(info, io.BytesIO(data))
            txt = f"a synthetic caption number {i}".encode()
            info = tarfile.TarInfo(f"{i:06d}.txt")
            info.size = len(txt)
            tf.addfile(info, io.BytesIO(txt))


@pytest.mark.slow
def test_train_entry_end_to_end(tmp_path):
    from merlin_tpu.data import registry
    from merlin_tpu.engine.train import train

    shard = tmp_path / "pairs.tar"
    _make_pair_shard(shard)
    registry.register("pair", "synthetic_e2e",
                      registry.WebdataSpec(path=str(shard), size=32,
                                           merge_round=2))
    out_dir = tmp_path / "out"
    argv = [
        "--pair_datasets", "synthetic_e2e",
        "--output_dir", str(out_dir),
        "--num_train_steps", "3",
        "--per_device_train_batch_size", "2",
        "--gradient_accumulation_steps", "2",
        "--model_max_length", "64",
        "--image_size", "16",
        "--learning_rate", "1e-3",
        "--warmup_ratio", "0.0",
        "--gradient_checkpointing", "False",
        "--save_steps", "3",
        "--logging_steps", "1",
        "--mesh_data", "2", "--mesh_fsdp", "2", "--mesh_tensor", "2",
    ]
    metrics = train(argv, tiny=True)
    assert np.isfinite(metrics["loss"])
    ckpts = [d for d in os.listdir(out_dir) if d.startswith("checkpoint-")]
    assert ckpts, "no checkpoint written"

    # resume: continues from step 3 without retraining steps 0-2
    argv2 = [a for a in argv]
    argv2[argv2.index("3", argv2.index("--num_train_steps"))] = "4"
    metrics2 = train(argv2, tiny=True)
    assert np.isfinite(metrics2["loss"])
