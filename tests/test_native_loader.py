"""Native C++ tar loader: parity with the Python tar path + throughput."""

import io
import tarfile
import time

import numpy as np
import pytest

from merlin_tpu.data.native_loader import (
    NativeTarStream, load_library, native_available)
from merlin_tpu.data.shards import shard_sample_stream, tar_to_samples

pytestmark = pytest.mark.skipif(not native_available(),
                                reason="native loader not built")


def _make_shard(path, n=16, prefix=""):
    with tarfile.open(path, "w") as tf:
        for i in range(n):
            for ext, data in [("jpg", b"\xff\xd8JPEGDATA" + bytes([i])),
                              ("txt", f"{prefix}caption {i}".encode()),
                              ("frame1.jpg", b"FRAME" + bytes([i]))]:
                info = tarfile.TarInfo(f"{prefix}{i:06d}.{ext}")
                info.size = len(data)
                tf.addfile(info, io.BytesIO(data))


def test_native_matches_python_sample_set(tmp_path):
    shard = tmp_path / "a.tar"
    _make_shard(shard, n=16)

    py_samples = list(tar_to_samples(iter([str(shard)])))
    native = NativeTarStream([str(shard)], seed=1, max_epochs=1)
    nat_samples = list(native)

    assert len(nat_samples) == len(py_samples) == 16
    py_by_key = {s["__key__"]: s for s in py_samples}
    for s in nat_samples:
        ref = py_by_key[s["__key__"]]
        for field in ("jpg", "txt", "frame1.jpg"):
            assert s[field] == ref[field], field


def test_native_infinite_epochs(tmp_path):
    shard = tmp_path / "b.tar"
    _make_shard(shard, n=4)
    stream = NativeTarStream([str(shard)], seed=7, max_epochs=3)
    samples = list(stream)
    assert len(samples) == 12  # 3 epochs x 4 samples


def test_native_long_names(tmp_path):
    # GNU longname entries (>100 chars)
    shard = tmp_path / "long.tar"
    long_key = "k" * 120
    with tarfile.open(shard, "w", format=tarfile.GNU_FORMAT) as tf:
        data = b"hello"
        info = tarfile.TarInfo(long_key + ".txt")
        info.size = len(data)
        tf.addfile(info, io.BytesIO(data))
    samples = list(NativeTarStream([str(shard)], seed=0, max_epochs=1))
    assert samples[0]["__key__"] == long_key
    assert samples[0]["txt"] == b"hello"


def test_stream_uses_native_and_filters(tmp_path):
    shard = tmp_path / "c.tar"
    _make_shard(shard, n=8)
    stream = shard_sample_stream([str(shard)], seed=3, use_native=True,
                                 sample_buffer=4,
                                 process_index=0, process_count=1)
    got = [next(stream) for _ in range(8)]
    assert all("txt" in s for s in got)


def test_native_throughput_vs_python(tmp_path):
    """Sanity: the native loader should not be slower than stdlib tarfile."""
    shard = tmp_path / "perf.tar"
    with tarfile.open(shard, "w") as tf:
        blob = np.random.default_rng(0).bytes(64 * 1024)
        for i in range(200):
            info = tarfile.TarInfo(f"{i:06d}.jpg")
            info.size = len(blob)
            tf.addfile(info, io.BytesIO(blob))
            info = tarfile.TarInfo(f"{i:06d}.txt")
            info.size = 8
            tf.addfile(info, io.BytesIO(b"caption!"))

    t0 = time.perf_counter()
    n_py = sum(1 for _ in tar_to_samples(iter([str(shard)] * 5)))
    dt_py = time.perf_counter() - t0

    t0 = time.perf_counter()
    n_nat = sum(1 for _ in NativeTarStream([str(shard)], seed=0,
                                           max_epochs=5, n_threads=2))
    dt_nat = time.perf_counter() - t0
    assert n_py == n_nat == 1000
    # generous bound: native (2 threads, off-GIL) at least ~as fast
    assert dt_nat < dt_py * 1.5, (dt_nat, dt_py)
    print(f"python {1000/dt_py:.0f} samples/s, native {1000/dt_nat:.0f}")


def test_native_cursor_resume_exact(tmp_path):
    """Sample-granular resume: the cursor is (earliest unfinished shard,
    consumed counts per shard). Restoring yields EXACTLY the unconsumed
    samples — no loss AND no replay — even with racing threads."""
    if not native_available():
        pytest.skip("native loader not built")
    shards = []
    for t in range(4):
        p = tmp_path / f"s{t}.tar"
        _make_shard(str(p), n=6, prefix=f"t{t}")
        shards.append(str(p))

    s = NativeTarStream(shards, seed=5, n_threads=2, max_epochs=1)
    seen = [next(s)["__key__"] for _ in range(8)]
    state = s.get_state()
    s.close()
    assert 0 <= state["shard_pos"] <= 4

    s2 = NativeTarStream.restore(shards, state, seed=5, n_threads=2,
                                 max_epochs=1)
    rest = [x["__key__"] for x in s2]
    s2.close()
    all_keys = {f"t{t}{i:06d}" for t in range(4) for i in range(6)}
    assert sorted(seen + rest) == sorted(all_keys)  # multiset-exact


def test_native_cursor_resume_bit_exact_single_thread(tmp_path):
    """With one worker thread, delivery order is deterministic: the
    resumed stream continues with the IDENTICAL sequence an uninterrupted
    run would have produced."""
    if not native_available():
        pytest.skip("native loader not built")
    shards = []
    for t in range(3):
        p = tmp_path / f"s{t}.tar"
        _make_shard(str(p), n=5, prefix=f"u{t}")
        shards.append(str(p))

    full = [x["__key__"] for x in NativeTarStream(
        shards, seed=9, n_threads=1, max_epochs=1)]

    s = NativeTarStream(shards, seed=9, n_threads=1, max_epochs=1)
    head = [next(s)["__key__"] for _ in range(7)]
    state = s.get_state()
    s.close()
    s2 = NativeTarStream.restore(shards, state, seed=9, n_threads=1,
                                 max_epochs=1)
    tail = [x["__key__"] for x in s2]
    s2.close()
    assert head == full[:7]
    assert head + tail == full


def test_native_cursor_chained_resume_no_replay(tmp_path):
    """checkpoint -> resume -> checkpoint -> resume (the every-N-steps
    training pattern): the second cursor must still report the prefix the
    FIRST run consumed, or the third stream replays it. Regression for the
    r3 bug where skipped samples were dropped without seeding _consumed."""
    if not native_available():
        pytest.skip("native loader not built")
    shards = []
    for t in range(3):
        p = tmp_path / f"s{t}.tar"
        _make_shard(str(p), n=5, prefix=f"v{t}")
        shards.append(str(p))

    full = [x["__key__"] for x in NativeTarStream(
        shards, seed=11, n_threads=1, max_epochs=1)]

    s = NativeTarStream(shards, seed=11, n_threads=1, max_epochs=1)
    a = [next(s)["__key__"] for _ in range(4)]
    st1 = s.get_state()
    s.close()

    s2 = NativeTarStream.restore(shards, st1, seed=11, n_threads=1,
                                 max_epochs=1)
    b = [next(s2)["__key__"] for _ in range(4)]
    st2 = s2.get_state()
    s2.close()

    s3 = NativeTarStream.restore(shards, st2, seed=11, n_threads=1,
                                 max_epochs=1)
    c = [x["__key__"] for x in s3]
    s3.close()
    assert a + b + c == full  # no loss, no replay, exact order
