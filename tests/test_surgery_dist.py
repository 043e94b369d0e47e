"""Checkpoint surgery (delta make/apply, pos-embed interpolation) and
multi-host helper degradation on single host."""

import numpy as np
import jax.numpy as jnp

from merlin_tpu.utils.surgery import (
    interpolate_checkpoint_pos_embed, tree_add, tree_sub)
from merlin_tpu.utils.dist import (
    barrier, get_rank, get_world_size, host_allreduce_min, is_main_process,
    main_process_only)


def test_delta_roundtrip():
    base = {"a": np.ones((2, 2)), "b": {"c": np.full((3,), 2.0)}}
    fine = {"a": np.full((2, 2), 3.0), "b": {"c": np.full((3,), 5.0)}}
    delta = tree_sub(fine, base)
    restored = tree_add(base, delta)
    np.testing.assert_allclose(restored["a"], fine["a"])
    np.testing.assert_allclose(restored["b"]["c"], fine["b"]["c"])


def test_interpolate_checkpoint_pos_embed():
    params = {"vision_tower": {"vit": {
        "position_embedding": np.random.default_rng(0)
        .normal(size=(5, 8)).astype(np.float32)}}}  # 2x2 grid + cls
    out = interpolate_checkpoint_pos_embed(params, 17)  # -> 4x4 + cls
    assert out["vision_tower"]["vit"]["position_embedding"].shape == (17, 8)


def test_dist_helpers_single_host():
    assert get_rank() == 0
    assert get_world_size() == 1
    assert is_main_process()
    assert host_allreduce_min(42) == 42
    barrier()  # no-op

    calls = []

    @main_process_only
    def record(x):
        calls.append(x)
        return x

    assert record(7) == 7
    assert calls == [7]
