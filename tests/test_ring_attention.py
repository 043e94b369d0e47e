"""Ring attention (context parallelism over the seq mesh axis) vs the
dense reference, on the 8-device virtual CPU mesh."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from merlin_tpu.core.mesh import MeshConfig, create_mesh
from merlin_tpu.ops.attention import mha_reference
from merlin_tpu.ops.ring_attention import ring_self_attention


def _rand(shape, seed):
    return jnp.asarray(np.random.default_rng(seed).normal(size=shape),
                       jnp.float32)


@pytest.mark.parametrize("causal", [True, False])
def test_ring_matches_dense(eight_devices, causal):
    mesh = create_mesh(MeshConfig(data=1, fsdp=1, seq=4, tensor=2),
                       devices=eight_devices)
    b, s, h, d = 2, 32, 4, 8
    q, k, v = _rand((b, s, h, d), 0), _rand((b, s, h, d), 1), _rand((b, s, h, d), 2)
    ref = mha_reference(q, k, v, causal=causal)
    with mesh:
        out = ring_self_attention(q, k, v, mesh=mesh, causal=causal)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=1e-4)


def test_ring_full_seq_axis(eight_devices):
    mesh = create_mesh(MeshConfig(data=1, fsdp=1, seq=8, tensor=1),
                       devices=eight_devices)
    b, s, h, d = 1, 64, 2, 8
    q, k, v = _rand((b, s, h, d), 3), _rand((b, s, h, d), 4), _rand((b, s, h, d), 5)
    ref = mha_reference(q, k, v, causal=True)
    with mesh:
        out = ring_self_attention(q, k, v, mesh=mesh, causal=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=1e-4)
