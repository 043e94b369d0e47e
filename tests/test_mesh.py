"""Mesh + partitioning tests on the 8-device virtual CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from merlin_tpu.core.mesh import MeshConfig, create_mesh, MESH_AXES
from merlin_tpu.core.partitioning import spec_for_logical, shard_logical


def test_mesh_resolve_wildcard():
    cfg = MeshConfig(data=-1, fsdp=2, tensor=2).resolve(8)
    assert cfg.shape == (2, 2, 1, 2)


def test_mesh_resolve_errors():
    import pytest
    with pytest.raises(ValueError):
        MeshConfig(data=3, fsdp=1, tensor=1).resolve(8)
    with pytest.raises(ValueError):
        MeshConfig(data=-1, fsdp=-1).resolve(8)


def test_create_mesh_8dev(eight_devices):
    mesh = create_mesh(MeshConfig(data=2, fsdp=2, tensor=2), devices=eight_devices)
    assert mesh.axis_names == MESH_AXES
    assert mesh.devices.shape == (2, 2, 1, 2)


def test_spec_for_logical():
    assert spec_for_logical(("batch", None, "embed")) == P(("data", "fsdp"), None, "fsdp")
    assert spec_for_logical(("embed", "mlp")) == P("fsdp", "tensor")
    assert spec_for_logical(("norm",)) == P(None)


def test_shard_logical_inside_jit(eight_devices):
    mesh = create_mesh(MeshConfig(data=2, fsdp=2, tensor=2), devices=eight_devices)

    @jax.jit
    def f(x):
        x = shard_logical(x, ("batch", "act_seq", None), mesh)
        return x * 2

    x = jnp.ones((8, 4, 16))
    out = f(x)
    np.testing.assert_allclose(out, 2 * np.ones((8, 4, 16)))


def test_matmul_tp_psum_semantics(eight_devices):
    """A column+row sharded matmul pair over 'tensor' reproduces the dense result."""
    mesh = create_mesh(MeshConfig(data=1, fsdp=1, tensor=8), devices=eight_devices)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(4, 16)), jnp.float32)
    w1 = jnp.asarray(rng.normal(size=(16, 32)), jnp.float32)
    w2 = jnp.asarray(rng.normal(size=(32, 16)), jnp.float32)

    w1s = jax.device_put(w1, NamedSharding(mesh, P(None, "tensor")))
    w2s = jax.device_put(w2, NamedSharding(mesh, P("tensor", None)))

    @jax.jit
    def f(x, a, b):
        return (x @ a) @ b

    out = f(x, w1s, w2s)
    np.testing.assert_allclose(np.asarray(out), np.asarray((x @ w1) @ w2), rtol=1e-4)
