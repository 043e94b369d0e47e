"""Device mesh construction.

The reference's distribution story is NCCL data-parallel + FSDP through
torchrun (SURVEY.md §2.6). The TPU-native design replaces all of it with a
single ``jax.sharding.Mesh`` whose axes express every parallelism family:

  * ``data``    — pure data parallelism (batch split, params replicated)
  * ``fsdp``    — ZeRO/FSDP-style: batch split AND params sharded along
                  their embed/row dimension, all-gathered on use by XLA
  * ``tensor``  — tensor parallelism (heads/mlp columns sharded; psum on
                  the row-parallel matmuls is emitted by XLA from the
                  sharding annotations)

Sequence ("sp"), pipeline ("pp") and expert ("ep") axes are available as
optional extra mesh dims; models annotate activations with logical axis
names and the rules in :mod:`merlin_tpu.core.partitioning` decide what
lands where, so enabling an axis is a rules change, not a model change.

Collectives ride ICI within a slice; for multipod, pass
``dcn_data_parallelism`` to split the data axis across DCN
(``jax.experimental.mesh_utils.create_hybrid_device_mesh``).
"""

from __future__ import annotations

import dataclasses
import math
from typing import Optional, Sequence

import jax
import numpy as np
from jax.experimental import mesh_utils
from jax.sharding import Mesh

AXIS_DATA = "data"
AXIS_FSDP = "fsdp"
AXIS_TENSOR = "tensor"
AXIS_SEQ = "seq"
AXIS_EXPERT = "expert"

MESH_AXES = (AXIS_DATA, AXIS_FSDP, AXIS_SEQ, AXIS_TENSOR)


@dataclasses.dataclass
class MeshConfig:
    """Parallelism degrees. -1 means "absorb all remaining devices"."""

    data: int = -1
    fsdp: int = 1
    seq: int = 1
    tensor: int = 1
    # Split the data axis across slices (DCN) for multipod.
    dcn_data_parallelism: int = 1

    def resolve(self, n_devices: int) -> "MeshConfig":
        dims = {"data": self.data, "fsdp": self.fsdp, "seq": self.seq,
                "tensor": self.tensor}
        wildcard = [k for k, v in dims.items() if v == -1]
        if len(wildcard) > 1:
            raise ValueError(f"only one mesh axis may be -1, got {wildcard}")
        fixed = math.prod(v for v in dims.values() if v != -1)
        if wildcard:
            if n_devices % fixed:
                raise ValueError(
                    f"{n_devices} devices not divisible by fixed axes product {fixed}")
            dims[wildcard[0]] = n_devices // fixed
        elif fixed != n_devices:
            raise ValueError(
                f"mesh {dims} needs {fixed} devices but {n_devices} available")
        return MeshConfig(dcn_data_parallelism=self.dcn_data_parallelism, **dims)

    @property
    def shape(self):
        return (self.data, self.fsdp, self.seq, self.tensor)


def create_mesh(config: Optional[MeshConfig] = None,
                devices: Optional[Sequence] = None) -> Mesh:
    """Build the global device mesh.

    Uses ``mesh_utils.create_device_mesh`` so the axis order maps onto the
    physical ICI topology (minimizing hop count for the tensor axis, which
    carries the most collective traffic per step).
    """
    devices = list(devices if devices is not None else jax.devices())
    config = (config or MeshConfig()).resolve(len(devices))
    shape = config.shape
    if config.dcn_data_parallelism > 1:
        per_slice = list(shape)
        per_slice[0] //= config.dcn_data_parallelism
        dev_array = mesh_utils.create_hybrid_device_mesh(
            tuple(per_slice),
            (config.dcn_data_parallelism, 1, 1, 1),
            devices=devices,
        )
    else:
        try:
            dev_array = mesh_utils.create_device_mesh(shape, devices=devices)
        except (ValueError, AssertionError):
            # Virtual/CPU devices or odd topologies: plain reshape.
            dev_array = np.asarray(devices).reshape(shape)
    return Mesh(dev_array, MESH_AXES)


def single_device_mesh() -> Mesh:
    """1x1x1x1 mesh over the first device (single-chip eval/serve path)."""
    return Mesh(np.asarray(jax.devices()[:1]).reshape(1, 1, 1, 1), MESH_AXES)


# --- global mesh context -----------------------------------------------------
# Pallas kernels have no SPMD partitioning rule: under pjit with sharded
# operands XLA would all-gather their inputs. Code that launches kernels
# (ops/attention) consults this context and wraps the kernel in shard_map
# over the active mesh instead. The trainer/server sets it.

_GLOBAL_MESH: Optional[Mesh] = None


def set_global_mesh(mesh: Optional[Mesh]) -> None:
    global _GLOBAL_MESH
    _GLOBAL_MESH = mesh


def get_global_mesh() -> Optional[Mesh]:
    return _GLOBAL_MESH
