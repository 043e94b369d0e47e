"""Multi-host coordination helpers (reference utils/dist_utils.py
equivalents on JAX primitives).

NCCL env/SLURM rendezvous (dist_utils.py:52-85) becomes
``jax.distributed.initialize``; rank helpers become process_index; the
cross-rank dataset length agreement (``dist.all_reduce(MIN)``,
base_dataset.py:134-137) becomes a host-level min over a tiny psum mesh.
"""

from __future__ import annotations

import functools
import os
from typing import Optional

import jax
import numpy as np


def init_distributed(coordinator_address: Optional[str] = None,
                     num_processes: Optional[int] = None,
                     process_id: Optional[int] = None) -> None:
    """Multi-host init. No-ops on single host (everything degrades like the
    reference's get_world_size()-guarded helpers)."""
    env_ok = coordinator_address or os.environ.get("COORDINATOR_ADDRESS")
    if env_ok and jax.process_count() == 1:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes, process_id=process_id)


def get_rank() -> int:
    return jax.process_index()


def get_world_size() -> int:
    return jax.process_count()


def is_main_process() -> bool:
    return jax.process_index() == 0


def main_process_only(fn):
    """Decorator: run only on host 0 (dist_utils.py main_process)."""
    @functools.wraps(fn)
    def wrapper(*args, **kwargs):
        if is_main_process():
            return fn(*args, **kwargs)
        return None
    return wrapper


def host_allreduce_min(value: int) -> int:
    """Cross-host MIN agreement (base_dataset.py:134-137 equivalent)."""
    if jax.process_count() == 1:
        return int(value)
    from jax.experimental import multihost_utils

    arr = multihost_utils.process_allgather(np.asarray([value]))
    return int(arr.min())


def barrier(name: str = "barrier") -> None:
    """Cross-host sync point (dist_utils.py:84,130)."""
    if jax.process_count() == 1:
        return
    from jax.experimental import multihost_utils

    multihost_utils.sync_global_devices(name)
