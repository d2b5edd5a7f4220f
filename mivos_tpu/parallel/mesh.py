"""Device mesh + sharding helpers.

The reference's distributed substrate is NCCL DDP + DistributedSampler
(train.py:27,96). Here it is one jax.sharding.Mesh with a `data` axis;
XLA inserts the gradient/metric all-reduces from the sharding
annotations — there is no hand-written transport (SURVEY.md section 2.8).
Multi-host initialization goes through jax.distributed.initialize.
"""
from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: Optional[int] = None, axis: str = "data") -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        if len(devs) < n_devices:
            raise ValueError(f"need {n_devices} devices, have {len(devs)}")
        devs = devs[:n_devices]
    return Mesh(np.asarray(devs), (axis,))


def make_mesh_nd(**axes: int) -> Mesh:
    """N-D mesh from axis=size kwargs, e.g. make_mesh_nd(object=2, data=4)
    — the 2D inference layout (MemoryConfig.object_sharded +
    bank_sharded). Axis order follows kwarg order (major first)."""
    if not axes or any(v < 1 for v in axes.values()):
        raise ValueError(f"axis sizes must be >= 1, got {axes}")
    n = int(np.prod(list(axes.values())))
    devs = jax.devices()
    if len(devs) < n:
        raise ValueError(f"need {n} devices, have {len(devs)}")
    return Mesh(np.asarray(devs[:n]).reshape(tuple(axes.values())),
                tuple(axes))


def batch_sharding(mesh: Mesh, axis: str = "data") -> NamedSharding:
    """Leading-axis (batch) sharding for data parallelism."""
    return NamedSharding(mesh, P(axis))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def maybe_initialize_distributed() -> None:
    """Multi-host entry (replaces torch.distributed.launch + NCCL init).
    No-op on single host; env-driven on TPU pods."""
    import os

    if os.environ.get("MIVOS_MULTIHOST"):
        jax.distributed.initialize()
