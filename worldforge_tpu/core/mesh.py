"""Device mesh + sharding helpers.

One GSPMD mesh replaces the reference's NCCL process groups
(/root/reference/longcat_for_worldforge/longcat_video/context_parallel/
context_parallel_util.py:13-37 builds a (dp, cp) torch device mesh; FSDP at
wan/distributed/fsdp.py:12-34 shards weights). Here:

  - ``dp``   — data parallel (batch / CFG-pair axis)
  - ``fsdp`` — fully-sharded weight axis (ZeRO-3 equivalent)
  - ``sp``   — sequence/context parallel axis (tokens of one sample)

Activations are sharded on (dp, sp); weights on fsdp; XLA inserts the
all-gathers / reduce-scatters / all-to-alls over ICI.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

AXIS_DP = "dp"
AXIS_FSDP = "fsdp"
AXIS_SP = "sp"
MESH_AXES = (AXIS_DP, AXIS_FSDP, AXIS_SP)


def make_mesh(
    dp: int = 1,
    fsdp: int = 1,
    sp: int = 1,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Build a 3-axis (dp, fsdp, sp) mesh over the given (or all) devices."""
    if devices is None:
        devices = jax.devices()
    n = dp * fsdp * sp
    if n > len(devices):
        raise ValueError(f"mesh needs {n} devices, have {len(devices)}")
    dev = np.asarray(devices[:n]).reshape(dp, fsdp, sp)
    return Mesh(dev, MESH_AXES)


def single_device_mesh() -> Mesh:
    return make_mesh(1, 1, 1)


def shard_constraint(x, mesh: Optional[Mesh], spec: P):
    """Apply a sharding constraint if a (real, multi-device) mesh is active."""
    if mesh is None or mesh.size == 1:
        return x
    return jax.lax.with_sharding_constraint(x, NamedSharding(mesh, spec))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def io_sharding(mesh: Mesh, *axes) -> NamedSharding:
    return NamedSharding(mesh, P(*axes))
