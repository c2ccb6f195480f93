"""GSPMD weight/activation sharding — the FSDP/ZeRO-3 equivalent.

Behavioral reference: wan/distributed/fsdp.py:12-34 (torch FSDP FULL_SHARD
over blocks, bf16 params). TPU-native: weights get NamedShardings on the
``fsdp`` mesh axis; XLA inserts per-layer all-gathers over ICI. Activations
are sharded (dp, sp) via constraints inside the model forward.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from worldforge_tpu.core.mesh import AXIS_DP, AXIS_FSDP, AXIS_SP


def fsdp_spec(shape, fsdp_size: int, *, skip_axes: int = 0) -> P:
    """Shard the largest divisible axis (after skip_axes leading axes, e.g.
    the scan-stacked layer axis) on the fsdp mesh axis; replicate others."""
    if fsdp_size <= 1 or len(shape) == 0:
        return P()
    cand = [(dim, ax) for ax, dim in enumerate(shape) if ax >= skip_axes
            and dim % fsdp_size == 0]
    if not cand:
        return P()
    dim, ax = max(cand)
    spec = [None] * len(shape)
    spec[ax] = AXIS_FSDP
    return P(*spec)


def shard_params_fsdp(params, mesh: Mesh, *, stacked_keys=("blocks",)):
    """Place a param pytree with per-leaf FSDP shardings. Leaves under keys
    named in ``stacked_keys`` are scan-stacked [L, ...]: their leading axis
    is never sharded (it is the scan axis)."""
    fsdp = mesh.shape[AXIS_FSDP]

    def place(path, leaf):
        if not isinstance(leaf, (jnp.ndarray, np.ndarray)) or leaf.ndim == 0:
            return leaf
        stacked = any(getattr(k, "key", None) in stacked_keys for k in path)
        spec = fsdp_spec(leaf.shape, fsdp, skip_axes=1 if stacked else 0)
        return jax.device_put(leaf, NamedSharding(mesh, spec))

    return jax.tree_util.tree_map_with_path(place, params)


def replicate(tree, mesh: Mesh):
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, NamedSharding(mesh, P())), tree)


def activation_spec(ndim: int, *, batch_axis: int = 0,
                    seq_axis: Optional[int] = 1) -> P:
    spec = [None] * ndim
    spec[batch_axis] = AXIS_DP
    if seq_axis is not None:
        spec[seq_axis] = AXIS_SP
    return P(*spec)
