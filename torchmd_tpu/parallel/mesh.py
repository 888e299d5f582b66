"""Device-mesh helpers for multi-chip execution.

The reference is strictly single-process/single-device (SURVEY.md §2.9);
this module is the designed-for-TPU replacement: replicas/ensembles shard
over a `dp` (data/replica) mesh axis, and the O(N^2) pair computation of a
single large system shards its atom rows over an `sp` (spatial) axis with
XLA collectives over ICI.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: int | None = None, axes=("dp", "sp"),
              shape=None) -> Mesh:
    """Build a mesh over the first `n_devices` devices.

    With two axes and no explicit shape, devices split as evenly as
    possible between dp (outer) and sp (inner)."""
    devices = jax.devices()[: (n_devices or len(jax.devices()))]
    n = len(devices)
    if shape is None:
        if len(axes) == 1:
            shape = (n,)
        else:
            sp = 1
            for cand in range(int(np.sqrt(n)), 0, -1):
                if n % cand == 0:
                    sp = cand
                    break
            shape = (n // sp, sp)
    dev_array = np.asarray(devices).reshape(shape)
    return Mesh(dev_array, axes)


def replica_sharding(mesh: Mesh, axis: str = "dp") -> NamedSharding:
    """Sharding placing the leading (replica/batch) axis on `axis`."""
    return NamedSharding(mesh, P(axis))


def shard_replicas(mesh: Mesh, state_arrays, axis: str = "dp"):
    """Device-put every (nreplicas, ...) array with the replica axis
    sharded over the mesh."""
    sh = replica_sharding(mesh, axis)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), state_arrays)
