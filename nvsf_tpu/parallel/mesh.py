"""Device mesh + ray-sharded data parallelism.

The reference's distribution story is vestigial DDP scaffolding
(``trainer.py:82-84,1506-1524``; never exercised). Here parallelism is
TPU-native: a 1-D ``jax.sharding.Mesh`` over the 'data' axis; the per-step
ray batch is shard-annotated along rays, parameters are replicated, and
XLA's SPMD partitioner inserts the gradient ``psum`` over ICI — the direct
analogue of DDP all-reduce, but compiled into the step.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


def make_mesh(n_devices: Optional[int] = None, devices=None) -> Mesh:
    """1-D mesh over the first ``n_devices`` (default: all)."""
    if devices is None:
        devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (DATA_AXIS,))


def mesh_from_spec(spec: str) -> Mesh:
    """Parse a 'mesh_shape' config string like '8' or '4x2' (extra axes are
    currently folded into the data axis — the model is small enough that
    replication is the right layout)."""
    if not spec:
        return make_mesh()
    dims = [int(x) for x in spec.lower().split("x")]
    return make_mesh(int(np.prod(dims)))


def shard_rays(mesh: Mesh, *arrays):
    """Constrain leading (ray) dimension sharding to the data axis."""
    sh = NamedSharding(mesh, P(DATA_AXIS))
    return tuple(jax.lax.with_sharding_constraint(a, sh) for a in arrays)


def replicate(mesh: Mesh, tree):
    """Fully-replicated placement for params / small state."""
    sh = NamedSharding(mesh, P())
    return jax.device_put(tree, sh)


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def data_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P(DATA_AXIS))
