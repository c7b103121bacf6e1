"""Device mesh helpers."""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_ray_mesh(n_devices: Optional[int] = None,
                  devices: Optional[Sequence] = None) -> Mesh:
    """1-D mesh over the ray axis ('rays')."""
    devs = list(devices) if devices is not None else jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.asarray(devs), ("rays",))


def ray_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P("rays"))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, tree):
    """Place a batch pytree with the leading axis sharded over rays."""
    return jax.device_put(tree, ray_sharding(mesh))


def replicate(mesh: Mesh, tree):
    return jax.device_put(tree, replicated_sharding(mesh))
