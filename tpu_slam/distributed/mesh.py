"""Device mesh construction and axis conventions.

Axis names:
  * ``data``  — batch axis for independent registrations (DP);
  * ``graph`` — edge/pose sharding for the distributed pose-graph solver.

A 1-D mesh with one axis used for both is the common case on a single
slice; multi-host topologies map ``data`` across hosts (DCN) and ``graph``
within a slice (ICI) — pose-graph Hv exchanges ride the faster fabric.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def device_count() -> int:
    return len(jax.devices())


def make_mesh(n_devices: Optional[int] = None,
              axis_name: str = "data") -> Mesh:
    """1-D mesh over the first ``n_devices`` devices."""
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.array(devs), (axis_name,))


def make_mesh_2d(data: int, graph: int) -> Mesh:
    """(data, graph) mesh: DP across ``data``, graph solve across ``graph``."""
    devs = np.array(jax.devices()[:data * graph]).reshape(data, graph)
    return Mesh(devs, ("data", "graph"))


def batch_sharding(mesh: Mesh, axis_name: str = "data") -> NamedSharding:
    """Shard the leading (batch) axis across the mesh."""
    return NamedSharding(mesh, P(axis_name))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
