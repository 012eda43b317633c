"""Mesh construction and sharding helpers.

One place decides axis names and layouts (SURVEY.md §7.1: mesh axes
('host', 'data') initially; here a single 'data' axis spans all devices and a
2D ('host', 'data') layout is available for multi-host pods, where the
landmark axis rides ICI within a host and DCN across hosts only for the small
reduced system).
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(num_devices: int | None = None, axis_name: str = "data") -> Mesh:
    """1-D mesh over the first `num_devices` devices (default: all)."""
    devs = jax.devices()
    if num_devices is not None:
        devs = devs[:num_devices]
    return Mesh(np.array(devs), (axis_name,))


def landmark_sharding(mesh: Mesh, rank: int, lm_axis: int, axis_name: str = "data"):
    """NamedSharding that shards dimension `lm_axis` of a rank-`rank` array."""
    spec = [None] * rank
    spec[lm_axis] = axis_name
    return NamedSharding(mesh, P(*spec))


def replicated(mesh: Mesh):
    return NamedSharding(mesh, P())
