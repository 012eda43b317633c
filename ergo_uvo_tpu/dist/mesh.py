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


def make_mesh_2d(
    n_kf: int,
    n_lm: int | None = None,
    kf_axis: str = "kf",
    lm_axis: str = "lm",
) -> Mesh:
    """2-D ('kf', 'lm') mesh: keyframe/window axis x landmark axis.

    The window-parallel BA layout (SURVEY.md §2.3 row 5 / dist.window_ba):
    on a multi-host pod put 'kf' on the slower DCN axis (only the tiny
    reduced system and the H_pl ring ride it) and 'lm' on ICI.
    """
    devs = jax.devices()
    if n_lm is None:
        n_lm = len(devs) // n_kf
    assert n_kf * n_lm <= len(devs), (n_kf, n_lm, len(devs))
    grid = np.array(devs[: n_kf * n_lm]).reshape(n_kf, n_lm)
    return Mesh(grid, (kf_axis, lm_axis))


def landmark_sharding(mesh: Mesh, rank: int, lm_axis: int, axis_name: str = "data"):
    """NamedSharding that shards dimension `lm_axis` of a rank-`rank` array."""
    spec = [None] * rank
    spec[lm_axis] = axis_name
    return NamedSharding(mesh, P(*spec))


def replicated(mesh: Mesh):
    return NamedSharding(mesh, P())
