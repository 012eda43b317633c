"""Data parallelism for the VO front end: independent sequences per device.

VO is sequential in time (the scan carries prev-frame state), so frame-level
DP is over *independent streams* — per-camera, per-dive-segment, or hypothesis
replays (SURVEY.md §2.3 "Data parallelism over frames/hypotheses").  The batch
axis is sharded over the mesh; each device scans its own stream; XLA inserts
no collectives (embarrassingly parallel), so throughput scales linearly.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ergo_uvo_tpu.config import MonoVOConfig
from ergo_uvo_tpu.pipeline.mono import run_mono_vo


def shard_frame_batches(source, mesh: Mesh, batch_size: int, axis_name: str = "data"):
    """Multi-host sharded ingestion (SURVEY.md §2.3 "host data pipeline").

    Iterates a :class:`ergo_uvo_tpu.io.sequence.FrameSource` and yields
    device-placed frame batches with the batch axis sharded over the mesh:
    each host decodes on CPU threads (the native prefetch ring inside the
    source) and `jax.device_put` scatters shards to its local devices; under
    `jax.distributed` each process feeds only its addressable shard.  The
    yielded arrays are ready inputs for `run_mono_vo_batch`-style consumers.
    """
    n = mesh.devices.size
    assert batch_size % n == 0, (batch_size, n)
    sh_b = NamedSharding(mesh, P(axis_name, None, None))
    sh_v = NamedSharding(mesh, P(axis_name))
    for batch in source.batches(batch_size):
        imgs = jax.device_put(jnp.asarray(batch.imgs), sh_b)
        tss = jax.device_put(jnp.asarray(batch.timestamps), sh_v)
        rgs = (
            jax.device_put(jnp.asarray(batch.ranges), sh_v)
            if batch.ranges is not None
            else None
        )
        yield imgs, tss, rgs


def shard_frame_batches_multiprocess(
    source, mesh: Mesh, global_batch_size: int, axis_name: str = "data"
):
    """Per-process half of multi-host sharded ingestion.

    Under ``jax.distributed`` each process may only place data on its
    ADDRESSABLE devices, so `source` must yield this process's share of every
    global batch (``global_batch_size * local_device_count // device_count``
    frames, in global order) and the global array is assembled with
    :func:`jax.make_array_from_process_local_data` — no process ever
    materializes a frame it did not decode.  Single-process meshes should use
    :func:`shard_frame_batches` (plain device_put scatter).

    Exercised end-to-end by tools/dryrun_multiprocess.py (2 OS processes x 2
    virtual CPU devices each).
    """
    n = mesh.devices.size
    n_local = len([d for d in mesh.devices.flat if d.process_index == jax.process_index()])
    local_bs = global_batch_size * n_local // n
    assert global_batch_size % n == 0, (global_batch_size, n)
    for batch in source.batches(local_bs):
        h, w = batch.imgs.shape[1:3]
        sh_b = NamedSharding(mesh, P(axis_name, None, None))
        sh_v = NamedSharding(mesh, P(axis_name))
        imgs = jax.make_array_from_process_local_data(
            sh_b, jnp.asarray(batch.imgs), (global_batch_size, h, w)
        )
        tss = jax.make_array_from_process_local_data(
            sh_v, jnp.asarray(batch.timestamps), (global_batch_size,)
        )
        rgs = (
            jax.make_array_from_process_local_data(
                sh_v, jnp.asarray(batch.ranges), (global_batch_size,)
            )
            if batch.ranges is not None
            else None
        )
        yield imgs, tss, rgs


def run_mono_vo_batch(
    mesh: Mesh,
    imgs: jax.Array,  # (B, T, H, W) — B independent streams
    timestamps: jax.Array,  # (B, T)
    ranges: jax.Array,  # (B, T)
    K: jax.Array,  # (3, 3) shared intrinsics
    cfg: MonoVOConfig,
    key: jax.Array,
    axis_name: str = "data",
):
    """Run B mono-VO streams, B sharded over the mesh.  Returns vmapped outputs."""
    B = imgs.shape[0]
    keys = jax.random.split(key, B)
    shard_b = NamedSharding(mesh, P(axis_name))

    imgs = jax.device_put(imgs, NamedSharding(mesh, P(axis_name, None, None, None)))
    timestamps = jax.device_put(timestamps, NamedSharding(mesh, P(axis_name, None)))
    ranges = jax.device_put(ranges, NamedSharding(mesh, P(axis_name, None)))
    keys = jax.device_put(keys, NamedSharding(mesh, P(axis_name, None)))

    fn = jax.jit(
        jax.vmap(
            lambda im, ts, rg, k: run_mono_vo(im, ts, rg, K, cfg, k),
            in_axes=(0, 0, 0, 0),
        ),
        out_shardings=(None, None),
    )
    return fn(imgs, timestamps, ranges, keys)
