"""Checkpoint / resume for pipeline and optimization state.

The reference has none — a crashed node respawns with all state lost
(SURVEY.md §5 "Checkpoint / resume": respawn=true at UVO_node.launch:24,38).
Here any pytree of arrays (``MonoVOState``, ``StereoVOState``, ``BAState``,
pose-graph nodes, keyframe windows) checkpoints through Orbax, so a restarted
process resumes mid-trajectory instead of re-initializing.
"""

from __future__ import annotations

import os
from typing import Any

import jax


def _checkpointer():
    import orbax.checkpoint as ocp

    return ocp.PyTreeCheckpointer()


def save_state(path: str, state: Any) -> None:
    """Save a pytree of arrays to `path` (a directory), overwriting."""
    path = os.path.abspath(path)
    ckptr = _checkpointer()
    import orbax.checkpoint as ocp

    state = jax.tree.map(lambda x: x, state)  # shallow copy of structure
    ckptr.save(path, state, force=True)


def save_stream_checkpoint(path: str, payload: Any) -> None:
    """Checkpoint a host-side pytree (streaming-VO progress) to one .npz.

    Streaming checkpoints are small (carried VO state + per-frame outputs +
    the RNG key), written once per few chunks from the ingest loop — a flat
    npz avoids Orbax's per-directory layout for what is a single file's worth
    of data.  Written atomically (tmp + rename) so a crash mid-save leaves
    the previous checkpoint intact.
    """
    import numpy as np

    path = os.path.abspath(path)
    leaves, _ = jax.tree.flatten(payload)
    tmp = path + ".tmp.npz"
    np.savez(tmp, **{f"leaf_{i:04d}": np.asarray(l) for i, l in enumerate(leaves)})
    os.replace(tmp, path)


def save_stream_head(
    path: str,
    frames_done: int,
    state: Any,
    key,
    n_segments: int,
    n_real: int,
    chunk_size: int,
    seq_digest: str = "",
) -> None:
    """Write the small streaming-run head file (atomic tmp+rename).

    The head carries resume accounting (`frames_done` counts REAL frames —
    never pad duplicates), the carried VO state + PRNG key, and the number of
    output segments written so far.  Per-frame outputs live in append-only
    segment files (:func:`append_stream_segment`), so each checkpoint writes
    O(new frames) bytes instead of rewriting the whole history.
    """
    import numpy as np

    path = os.path.abspath(path)
    leaves, _ = jax.tree.flatten(state)
    payload = {f"state_{i:04d}": np.asarray(l) for i, l in enumerate(leaves)}
    payload["key"] = np.asarray(key)
    payload["frames_done"] = np.int64(frames_done)
    payload["n_segments"] = np.int64(n_segments)
    payload["n_real"] = np.int64(n_real)
    payload["chunk_size"] = np.int64(chunk_size)
    # Identity of the frame sequence (hash of the ordered path list): resume
    # refuses a checkpoint whose sequence changed — a re-sorted glob would
    # silently misalign the restored prefix otherwise (ADVICE r4).
    payload["seq_digest"] = np.str_(seq_digest)
    tmp = path + ".tmp.npz"
    np.savez(tmp, **payload)
    os.replace(tmp, path)


def _segment_path(path: str, index: int) -> str:
    return f"{os.path.abspath(path)}.seg{index:04d}.npz"


def append_stream_segment(path: str, index: int, outs: Any) -> None:
    """Write per-frame outputs for one checkpoint interval as segment `index`.

    Written atomically BEFORE the head that references it: a crash between the
    two leaves a head pointing at the previous segment count, and the orphan
    segment is simply overwritten on the next run.
    """
    import numpy as np

    leaves, _ = jax.tree.flatten(outs)
    seg = _segment_path(path, index)
    tmp = seg + ".tmp.npz"
    np.savez(tmp, **{f"leaf_{i:04d}": np.asarray(l) for i, l in enumerate(leaves)})
    os.replace(tmp, seg)


def load_stream_run(path: str, state_example: Any, outs_example: Any):
    """Restore a segmented streaming checkpoint.

    Returns ``(frames_done, state, outs | None, key, meta)`` where `outs` is
    the per-frame output pytree concatenated across all referenced segments
    (None when no segment was persisted yet) and `meta` is
    ``{"n_real", "chunk_size", "n_segments"}`` for resume validation — the
    caller may stream the remaining frames with ANY chunk size since
    `frames_done` refers to real frames only (ADVICE r3).
    """
    import numpy as np

    path = os.path.abspath(path)
    data = np.load(path)
    s_leaves, s_def = jax.tree.flatten(state_example)
    state = jax.tree.unflatten(
        s_def, [data[f"state_{i:04d}"] for i in range(len(s_leaves))]
    )
    meta = {
        "n_real": int(data["n_real"]),
        "chunk_size": int(data["chunk_size"]),
        "n_segments": int(data["n_segments"]),
        # absent in pre-r5 checkpoints -> "" (callers treat "" as unknown)
        "seq_digest": str(data["seq_digest"]) if "seq_digest" in data else "",
    }
    o_leaves, o_def = jax.tree.flatten(outs_example)
    outs = None
    if meta["n_segments"] > 0:
        segs = []
        for s in range(meta["n_segments"]):
            seg = np.load(_segment_path(path, s))
            segs.append([seg[f"leaf_{i:04d}"] for i in range(len(o_leaves))])
        outs = jax.tree.unflatten(
            o_def, [np.concatenate([seg[i] for seg in segs]) for i in range(len(o_leaves))]
        )
    return int(data["frames_done"]), state, outs, data["key"], meta


def load_stream_checkpoint(path: str, example: Any) -> Any:
    """Restore a :func:`save_stream_checkpoint` pytree.

    `example` supplies only the tree *structure* (leaf shapes/dtypes come
    from the file), so a template with zero-length leading axes works.
    """
    import numpy as np

    data = np.load(os.path.abspath(path))
    leaves, treedef = jax.tree.flatten(example)
    if len(data.files) != len(leaves):
        raise ValueError(
            f"checkpoint has {len(data.files)} leaves, template has "
            f"{len(leaves)} — config/detector mismatch?"
        )
    restored = [data[f"leaf_{i:04d}"] for i in range(len(leaves))]
    return jax.tree.unflatten(treedef, restored)


def restore_state(path: str, example: Any) -> Any:
    """Restore a pytree saved by :func:`save_state`.

    `example` provides the structure/shape/dtype template (e.g.
    ``mono_vo_init(...)``), so restoration returns the same pytree type.
    """
    path = os.path.abspath(path)
    ckptr = _checkpointer()
    import orbax.checkpoint as ocp

    restored = ckptr.restore(
        path, args=ocp.args.PyTreeRestore(item=jax.tree.map(lambda x: x, example))
    )
    # Rebuild the original NamedTuple/structure from the restored leaves.
    leaves, treedef = jax.tree.flatten(example)
    new_leaves = jax.tree.leaves(restored)
    return jax.tree.unflatten(treedef, new_leaves)
