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
