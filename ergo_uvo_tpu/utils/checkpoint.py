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
