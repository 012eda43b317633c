"""Hypothesis minimal-set sampling for batched RANSAC/LMEDS.

Replaces the sequential sampling loop inside OpenCV's LMeDS/RANSAC engines
(driven by the reference's *_MAX_ITERS configs, mono_VO_parameters.yaml:19,23):
all `num_hypotheses` minimal sets are drawn up front with one Gumbel-top-k
pass, giving distinct in-set indices restricted to valid (masked) matches.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def sample_minimal_sets(
    key: jax.Array,
    mask: jax.Array,
    num_hypotheses: int,
    set_size: int,
):
    """(H, m) indices of valid entries; distinct within each hypothesis.

    Uses the Gumbel-top-k trick: per hypothesis draw iid uniforms over all N
    slots, push invalid slots to -inf, take the top-m.  If fewer than m valid
    entries exist the surplus picks land on invalid slots — the returned
    `sets_valid` flag marks those hypotheses.
    """
    n = mask.shape[0]
    u = jax.random.uniform(key, (num_hypotheses, n))
    u = jnp.where(mask[None, :], u, -jnp.inf)
    _, idx = jax.lax.top_k(u, set_size)  # (H, m)
    enough = jnp.sum(mask.astype(jnp.int32)) >= set_size
    sets_valid = jnp.broadcast_to(enough, (num_hypotheses,))
    return idx, sets_valid
