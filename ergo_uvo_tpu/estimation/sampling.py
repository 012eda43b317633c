"""Hypothesis minimal-set sampling for batched RANSAC/LMEDS.

Replaces the sequential sampling loop inside OpenCV's LMeDS/RANSAC engines
(driven by the reference's *_MAX_ITERS configs, mono_VO_parameters.yaml:19,23):
all `num_hypotheses` minimal sets are drawn up front with one Gumbel-top-k
pass, giving distinct in-set indices restricted to valid (masked) matches.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp


def hypotheses_for_confidence(
    confidence: float, outlier_frac: float, model_points: int
) -> int:
    """Minimal hypothesis count for >= `confidence` probability that at least
    one sampled minimal set is outlier-free — OpenCV's RANSACUpdateNumIters
    formula (the reference budgets 2000 LMEDS iterations at m=5,
    mono_VO_parameters.yaml:19; our 8-point sets need re-derivation, not a
    copied constant: P(all-inlier set) = (1-eps)^m).

    The pipeline default of 512 hypotheses covers, at 0.99 confidence,
    m=8 at eps<=0.42, m=4 at eps<=0.67, m=3 at eps<=0.78; size up via this
    helper for harsher regimes.
    """
    eps = min(max(outlier_frac, 0.0), 0.95)
    p_good = (1.0 - eps) ** model_points
    if p_good >= 1.0:
        return 1
    return int(math.ceil(math.log(1.0 - confidence) / math.log(1.0 - p_good)))


def implied_inlier_rate(
    confidence: float, budget: int, model_points: int
) -> float:
    """Invert the RANSAC budget formula: the inlier rate a budget of
    `budget` minimal sets (size `model_points`) is sized for at `confidence`
    — i.e. the harshest regime the budget still covers."""
    conf = min(max(confidence, 0.5), 1.0 - 1e-9)
    p_good = 1.0 - (1.0 - conf) ** (1.0 / max(budget, 1))
    return p_good ** (1.0 / model_points)


def derive_hypothesis_budget(
    confidence: float,
    reference_max_iters: int,
    model_points: int = 8,
    reference_model_points: int = 5,
    floor: int = 512,
    cap: int = 2048,
) -> int:
    """Map the reference's sequential-RANSAC budget onto our batched sampler.

    The YAML's ``essential_max_iters`` (VO_utility.cpp:476, default 2000)
    budgets OpenCV's 5-point engine; our batched solver draws `model_points`
    sets.  Recover the outlier regime the reference budget was sized for
    (``implied_inlier_rate`` at m=5), re-derive the count for our set size,
    then clamp to [floor, cap] — the count is a jit-static shape, the cap
    bounds compile time/memory, and LO-style polish + all-hypothesis scoring
    cover the tail the cap cuts off.  Rounded up to a multiple of 256 for
    MXU-friendly batching.
    """
    rate = implied_inlier_rate(confidence, reference_max_iters,
                               reference_model_points)
    n = hypotheses_for_confidence(confidence, 1.0 - rate, model_points)
    n = max(floor, min(cap, n))
    return int(-(-n // 256) * 256)


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
