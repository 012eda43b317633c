"""Robust model scoring: vectorized RANSAC and LMEDS over hypothesis batches.

The reference runs OpenCV's LMeDS (method 4 — mono_VO_parameters.yaml:18,22)
inside ``findEssentialMat``/``findHomography``.  Here scoring is one masked
reduction over a (num_hypotheses, N) residual matrix:

  * RANSAC: maximize the count of residuals below threshold;
  * LMEDS: minimize the masked median of squared residuals, then derive the
    inlier mask from the robust scale estimate
    sigma = 2.5 * 1.4826 * (1 + 3/(n - m)) * sqrt(med)  (OpenCV's formula),
    inlier iff r^2 <= sigma^2.

The inlier-mask definition matters: it feeds the valid-point-fraction
accept/reject logic (VO_utility.cpp:157-160; SURVEY.md §7.3 "RANSAC semantics
parity").
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ergo_uvo_tpu.config import LMEDS, RANSAC
from ergo_uvo_tpu.geometry.stats import masked_median


def lmeds_sigma(median_sq: jax.Array, n: jax.Array, model_points: int) -> jax.Array:
    """OpenCV LMeDS robust scale from the median squared residual."""
    n_f = jnp.maximum(n.astype(median_sq.dtype) - model_points, 1.0)
    return 2.5 * 1.4826 * (1.0 + 3.0 / n_f) * jnp.sqrt(jnp.maximum(median_sq, 0.0))


def lmeds_inlier_mask(
    residual_sq: jax.Array, mask: jax.Array, model_points: int
) -> jax.Array:
    """Inlier mask for the winning LMEDS model (OpenCV semantics)."""
    med = masked_median(residual_sq, mask)
    n = jnp.sum(mask.astype(jnp.int32))
    sigma = lmeds_sigma(med, n, model_points)
    return mask & (residual_sq <= sigma * sigma)


def inlier_mask_for_model(
    residual_sq: jax.Array,  # (N,) squared residuals of ONE model
    mask: jax.Array,
    method: int,
    threshold: float,
    model_points: int,
) -> jax.Array:
    """Method-consistent inlier mask for a single (e.g. refit) model."""
    finite = jnp.isfinite(residual_sq)
    if method == RANSAC:
        return mask & finite & (residual_sq <= threshold * threshold)
    if method == LMEDS:
        r2 = jnp.where(finite, residual_sq, 1e30)
        return lmeds_inlier_mask(r2, mask, model_points)
    raise NotImplementedError(f"outlier method {method}")


def score_hypotheses(
    residual_sq: jax.Array,  # (H, N) squared residuals per hypothesis
    mask: jax.Array,  # (N,) valid-correspondence mask
    sets_valid: jax.Array,  # (H,) hypothesis validity
    method: int,
    threshold: float,
    model_points: int,
):
    """Pick the best hypothesis; return (best_idx, inlier_mask_of_best).

    `threshold` is in the residual's units (pixels for homography/PnP,
    pixel-equivalent for essential); only used by RANSAC scoring and the final
    RANSAC inlier mask.  NaN/inf residuals never count as inliers.
    """
    finite = jnp.isfinite(residual_sq)
    r2 = jnp.where(finite & mask[None, :], residual_sq, jnp.inf)
    t2 = threshold * threshold

    if method == RANSAC:
        scores = jnp.sum((r2 <= t2).astype(jnp.int32), axis=-1)
        scores = jnp.where(sets_valid, scores, -1)
        best = jnp.argmax(scores)
        best_r2 = r2[best]
        inliers = mask & (best_r2 <= t2)
        return best, inliers
    if method == LMEDS:
        # Non-finite residuals become huge (not masked out): a hypothesis that
        # produces NaNs must score badly, not have its NaN lanes ignored.
        r2_clean = jnp.where(finite, residual_sq, 1e30)
        meds = masked_median(r2_clean, jnp.broadcast_to(mask[None, :], r2_clean.shape))
        meds = jnp.where(sets_valid, meds, jnp.inf)
        best = jnp.argmin(meds)
        inliers = lmeds_inlier_mask(r2_clean[best], mask, model_points)
        return best, inliers
    raise NotImplementedError(f"outlier method {method} (supported: RANSAC=8, LMEDS=4)")
