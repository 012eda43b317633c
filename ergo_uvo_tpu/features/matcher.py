"""Brute-force kNN (k=2) descriptor matching with Lowe ratio test.

Fixed-shape, mask-carrying re-design of the reference's ``match_features``
(VO_utility.cpp:515-543 keypoint-free overload; :551-573 point-emitting
overload, hardcoded NORM_L2): the full distance matrix is one MXU matmul,
top-2 is a pair of masked row reductions, and the ratio test
``d0 < ratio * d1`` produces the validity mask instead of compacting vectors.

`impl='pallas'` routes to the fused Pallas kernel
(:mod:`ergo_uvo_tpu.features.pallas_matcher`) that never materializes the
distance matrix in HBM; `impl='xla'` is the reference path; `impl='auto'`
picks Pallas on TPU backends.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

_INF = jnp.inf


class Matches(NamedTuple):
    """For each query keypoint: best train index + distances + validity."""

    idx: jax.Array  # (Q,) int32 — best match in the train set
    dist: jax.Array  # (Q,) float32 — best L2 distance
    second_dist: jax.Array  # (Q,) float32 — second-best L2 distance
    mask: jax.Array  # (Q,) bool — valid & passed ratio test

    @property
    def count(self) -> jax.Array:
        return jnp.sum(self.mask.astype(jnp.int32))


def _top2_from_distances(d2: jax.Array):
    """Row-wise (min, argmin, second-min) of a squared-distance matrix."""
    min1 = jnp.min(d2, axis=1)
    idx1 = jnp.argmin(d2, axis=1).astype(jnp.int32)
    cols = jax.lax.broadcasted_iota(jnp.int32, d2.shape, 1)
    d2_wo = jnp.where(cols == idx1[:, None], _INF, d2)
    min2 = jnp.min(d2_wo, axis=1)
    return min1, idx1, min2


def match_descriptors(
    desc_q: jax.Array,
    mask_q: jax.Array,
    desc_t: jax.Array,
    mask_t: jax.Array,
    ratio: float = 0.7,
    impl: str = "auto",
    binary: bool = False,
) -> Matches:
    """kNN(k=2) + Lowe ratio matching of query descriptors against train.

    Args:
      desc_q: (Q, D) query descriptors (prev frame in the mono pipeline).
      desc_t: (T, D) train descriptors (curr frame).
      mask_q/mask_t: validity masks.
      ratio: Lowe threshold (0.7 mono / 0.8 stereo — *_VO_parameters.yaml).
      impl: 'auto' | 'xla' | 'pallas'.
      binary: descriptors are {0,1} bit vectors (ORB/AKAZE).  Squared L2 on
        bits equals Hamming distance, so the same matmul kernel serves the
        reference's NORM_HAMMING branch (VO_utility.cpp:524-529); the ratio
        test is then applied to Hamming (= squared) distances, matching
        knnMatch-on-Hamming semantics.
    """
    if impl == "auto":
        impl = "pallas" if jax.default_backend() == "tpu" else "xla"
    if impl == "pallas":
        from ergo_uvo_tpu.features.pallas_matcher import (
            fits_vmem,
            top2_distances_pallas,
        )

        if not fits_vmem(desc_q.shape[0], desc_t.shape[0], desc_t.shape[1]):
            import warnings

            warnings.warn(
                f"matcher problem {desc_q.shape[0]}x{desc_t.shape[0]}x"
                f"{desc_t.shape[1]} exceeds the Pallas kernel's VMEM plan; "
                "falling back to the XLA path (slower)",
                stacklevel=2,
            )
            impl = "xla"
    if impl == "pallas":
        min1, idx1, min2 = top2_distances_pallas(desc_q, desc_t, mask_t)
    else:
        # Squared L2 via the matmul identity; invalid train columns -> +inf.
        qn = jnp.sum(desc_q * desc_q, axis=-1, keepdims=True)
        tn = jnp.sum(desc_t * desc_t, axis=-1)
        cross = desc_q @ desc_t.T
        d2 = jnp.maximum(qn + tn[None, :] - 2.0 * cross, 0.0)
        d2 = jnp.where(mask_t[None, :], d2, _INF)
        min1, idx1, min2 = _top2_from_distances(d2)

    if binary:
        d1 = jnp.maximum(min1, 0.0)  # Hamming distance directly
        d2nd = jnp.maximum(min2, 0.0)
    else:
        d1 = jnp.sqrt(jnp.maximum(min1, 0.0))
        d2nd = jnp.sqrt(jnp.maximum(min2, 0.0))
    n_train = jnp.sum(mask_t.astype(jnp.int32))
    # OpenCV knnMatch(k=2) yields no pair when <2 train descriptors exist;
    # the ratio test then rejects everything.
    ok = (
        mask_q
        & jnp.isfinite(d1)
        & jnp.isfinite(d2nd)
        & (d1 < ratio * d2nd)
        & (n_train >= 2)
    )
    return Matches(
        idx=jnp.where(ok, idx1, 0),
        dist=jnp.where(ok, d1, 0.0),
        second_dist=jnp.where(ok, d2nd, 0.0),
        mask=ok,
    )


def match_and_gather(
    xy_q: jax.Array,
    desc_q: jax.Array,
    mask_q: jax.Array,
    xy_t: jax.Array,
    desc_t: jax.Array,
    mask_t: jax.Array,
    ratio: float = 0.7,
    impl: str = "auto",
):
    """Matching + aligned coordinate gathering (the reference's point-emitting
    overload, VO_utility.cpp:551-573).

    Returns (prev_xy, curr_xy, matches): (Q, 2) arrays aligned on the query
    slot, zeros where invalid — the fixed-shape analogue of the compacted
    ``Point2f`` vectors.
    """
    m = match_descriptors(desc_q, mask_q, desc_t, mask_t, ratio, impl)
    curr = jnp.take(xy_t, m.idx, axis=0)
    prev = jnp.where(m.mask[:, None], xy_q, 0.0)
    curr = jnp.where(m.mask[:, None], curr, 0.0)
    return prev, curr, m
