"""Keyframe window bookkeeping: turning VO frames into BA problems.

New subsystem (the reference carries exactly one previous frame,
visual_odometry.h:209-215; SURVEY.md §2.3 "keyframe/map-block sharding" row).

Design: a fixed-size window of P keyframes with fixed-K feature slots.
Landmarks are anchored to the *oldest* keyframe's feature slots (L = K): every
other keyframe's observations come from descriptor matching against the
anchor, and landmark positions are initialized by triangulating the anchor
against the most recent keyframe.  This keeps every array (P, L)-shaped — the
whole window association is a handful of matmul matchings, and the resulting
:class:`ergo_uvo_tpu.optim.ba.BAProblem` is ready for (distributed) solving.

The window manager itself is tiny host-side state (a ring of device arrays);
all math runs jitted.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ergo_uvo_tpu.features.matcher import match_descriptors
from ergo_uvo_tpu.geometry.camera import projection_matrix
from ergo_uvo_tpu.optim.ba import BAProblem, BAState, ba_solve, reprojection_residuals
from ergo_uvo_tpu.geometry.triangulation import triangulate_points


class KeyframeWindow(NamedTuple):
    """Stacked keyframe data, oldest first (index 0 = BA anchor)."""

    xy: jax.Array  # (P, K, 2)
    desc: jax.Array  # (P, K, D)
    kp_mask: jax.Array  # (P, K)
    R: jax.Array  # (P, 3, 3) world -> camera initial poses
    t: jax.Array  # (P, 3)


def build_ba_problem(
    window: KeyframeWindow,
    K_cam: jax.Array,
    lowe_ratio: float = 0.8,
    min_track_length: int = 2,
    num_fixed_poses: int = 2,
    obs_gate_px: float = 6.0,
    binary: bool = False,
):
    """Associate window features to anchor landmarks and build a BAProblem.

    Observations whose *initial* reprojection error (VO poses + triangulated
    landmark init) exceeds `obs_gate_px` are masked out: descriptor matching
    leaks a few percent of mismatches even after the ratio test, and a plain
    least-squares BA is poisoned by them (tens-of-pixels residuals dominate
    the quadratic cost and the LM step stalls).

    Returns (problem, X0 (L,3) landmark init, lm_mask (L,)).
    """
    P, Kk, _ = window.xy.shape
    anchor_desc = window.desc[0]
    anchor_mask = window.kp_mask[0]

    def match_to_anchor(desc_p, mask_p, xy_p):
        # impl="xla": this call is vmapped over the window axis, which the
        # Pallas kernel's block specs don't support; the batched matmul path
        # is the right shape here anyway.
        m = match_descriptors(
            anchor_desc, anchor_mask, desc_p, mask_p, lowe_ratio, impl="xla",
            binary=binary,
        )
        uv = jnp.take(xy_p, m.idx, axis=0)
        return jnp.where(m.mask[:, None], uv, 0.0), m.mask

    obs_uv, obs_mask = jax.vmap(match_to_anchor)(
        window.desc, window.kp_mask, window.xy
    )  # (P, L, 2), (P, L)
    # Anchor observes its own slots directly.
    obs_uv = obs_uv.at[0].set(window.xy[0])
    obs_mask = obs_mask.at[0].set(anchor_mask)

    # Landmark init: triangulate anchor vs the newest keyframe that sees it.
    # (Use the last frame — widest baseline in a sliding window.)
    P0 = projection_matrix(K_cam, window.R[0], window.t[0])
    P_last = projection_matrix(K_cam, window.R[-1], window.t[-1])
    X0 = triangulate_points(P0, P_last, obs_uv[0], obs_uv[-1])
    lm_finite = anchor_mask & obs_mask[-1] & jnp.all(jnp.isfinite(X0), axis=-1)
    # Landmarks must be in front of the anchor camera.
    z0 = (X0 @ window.R[0].T + window.t[0])[:, 2]
    lm_finite = lm_finite & (z0 > 0)

    # ---- outlier gate: drop observations inconsistent with the initial
    # geometry, then re-require the track length on what survives.
    X0_safe = jnp.where(lm_finite[:, None], X0, jnp.asarray([0.0, 0.0, 1.0]))
    r0, _, _ = reprojection_residuals(
        K_cam, window.R, window.t, X0_safe, obs_uv, obs_mask
    )
    err0 = jnp.linalg.norm(r0, axis=-1)  # (P, L)
    obs_mask = obs_mask & lm_finite[None, :] & (err0 < obs_gate_px)
    seen = jnp.sum(obs_mask.astype(jnp.int32), axis=0)
    lm_mask = lm_finite & obs_mask[0] & obs_mask[-1] & (seen >= min_track_length)
    obs_mask = obs_mask & lm_mask[None, :]
    # Two anchored poses: monocular BA has a 7-dof gauge (SE(3) + scale);
    # fixing one pose pins the frame, the second pins the scale.
    problem = BAProblem(
        K=K_cam,
        obs_uv=obs_uv,
        obs_mask=obs_mask,
        num_fixed_poses=num_fixed_poses,
    )
    return problem, jnp.where(lm_mask[:, None], X0, 0.0), lm_mask


class WindowedBA:
    """Sliding-window BA driver: push keyframes, get refined poses.

    Host-side ring buffer of device arrays; `refine()` is one jitted solve.
    Keyframe insertion policy (every `keyframe_stride` frames) approximates
    the usual parallax-based policies without host round-trips.
    """

    def __init__(self, window_size: int = 8, iters: int = 15):
        self.window_size = window_size
        self.iters = iters
        self._frames: list = []
        # Jitted (build problem + solve) programs, keyed by the trace-time
        # constants baked into the closure so later calls with different
        # matcher settings don't silently reuse a stale program.
        self._refine_fns: dict = {}

    def push_keyframe(self, xy, desc, kp_mask, R_wc, t_wc):
        self._frames.append((xy, desc, kp_mask, R_wc, t_wc))
        if len(self._frames) > self.window_size:
            self._frames.pop(0)

    @property
    def full(self) -> bool:
        return len(self._frames) >= self.window_size

    def window(self) -> KeyframeWindow:
        xy, desc, mask, R, t = (jnp.stack(v) for v in zip(*self._frames))
        return KeyframeWindow(xy=xy, desc=desc, kp_mask=mask, R=R, t=t)

    def refine(self, K_cam: jax.Array, lowe_ratio: float = 0.8,
               binary: bool = False):
        """Run window BA; returns (BAState, costs, lm_mask).

        Association + solve compile into ONE XLA program (cached per
        (lowe_ratio, binary) on first use) — per-call dispatch overhead would
        otherwise dominate the small window solve.
        """
        w = self.window()
        cache_key = (float(lowe_ratio), bool(binary))
        if cache_key not in self._refine_fns:

            @jax.jit
            def _refine(w, K_cam):
                problem, X0, lm_mask = build_ba_problem(
                    w, K_cam, lowe_ratio, binary=binary
                )
                state, costs = ba_solve(problem, w.R, w.t, X0, iters=self.iters)
                return state, costs, lm_mask

            self._refine_fns[cache_key] = _refine
        state, costs, lm_mask = self._refine_fns[cache_key](w, K_cam)
        # Write refined poses back into the window.
        self._frames = [
            (f[0], f[1], f[2], state.R[i], state.t[i])
            for i, f in enumerate(self._frames)
        ]
        return state, costs, lm_mask
