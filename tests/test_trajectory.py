"""End-to-end trajectory refinement tests: VO -> window BA, loop closure ->
pose graph (BASELINE configs[2]/[3]; VERDICT r1 items 2-3).

These are the integration gates the optimization libraries were missing:
window BA must measurably reduce ATE of a real VO run, and the full
retrieval -> geometric-verification -> pose-graph chain must collapse
endpoint drift on a closed-loop sequence.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ergo_uvo_tpu.config import MonoVOConfig, SurfConfig
from ergo_uvo_tpu.eval import ate_rmse
from ergo_uvo_tpu.io import make_loop_sequence, make_mono_sequence
from ergo_uvo_tpu.optim import (
    close_loops_and_optimize,
    integrate_mono_poses,
    refine_mono_trajectory,
)
from ergo_uvo_tpu.pipeline import run_mono_vo


@pytest.fixture(scope="module")
def mono_vo_run():
    # Deliberately starved VO (few hypotheses/features) so the raw trajectory
    # carries real error for BA to remove; BA itself re-detects with a richer
    # budget (cfg_ba), as a mapping layer would.
    cfg_vo = MonoVOConfig(
        surf=SurfConfig(min_hessian=150.0),
        max_keypoints=96,
        num_hypotheses=16,
    )
    cfg_ba = MonoVOConfig(
        surf=SurfConfig(min_hessian=60.0),
        max_keypoints=256,
        num_hypotheses=16,
    )
    seq = make_mono_sequence(
        n_frames=36, height=240, width=320, dt=0.25, seed=5, speed=0.5
    )
    state, outs = run_mono_vo(
        jnp.asarray(seq.imgs_left),
        jnp.asarray(seq.timestamps),
        jnp.asarray(seq.ranges),
        jnp.asarray(seq.K),
        cfg_vo,
        jax.random.PRNGKey(0),
    )
    outs = jax.tree.map(np.asarray, outs)
    return cfg_ba, seq, outs


class TestWindowBAEndToEnd:
    def test_ba_reduces_ate(self, mono_vo_run):
        cfg, seq, outs = mono_vo_run
        _, _, raw_pos = integrate_mono_poses(
            outs.velocity, outs.R, seq.timestamps, outs.published
        )
        gt = seq.positions - seq.positions[0]
        ate_raw = ate_rmse(raw_pos, gt)

        res = refine_mono_trajectory(
            seq.imgs_left, seq.timestamps, outs, seq.K, cfg,
            window_size=6, keyframe_stride=2, ba_iters=12,
        )
        ate_ba = ate_rmse(res.positions, gt)
        # The BA gate: a real improvement, not noise (measured ~0.38x).
        assert ate_ba < 0.7 * ate_raw, (ate_raw, ate_ba)
        # Cost curves must be monotonically non-increasing (LM accept/reject).
        assert res.costs.shape[0] >= 1
        diffs = np.diff(res.costs, axis=1)
        assert (diffs <= 1e-3 * np.abs(res.costs[:, :-1]) + 1e-5).all()

    def test_keyframe_bookkeeping(self, mono_vo_run):
        cfg, seq, outs = mono_vo_run
        res = refine_mono_trajectory(
            seq.imgs_left, seq.timestamps, outs, seq.K, cfg,
            window_size=6, keyframe_stride=2, ba_iters=5,
        )
        assert len(res.kf_indices) == len(res.kf_positions)
        assert (np.diff(res.kf_indices) > 0).all()
        assert res.positions.shape == (36, 3)
        assert np.isfinite(res.positions).all()


class TestLoopClosureEndToEnd:
    def test_pose_graph_closes_loop(self):
        cfg = MonoVOConfig(
            surf=SurfConfig(min_hessian=60.0),
            max_keypoints=256,
            num_hypotheses=256,
        )
        seq = make_loop_sequence(n_frames=20, height=240, width=320, seed=2)
        T = len(seq.imgs_left)
        # world->cam ground truth (x_cam = R (X - C)).
        R_wc = seq.rotations
        t_wc = -np.einsum("tij,tj->ti", R_wc, seq.positions)

        # Inject odometry-like drift: position error growing linearly to ~6%
        # of the path length at the endpoint (orientation kept exact).
        rng = np.random.default_rng(0)
        step = np.linalg.norm(np.diff(seq.positions, axis=0), axis=-1).mean()
        drift_dir = rng.standard_normal(3)
        drift_dir /= np.linalg.norm(drift_dir)
        drift = np.outer(np.arange(T), drift_dir) * (0.06 * step)
        pos_drift = seq.positions + drift
        t_drift = -np.einsum("tij,tj->ti", R_wc, pos_drift)

        endpoint_before = np.linalg.norm(pos_drift[-1] - seq.positions[-1])
        assert endpoint_before > 0.2  # the fixture really drifts

        res = close_loops_and_optimize(
            seq.imgs_left, R_wc, t_drift, seq.ranges, seq.K, cfg,
            min_gap=12, top_k=6, min_similarity=0.8, iters=25,
        )
        # the retrieval + verification chain must accept >= 1 loop pairing
        # early and late frames
        assert len(res.loops) >= 1, "no loop closure survived verification"
        assert any(lp.j - lp.i >= 12 for lp in res.loops)
        # aligned-origin endpoint error must collapse >= 5x (VERDICT r1 #3).
        endpoint_after = np.linalg.norm(
            (res.positions[-1] - res.positions[0])
            - (seq.positions[-1] - seq.positions[0])
        )
        assert endpoint_after < endpoint_before / 5.0, (
            endpoint_before, endpoint_after,
        )
