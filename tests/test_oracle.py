"""Reference-parity measurement: the BASELINE headline metric.

The oracle (eval/reference_oracle.py) re-executes the reference's mono and
stereo algorithms with OpenCV — same calls, thresholds, and failure cascade
as /root/reference (visual_odometry.h:167-741, VO_utility.cpp) — to generate
the baseline trajectory the reference would produce on a sequence.  These
tests then assert the BASELINE.md headline row: **engine ATE <= oracle ATE
(x1.05 tolerance)** on the same frames, per shared detector config (SIFT and
ORB are the reference dispatch branches this cv2 build ships).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ergo_uvo_tpu.config import MonoVOConfig, StereoVOConfig
from ergo_uvo_tpu.eval import ate_rmse, integrate_mono_trajectory, velocity_rmse
from ergo_uvo_tpu.io import make_mono_sequence, make_stereo_sequence
from ergo_uvo_tpu.pipeline import run_mono_vo, run_stereo_vo
from ergo_uvo_tpu.pipeline.stereo import StereoRig

pytestmark = pytest.mark.slow  # full-frame detectors on CPU: compile-heavy


def _cv2_ok():
    try:
        import cv2  # noqa: F401

        return True
    except ImportError:
        return False


requires_cv2 = pytest.mark.skipif(not _cv2_ok(), reason="cv2 unavailable")


def _positions(velocity, R, tss, published, validity):
    pos, _ = integrate_mono_trajectory(
        np.asarray(velocity), np.asarray(R), np.asarray(tss),
        np.asarray(published), np.asarray(validity),
    )
    return pos


@requires_cv2
@pytest.mark.parametrize("detector", ["SIFT", "ORB"])
def test_mono_ate_beats_reference(detector):
    """ATE(engine) <= 1.05 * ATE(reference re-execution), mean over seeds."""
    from ergo_uvo_tpu.eval.reference_oracle import run_mono_oracle

    cfg = MonoVOConfig(
        feature_detector=detector, max_keypoints=512, num_hypotheses=256
    )
    ates_oracle, ates_engine = [], []
    for seed in (0, 1):
        seq = make_mono_sequence(
            n_frames=24, height=240, width=320, dt=0.25, seed=seed
        )
        gt = seq.positions - seq.positions[0]

        oracle = run_mono_oracle(
            seq.imgs_left, seq.timestamps, seq.ranges, seq.K, cfg
        )
        pos_o = _positions(oracle.velocity, oracle.R, seq.timestamps,
                           oracle.published, oracle.validity)
        ates_oracle.append(ate_rmse(pos_o, gt))

        _, outs = run_mono_vo(
            jnp.asarray(seq.imgs_left), jnp.asarray(seq.timestamps),
            jnp.asarray(seq.ranges), jnp.asarray(seq.K), cfg,
            jax.random.PRNGKey(seed),
        )
        outs = jax.tree.map(np.asarray, outs)
        pos_e = _positions(outs.velocity, outs.R, seq.timestamps,
                           outs.published, outs.validity)
        ates_engine.append(ate_rmse(pos_e, gt))

    assert np.mean(ates_engine) <= 1.05 * np.mean(ates_oracle) + 1e-3, (
        f"{detector}: engine ATE {ates_engine} vs reference {ates_oracle}"
    )


@requires_cv2
def test_stereo_velocity_beats_reference():
    """Stereo: engine velocity RMSE (vs GT) <= 1.05 * oracle's on the same
    pairs (SIFT config; the stereo BASELINE row)."""
    from ergo_uvo_tpu.eval.reference_oracle import run_stereo_oracle

    cfg = StereoVOConfig(
        feature_detector="SIFT", max_keypoints=512, num_hypotheses=256
    )
    seq = make_stereo_sequence(n_frames=16, height=240, width=320, dt=0.25,
                               seed=0)
    R_right, t_right = np.eye(3), np.array([-0.33, 0.0, 0.0])

    oracle = run_stereo_oracle(
        seq.imgs_left, seq.imgs_right, seq.timestamps, seq.K, seq.K,
        R_right, t_right, cfg,
    )
    rmse_o = velocity_rmse(oracle.velocity, seq.velocities_prevcam,
                           oracle.validity)

    rig = StereoRig(
        K_left=jnp.asarray(seq.K), K_right=jnp.asarray(seq.K),
        R_right=jnp.asarray(R_right, jnp.float32) @ jnp.eye(3),
        t_right=jnp.asarray(t_right, jnp.float32),
    )
    _, outs = run_stereo_vo(
        jnp.asarray(seq.imgs_left), jnp.asarray(seq.imgs_right),
        jnp.asarray(seq.timestamps), rig, cfg, jax.random.PRNGKey(0),
    )
    outs = jax.tree.map(np.asarray, outs)
    rmse_e = velocity_rmse(outs.velocity, seq.velocities_prevcam,
                           outs.validity)

    # Both must actually track; then the engine must be at least as good.
    assert np.isfinite(rmse_e)
    assert rmse_e <= 1.05 * max(rmse_o, 1e-6), (rmse_e, rmse_o)


@requires_cv2
def test_stereo_ate_beats_reference():
    """Stereo ATE parity (VERDICT r4 missing #4): integrate both the oracle's
    and the engine's per-frame t_prevCam_currCam outputs
    (visual_odometry.h:148-159 — same prev-cam-frame displacement convention
    as mono, so the shared integrator applies) and require
    ATE(engine) <= 1.05 * ATE(reference re-execution), mean over seeds."""
    from ergo_uvo_tpu.eval.reference_oracle import run_stereo_oracle

    cfg = StereoVOConfig(
        feature_detector="SIFT", max_keypoints=512, num_hypotheses=256
    )
    R_right, t_right = np.eye(3), np.array([-0.33, 0.0, 0.0])
    ates_oracle, ates_engine = [], []
    for seed in (0, 1):
        seq = make_stereo_sequence(n_frames=16, height=240, width=320,
                                   dt=0.25, seed=seed)
        gt = seq.positions - seq.positions[0]

        oracle = run_stereo_oracle(
            seq.imgs_left, seq.imgs_right, seq.timestamps, seq.K, seq.K,
            R_right, t_right, cfg,
        )
        pos_o = _positions(oracle.velocity, oracle.R, seq.timestamps,
                           oracle.published, oracle.validity)
        ates_oracle.append(ate_rmse(pos_o, gt))

        rig = StereoRig(
            K_left=jnp.asarray(seq.K), K_right=jnp.asarray(seq.K),
            R_right=jnp.asarray(R_right, jnp.float32),
            t_right=jnp.asarray(t_right, jnp.float32),
        )
        _, outs = run_stereo_vo(
            jnp.asarray(seq.imgs_left), jnp.asarray(seq.imgs_right),
            jnp.asarray(seq.timestamps), rig, cfg, jax.random.PRNGKey(seed),
        )
        outs = jax.tree.map(np.asarray, outs)
        pos_e = _positions(outs.velocity, outs.R, seq.timestamps,
                           outs.published, outs.validity)
        ates_engine.append(ate_rmse(pos_e, gt))

    # Both must actually track (not an empty/held trajectory) ...
    assert np.isfinite(ates_engine).all() and np.mean(ates_engine) < 1.0, (
        ates_engine
    )
    # ... and the engine must be at least as accurate as the reference.
    assert np.mean(ates_engine) <= 1.05 * np.mean(ates_oracle) + 1e-3, (
        f"engine ATE {ates_engine} vs reference {ates_oracle}"
    )
