"""End-to-end pipeline tests on synthetic ground-truthed sequences.

The golden-trajectory analogue of SURVEY.md §4's bag-replay fixture: render a
textured seafloor with a known trajectory, run the full mono/stereo pipeline,
and require the recovered velocities/trajectory to track ground truth.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ergo_uvo_tpu.config import MonoVOConfig, StereoVOConfig, SurfConfig
import pytest as _pytest

from ergo_uvo_tpu.eval import ate_rmse, integrate_mono_trajectory, velocity_rmse


@_pytest.mark.parametrize("detector", ["ORB", "SIFT"])
def test_mono_vo_with_alternate_detector(detector):
    """The reference's detect_features switch (VO_utility.cpp:91-126) must be
    a real switch end-to-end: the full mono pipeline runs and produces valid
    velocity estimates with each implemented detector."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from ergo_uvo_tpu.config import MonoVOConfig, SurfConfig
    from ergo_uvo_tpu.io import make_mono_sequence
    from ergo_uvo_tpu.pipeline import run_mono_vo

    # The smooth low-res synthetic seafloor is harsher than AUV imagery:
    # lower the FAST/contrast gates (the fixed top-K budget keeps only the
    # best-ranked candidates regardless) and the count gates.
    cfg = MonoVOConfig(
        feature_detector=detector,
        surf=SurfConfig(min_hessian=60.0),
        max_keypoints=256,
        num_hypotheses=128,
        lowe_ratio_test=0.8 if detector != "ORB" else 0.85,
        orb_threshold=8.0,
        sift_contrast_threshold=0.01,
        min_num_features=15,
        min_num_inliers=8,
    )
    assert cfg.descriptor_dim == (256 if detector == "ORB" else 128)
    seq = make_mono_sequence(n_frames=8, height=240, width=320, dt=0.25, seed=2)
    _, outs = run_mono_vo(
        jnp.asarray(seq.imgs_left), jnp.asarray(seq.timestamps),
        jnp.asarray(seq.ranges), jnp.asarray(seq.K), cfg, jax.random.PRNGKey(0),
    )
    outs = jax.tree.map(np.asarray, outs)
    assert outs.published.sum() >= 5, outs.published
    assert outs.validity.sum() >= 4, (detector, outs.validity)
    v = velocity_rmse(outs.velocity, seq.velocities_prevcam, outs.validity)
    assert v < 0.3, (detector, v)
from ergo_uvo_tpu.io import make_mono_sequence, make_stereo_sequence
from ergo_uvo_tpu.pipeline import (
    mono_vo_init,
    mono_vo_step,
    run_mono_vo,
    run_stereo_vo,
    stereo_vo_init,
)
from ergo_uvo_tpu.pipeline.stereo import StereoRig

# Small, CI-friendly configuration: modest hypothesis count + keypoint budget.
MONO_CFG = MonoVOConfig(
    surf=SurfConfig(min_hessian=60.0, n_octaves=3),
    max_keypoints=256,
    num_hypotheses=192,
    min_num_features=20,
    min_num_inliers=10,
)
STEREO_CFG = StereoVOConfig(
    surf=SurfConfig(min_hessian=60.0, n_octaves=3),
    max_keypoints=256,
    num_hypotheses=192,
)


@pytest.fixture(scope="module")
def mono_seq():
    return make_mono_sequence(n_frames=14, height=200, width=280, dt=0.25, seed=4)


@pytest.fixture(scope="module")
def mono_results(mono_seq):
    seq = mono_seq
    state, outs = run_mono_vo(
        jnp.asarray(seq.imgs_left),
        jnp.asarray(seq.timestamps),
        jnp.asarray(seq.ranges),
        jnp.asarray(seq.K),
        MONO_CFG,
        jax.random.PRNGKey(0),
    )
    return state, jax.tree.map(np.asarray, outs)


class TestMonoPipeline:
    def test_initializes_and_publishes(self, mono_results):
        _, outs = mono_results
        assert not outs.published[0]  # init frame
        assert outs.published[1:].all()
        assert outs.validity[1:].mean() > 0.7, outs.validity

    def test_velocity_tracks_ground_truth(self, mono_seq, mono_results):
        seq = mono_seq
        _, outs = mono_results
        valid = outs.validity.astype(bool)
        gt = seq.velocities_prevcam
        err = velocity_rmse(outs.velocity[valid], gt[valid])
        speed = np.linalg.norm(gt[1:], axis=-1).mean()
        assert err < 0.35 * speed, (err, speed)

    def test_scale_factor_recovers_metric_scale(self, mono_seq, mono_results):
        """SF should bring |v| close to the true metric speed."""
        seq = mono_seq
        _, outs = mono_results
        valid = outs.validity.astype(bool)
        est_speed = np.linalg.norm(outs.velocity[valid], axis=-1)
        gt_speed = np.linalg.norm(seq.velocities_prevcam[valid], axis=-1)
        ratio = est_speed / np.maximum(gt_speed, 1e-9)
        assert 0.8 < np.median(ratio) < 1.25, np.median(ratio)

    def test_trajectory_ate(self, mono_seq, mono_results):
        seq = mono_seq
        _, outs = mono_results
        est_pos = integrate_mono_trajectory(
            outs.velocity, outs.R, seq.timestamps, outs.published
        )
        gt_rel = seq.positions - seq.positions[0]
        ate = ate_rmse(est_pos, gt_rel, align=True, with_scale=False)
        path_len = np.linalg.norm(np.diff(seq.positions, axis=0), axis=-1).sum()
        assert ate < 0.15 * path_len, (ate, path_len)

    def test_featureless_frames_skip_not_crash(self):
        cfg = MONO_CFG
        seq = make_mono_sequence(n_frames=6, height=200, width=280, seed=5)
        imgs = seq.imgs_left.copy()
        imgs[3] = 60.0  # featureless water column (SURVEY.md §5 fault injection)
        _, outs = run_mono_vo(
            jnp.asarray(imgs), jnp.asarray(seq.timestamps),
            jnp.asarray(seq.ranges), jnp.asarray(seq.K), cfg,
            jax.random.PRNGKey(0),
        )
        outs = jax.tree.map(np.asarray, outs)
        assert not outs.published[3]  # skipped
        assert np.isfinite(outs.velocity).all()

    def test_step_state_shift(self, mono_seq):
        """Single-step API: state carries the current frame's features."""
        seq = mono_seq
        state = mono_vo_init(MONO_CFG.max_keypoints, MONO_CFG.descriptor_dim)
        state, out = mono_vo_step(
            state, jnp.asarray(seq.imgs_left[0]), jnp.asarray(seq.timestamps[0]),
            jnp.asarray(seq.ranges[0]), jnp.asarray(seq.K),
            jax.random.PRNGKey(0), MONO_CFG,
        )
        assert bool(state.initialized)
        assert int(jnp.sum(state.prev_mask)) >= MONO_CFG.min_num_features
        assert not bool(out.published)


class TestStereoPipeline:
    def test_velocity_tracks_ground_truth(self):
        seq = make_stereo_sequence(n_frames=10, height=200, width=280, dt=0.25,
                                   baseline=0.33, seed=6)
        rig = StereoRig(
            K_left=jnp.asarray(seq.K),
            K_right=jnp.asarray(seq.K),
            R_right=jnp.eye(3),
            t_right=jnp.asarray([-0.33, 0.0, 0.0]),
        )
        _, outs = run_stereo_vo(
            jnp.asarray(seq.imgs_left), jnp.asarray(seq.imgs_right),
            jnp.asarray(seq.timestamps), rig, STEREO_CFG, jax.random.PRNGKey(0),
        )
        outs = jax.tree.map(np.asarray, outs)
        assert not outs.published[0]
        assert outs.validity[1:].mean() > 0.6, outs.validity
        valid = outs.validity.astype(bool)
        gt = seq.velocities_prevcam
        err = velocity_rmse(outs.velocity[valid], gt[valid])
        speed = np.linalg.norm(gt[1:], axis=-1).mean()
        # Stereo is metric with no range sensor: both direction AND scale.
        assert err < 0.35 * speed, (err, speed)

    def test_bad_pair_constant_motion(self):
        seq = make_stereo_sequence(n_frames=6, height=200, width=280, seed=7)
        imgs_l = seq.imgs_left.copy()
        imgs_l[3] = 50.0
        rig = StereoRig(
            K_left=jnp.asarray(seq.K), K_right=jnp.asarray(seq.K),
            R_right=jnp.eye(3), t_right=jnp.asarray([-0.33, 0.0, 0.0]),
        )
        _, outs = run_stereo_vo(
            jnp.asarray(imgs_l), jnp.asarray(seq.imgs_right),
            jnp.asarray(seq.timestamps), rig, STEREO_CFG, jax.random.PRNGKey(0),
        )
        outs = jax.tree.map(np.asarray, outs)
        assert outs.published[3] and not outs.validity[3]
        # constant-motion hold: same t as previous frame
        np.testing.assert_allclose(outs.t[3], outs.t[2])
        assert np.isfinite(outs.velocity).all()


@pytest.mark.fast
def test_batched_features_runner_matches_scan():
    """run_mono_vo_batched_features (detection vmapped outside the scan)
    must agree with run_mono_vo — same algorithm re-scheduled (the axon ORB
    workaround + external-feature entry, pipeline/mono.py).  Batched-vs-
    scanned XLA compilations reassociate float reductions, so agreement is
    to ~1e-3, with the discrete decisions (published/validity/method)
    required IDENTICAL."""
    from ergo_uvo_tpu.pipeline.mono import run_mono_vo_batched_features

    cfg = MonoVOConfig(
        surf=SurfConfig(min_hessian=60.0), max_keypoints=128,
        num_hypotheses=64,
    )
    seq = make_mono_sequence(n_frames=8, height=120, width=160, dt=0.25,
                             seed=3)
    args = (jnp.asarray(seq.imgs_left), jnp.asarray(seq.timestamps),
            jnp.asarray(seq.ranges), jnp.asarray(seq.K), cfg,
            jax.random.PRNGKey(0))
    _, a = run_mono_vo(*args)
    _, b = run_mono_vo_batched_features(*args)
    np.testing.assert_array_equal(np.asarray(a.published),
                                  np.asarray(b.published))
    np.testing.assert_array_equal(np.asarray(a.validity),
                                  np.asarray(b.validity))
    np.testing.assert_array_equal(np.asarray(a.used_essential),
                                  np.asarray(b.used_essential))
    np.testing.assert_array_equal(np.asarray(a.num_features),
                                  np.asarray(b.num_features))
    np.testing.assert_allclose(np.asarray(a.velocity),
                               np.asarray(b.velocity), atol=5e-3)
    np.testing.assert_allclose(np.asarray(a.scale_factor),
                               np.asarray(b.scale_factor), rtol=1e-2)
