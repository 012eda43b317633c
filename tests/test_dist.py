"""Distributed tests on the 8-device virtual CPU mesh (SURVEY.md §4).

These exercise the real mesh/collective code paths (psum in the Schur
reduction, sharded landmark arrays) without TPU hardware.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ergo_uvo_tpu.dist import make_mesh, run_mono_vo_batch, sharded_ba_solve
from ergo_uvo_tpu.optim import BAProblem, ba_solve

from test_optim import K, make_ba_scene  # reuse the synthetic BA scene


@pytest.fixture(scope="module")
def mesh():
    assert len(jax.devices()) >= 8, "conftest must provide 8 virtual devices"
    return make_mesh(8)


class TestShardedBA:
    def test_matches_single_device(self, mesh):
        Rs, ts, X, R0, t0, X0, obs, mask = make_ba_scene(P=4, L=64)
        prob = BAProblem(K=jnp.asarray(K), obs_uv=obs, obs_mask=mask)
        ref_state, ref_costs = ba_solve(prob, R0, t0, X0, iters=8)
        sh_state, sh_costs = sharded_ba_solve(
            mesh, jnp.asarray(K), obs, mask, R0, t0, X0, iters=8
        )
        # Early iterations may differ slightly (f32 reduce-then-psum vs one
        # global einsum, amplified through the normal equations); the
        # converged cost and state must agree.
        np.testing.assert_allclose(
            np.asarray(sh_costs)[-1], np.asarray(ref_costs)[-1], rtol=1e-3
        )
        # With one fixed pose the mono problem has a free scale gauge; the two
        # solvers converge to the same cost at (possibly) different points on
        # the gauge orbit — compare after scale normalization.
        s_ref = np.linalg.norm(np.asarray(ref_state.t[-1]))
        s_sh = np.linalg.norm(np.asarray(sh_state.t[-1]))
        np.testing.assert_allclose(
            np.asarray(sh_state.t) / s_sh, np.asarray(ref_state.t) / s_ref,
            atol=2e-3,
        )
        np.testing.assert_allclose(
            np.asarray(sh_state.X) / s_sh, np.asarray(ref_state.X) / s_ref,
            atol=5e-3,
        )

    def test_converges(self, mesh):
        Rs, ts, X, R0, t0, X0, obs, mask = make_ba_scene(P=4, L=128, seed=9)
        state, costs = sharded_ba_solve(
            mesh, jnp.asarray(K), obs, mask, R0, t0, X0, iters=15
        )
        costs = np.asarray(costs)
        noise_floor = 4 * 128 * 2 * 0.1**2
        assert costs[-1] < max(0.05 * costs[0], 1.5 * noise_floor)


class TestWindowShardedBA:
    """2-D ('kf','lm') mesh: window poses sharded + ppermute Schur ring."""

    @pytest.mark.parametrize("shape", [(2, 4), (4, 2), (8, 1), (1, 8)])
    def test_matches_single_device(self, shape):
        from ergo_uvo_tpu.dist import make_mesh_2d, window_sharded_ba_solve

        n_kf, n_lm = shape
        mesh2 = make_mesh_2d(n_kf, n_lm)
        Rs, ts, X, R0, t0, X0, obs, mask = make_ba_scene(P=8, L=64)
        prob = BAProblem(
            K=jnp.asarray(K), obs_uv=obs, obs_mask=mask, num_fixed_poses=2
        )
        ref_state, ref_costs = ba_solve(prob, R0, t0, X0, iters=8)
        (R, t, Xs, lam), costs = window_sharded_ba_solve(
            mesh2, jnp.asarray(K), obs, mask, R0, t0, X0,
            iters=8, num_fixed=2,
        )
        np.testing.assert_allclose(
            np.asarray(costs)[-1], np.asarray(ref_costs)[-1], rtol=1e-3
        )
        np.testing.assert_allclose(
            np.asarray(t), np.asarray(ref_state.t), atol=2e-3
        )
        np.testing.assert_allclose(
            np.asarray(Xs), np.asarray(ref_state.X), atol=5e-3
        )

    def test_converges_from_noise(self):
        from ergo_uvo_tpu.dist import make_mesh_2d, window_sharded_ba_solve

        mesh2 = make_mesh_2d(2, 4)
        Rs, ts, X, R0, t0, X0, obs, mask = make_ba_scene(P=8, L=128, seed=11)
        (_, _, _, _), costs = window_sharded_ba_solve(
            mesh2, jnp.asarray(K), obs, mask, R0, t0, X0, iters=15, num_fixed=2
        )
        costs = np.asarray(costs)
        noise_floor = 8 * 128 * 2 * 0.1**2
        assert costs[-1] < max(0.05 * costs[0], 1.5 * noise_floor), costs[[0, -1]]


class TestShardedIngestion:
    def test_shard_frame_batches(self, mesh):
        from ergo_uvo_tpu.dist import shard_frame_batches
        from ergo_uvo_tpu.io.sequence import ArraySource

        rng = np.random.default_rng(0)
        imgs = rng.uniform(0, 255, (16, 32, 48)).astype(np.float32)
        src = ArraySource(imgs, np.arange(16, dtype=np.float32),
                          ranges=np.ones(16, np.float32))
        seen = 0
        for imgs_d, tss_d, rgs_d in shard_frame_batches(src, mesh, 8):
            assert imgs_d.shape == (8, 32, 48)
            # batch axis really sharded over the 8 devices
            assert len(imgs_d.sharding.device_set) == 8
            np.testing.assert_allclose(
                np.asarray(imgs_d), imgs[seen : seen + 8]
            )
            seen += 8
        assert seen == 16


class TestDataParallelVO:
    def test_batch_runs_sharded(self, mesh):
        from ergo_uvo_tpu.config import MonoVOConfig, SurfConfig
        from ergo_uvo_tpu.io import make_mono_sequence

        cfg = MonoVOConfig(
            surf=SurfConfig(min_hessian=80.0, n_octaves=2),
            max_keypoints=128, num_hypotheses=64,
        )
        seqs = [make_mono_sequence(n_frames=4, height=128, width=160, seed=s)
                for s in range(8)]
        imgs = jnp.asarray(np.stack([s.imgs_left for s in seqs]))
        ts = jnp.asarray(np.stack([s.timestamps for s in seqs]))
        rg = jnp.asarray(np.stack([s.ranges for s in seqs]))
        state, outs = run_mono_vo_batch(
            mesh, imgs, ts, rg, jnp.asarray(seqs[0].K), cfg, jax.random.PRNGKey(0)
        )
        assert outs.velocity.shape == (8, 4, 3)
        assert bool(jnp.all(state.initialized))
