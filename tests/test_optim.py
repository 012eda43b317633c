"""BA / keyframe-window / pose-graph tests on synthetic ground truth."""

import jax
import jax.numpy as jnp
import numpy as np

from ergo_uvo_tpu.geometry import so3_exp
from ergo_uvo_tpu.optim import (
    BAProblem,
    ba_solve,
    optimize_pose_graph,
    detect_loop_closures,
)
from ergo_uvo_tpu.optim.keyframes import WindowedBA, build_ba_problem, KeyframeWindow
from ergo_uvo_tpu.optim.ba import reprojection_residuals
from ergo_uvo_tpu.optim.pose_graph import (
    PoseGraph,
    global_descriptor,
    pose_graph_residuals,
)

K = np.array([[300.0, 0, 160], [0, 300, 120], [0, 0, 1]], np.float32)


def make_ba_scene(P=5, L=64, seed=0, pix_noise=0.1, pose_noise=0.05, lm_noise=0.3):
    rng = np.random.default_rng(seed)
    X = np.stack(
        [rng.uniform(-3, 3, L), rng.uniform(-2, 2, L), rng.uniform(5, 9, L)], -1
    ).astype(np.float32)
    Rs, ts, obs = [], [], []
    for p in range(P):
        w = 0.03 * rng.standard_normal(3).astype(np.float32)
        R = np.asarray(so3_exp(jnp.asarray(w)))
        t = np.array([0.25 * p, 0.02 * p, 0.0], np.float32)
        pc = X @ R.T + t
        uv = pc[:, :2] / pc[:, 2:3] * [K[0, 0], K[1, 1]] + [K[0, 2], K[1, 2]]
        obs.append(uv + pix_noise * rng.standard_normal((L, 2)))
        Rs.append(R)
        ts.append(t)
    Rs, ts, obs = np.stack(Rs), np.stack(ts), np.stack(obs).astype(np.float32)
    mask = np.ones((P, L), bool)
    # noisy initialization
    R0 = np.stack(
        [np.asarray(so3_exp(jnp.asarray(pose_noise * rng.standard_normal(3), jnp.float32))) @ Rs[p]
         for p in range(P)]
    )
    R0[0] = Rs[0]  # anchored pose exact
    t0 = ts + pose_noise * rng.standard_normal((P, 3)).astype(np.float32)
    t0[0] = ts[0]
    X0 = X + lm_noise * rng.standard_normal((L, 3)).astype(np.float32)
    return (jnp.asarray(v) for v in (Rs, ts, X, R0, t0, X0, obs, mask))


class TestBA:
    def test_reduces_cost_and_recovers_poses(self):
        Rs, ts, X, R0, t0, X0, obs, mask = make_ba_scene()
        prob = BAProblem(K=jnp.asarray(K), obs_uv=obs, obs_mask=mask)
        state, costs = ba_solve(prob, R0, t0, X0, iters=25)
        costs = np.asarray(costs)
        # Converge to near the pixel-noise chi^2 floor (~P*L*2*sigma^2),
        # far below the perturbation-dominated initial cost.
        noise_floor = 5 * 64 * 2 * 0.1**2
        assert costs[-1] < max(0.02 * costs[0], 1.5 * noise_floor), costs[[0, -1]]
        # pose translation error shrinks vs initialization
        err0 = np.linalg.norm(np.asarray(t0) - np.asarray(ts), axis=-1).mean()
        err1 = np.linalg.norm(np.asarray(state.t) - np.asarray(ts), axis=-1).mean()
        assert err1 < 0.5 * err0, (err0, err1)

    def test_masked_observations_ignored(self):
        Rs, ts, X, R0, t0, X0, obs, mask = make_ba_scene()
        obs = obs.at[2, :10].set(1e5)  # poisoned but masked out
        mask = mask.at[2, :10].set(False)
        prob = BAProblem(K=jnp.asarray(K), obs_uv=obs, obs_mask=mask)
        state, costs = ba_solve(prob, R0, t0, X0, iters=15)
        assert np.isfinite(np.asarray(costs)).all()
        assert np.asarray(costs)[-1] < 0.2 * np.asarray(costs)[0]

    def test_gauge_fixed_pose_unchanged(self):
        Rs, ts, X, R0, t0, X0, obs, mask = make_ba_scene()
        prob = BAProblem(K=jnp.asarray(K), obs_uv=obs, obs_mask=mask)
        state, _ = ba_solve(prob, R0, t0, X0, iters=10)
        np.testing.assert_allclose(np.asarray(state.R[0]), np.asarray(R0[0]), atol=1e-6)
        np.testing.assert_allclose(np.asarray(state.t[0]), np.asarray(t0[0]), atol=1e-6)


class TestPoseGraph:
    def _chain(self, T=12, drift=0.05, seed=0):
        """Ground-truth circular-ish trajectory + odometry edges with drift."""
        rng = np.random.default_rng(seed)
        R_gt = [np.eye(3, dtype=np.float32)]
        t_gt = [np.zeros(3, np.float32)]
        for k in range(1, T):
            w = np.array([0, 0, 2 * np.pi / T], np.float32)
            dR = np.asarray(so3_exp(jnp.asarray(w)))
            R_gt.append((dR @ R_gt[-1]).astype(np.float32))
            t_gt.append(t_gt[-1] + rng.uniform(-1, 1, 3).astype(np.float32) * 0 + np.array([1.0, 0, 0], np.float32))
        return np.stack(R_gt), np.stack(t_gt)

    def test_residuals_zero_at_ground_truth(self):
        R_gt, t_gt = self._chain()
        T = len(R_gt)
        ei = np.arange(T - 1, dtype=np.int32)
        ej = ei + 1
        R_rel, t_rel = [], []
        for i in range(T - 1):
            Rr = R_gt[i + 1] @ R_gt[i].T
            tr = t_gt[i + 1] - Rr @ t_gt[i]
            R_rel.append(Rr)
            t_rel.append(tr)
        g = PoseGraph(
            R=jnp.asarray(R_gt), t=jnp.asarray(t_gt),
            edge_i=jnp.asarray(ei), edge_j=jnp.asarray(ej),
            edge_R=jnp.asarray(np.stack(R_rel)), edge_t=jnp.asarray(np.stack(t_rel)),
            edge_weight=jnp.ones(T - 1),
        )
        r = pose_graph_residuals(g)
        assert float(jnp.abs(r).max()) < 1e-4

    def test_optimization_corrects_drift(self):
        R_gt, t_gt = self._chain(T=12)
        T = len(R_gt)
        rng = np.random.default_rng(1)
        # noisy initial nodes, exact odometry + one loop-closure edge
        R0 = [R_gt[0]]
        t0 = [t_gt[0]]
        for k in range(1, T):
            w = (0.03 * rng.standard_normal(3)).astype(np.float32)
            R0.append((np.asarray(so3_exp(jnp.asarray(w))) @ R_gt[k]).astype(np.float32))
            t0.append((t_gt[k] + 0.2 * rng.standard_normal(3)).astype(np.float32))
        ei = list(range(T - 1)) + [0]
        ej = list(range(1, T)) + [T - 1]
        R_rel, t_rel = [], []
        for i, j in zip(ei, ej):
            Rr = R_gt[j] @ R_gt[i].T
            tr = t_gt[j] - Rr @ t_gt[i]
            R_rel.append(Rr)
            t_rel.append(tr)
        g = PoseGraph(
            R=jnp.asarray(np.stack(R0)), t=jnp.asarray(np.stack(t0)),
            edge_i=jnp.asarray(np.array(ei, np.int32)),
            edge_j=jnp.asarray(np.array(ej, np.int32)),
            edge_R=jnp.asarray(np.stack(R_rel)), edge_t=jnp.asarray(np.stack(t_rel)),
            edge_weight=jnp.ones(len(ei)),
        )
        g_opt, costs = optimize_pose_graph(g, iters=15)
        err0 = np.linalg.norm(np.stack(t0) - t_gt, axis=-1).mean()
        err1 = np.linalg.norm(np.asarray(g_opt.t) - t_gt, axis=-1).mean()
        assert err1 < 0.2 * err0, (err0, err1)
        assert np.asarray(costs)[-1] < 1e-3 * max(np.asarray(costs)[0], 1e-12) or err1 < 0.02

    def test_loop_closure_detection(self):
        rng = np.random.default_rng(2)
        T, D = 30, 64
        descs = rng.standard_normal((T, D)).astype(np.float32)
        descs[25] = descs[3] + 0.01 * rng.standard_normal(D).astype(np.float32)  # revisit
        descs /= np.linalg.norm(descs, axis=-1, keepdims=True)
        pairs, scores, valid = detect_loop_closures(jnp.asarray(descs), min_gap=10, top_k=4)
        pairs = np.asarray(pairs)
        valid = np.asarray(valid)
        assert valid[0]
        assert tuple(pairs[0]) == (3, 25)

    def test_global_descriptor_masked(self):
        desc = jnp.asarray(np.random.default_rng(0).standard_normal((16, 64)).astype(np.float32))
        mask = jnp.zeros(16, bool).at[:4].set(True)
        g = global_descriptor(desc, mask)
        manual = np.asarray(desc)[:4].mean(0)
        manual /= np.linalg.norm(manual)
        np.testing.assert_allclose(np.asarray(g), manual, atol=1e-5)


class TestWindowedBA:
    def test_window_refine_on_synthetic_features(self):
        """Window of synthetic 'keyframes' sharing one landmark field."""
        rng = np.random.default_rng(3)
        L = 96
        X = np.stack(
            [rng.uniform(-3, 3, L), rng.uniform(-2, 2, L), rng.uniform(5, 9, L)], -1
        ).astype(np.float32)
        desc = rng.standard_normal((L, 64)).astype(np.float32)
        desc /= np.linalg.norm(desc, axis=-1, keepdims=True)
        wba = WindowedBA(window_size=4, iters=15)
        Rs, ts = [], []
        for p in range(4):
            R = np.asarray(so3_exp(jnp.asarray(0.02 * rng.standard_normal(3), jnp.float32)))
            t = np.array([0.3 * p, 0.0, 0.0], np.float32)
            pc = X @ R.T + t
            uv = (pc[:, :2] / pc[:, 2:3] * [K[0, 0], K[1, 1]] + [K[0, 2], K[1, 2]]).astype(np.float32)
            uv += 0.1 * rng.standard_normal((L, 2)).astype(np.float32)
            # noisy pose init (anchor exact)
            if p <= 1:
                R0, t0 = R, t  # two anchor poses exact (scale gauge)
            else:
                R0 = np.asarray(so3_exp(jnp.asarray(0.02 * rng.standard_normal(3), jnp.float32))) @ R
                t0 = t + 0.05 * rng.standard_normal(3).astype(np.float32)
            wba.push_keyframe(jnp.asarray(uv), jnp.asarray(desc),
                              jnp.ones(L, bool), jnp.asarray(R0), jnp.asarray(t0))
            Rs.append(R)
            ts.append(t)
        assert wba.full
        state, costs, lm_mask = wba.refine(jnp.asarray(K))
        costs = np.asarray(costs)
        assert int(jnp.sum(lm_mask)) > 60
        noise_floor = 4 * L * 2 * 0.1**2
        assert costs[-1] < max(0.3 * costs[0], 2.0 * noise_floor), costs[[0, -1]]
        err = np.linalg.norm(np.asarray(state.t) - np.stack(ts), axis=-1).mean()
        assert err < 0.04, err
