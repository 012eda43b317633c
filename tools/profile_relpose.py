"""Micro-profile of the relative-pose internals on the current device."""
import os, sys, time
import numpy as np
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

def bench(fn, args, reps=30, name=""):
    import jax
    out = fn(*args); jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    print(f"{name:42s} {(time.perf_counter()-t0)/reps*1e3:8.2f} ms")

def main():
    import jax, jax.numpy as jnp
    from ergo_uvo_tpu.config import MonoVOConfig, SurfConfig
    from ergo_uvo_tpu.estimation.essential import (
        _normalized, find_essential, recover_pose_from_essential,
        eight_point_essential, sampson_error_sq, gn_refine_essential)
    from ergo_uvo_tpu.estimation.homography import find_homography, recover_pose_homography
    from ergo_uvo_tpu.estimation.sampling import sample_minimal_sets

    cfg = MonoVOConfig(num_hypotheses=512)
    N = 512
    rng = np.random.default_rng(0)
    K = jnp.asarray([[576.0, 0, 320], [0, 576, 240], [0, 0, 1.0]])
    X = np.stack([rng.uniform(-2, 2, N), rng.uniform(-1.5, 1.5, N), rng.uniform(4, 8, N)], -1)
    R = np.eye(3); t = np.array([0.3, 0.05, 0.02])
    x1 = X[:, :2] / X[:, 2:3]
    Xc = X @ R.T + t
    x2 = Xc[:, :2] / Xc[:, 2:3]
    Kn = np.asarray(K)
    xy1 = jnp.asarray(x1 * [Kn[0,0], Kn[1,1]] + [Kn[0,2], Kn[1,2]] + 0.3*rng.standard_normal((N,2)))
    xy2 = jnp.asarray(x2 * [Kn[0,0], Kn[1,1]] + [Kn[0,2], Kn[1,2]] + 0.3*rng.standard_normal((N,2)))
    mask = jnp.ones(N, bool)
    key = jax.random.PRNGKey(0)

    fe = jax.jit(lambda k, a, b, m: find_essential(k, a, b, m, K, cfg.essential.outlier_method, cfg.essential.threshold, cfg.num_hypotheses))
    E, inl = fe(key, xy1, xy2, mask)
    bench(fe, (key, xy1, xy2, mask), name="find_essential (512 hyp, LMEDS+refit+GN)")

    x1n = _normalized(K, xy1); x2n = _normalized(K, xy2)
    rp = jax.jit(recover_pose_from_essential)
    rp(E, x1n, x2n, inl)
    bench(rp, (E, x1n, x2n, inl), name="recover_pose_from_essential")

    fh = jax.jit(lambda k, a, b, m: find_homography(k, a, b, m, cfg.homography.outlier_method, cfg.homography.threshold, cfg.num_hypotheses))
    Hm, hinl = fh(key, xy1, xy2, mask)
    bench(fh, (key, xy1, xy2, mask), name="find_homography (512 hyp)")

    rh = jax.jit(lambda H, a, b, m: recover_pose_homography(H, a, b, m, K, cfg.homography_distance, jnp.eye(3), jnp.zeros(3)))
    rh(Hm, xy1, xy2, hinl)
    bench(rh, (Hm, xy1, xy2, hinl), name="recover_pose_homography")

    # find_essential internals
    samp = jax.jit(lambda k, m: sample_minimal_sets(k, m, cfg.num_hypotheses, 8))
    idx, sv = samp(key, mask)
    bench(samp, (key, mask), name="  sample_minimal_sets")
    ep = jax.jit(lambda i: eight_point_essential(x1n[i], x2n[i]))
    Es = ep(idx)
    bench(ep, (idx,), name="  eight_point_essential (batched eig 9x9)")
    se = jax.jit(lambda Es: sampson_error_sq(Es, x1n, x2n))
    se(Es)
    bench(se, (Es,), name="  sampson_error_sq (512x512)")
    from ergo_uvo_tpu.estimation.robust import score_hypotheses
    sc = jax.jit(lambda r2: score_hypotheses(r2, mask, sv, cfg.essential.outlier_method, 0.1/576.0, 8))
    r2 = se(Es)
    sc(r2)
    bench(sc, (r2,), name="  score_hypotheses (LMEDS medians)")
    gn = jax.jit(lambda E: gn_refine_essential(E, x1n, x2n, inl.astype(x1n.dtype)))
    gn(E)
    bench(gn, (E,), name="  gn_refine_essential (6 GN iters)")

if __name__ == "__main__":
    main()
