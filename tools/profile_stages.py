"""Per-stage timing of the mono hot loop on the current default device.

Times each pipeline stage in isolation (jitted, with block_until_ready) so
optimization effort goes where the milliseconds are.  Not a test — a
development tool.  Run: `python tools/profile_stages.py`.
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def bench(fn, args, reps=20, name=""):
    import jax

    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    ms = (time.perf_counter() - t0) / reps * 1e3
    print(f"{name:35s} {ms:8.2f} ms")
    return ms


def main():
    import jax
    import jax.numpy as jnp

    from ergo_uvo_tpu.config import MonoVOConfig, SurfConfig
    from ergo_uvo_tpu.estimation.relative_pose import estimate_relative_pose
    from ergo_uvo_tpu.features.frontend import detect_and_describe
    from ergo_uvo_tpu.features.matcher import match_descriptors
    from ergo_uvo_tpu.geometry import (
        filter_3d_points,
        projection_matrix,
        triangulate_points,
    )
    from ergo_uvo_tpu.image import build_preprocess_plan, preprocess_frame
    from ergo_uvo_tpu.io import make_mono_sequence

    h, w = 480, 640
    cfg = MonoVOConfig(
        surf=SurfConfig(min_hessian=60.0), max_keypoints=512, num_hypotheses=512
    )
    seq = make_mono_sequence(n_frames=2, height=h, width=w, seed=1)
    dist = np.array([-0.05, 0.01, 0.0, 0.0])
    plan = build_preprocess_plan(
        seq.K.astype(np.float64), dist, w, h, cfg.preprocessing.desired_width,
        clahe_enabled=True, clip_limit=3.0,
    )
    K = jnp.asarray(plan.new_K)

    raw = jnp.asarray(seq.imgs_left[0])
    pre = jax.jit(lambda im: preprocess_frame(plan, im))
    img = pre(raw)
    bench(pre, (raw,), name="preprocess (resize+undistort+CLAHE)")

    det = jax.jit(
        lambda im: detect_and_describe(im, cfg.surf, cfg.max_keypoints, "SURF")
    )
    kpts, desc = det(img)
    bench(det, (img,), name="detect+describe (SURF)")

    img2 = pre(jnp.asarray(seq.imgs_left[1]))
    kpts2, desc2 = det(img2)

    mat = jax.jit(
        lambda d1, m1, d2, m2: match_descriptors(d1, m1, d2, m2, cfg.lowe_ratio_test)
    )
    matches = mat(desc, kpts.mask, desc2, kpts2.mask)
    bench(mat, (desc, kpts.mask, desc2, kpts2.mask), name="match (512x512 top-2)")

    prev_xy = jnp.where(matches.mask[:, None], kpts.xy, 0.0)
    curr_xy = jnp.where(
        matches.mask[:, None], jnp.take(kpts2.xy, matches.idx, axis=0), 0.0
    )
    R0, t0v = jnp.eye(3), jnp.zeros(3)

    est = jax.jit(
        lambda key, p, c, m: estimate_relative_pose(key, p, c, m, K, cfg, R0, t0v)
    )
    pose = est(jax.random.PRNGKey(0), prev_xy, curr_xy, matches.mask)
    bench(
        est,
        (jax.random.PRNGKey(0), prev_xy, curr_xy, matches.mask),
        name="estimate_relative_pose (E+H RANSAC)",
    )

    def tri(p, c, R, t, m):
        eye3 = jnp.eye(3, dtype=K.dtype)
        zero3 = jnp.zeros(3, K.dtype)
        P1 = projection_matrix(K, eye3, zero3)
        P2 = projection_matrix(K, R, t)
        X = triangulate_points(P1, P2, p, c)
        good, _ = filter_3d_points(
            X, m, K, eye3, zero3, K, R, t, p, c, cfg.reprojection_threshold, 5
        )
        return X, good

    trij = jax.jit(tri)
    out = trij(prev_xy, curr_xy, pose.R, pose.t, matches.mask)
    jax.block_until_ready(out)
    bench(
        trij,
        (prev_xy, curr_xy, pose.R, pose.t, matches.mask),
        name="triangulate+filter",
    )


if __name__ == "__main__":
    main()
