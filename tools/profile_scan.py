"""True device-side per-stage cost: each stage scanned N times inside ONE
jitted program (no per-call RPC/dispatch effects — the same regime bench.py
and the production pipeline run in).
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

N = 24


def bench_scan(make_step, x0, name, reps=3):
    """make_step() -> step(carry, x) -> (carry, None); times N iterations."""
    import jax

    @jax.jit
    def run(x0):
        c, _ = jax.lax.scan(make_step(), x0, None, length=N)
        return c

    out = run(x0)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = run(x0)
        jax.block_until_ready(out)
    ms = (time.perf_counter() - t0) / (reps * N) * 1e3
    print(f"{name:46s} {ms:8.3f} ms/iter", flush=True)
    return ms


def main():
    import jax
    import jax.numpy as jnp

    print("backend:", jax.default_backend(), flush=True)

    from ergo_uvo_tpu.config import SurfConfig
    from ergo_uvo_tpu.features.descriptor import describe_upright_surf
    from ergo_uvo_tpu.features.detector import detect_surf
    from ergo_uvo_tpu.features.integral import integral_image
    from ergo_uvo_tpu.features.matcher import match_descriptors
    from ergo_uvo_tpu.image.clahe import clahe
    from ergo_uvo_tpu.image.preprocess import remap_bilinear

    h, w = 480, 640
    rng = np.random.default_rng(0)
    img0 = jnp.asarray(rng.uniform(0, 255, (h, w)).astype(np.float32))
    ys, xs = np.mgrid[0:h, 0:w].astype(np.float32)
    grid = jnp.asarray(np.stack([xs + 0.5 * np.sin(ys / 37), ys], -1))
    surf = SurfConfig(min_hessian=60.0)

    # Each step perturbs the carry so iterations can't be CSE'd away.
    def remap_step():
        def step(c, _):
            return remap_bilinear(c, grid) * 0.999 + 0.1, None
        return step

    def clahe_step():
        def step(c, _):
            return clahe(c, 3.0) * 0.999 + 0.1, None
        return step

    def integral_step():
        def step(c, _):
            ii = integral_image(c)
            return c + ii[-1, -1] * 1e-9, None
        return step

    def detect_step():
        def step(c, _):
            k = detect_surf(c, 512, 60.0)
            return c + jnp.sum(k.xy) * 1e-9, None
        return step

    def describe_step():
        k0 = detect_surf(img0, 512, 60.0)

        def step(c, _):
            d = describe_upright_surf(c, k0)
            return c + jnp.sum(d) * 1e-6, None
        return step

    def detect_describe_step():
        def step(c, _):
            k = detect_surf(c, 512, surf.min_hessian)
            k = jax.lax.optimization_barrier(k)
            d = describe_upright_surf(c, k)
            return c + jnp.sum(d) * 1e-6, None
        return step

    def match_step():
        d1 = jnp.asarray(rng.standard_normal((512, 64)).astype(np.float32))
        m = jnp.ones(512, bool)

        def step(c, _):
            mm = match_descriptors(c, m, d1, m, 0.7)
            return c + mm.dist[:, None] * 1e-6, None
        return step

    bench_scan(remap_step, img0, "remap x%d in-scan" % N)
    bench_scan(clahe_step, img0, "clahe x%d in-scan" % N)
    bench_scan(integral_step, img0, "integral_image in-scan")
    bench_scan(detect_step, img0, "detect_surf in-scan")
    bench_scan(describe_step, img0, "describe in-scan")
    bench_scan(detect_describe_step, img0, "detect+describe in-scan")
    bench_scan(
        match_step,
        jnp.asarray(rng.standard_normal((512, 64)).astype(np.float32)),
        "match 512x512 in-scan",
    )

    # full preprocess with a real plan (shift remap + CLAHE cells)
    from ergo_uvo_tpu.image import build_preprocess_plan, preprocess_frame

    Kc = np.array([[600.0, 0, 320], [0, 600, 240], [0, 0, 1.0]])
    plan = build_preprocess_plan(
        Kc, np.array([-0.05, 0.01, 0.0, 0.0]), w, h, 640, True, 3.0
    )

    def preprocess_step():
        def step(c, _):
            return preprocess_frame(plan, c) * 0.999 + 0.1, None
        return step

    bench_scan(preprocess_step, img0, "preprocess_frame (plan) in-scan")

    # relative pose estimation with the GN polish
    from ergo_uvo_tpu.config import MonoVOConfig
    from ergo_uvo_tpu.estimation.relative_pose import estimate_relative_pose

    cfg = MonoVOConfig(max_keypoints=512, num_hypotheses=512)
    rngl = np.random.default_rng(1)
    xy1 = jnp.asarray(rngl.uniform(50, 400, (512, 2)).astype(np.float32))
    xy2 = xy1 + jnp.asarray(rngl.normal(5, 2, (512, 2)).astype(np.float32))
    maskm = jnp.ones(512, bool)
    Kj = jnp.asarray(Kc, jnp.float32)

    def est_step():
        key0 = jax.random.PRNGKey(0)

        def step(c, _):
            pose = estimate_relative_pose(
                key0, c, xy2, maskm, Kj, cfg, jnp.eye(3), jnp.zeros(3)
            )
            return c + pose.t[None, :2] * 1e-6, None
        return step

    bench_scan(est_step, xy1, "estimate_relative_pose in-scan")


if __name__ == "__main__":
    main()
