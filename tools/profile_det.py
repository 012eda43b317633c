"""Detector bisection on TPU, with full-result consumption (no DCE traps)."""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

N = 24


def bench_scan(step, x0, name, reps=3):
    import jax

    @jax.jit
    def run(x0):
        c, _ = jax.lax.scan(step, x0, None, length=N)
        return c

    out = run(x0)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = run(x0)
        jax.block_until_ready(out)
    ms = (time.perf_counter() - t0) / (reps * N) * 1e3
    print(f"{name:56s} {ms:8.3f} ms/iter", flush=True)
    return ms


def main():
    import jax
    import jax.numpy as jnp

    print("backend:", jax.default_backend(), flush=True)
    from ergo_uvo_tpu.features.detector import (
        detect_surf,
        filter_sizes,
        hessian_octave,
        integral_image,
        pad_integral,
    )

    h, w = 480, 640
    rng = np.random.default_rng(0)
    img0 = jnp.asarray(rng.uniform(0, 255, (h, w)).astype(np.float32))
    sizes = filter_sizes(4, 3)
    margin = sizes[-1][-1] // 2 + 2

    def stages(c, upto):
        iip = jax.lax.optimization_barrier(
            pad_integral(integral_image(c), margin)
        )
        acc = jnp.zeros((), c.dtype)
        for o in range(4):
            d, t = hessian_octave(iip, margin, h, w, o, sizes[o])
            d, t = jax.lax.optimization_barrier((d, t))
            if upto == "hessian":
                acc += (jnp.sum(d) + jnp.sum(t)) * 1e-9
                continue
            nmax = jax.lax.reduce_window(
                d, -jnp.inf, jax.lax.max, (3, 3, 3), (1, 1, 1),
                [(1, 1), (1, 1), (1, 1)],
            )
            peak = jnp.where((d >= nmax) & (d > 60.0), d, -jnp.inf)
            if upto == "nms":
                acc += jnp.sum(jnp.where(jnp.isfinite(peak), peak, 0.0)) * 1e-9
                continue
            flat = peak.reshape(-1)
            k = min(512, flat.shape[0])
            s, i = jax.lax.top_k(flat, k)
            acc += (jnp.sum(jnp.where(jnp.isfinite(s), s, 0.0))
                    + jnp.sum(i).astype(c.dtype)) * 1e-9
            if upto == "topk":
                continue
        return c + acc, None

    bench_scan(lambda c, _: stages(c, "hessian"), img0, "hessian (all octaves)")
    bench_scan(lambda c, _: stages(c, "nms"), img0, "hessian + NMS")
    bench_scan(lambda c, _: stages(c, "topk"), img0, "hessian + NMS + per-octave top_k")

    def full_step(c, _):
        kk = detect_surf(c, 512, 60.0)
        return c + (jnp.sum(kk.xy) + jnp.sum(kk.score) + jnp.sum(kk.scale)
                    + jnp.sum(kk.laplacian)) * 1e-9, None

    bench_scan(full_step, img0, "detect_surf full")


if __name__ == "__main__":
    main()
