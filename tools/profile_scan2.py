"""Sub-stage in-scan bisection: CLAHE parts, detector parts, descriptor parts.

Same methodology as profile_scan.py: N iterations inside one jitted scan.
"""

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
    print(f"{name:52s} {ms:8.3f} ms/iter", flush=True)
    return ms


def main():
    import jax
    import jax.numpy as jnp

    print("backend:", jax.default_backend(), flush=True)

    from ergo_uvo_tpu.features.detector import (
        _octave_candidates,
        filter_sizes,
        hessian_octave,
        pad_integral,
        integral_image,
    )

    h, w = 480, 640
    rng = np.random.default_rng(0)
    img0 = jnp.asarray(rng.uniform(0, 255, (h, w)).astype(np.float32))

    # ---- CLAHE parts -----------------------------------------------------
    HIST = 256
    gh = gw = 8
    th, tw = h // gh, w // gw

    def hist_step(c, _):
        ints = jnp.clip(jnp.round(c), 0, 255).astype(jnp.int32)
        tiles = ints.reshape(gh, th, gw, tw).transpose(0, 2, 1, 3).reshape(
            gh * gw, th * tw
        )
        bins = jnp.arange(HIST, dtype=jnp.int32)
        hist = jnp.sum((tiles[:, :, None] == bins[None, None, :]).astype(jnp.int32), 1)
        return c + jnp.sum(hist) * 1e-9, None

    def lut_gather_step(c, _):
        pix = jnp.clip(jnp.round(c), 0, 255).astype(jnp.int32)
        luts_flat = jnp.arange(gh * gw * HIST, dtype=jnp.float32)
        row = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0) // th
        col = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1) // tw
        tid = jnp.clip(row * gw + col, 0, gh * gw - 1)
        v = jnp.take(luts_flat, tid * HIST + pix)
        return c + jnp.sum(v) * 1e-9, None

    def lut_compare_step(c, _):
        """Candidate replacement: per-cell weighted compare-reduce."""
        pix = jnp.clip(jnp.round(c), 0, 255).astype(jnp.int32)
        tiles = pix.reshape(gh, th, gw, tw).transpose(0, 2, 1, 3).reshape(
            gh * gw, th * tw
        )
        Hc = jnp.ones((gh * gw, HIST), jnp.float32)  # stand-in clipped hist
        bins = jnp.arange(HIST, dtype=jnp.int32)
        # cdf[pix] = sum_b H[b] * (b <= pix)
        v = jnp.sum(
            Hc[:, None, :] * (bins[None, None, :] <= tiles[:, :, None]), axis=-1
        )
        return c + jnp.sum(v) * 1e-9, None

    bench_scan(hist_step, img0, "clahe: histogram compare-reduce")
    bench_scan(lut_gather_step, img0, "clahe: LUT flat gather (current)")
    bench_scan(lut_compare_step, img0, "clahe: LUT via compare-reduce (x1 corner)")

    # ---- detector parts --------------------------------------------------
    sizes = filter_sizes(4, 3)
    margin = sizes[-1][-1] // 2 + 2

    def integ(c):
        return jax.lax.optimization_barrier(pad_integral(integral_image(c), margin))

    def hess_step(c, _):
        iip = integ(c)
        acc = 0.0
        for o in range(4):
            d, t = hessian_octave(iip, margin, h, w, o, sizes[o])
            acc = acc + jnp.sum(d) * 1e-9 + jnp.sum(t) * 1e-9
        return c + acc, None

    def hess_o0_step(c, _):
        iip = integ(c)
        d, t = hessian_octave(iip, margin, h, w, 0, sizes[0])
        return c + (jnp.sum(d) + jnp.sum(t)) * 1e-9, None

    def cands_step(c, _):
        iip = integ(c)
        acc = 0.0
        for o in range(4):
            d, t = hessian_octave(iip, margin, h, w, o, sizes[o])
            d, t = jax.lax.optimization_barrier((d, t))
            s, xy, sg, lp, m = _octave_candidates(d, t, o, sizes[o], h, w, 512, 60.0)
            acc = acc + (jnp.sum(xy) + jnp.sum(s) + jnp.sum(sg)) * 1e-9
        return c + acc, None

    def topk_step(c, _):
        x = c.reshape(-1)
        big = jnp.concatenate([x, x, x, x, x])  # ~1.5M
        s, i = jax.lax.top_k(big, 512)
        return c + (jnp.sum(s) + jnp.sum(i)) * 1e-9, None

    bench_scan(hess_o0_step, img0, "detector: integral+hessian octave0")
    bench_scan(hess_step, img0, "detector: integral+hessian all octaves")
    bench_scan(cands_step, img0, "detector: hessian+NMS+topk+refine (full)")
    bench_scan(topk_step, img0, "top_k(512) over 1.5M")

    from ergo_uvo_tpu.features.detector import detect_surf
    from ergo_uvo_tpu.features.descriptor import (
        _sample_patches_matmul,
        describe_upright_surf,
    )
    from ergo_uvo_tpu.image.preprocess import remap_bilinear_shifts

    def detect_full_step(c, _):
        k = detect_surf(c, 512, 60.0)
        return c + (jnp.sum(k.xy) + jnp.sum(k.score) + jnp.sum(k.scale)) * 1e-9, None

    bench_scan(detect_full_step, img0, "detect_surf full (recheck)")

    k0 = detect_surf(img0, 512, 60.0)

    def patches_step(c, _):
        p = _sample_patches_matmul(c, k0.xy, k0.scale)
        return c + jnp.sum(p) * 1e-9, None

    def describe_step(c, _):
        d = describe_upright_surf(c, k0)
        return c + jnp.sum(d) * 1e-6, None

    bench_scan(patches_step, img0, "patch sampling via matmuls")
    bench_scan(describe_step, img0, "describe (matmul sampling) full")

    ys, xs = np.mgrid[0:h, 0:w].astype(np.float32)
    disp = jnp.asarray(
        np.stack([3.7 * np.sin(ys / 7), -2.9 * np.cos(xs / 5)], -1).astype(np.float32)
    )

    def remap_shift_step(c, _):
        r = remap_bilinear_shifts(c, disp, 4)
        return r * 0.999 + 0.1, None

    bench_scan(remap_shift_step, img0, "remap via shift decomposition (D=4)")


if __name__ == "__main__":
    main()
