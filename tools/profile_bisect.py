"""Bisect the composed-program slowdowns on TPU.

Every measurement cycles 8 distinct inputs and blocks each rep — per-rep
wall time with no async pipelining illusions.
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")


def bench(fn, argsets, reps=16, name=""):
    import jax

    out = fn(*argsets[0])
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for i in range(reps):
        out = fn(*argsets[i % len(argsets)])
        jax.block_until_ready(out)
    ms = (time.perf_counter() - t0) / reps * 1e3
    print(f"{name:56s} {ms:8.3f} ms", flush=True)
    return ms


def main():
    import jax
    import jax.numpy as jnp

    print("backend:", jax.default_backend(), flush=True)

    from ergo_uvo_tpu.config import SurfConfig
    from ergo_uvo_tpu.features.descriptor import describe_upright_surf
    from ergo_uvo_tpu.features.detector import detect_surf
    from ergo_uvo_tpu.features.frontend import detect_and_describe
    from ergo_uvo_tpu.image.clahe import clahe
    from ergo_uvo_tpu.image.preprocess import remap_bilinear

    h, w = 480, 640
    rng = np.random.default_rng(0)
    imgs = [
        jnp.asarray(rng.uniform(0, 255, (h, w)).astype(np.float32)) for _ in range(8)
    ]
    ys, xs = np.mgrid[0:h, 0:w].astype(np.float32)
    grid = jnp.asarray(np.stack([xs + 0.5 * np.sin(ys / 37), ys], -1))
    surf = SurfConfig(min_hessian=60.0)

    A = [(im,) for im in imgs]

    remap = jax.jit(remap_bilinear)
    bench(remap, [(im, grid) for im in imgs], name="remap alone")
    bench(jax.jit(lambda im: clahe(im, 3.0)), A, name="clahe alone")
    bench(
        jax.jit(lambda im: clahe(remap_bilinear(im, grid), 3.0)), A,
        name="remap+clahe composed NO barrier",
    )
    bench(
        jax.jit(
            lambda im: clahe(
                jax.lax.optimization_barrier(remap_bilinear(im, grid)), 3.0
            )
        ),
        A,
        name="remap+clahe composed WITH barrier",
    )

    det = jax.jit(lambda im: detect_surf(im, 512, 60.0))
    bench(det, A, name="detect_surf alone")
    kpts_sets = [det(im) for im in imgs]
    jax.block_until_ready(kpts_sets[-1])
    desc = jax.jit(describe_upright_surf)
    bench(
        desc, [(im, k) for im, k in zip(imgs, kpts_sets)],
        name="describe alone (kpts as inputs)",
    )
    bench(
        jax.jit(lambda im: detect_and_describe(im, surf, 512, "SURF")), A,
        name="detect_and_describe (has barrier)",
    )

    def dd_nobarrier(im):
        k = detect_surf(im, 512, surf.min_hessian, surf.n_octaves,
                        surf.n_octave_layers)
        return k, describe_upright_surf(im, k)

    bench(jax.jit(dd_nobarrier), A, name="detect+describe NO barrier")

    def dd_detonly_out(im):
        k = detect_surf(im, 512, surf.min_hessian)
        return k

    # detect via the same code path detect_and_describe uses, sanity
    bench(jax.jit(dd_detonly_out), A, name="detect only (recheck)")


if __name__ == "__main__":
    main()
