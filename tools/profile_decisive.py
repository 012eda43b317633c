"""Resolve the micro-vs-stage timing contradiction on the TPU.

Times each op (a) same input every rep, (b) cycling 8 distinct inputs,
(c) blocking every rep — to expose any async/caching artifacts in how the
benchmarks measure.  Also times composed jits vs their parts.
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")


def bench(fn, argsets, reps=20, name="", block_each=False):
    import jax

    out = fn(*argsets[0])
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for i in range(reps):
        out = fn(*argsets[i % len(argsets)])
        if block_each:
            jax.block_until_ready(out)
    jax.block_until_ready(out)
    ms = (time.perf_counter() - t0) / reps * 1e3
    print(f"{name:52s} {ms:8.3f} ms", flush=True)
    return ms


def main():
    import jax
    import jax.numpy as jnp

    print("backend:", jax.default_backend(), jax.devices(), flush=True)

    from ergo_uvo_tpu.config import SurfConfig
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

    remap = jax.jit(remap_bilinear)
    cla = jax.jit(lambda im: clahe(im, 3.0))
    surf = SurfConfig(min_hessian=60.0)
    det = jax.jit(lambda im: detect_and_describe(im, surf, 512, "SURF"))
    comp = jax.jit(lambda im: clahe(remap_bilinear(im, grid), 3.0))

    tiny = jax.jit(lambda x: x + 1.0)
    bench(tiny, [(imgs[0],)], name="tiny x+1 (dispatch overhead), same input")
    bench(tiny, [(im,) for im in imgs], name="tiny x+1, cycling inputs")

    bench(remap, [(imgs[0], grid)], name="remap, same input")
    bench(remap, [(im, grid) for im in imgs], name="remap, cycling inputs")
    bench(remap, [(im, grid) for im in imgs], name="remap, cycling + block each",
          block_each=True)

    bench(cla, [(imgs[0],)], name="clahe, same input")
    bench(cla, [(im,) for im in imgs], name="clahe, cycling inputs")
    bench(cla, [(im,) for im in imgs], name="clahe, cycling + block each",
          block_each=True)

    bench(comp, [(im,) for im in imgs], name="remap+clahe composed, cycling")

    bench(det, [(imgs[0],)], name="detect_and_describe, same input")
    bench(det, [(im,) for im in imgs], name="detect_and_describe, cycling")
    bench(det, [(im,) for im in imgs], name="detect_and_describe, cycling + block",
          block_each=True)


if __name__ == "__main__":
    main()
