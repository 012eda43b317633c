"""Micro-timing of preprocess/detector sub-stages on the default device.

Finer-grained than tools/profile_stages.py: isolates remap, CLAHE histogram,
CLAHE LUT-interp, per-octave Hessian, NMS+topk, descriptor sampling — so
kernel work goes where the microseconds are.  Run: `python tools/profile_micro.py`.
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")


def bench(fn, args, reps=30, name=""):
    import jax

    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    ms = (time.perf_counter() - t0) / reps * 1e3
    print(f"{name:40s} {ms:8.3f} ms", flush=True)
    return ms


def main():
    import jax
    import jax.numpy as jnp

    from ergo_uvo_tpu.features.descriptor import describe_upright_surf
    from ergo_uvo_tpu.features.detector import detect_surf
    from ergo_uvo_tpu.image.clahe import clahe
    from ergo_uvo_tpu.image.preprocess import remap_bilinear

    h, w = 480, 640
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.uniform(0, 255, (h, w)).astype(np.float32))

    # remap grid: mild distortion-ish identity perturbation
    ys, xs = np.mgrid[0:h, 0:w].astype(np.float32)
    grid = jnp.asarray(np.stack([xs + 0.5 * np.sin(ys / 37), ys], -1))
    bench(jax.jit(remap_bilinear), (img, grid), name="remap_bilinear 640x480")

    bench(jax.jit(lambda im: clahe(im, 3.0)), (img,), name="clahe full")

    det = jax.jit(lambda im: detect_surf(im, max_keypoints=512, min_hessian=60.0))
    kpts = det(img)
    bench(det, (img,), name="detect_surf (4 octaves)")

    det1 = jax.jit(
        lambda im: detect_surf(im, max_keypoints=512, min_hessian=60.0, n_octaves=1)
    )
    det1(img)
    bench(det1, (img,), name="detect_surf (octave 0 only)")

    desc = jax.jit(lambda im, k: describe_upright_surf(im, k))
    desc(img, kpts)
    bench(desc, (img, kpts), name="describe_upright_surf (512)")


if __name__ == "__main__":
    main()
