"""CLAHE ablation on TPU: which half costs the 10 ms — histogram or LUT apply?"""

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
    h, w = 480, 640
    HIST = 256
    gh = gw = 8
    th, tw = h // gh, w // gw
    rng = np.random.default_rng(0)
    img0 = jnp.asarray(rng.uniform(0, 255, (h, w)).astype(np.float32))

    def hist_part(img):
        ints = jnp.clip(jnp.round(img), 0, 255).astype(jnp.int32)
        tiles = ints.reshape(gh, th, gw, tw).transpose(0, 2, 1, 3).reshape(
            gh * gw, th * tw
        )
        bins = jnp.arange(HIST, dtype=jnp.int32)
        return jnp.sum(
            (tiles[:, :, None] == bins[None, None, :]).astype(jnp.int32), axis=1
        )

    def lut_part(img, luts_flat):
        pix = jnp.clip(jnp.round(img), 0, 255).astype(jnp.int32)
        ys = jax.lax.broadcasted_iota(jnp.float32, (h, w), 0)
        xs = jax.lax.broadcasted_iota(jnp.float32, (h, w), 1)
        tyf = ys / th - 0.5
        txf = xs / tw - 0.5
        ty0 = jnp.floor(tyf)
        tx0 = jnp.floor(txf)
        wy = tyf - ty0
        wx = txf - tx0
        ty0i = jnp.clip(ty0.astype(jnp.int32), 0, gh - 1)
        tx0i = jnp.clip(tx0.astype(jnp.int32), 0, gw - 1)
        ty1 = jnp.clip(ty0i + 1, 0, gh - 1)
        tx1 = jnp.clip(tx0i + 1, 0, gw - 1)

        def lut_at(ty, tx):
            return jnp.take(luts_flat, (ty * gw + tx) * HIST + pix)

        v00 = lut_at(ty0i, tx0i)
        v01 = lut_at(ty0i, tx1)
        v10 = lut_at(ty1, tx0i)
        v11 = lut_at(ty1, tx1)
        return (
            v00 * (1 - wy) * (1 - wx)
            + v01 * (1 - wy) * wx
            + v10 * wy * (1 - wx)
            + v11 * wy * wx
        )

    fixed_luts = jnp.asarray(
        rng.uniform(0, 255, gh * gw * HIST).astype(np.float32)
    )

    def hist_only_step(c, _):
        hcounts = hist_part(c)
        return c + jnp.sum(hcounts).astype(jnp.float32) * 1e-9, None

    def lut_only_step(c, _):
        v = lut_part(c, fixed_luts)
        return v * 0.999 + 0.1, None

    def full_step(c, _):
        from ergo_uvo_tpu.image.clahe import clahe

        return clahe(c, 3.0) * 0.999 + 0.1, None

    bench_scan(lut_only_step, img0, "clahe LUT-apply only (4 gathers + blend)")
    bench_scan(hist_only_step, img0, "clahe histogram only (compare-reduce)")
    bench_scan(full_step, img0, "clahe full (reference impl)")


if __name__ == "__main__":
    main()
