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
    print(f"{name:46s} {(time.perf_counter()-t0)/reps*1e3:8.2f} ms")

def main():
    import jax, jax.numpy as jnp
    from ergo_uvo_tpu.features.detector import detect_surf
    from ergo_uvo_tpu.image.clahe import clahe
    from ergo_uvo_tpu.image.preprocess import remap_bilinear_shifts, resize_area
    from ergo_uvo_tpu.image import build_preprocess_plan
    from ergo_uvo_tpu.io import make_mono_sequence

    h, w = 480, 640
    seq = make_mono_sequence(n_frames=1, height=h, width=w, seed=1)
    img = jnp.asarray(seq.imgs_left[0])
    det = jax.jit(lambda im: detect_surf(im, 512, 60.0, 4, 3))
    det(img)
    bench(det, (img,), name="detect baseline")

    cl = jax.jit(lambda im: clahe(im, clip_limit=3.0))
    jax.block_until_ready(cl(img))
    bench(det, (img,), name="detect after CLAHE ran")

    rz = jax.jit(lambda im: resize_area(im, 240, 320))
    jax.block_until_ready(rz(img))
    bench(det, (img,), name="detect after resize ran")

    dist = np.array([-0.05, 0.01, 0.0, 0.0])
    plan = build_preprocess_plan(seq.K.astype(np.float64), dist, w, h, 640, True, 3.0)
    rm = jax.jit(lambda im: remap_bilinear_shifts(im, plan.disp, plan.max_shift))
    jax.block_until_ready(rm(img))
    bench(det, (img,), name="detect after remap ran")
main()
