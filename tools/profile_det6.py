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
    from ergo_uvo_tpu.image import build_preprocess_plan, preprocess_frame
    from ergo_uvo_tpu.io import make_mono_sequence

    h, w = 480, 640
    seq = make_mono_sequence(n_frames=1, height=h, width=w, seed=1)
    img = jnp.asarray(seq.imgs_left[0])
    det = jax.jit(lambda im: detect_surf(im, 512, 60.0, 4, 3))
    det(img)
    bench(det, (img,), name="detect BEFORE preprocess ever ran")
    bench(det, (img,), name="detect again (still before)")

    dist = np.array([-0.05, 0.01, 0.0, 0.0])
    plan = build_preprocess_plan(seq.K.astype(np.float64), dist, w, h, 640, True, 3.0)
    pre = jax.jit(lambda im: preprocess_frame(plan, im))
    img2 = pre(img)
    jax.block_until_ready(img2)
    bench(det, (img,), name="detect AFTER preprocess ran once")
    del img2, pre, plan
    import gc; gc.collect()
    bench(det, (img,), name="detect after del plan + gc")
main()
