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
    raw = jnp.asarray(seq.imgs_left[0])
    dist = np.array([-0.05, 0.01, 0.0, 0.0])
    plan = build_preprocess_plan(seq.K.astype(np.float64), dist, w, h, 640, True, 3.0)
    pre = jax.jit(lambda im: preprocess_frame(plan, im))
    img = pre(raw)
    imn = np.asarray(img)
    print("raw:", float(raw.min()), float(raw.max()), raw.dtype)
    print("pre:", imn.min(), imn.max(), np.isfinite(imn).all(), (np.abs(imn[imn!=0]) < 1e-30).sum())

    det = jax.jit(lambda im: detect_surf(im, 512, 60.0, 4, 3))
    det(raw)
    bench(det, (raw,), name="detect_surf(raw synthetic)")
    bench(det, (img,), name="detect_surf(preprocessed, device out)")
    img_rt = jnp.asarray(imn)  # host round-trip
    bench(det, (img_rt,), name="detect_surf(preprocessed, host round-trip)")
    # raw with CLAHE-like range?
    bench(det, (jnp.asarray(np.asarray(raw)),), name="detect_surf(raw round-trip)")
main()
