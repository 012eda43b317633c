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
    from ergo_uvo_tpu.config import MonoVOConfig, SurfConfig
    from ergo_uvo_tpu.features.frontend import detect_and_describe
    from ergo_uvo_tpu.features.detector import detect_surf
    from ergo_uvo_tpu.features.descriptor import describe_surf
    from ergo_uvo_tpu.image import build_preprocess_plan, preprocess_frame
    from ergo_uvo_tpu.io import make_mono_sequence

    h, w = 480, 640
    cfg = MonoVOConfig(surf=SurfConfig(min_hessian=60.0), max_keypoints=512)
    seq = make_mono_sequence(n_frames=1, height=h, width=w, seed=1)
    dist = np.array([-0.05, 0.01, 0.0, 0.0])
    plan = build_preprocess_plan(seq.K.astype(np.float64), dist, w, h, 640, True, 3.0)
    pre = jax.jit(lambda im: preprocess_frame(plan, im))
    img = pre(jnp.asarray(seq.imgs_left[0]))
    print("img", img.shape, img.dtype)

    dd = jax.jit(lambda im: detect_and_describe(im, cfg.surf, cfg.max_keypoints, "SURF"))
    dd(img); bench(dd, (img,), name="detect_and_describe (frontend, as staged)")

    det = jax.jit(lambda im: detect_surf(im, 512, cfg.surf.min_hessian, cfg.surf.n_octaves, cfg.surf.n_octave_layers))
    kp = det(img); bench(det, (img,), name="detect_surf direct")
    desc = jax.jit(lambda im, kp: describe_surf(im, kp, extended=cfg.surf.extended, upright=cfg.surf.upright))
    desc(img, kp); bench(desc, (img, kp), name="describe_surf direct")
    print("surf cfg:", cfg.surf)
main()
