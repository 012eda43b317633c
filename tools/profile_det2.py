"""Split detect vs describe timing on the current device."""
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
    print(f"{name:42s} {(time.perf_counter()-t0)/reps*1e3:8.2f} ms")

def main():
    import jax, jax.numpy as jnp
    from ergo_uvo_tpu.config import SurfConfig
    from ergo_uvo_tpu.features.detector import detect_surf
    from ergo_uvo_tpu.features.descriptor import describe_surf
    from ergo_uvo_tpu.features.integral import integral_image, pad_integral
    from ergo_uvo_tpu.io import make_mono_sequence

    seq = make_mono_sequence(n_frames=1, height=480, width=640, seed=1)
    img = jnp.asarray(seq.imgs_left[0])

    ii = jax.jit(lambda im: pad_integral(integral_image(im), 200))
    ii(img); bench(ii, (img,), name="integral+pad")

    det = jax.jit(lambda im: detect_surf(im, 512, 60.0, 4, 3))
    kp = det(img); bench(det, (img,), name="detect_surf (4 octaves)")

    det2 = jax.jit(lambda im: detect_surf(im, 512, 60.0, 2, 3))
    det2(img); bench(det2, (img,), name="detect_surf (2 octaves)")

    desc = jax.jit(lambda im, kp: describe_surf(im, kp))
    desc(img, kp); bench(desc, (img, kp), name="describe_surf (512 kp, upright)")
main()
