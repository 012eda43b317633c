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
    ms = (time.perf_counter()-t0)/reps*1e3
    print(f"{name:46s} {ms:8.2f} ms")
    return ms

def main():
    import jax, jax.numpy as jnp
    from ergo_uvo_tpu.features.detector import (
        detect_surf, filter_sizes, hessian_octave, _octave_candidates)
    from ergo_uvo_tpu.features.integral import integral_image, pad_integral
    from ergo_uvo_tpu.io import make_mono_sequence

    h, w = 480, 640
    seq = make_mono_sequence(n_frames=1, height=h, width=w, seed=1)
    img = jnp.asarray(seq.imgs_left[0])
    sizes = filter_sizes(4, 3)
    margin = sizes[-1][-1] // 2 + 2

    ii = jax.jit(lambda im: pad_integral(integral_image(im), margin))
    iip = ii(img)
    bench(ii, (img,), name="integral+pad")

    # dense Hessian per octave
    for o in range(4):
        f = jax.jit(lambda iip, o=o: hessian_octave(iip, margin, h, w, o, sizes[o]))
        f(iip); bench(f, (iip,), name=f"hessian_octave {o} (dense)")

    # candidates per octave (NMS + topk + refine)
    for o in range(4):
        fh = jax.jit(lambda iip, o=o: hessian_octave(iip, margin, h, w, o, sizes[o]))
        d, t = fh(iip)
        fc = jax.jit(lambda d, t, o=o: _octave_candidates(d, t, o, sizes[o], h, w, 512, 60.0))
        fc(d, t); bench(fc, (d, t), name=f"octave_candidates {o} (NMS+topk+refine)")

    det = jax.jit(lambda im: detect_surf(im, 512, 60.0, 4, 3))
    det(img); bench(det, (img,), name="detect_surf full")
main()
