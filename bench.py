"""Benchmark: mono-UVO frames/s/chip on real hardware.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

The benched unit is the reference's entire steady-state hot loop
(visual_odometry.h:247-397) including preprocessing (`get_image`: resize,
gray, undistort, CLAHE — VO_utility.cpp:337-379), at the reference's working
resolution (640-px width, mono_VO_parameters.yaml:6) and default SURF/LMEDS
configuration.  The whole sequence runs as ONE jitted `lax.scan` — no host
round-trips between frames.

Baseline: the reference's implied real-time target of 20 frames/s on CPU
(node_freq: 20, mono_VO_parameters.yaml:2; BASELINE.md "Operative baseline"
asks for >= 2x frames/s/chip).  vs_baseline = fps / 20.
"""

import json
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from ergo_uvo_tpu.config import MonoVOConfig, SurfConfig
    from ergo_uvo_tpu.image import build_preprocess_plan, preprocess_frame
    from ergo_uvo_tpu.io import make_mono_sequence
    from ergo_uvo_tpu.pipeline.mono import mono_vo_init, mono_vo_step

    n_frames = 32
    h, w = 480, 640
    cfg = MonoVOConfig(
        surf=SurfConfig(min_hessian=60.0),
        max_keypoints=512,
        num_hypotheses=512,
    )
    seq = make_mono_sequence(n_frames=n_frames, height=h, width=w, dt=0.05, seed=1)

    # Preprocess plan: identity-size (already 640-wide), mild distortion model.
    dist = np.array([-0.05, 0.01, 0.0, 0.0])
    plan = build_preprocess_plan(
        seq.K.astype(np.float64), dist, w, h, cfg.preprocessing.desired_width,
        clahe_enabled=cfg.preprocessing.clahe, clip_limit=cfg.preprocessing.clip_limit,
    )
    K = plan.new_K

    imgs = jnp.asarray(seq.imgs_left)
    tss = jnp.asarray(seq.timestamps)
    rgs = jnp.asarray(seq.ranges)

    def full_step(state, inp):
        img, ts, rg, key = inp
        pre = preprocess_frame(plan, img)
        return mono_vo_step(state, pre, ts, rg, K, key, cfg)

    @jax.jit
    def run(imgs, tss, rgs, key):
        keys = jax.random.split(key, imgs.shape[0])
        state = mono_vo_init(cfg.max_keypoints, cfg.descriptor_dim)
        return jax.lax.scan(full_step, state, (imgs, tss, rgs, keys))

    # Warmup/compile.
    state, outs = run(imgs, tss, rgs, jax.random.PRNGKey(0))
    jax.block_until_ready(outs.velocity)

    reps = 3
    t0 = time.perf_counter()
    for r in range(reps):
        state, outs = run(imgs, tss, rgs, jax.random.PRNGKey(r))
        jax.block_until_ready(outs.velocity)
    elapsed = time.perf_counter() - t0
    fps = n_frames * reps / elapsed

    print(
        json.dumps(
            {
                "metric": "mono_uvo_frames_per_second_per_chip",
                "value": round(fps, 2),
                "unit": "frames/s",
                "vs_baseline": round(fps / 20.0, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
