"""Benchmarks: mono/stereo UVO frames/s/chip, parity vs the reference
re-execution, BA iters/s, per-stage device costs, scaling efficiency.

Prints ONE JSON line per metric: {"metric", "value", "unit", "vs_baseline"}.
The headline metric (mono frames/s/chip vs the reference's 20 Hz real-time
target) is printed LAST.

Crash isolation (VERDICT r4 #1): every section runs in its OWN subprocess —
`python bench.py` orchestrates; `python bench.py --section NAME` runs one
section inline.  CPU-sufficient sections (reference parity, oracle
throughput, scaling proxies) run under JAX_PLATFORMS=cpu and can never be
taken down by a TPU fault; device sections each get a fresh process so one
axon kernel fault costs one metric, not five (the r4 failure mode:
BENCH_r04.json lost 5/8 metrics to a single worker crash).

The benched unit for the VO metrics is the reference's entire steady-state
hot loop (visual_odometry.h:247-397 mono, :526-740 stereo) including
preprocessing (`get_image`: resize, gray, undistort, CLAHE —
VO_utility.cpp:337-379), at the reference's working resolution (640-px width,
mono_VO_parameters.yaml:6).  Each sequence runs as ONE jitted `lax.scan` —
no host round-trips between frames.

Baselines (BASELINE.md "Operative baseline"):
  * mono/stereo fps: vs the 20 frames/s implied real-time target
    (node_freq: 20, UVO_node.cpp:14) AND — new in r5 — vs the MEASURED
    throughput of the faithful OpenCV re-execution of the reference mono
    pipeline on this host (`reference_mono_fps`;
    `mono_fps_vs_reference_measured` targets the >= 2x/chip BASELINE row);
  * ATE rows: vs_baseline = ate_reference / ate_ours (>= 1.0 means the
    engine is at least as accurate as the reference re-execution);
  * BA iters/s + per-stage ms: no reference analogue (the reference has no
    BA and publishes no timings) — vs_baseline fixed at 1.0;
  * distributed-BA comm efficiency (virtual 8-device mesh + 2-process gloo)
    — vs_baseline = efficiency / 0.8 against the >= 80% target.
"""

import argparse
import json
import os
import subprocess
import sys
import time

import numpy as np

_REPO = os.path.dirname(os.path.abspath(__file__)) or "."
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(_REPO, ".jax_cache"))


def size_slope_rate(time_fn, size_lo, size_hi, reps=2):
    """Units/s from the wall-time difference of the SAME computation compiled
    at two static sizes (scan length / iteration count).

    Why not plain rep timing: on the axon TPU tunnel `jax.block_until_ready`
    is a NO-OP and each dispatch/fetch carries seconds of fixed RPC overhead
    (r4 calibration: ~2.5 s fixed vs 0.17 s true device time per 32-frame
    scan) — per-rep wall timing measures the tunnel, not the chip.  Why not
    chained reps: queueing tens of un-synced dispatches reproducibly CRASHED
    the experimental axon worker (three r4 incidents, all right after the
    chained section).  Here every measurement is ONE dispatch + one tiny
    fetch; `time_fn(size)` must run the size-`size` program and block on a
    scalar of its result.  The fixed overhead cancels in t_hi - t_lo and the
    slope is honest device throughput; `reps` takes the min to damp jitter.

    Under RPC jitter t_hi can come back <= t_lo; that is a failed
    measurement, not a throughput — return NaN so the caller skips the
    metric instead of emitting a ~1e10 garbage rate (ADVICE r4).
    """
    t_lo = min(time_fn(size_lo) for _ in range(reps))
    t_hi = min(time_fn(size_hi) for _ in range(reps))
    dt = t_hi - t_lo
    if dt <= 1e-6:
        print(f"# slope measurement failed: t_lo={t_lo:.4f}s "
              f"t_hi={t_hi:.4f}s (jitter >= signal)", file=sys.stderr)
        return float("nan")
    return (size_hi - size_lo) / dt


# Presentation order (headline LAST).  Sections RUN in a different, safety
# order — see _SECTIONS: CPU sections are immune to the flaky axon worker;
# device sections run never-recorded metrics first.
_ORDER = [
    "distributed_ba_comm_efficiency_8dev",
    "distributed_ba_efficiency_2proc",
    "reference_mono_fps",
    "reference_mono_ate_m_sift",
    "mono_velocity_rmse_sift",
    "mono_ate_m_sift",
    "reference_stereo_ate_m_sift",
    "stereo_ate_m_sift",
    "mono_stage_ms_preprocess",
    "mono_stage_ms_detect",
    "mono_stage_ms_match",
    "mono_stage_ms_pose",
    "mono_stage_ms_triangulate",
    "matcher_achieved_tflops",
    "ba_iters_per_second_8x512",
    "mono_uvo_fps_orb",
    "mono_uvo_fps_sift",
    "mono_uvo_fps_akaze",
    "mono_uvo_fps_refcfg",
    "mono_fps_vs_reference_measured",
    "stereo_uvo_frames_per_second_per_chip",
    "mono_uvo_frames_per_second_per_chip",
]
_LINES = []


def emit(metric, value, unit, vs_baseline):
    if not (np.isfinite(value) and np.isfinite(vs_baseline)):
        print(f"# {metric} skipped: non-finite measurement "
              f"({value}, {vs_baseline})", file=sys.stderr)
        return
    v = float(value)
    line = json.dumps(
        {
            "metric": metric,
            # sub-0.1 values (e.g. the matcher's ms/frame) keep enough
            # digits to stay nonzero in the record
            "value": round(v, 2) if abs(v) >= 0.1 else round(v, 5),
            "unit": unit,
            "vs_baseline": round(float(vs_baseline), 2),
        }
    )
    print(f"# {line}", file=sys.stderr, flush=True)  # progress visibility
    _LINES.append((metric, line))


def flush_lines():
    key = {m: i for i, m in enumerate(_ORDER)}
    for _, line in sorted(_LINES, key=lambda p: key.get(p[0], len(_ORDER) // 2)):
        print(line, flush=True)


# --------------------------------------------------------------------------
# CPU sections
# --------------------------------------------------------------------------


def section_scaling():
    """Virtual-mesh comm-overhead proxy (its own process: XLA_FLAGS device
    count must be set before jax imports)."""
    out = subprocess.run(
        [sys.executable, os.path.join(_REPO, "tools", "bench_scaling.py")],
        capture_output=True, text=True, timeout=900,
        env={**os.environ, "JAX_PLATFORMS": "cpu"},
    )
    line = out.stdout.strip().splitlines()[-1]
    d = json.loads(line)
    emit("distributed_ba_comm_efficiency_8dev",
         d["efficiency"], "ratio", d["efficiency"] / 0.8)


def section_scaling_2proc():
    """Cross-PROCESS scaling (VERDICT r4 missing #5): sharded-BA iters/s at
    1 vs 2 gloo processes on the same total problem
    (tools/bench_scaling_2proc.py)."""
    out = subprocess.run(
        [sys.executable,
         os.path.join(_REPO, "tools", "bench_scaling_2proc.py")],
        capture_output=True, text=True, timeout=900,
        env={**os.environ, "JAX_PLATFORMS": "cpu"},
    )
    line = out.stdout.strip().splitlines()[-1]
    d = json.loads(line)
    emit("distributed_ba_efficiency_2proc",
         d["efficiency"], "ratio", d["efficiency"] / 0.8)


def section_parity():
    """BASELINE headline rows, all CPU (VERDICT r4 #1: parity needs no TPU
    and must not die with it).

    The reference trajectory is generated by the faithful OpenCV
    re-execution of its pipelines (eval/reference_oracle.py — same calls,
    thresholds, failure cascade as visual_odometry.h:167-741), on the SIFT
    config (a dispatch branch this cv2 build shares with the reference).
    vs_baseline = ate_reference / ate_ours, so >= 1.0 means the engine is at
    least as accurate as the reference.  Also times the oracle's mono loop at
    the working resolution — the measured C++-analogue throughput baseline
    the >= 2x/chip row divides by (VERDICT r4 #2; the 20 Hz `node_freq` is a
    loop rate, not a throughput — UVO_node.cpp:14)."""
    import cv2  # noqa: F401  (fail the section early when unavailable)
    import jax
    import jax.numpy as jnp

    from ergo_uvo_tpu.config import MonoVOConfig, StereoVOConfig
    from ergo_uvo_tpu.eval import (
        ate_rmse,
        integrate_mono_trajectory,
        velocity_rmse,
    )
    from ergo_uvo_tpu.eval.reference_oracle import (
        run_mono_oracle,
        run_stereo_oracle,
    )
    from ergo_uvo_tpu.io import make_mono_sequence, make_stereo_sequence
    from ergo_uvo_tpu.pipeline import run_mono_vo, run_stereo_vo
    from ergo_uvo_tpu.pipeline.stereo import StereoRig

    # ---- mono ATE + velocity RMSE (3 seeds).
    cfg = MonoVOConfig(
        feature_detector="SIFT", max_keypoints=512, num_hypotheses=256
    )
    ates_o, ates_e, vrmse_o, vrmse_e = [], [], [], []
    for seed in (0, 1, 2):
        seq = make_mono_sequence(
            n_frames=24, height=240, width=320, dt=0.25, seed=seed
        )
        gt = seq.positions - seq.positions[0]
        o = run_mono_oracle(seq.imgs_left, seq.timestamps, seq.ranges, seq.K,
                            cfg)
        po, _ = integrate_mono_trajectory(
            o.velocity, o.R, seq.timestamps, o.published, o.validity
        )
        ates_o.append(ate_rmse(po, gt))
        vrmse_o.append(velocity_rmse(o.velocity, seq.velocities_prevcam,
                                     o.validity))
        _, outs = run_mono_vo(
            jnp.asarray(seq.imgs_left), jnp.asarray(seq.timestamps),
            jnp.asarray(seq.ranges), jnp.asarray(seq.K), cfg,
            jax.random.PRNGKey(seed),
        )
        outs = jax.tree.map(np.asarray, outs)
        pe, _ = integrate_mono_trajectory(
            outs.velocity, outs.R, seq.timestamps, outs.published,
            outs.validity,
        )
        ates_e.append(ate_rmse(pe, gt))
        vrmse_e.append(velocity_rmse(outs.velocity, seq.velocities_prevcam,
                                     outs.validity))
    ate_ours = float(np.mean(ates_e))
    ate_ref = float(np.mean(ates_o))
    emit("reference_mono_ate_m_sift", ate_ref, "m", 1.0)
    v_ours, v_ref = float(np.mean(vrmse_e)), float(np.mean(vrmse_o))
    emit("mono_velocity_rmse_sift", v_ours, "m/s", v_ref / max(v_ours, 1e-9))
    emit("mono_ate_m_sift", ate_ours, "m", ate_ref / max(ate_ours, 1e-9))

    # ---- stereo ATE (VERDICT r4 missing #4): integrated t_prevCam_currCam
    # trajectories, engine vs oracle (visual_odometry.h:406-741, :148-159).
    scfg = StereoVOConfig(
        feature_detector="SIFT", max_keypoints=512, num_hypotheses=256
    )
    R_right, t_right = np.eye(3), np.array([-0.33, 0.0, 0.0])
    s_ates_o, s_ates_e = [], []
    for seed in (0, 1):
        sseq = make_stereo_sequence(n_frames=16, height=240, width=320,
                                    dt=0.25, seed=seed)
        gt = sseq.positions - sseq.positions[0]
        so = run_stereo_oracle(
            sseq.imgs_left, sseq.imgs_right, sseq.timestamps, sseq.K, sseq.K,
            R_right, t_right, scfg,
        )
        po, _ = integrate_mono_trajectory(
            so.velocity, so.R, sseq.timestamps, so.published, so.validity
        )
        s_ates_o.append(ate_rmse(po, gt))
        rig = StereoRig(
            K_left=jnp.asarray(sseq.K), K_right=jnp.asarray(sseq.K),
            R_right=jnp.asarray(R_right, jnp.float32),
            t_right=jnp.asarray(t_right, jnp.float32),
        )
        _, souts = run_stereo_vo(
            jnp.asarray(sseq.imgs_left), jnp.asarray(sseq.imgs_right),
            jnp.asarray(sseq.timestamps), rig, scfg, jax.random.PRNGKey(seed),
        )
        souts = jax.tree.map(np.asarray, souts)
        pe, _ = integrate_mono_trajectory(
            souts.velocity, souts.R, sseq.timestamps, souts.published,
            souts.validity,
        )
        s_ates_e.append(ate_rmse(pe, gt))
    s_ate_ours = float(np.mean(s_ates_e))
    s_ate_ref = float(np.mean(s_ates_o))
    emit("reference_stereo_ate_m_sift", s_ate_ref, "m", 1.0)
    emit("stereo_ate_m_sift", s_ate_ours, "m",
         s_ate_ref / max(s_ate_ours, 1e-9))

    # ---- measured reference throughput: the oracle mono loop at the
    # working resolution, SAME frames the device SIFT fps bench scans.
    fseq = make_mono_sequence(n_frames=30, height=480, width=640, dt=0.05,
                              seed=1)
    run_mono_oracle(fseq.imgs_left[:3], fseq.timestamps[:3], fseq.ranges[:3],
                    fseq.K, cfg)  # warm cv2 internals
    t0 = time.perf_counter()
    run_mono_oracle(fseq.imgs_left, fseq.timestamps, fseq.ranges, fseq.K, cfg)
    dt = time.perf_counter() - t0
    emit("reference_mono_fps", 30.0 / dt, "frames/s", 1.0)


# --------------------------------------------------------------------------
# Device sections
# --------------------------------------------------------------------------


def _mono_scan_fps(cfg, n_lo, n_hi, height=480, width=640, dt=0.05, seed=1,
                   with_preprocess=True):
    """frames/s of the full mono loop via the two-length slope method."""
    import jax
    import jax.numpy as jnp

    from ergo_uvo_tpu.image import build_preprocess_plan, preprocess_frame
    from ergo_uvo_tpu.io import make_mono_sequence
    from ergo_uvo_tpu.pipeline.mono import mono_vo_init_from, mono_vo_step

    seq = make_mono_sequence(n_frames=n_hi, height=height, width=width,
                             dt=dt, seed=seed)
    if with_preprocess:
        dist = np.array([-0.05, 0.01, 0.0, 0.0])
        plan = build_preprocess_plan(
            seq.K.astype(np.float64), dist, width, height,
            cfg.preprocessing.desired_width,
            clahe_enabled=cfg.preprocessing.clahe,
            clip_limit=cfg.preprocessing.clip_limit,
        )
        K = jnp.asarray(plan.new_K)
    else:
        plan, K = None, jnp.asarray(seq.K)

    imgs = jnp.asarray(seq.imgs_left)
    tss = jnp.asarray(seq.timestamps)
    rgs = jnp.asarray(seq.ranges)

    def full_step(state, inp):
        img, ts, rg, key = inp
        if plan is not None:
            img = preprocess_frame(plan, img)
        return mono_vo_step(state, img, ts, rg, K, key, cfg)

    key0 = jax.random.PRNGKey(0)
    runs = {}
    for n in (n_lo, n_hi):

        @jax.jit
        def run(imgs, tss, rgs, key, n=n):
            keys = jax.random.split(key, n)
            state = mono_vo_init_from(cfg)
            return jax.lax.scan(
                full_step, state, (imgs[:n], tss[:n], rgs[:n], keys)
            )

        runs[n] = run
        np.asarray(run(imgs, tss, rgs, key0)[1].scale_factor[-1])  # compile

    def time_n(n):
        t0 = time.perf_counter()
        np.asarray(runs[n](imgs, tss, rgs, key0)[1].scale_factor[-1])
        return time.perf_counter() - t0

    return size_slope_rate(time_n, n_lo, n_hi)


def section_mono():
    """Headline: full mono loop (preprocess + VO), SURF default config."""
    from ergo_uvo_tpu.config import MonoVOConfig, SurfConfig

    cfg = MonoVOConfig(
        surf=SurfConfig(min_hessian=60.0), max_keypoints=512,
        num_hypotheses=512,
    )
    fps = _mono_scan_fps(cfg, 16, 144)
    emit("mono_uvo_frames_per_second_per_chip", fps, "frames/s", fps / 20.0)


def section_mono_refcfg():
    """The same loop under the REFERENCE-DEFAULT YAML config (VERDICT r4
    weak #6 / #8): min_hessian 50 (mono_VO_parameters.yaml:44) and the
    hypothesis budget derived from the LMEDS 2000-iteration / 0.99-confidence
    keys (:19,25) rather than the tuned 512 — what a user loading the
    shipped YAML actually runs."""
    from ergo_uvo_tpu.config import MonoVOConfig, SurfConfig
    from ergo_uvo_tpu.estimation.sampling import derive_hypothesis_budget

    cfg = MonoVOConfig(
        surf=SurfConfig(min_hessian=50.0),
        max_keypoints=512,
        num_hypotheses=derive_hypothesis_budget(0.99, 2000),
    )
    fps = _mono_scan_fps(cfg, 8, 48)
    emit("mono_uvo_fps_refcfg", fps, "frames/s", fps / 20.0)


def section_stereo():
    import jax
    import jax.numpy as jnp

    from ergo_uvo_tpu.config import StereoVOConfig, SurfConfig
    from ergo_uvo_tpu.io import make_stereo_sequence
    from ergo_uvo_tpu.pipeline import run_stereo_vo
    from ergo_uvo_tpu.pipeline.stereo import StereoRig

    n_lo, n_hi = 8, 48
    cfg = StereoVOConfig(
        surf=SurfConfig(min_hessian=60.0), max_keypoints=512,
        num_hypotheses=512,
    )
    seq = make_stereo_sequence(n_frames=n_hi, height=480, width=640, seed=2)
    rig = StereoRig(
        K_left=jnp.asarray(seq.K), K_right=jnp.asarray(seq.K),
        R_right=jnp.eye(3), t_right=jnp.asarray([-0.33, 0.0, 0.0]),
    )
    il = jnp.asarray(seq.imgs_left)
    ir = jnp.asarray(seq.imgs_right)
    tss = jnp.asarray(seq.timestamps)
    key0 = jax.random.PRNGKey(0)

    runs = {}
    for n in (n_lo, n_hi):
        runs[n] = jax.jit(
            lambda il, ir, t, key, n=n: run_stereo_vo(
                il[:n], ir[:n], t[:n], rig, cfg, key
            )
        )
        np.asarray(runs[n](il, ir, tss, key0)[1].velocity[-1])  # compile+sync

    def time_n(n):
        t0 = time.perf_counter()
        np.asarray(runs[n](il, ir, tss, key0)[1].velocity[-1])
        return time.perf_counter() - t0

    fps = size_slope_rate(time_n, n_lo, n_hi)
    emit("stereo_uvo_frames_per_second_per_chip", fps, "frames/s", fps / 20.0)


def _section_detector(det, batched_features=False):
    """Per-detector throughput: one short scan per non-default detector
    branch at the working resolution, so 'exists but is 5 fps' is visible in
    the bench record.  The SURF default remains the headline (section_mono).

    `batched_features=True` uses run_mono_vo_batched_features — detection
    vmapped over all frames, only match->pose->scale scanned.  The ORB path
    REQUIRES it on the axon TPU: its image-stage executable inside an
    xs-scan reproducibly faults the worker (r5 bisect: per-step, carried-
    image scan, and every sub-stage pass; the scan-over-stacked-frames
    program crashes), while the vmapped schedule avoids the faulting codegen
    pattern.  The measured unit is the same per-frame work either way."""
    import jax
    import jax.numpy as jnp

    from ergo_uvo_tpu.config import MonoVOConfig
    from ergo_uvo_tpu.pipeline import run_mono_vo
    from ergo_uvo_tpu.pipeline.mono import run_mono_vo_batched_features
    from ergo_uvo_tpu.io import make_mono_sequence

    runner = run_mono_vo_batched_features if batched_features else run_mono_vo
    n_lo, n_hi = 6, 30
    seq = make_mono_sequence(n_frames=n_hi, height=480, width=640, dt=0.05,
                             seed=1)
    imgs = jnp.asarray(seq.imgs_left)
    tss = jnp.asarray(seq.timestamps)
    rgs = jnp.asarray(seq.ranges)
    K = jnp.asarray(seq.K)
    key0 = jax.random.PRNGKey(0)
    cfg = MonoVOConfig(
        feature_detector=det, max_keypoints=512, num_hypotheses=512
    )
    runs = {}
    for n in (n_lo, n_hi):
        runs[n] = jax.jit(
            lambda im, t, r, key, n=n, cfg=cfg: runner(
                im[:n], t[:n], r[:n], K, cfg, key
            )
        )
        np.asarray(runs[n](imgs, tss, rgs, key0)[1].scale_factor[-1])

    def time_n(n):
        t0 = time.perf_counter()
        np.asarray(runs[n](imgs, tss, rgs, key0)[1].scale_factor[-1])
        return time.perf_counter() - t0

    fps = size_slope_rate(time_n, n_lo, n_hi)
    emit(f"mono_uvo_fps_{det.lower()}", fps, "frames/s", fps / 20.0)


def section_det_orb():
    # vmapped-detection schedule: the plain xs-scan ORB executable faults
    # the axon worker (see _section_detector docstring).  Still runs LAST
    # among device sections as defense in depth.
    _section_detector("ORB", batched_features=True)


def section_det_sift():
    _section_detector("SIFT")


def section_det_akaze():
    _section_detector("AKAZE")


def section_stages():
    """Per-stage device-time breakdown of the mono hot loop (VERDICT r4
    weak #5: quantify 'speed-of-light').  Each stage is scanned at two
    lengths inside one jitted program; the slope is its device ms/iteration.
    Also reports the matcher's achieved TFLOP/s (512x512x64-D distance
    matmul, 2*K*K*D flops) so the number can be read against any chip's peak
    without baking a hardware constant into the record."""
    sys.path.insert(0, _REPO)
    import jax

    from tools.profile import mono_stage_steps

    n_lo, n_hi = 16, 416
    match_ms = None
    for name, step, carry0 in mono_stage_steps():
        progs = {}
        for n in (n_lo, n_hi):

            @jax.jit
            def run(c, n=n, step=step):
                c, _ = jax.lax.scan(lambda c, _: (step(c), None), c, None,
                                    length=n)
                return c

            progs[n] = run
            np.asarray(run(carry0))  # compile + sync

        def time_n(n, progs=progs):
            t0 = time.perf_counter()
            np.asarray(progs[n](carry0))
            return time.perf_counter() - t0

        rate = size_slope_rate(time_n, n_lo, n_hi, reps=3)
        ms = 1e3 / rate if np.isfinite(rate) and rate > 0 else float("nan")
        emit(f"mono_stage_ms_{name}", ms, "ms", 1.0)
        if name == "match":
            match_ms = ms
    if match_ms is not None and np.isfinite(match_ms):
        flops = 2.0 * 512 * 512 * 64  # distance matmul, dominating term
        emit("matcher_achieved_tflops", flops / (match_ms * 1e-3) / 1e12,
             "TFLOP/s", 1.0)


def section_ba():
    """On-device BA LM iterations/s via the iteration-count slope (runs LAST
    among device sections: the axon worker historically died after it)."""
    import jax
    import jax.numpy as jnp

    from ergo_uvo_tpu.optim.ba import BAProblem, ba_solve

    rng = np.random.default_rng(0)
    Pp, L = 8, 512
    X = np.stack(
        [rng.uniform(-3, 3, L), rng.uniform(-2, 2, L), rng.uniform(5, 9, L)], -1
    ).astype(np.float32)
    K = np.array([[300.0, 0, 160], [0, 300, 120], [0, 0, 1]], np.float32)
    obs = np.zeros((Pp, L, 2), np.float32)
    ts = np.zeros((Pp, 3), np.float32)
    Rs = np.tile(np.eye(3, dtype=np.float32), (Pp, 1, 1))
    for p in range(Pp):
        ts[p] = [0.25 * p, 0.0, 0.0]
        pc = X + ts[p]
        obs[p] = pc[:, :2] / pc[:, 2:3] * [K[0, 0], K[1, 1]] + [K[0, 2], K[1, 2]]
    obs += 0.1 * rng.standard_normal(obs.shape).astype(np.float32)
    X0 = X + 0.2 * rng.standard_normal(X.shape).astype(np.float32)

    prob = BAProblem(
        K=jnp.asarray(K), obs_uv=jnp.asarray(obs),
        obs_mask=jnp.ones((Pp, L), bool), num_fixed_poses=2,
    )
    iters = 30
    # Wide iteration window: a single LM iteration is sub-ms on-device, so
    # the slope needs thousands of extra iterations to dominate RPC jitter.
    hi = iters + 3000
    Rd, td, Xd = jnp.asarray(Rs), jnp.asarray(ts), jnp.asarray(X0)
    solves = {
        n: jax.jit(lambda R, t, X, n=n: ba_solve(prob, R, t, X, iters=n)[1])
        for n in (iters, hi)
    }
    for s in solves.values():  # compile + sync outside timing
        np.asarray(s(Rd, td, Xd)[-1])

    def time_iters(n):
        t0 = time.perf_counter()
        np.asarray(solves[n](Rd, td, Xd)[-1])
        return time.perf_counter() - t0

    ips = size_slope_rate(time_iters, iters, hi)
    emit("ba_iters_per_second_8x512", ips, "iters/s", 1.0)


# --------------------------------------------------------------------------
# Orchestrator
# --------------------------------------------------------------------------

# name -> (callable, runs_on_cpu, timeout_s).  Execution order = dict order:
# CPU sections first (immune to TPU faults), then device sections with the
# never-yet-recorded metrics early and the known worker-killer LAST: the ORB
# program's first dispatch reproducibly faults the axon worker (r4 + r5 —
# the r4 "dies after sustained dispatch" theory was wrong; it was always the
# ORB executable), and recovery takes ~40-90 min, so everything after it in
# the same bench run would be lost.
_SECTIONS = {
    "parity": (section_parity, True, 2400),
    "scaling": (section_scaling, True, 1200),
    "scaling_2proc": (section_scaling_2proc, True, 1200),
    "mono": (section_mono, False, 1800),
    "det_sift": (section_det_sift, False, 1500),
    "ba": (section_ba, False, 1200),
    "det_akaze": (section_det_akaze, False, 1800),
    "stereo": (section_stereo, False, 1800),
    "refcfg": (section_mono_refcfg, False, 1800),
    "stages": (section_stages, False, 1800),
    "det_orb": (section_det_orb, False, 1500),
}


def _run_section_subprocess(name, cpu, timeout):
    env = dict(os.environ)
    if cpu:
        env["JAX_PLATFORMS"] = "cpu"
    try:
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--section", name],
            capture_output=True, text=True, timeout=timeout, env=env,
            cwd=_REPO,
        )
    except subprocess.TimeoutExpired:
        print(f"# section {name} timed out after {timeout}s", file=sys.stderr)
        return []
    for ln in (out.stderr or "").splitlines()[-6:]:
        print(f"# [{name}] {ln}", file=sys.stderr)
    if out.returncode != 0:
        print(f"# section {name} failed (rc {out.returncode})",
              file=sys.stderr)
    rows = []
    for ln in (out.stdout or "").splitlines():
        ln = ln.strip()
        if not ln.startswith("{"):
            continue
        try:
            d = json.loads(ln)
            if "metric" in d:
                rows.append(d)
        except json.JSONDecodeError:
            pass
    return rows


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--section", choices=sorted(_SECTIONS),
                    help="run ONE section inline (internal; spawned by the "
                         "orchestrator)")
    ap.add_argument("--only", help="comma-separated section subset "
                                   "(debugging)")
    args = ap.parse_args()

    if args.section:
        fn, cpu, _ = _SECTIONS[args.section]
        if cpu:
            import jax

            jax.config.update("jax_platforms", "cpu")
        fn()
        flush_lines()
        return

    wanted = set(args.only.split(",")) if args.only else set(_SECTIONS)
    collected = {}
    for name, (fn, cpu, timeout) in _SECTIONS.items():
        if name not in wanted:
            continue
        t0 = time.perf_counter()
        rows = _run_section_subprocess(name, cpu, timeout)
        if not rows and not cpu:
            # One retry: the tunnel's remote-compile endpoint drops
            # connections transiently (r5: "response body closed before all
            # bytes were read"), which is distinct from a worker crash — a
            # retry 30 s later usually lands.  A genuinely dead worker fails
            # fast the second time, costing ~30 s.
            print(f"# section {name}: no metrics, retrying once",
                  file=sys.stderr, flush=True)
            time.sleep(30)
            rows = _run_section_subprocess(name, cpu, timeout)
        for d in rows:
            collected[d["metric"]] = d
            _LINES.append((d["metric"], json.dumps(d)))
        print(f"# section {name}: {time.perf_counter() - t0:.0f}s",
              file=sys.stderr, flush=True)
        if not cpu:
            time.sleep(5)  # let the axon worker drain between device users

    # Derived row: engine SIFT fps (device) vs the MEASURED reference
    # throughput (same frames, same detector config) — the >= 2x BASELINE
    # target, anchored to a measurement instead of the 20 Hz constant.
    eng = collected.get("mono_uvo_fps_sift")
    ref = collected.get("reference_mono_fps")
    if eng and ref and ref["value"] > 0:
        ratio = eng["value"] / ref["value"]
        emit("mono_fps_vs_reference_measured", ratio, "ratio", ratio / 2.0)
    flush_lines()


if __name__ == "__main__":
    main()
