"""Command-line runner — the reference's L3/L4 (UVO_node + launch/config).

Replaces `main()` + roslaunch (UVO_node.cpp:9-29, UVO_node.launch:1-41): the
`visual_odometry_node` mono/stereo switch becomes a subcommand, the rosparam
YAML files load unchanged via :mod:`ergo_uvo_tpu.config`, the rosbag becomes a
directory of JPEG frames (decoded by the native loader when available) or a
synthetic sequence, and the output topics become a JSONL record stream + a
trajectory file.

Usage:
  python -m ergo_uvo_tpu.cli mono --params mono_VO_parameters.yaml \
      --intrinsics mono_VO_intrinsics.yaml --camera downward_camera \
      --frames /path/to/jpegs --ranges ranges.txt --out run.jsonl
  python -m ergo_uvo_tpu.cli mono --synthetic 64 --out run.jsonl
  python -m ergo_uvo_tpu.cli stereo --synthetic 64 --out run.jsonl
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import sys

import numpy as np


def _load_frames_dir(directory, gray=True):
    paths = sorted(glob.glob(os.path.join(directory, "*.jpg"))) + sorted(
        glob.glob(os.path.join(directory, "*.jpeg"))
    )
    if not paths:
        raise SystemExit(f"no JPEG frames under {directory}")
    from ergo_uvo_tpu.io import native

    frames = {}
    if native.available():
        loader = native.JpegLoader(paths, threads=4, gray=gray)
        for idx, img in loader:
            frames[idx] = img
        loader.close()
    else:  # PIL fallback
        from PIL import Image

        for i, p in enumerate(paths):
            img = Image.open(p)
            frames[i] = np.asarray(img.convert("L" if gray else "RGB"))
    imgs = np.stack([frames[i] for i in range(len(paths))]).astype(np.float32)
    return imgs


def _load_frames(args, gray=True):
    return _load_frames_dir(args.frames, gray)


def _parse_size(spec):
    """'640x480' -> (640, 480)."""
    try:
        w, h = (int(v) for v in spec.lower().split("x"))
        return w, h
    except ValueError:
        raise SystemExit(f"--synthetic-size must be WxH, got {spec!r}")


def _run_mono(args):
    import jax
    import jax.numpy as jnp

    from ergo_uvo_tpu.config import MonoVOConfig, load_mono_intrinsics, load_vo_params
    from ergo_uvo_tpu.eval import integrate_mono_trajectory
    from ergo_uvo_tpu.image import build_preprocess_plan, preprocess_frame
    from ergo_uvo_tpu.io import make_mono_sequence
    from ergo_uvo_tpu.pipeline import run_mono_vo
    from ergo_uvo_tpu.utils import RunRecorder

    cfg = (
        load_vo_params(args.params)
        if args.params
        else MonoVOConfig()
    )

    if args.synthetic:
        w_s, h_s = _parse_size(args.synthetic_size)
        seq = make_mono_sequence(n_frames=args.synthetic, height=h_s, width=w_s)
        imgs, tss, rgs, K = seq.imgs_left, seq.timestamps, seq.ranges, seq.K
        gt_positions = seq.positions
        state, outs = run_mono_vo(
            jnp.asarray(imgs), jnp.asarray(tss), jnp.asarray(rgs),
            jnp.asarray(K), cfg, jax.random.PRNGKey(args.seed),
        )
    else:
        # Real-data path: STREAMING ingestion — frames decode on host threads
        # (native prefetch ring) chunk by chunk while the device runs VO; the
        # sequence never bulk-materializes.
        if not (args.intrinsics and args.camera and args.ranges):
            raise SystemExit("--intrinsics, --camera and --ranges required "
                             "(or use --synthetic N)")
        import glob as _glob

        from ergo_uvo_tpu.io.sequence import JpegDirectorySource
        from ergo_uvo_tpu.pipeline.mono import run_mono_vo_streaming
        from PIL import Image

        intr = load_mono_intrinsics(args.intrinsics, args.camera)
        paths = sorted(_glob.glob(os.path.join(args.frames, "*.jpg"))) + sorted(
            _glob.glob(os.path.join(args.frames, "*.jpeg"))
        )
        if not paths:
            raise SystemExit(f"no JPEG frames under {args.frames}")
        with Image.open(paths[0]) as im0:
            w, h = im0.size
        plan = build_preprocess_plan(
            intr.K(), intr.dist_coeffs(), w, h, cfg.preprocessing.desired_width,
            cfg.preprocessing.clahe, cfg.preprocessing.clip_limit,
        )
        K = np.asarray(plan.new_K)
        rgs = np.atleast_1d(np.loadtxt(args.ranges).astype(np.float32))
        if len(rgs) < len(paths):
            raise SystemExit(
                f"--ranges has {len(rgs)} entries for {len(paths)} frames"
            )
        tss = np.arange(len(paths), dtype=np.float32) / cfg.node_freq
        gt_positions = None
        if args.ba_window or args.loop_closure:
            # BA / loop closure need random access to frames for keyframe
            # re-detection — bulk-decode in that mode.
            imgs = _load_frames(args)
            pre = jax.jit(jax.vmap(lambda im: preprocess_frame(plan, im)))
            imgs = np.asarray(pre(jnp.asarray(imgs)))
            state, outs = run_mono_vo(
                jnp.asarray(imgs), jnp.asarray(tss), jnp.asarray(rgs),
                jnp.asarray(K), cfg, jax.random.PRNGKey(args.seed),
            )
        else:
            # Pad the path list to a chunk multiple (repeating the final
            # frame) so the fixed-shape streaming loop processes EVERY real
            # frame — JpegDirectorySource drops a trailing partial batch
            # (io/sequence.py) — then trim outputs back to the true length.
            n_real = len(paths)
            chunk = max(min(args.chunk_size, n_real), 1)
            pad = (-n_real) % chunk
            paths_p = paths + [paths[-1]] * pad
            tss_p = np.concatenate([tss, np.full(pad, tss[-1], np.float32)])
            rgs_p = np.concatenate([rgs[:n_real],
                                    np.full(pad, rgs[n_real - 1], np.float32)])
            source = JpegDirectorySource(paths_p, timestamps=tss_p, ranges=rgs_p)
            state, outs = run_mono_vo_streaming(
                source, plan, jnp.asarray(K), cfg, jax.random.PRNGKey(args.seed),
                chunk_size=chunk,
            )
            outs = jax.tree.map(lambda v: v[:n_real], outs)
            imgs, tss, rgs = np.zeros((n_real,)), tss[:n_real], rgs[:n_real]
    outs = jax.tree.map(np.asarray, outs)

    rec = RunRecorder(args.out)
    for i in range(len(imgs)):
        rec.record_frame(i, jax.tree.map(lambda v, i=i: v[i], outs))
    rec.close()

    pos, dead_reckoned = integrate_mono_trajectory(
        outs.velocity, outs.R, tss, outs.published, outs.validity
    )
    summary = {
        "frames": int(len(imgs)),
        "dead_reckoned_frames": int(dead_reckoned.sum()),
        "published": int(outs.published.sum()),
        "valid": int(outs.validity.sum()),
        "mean_inliers": float(outs.num_inliers[outs.published].mean())
        if outs.published.any()
        else 0.0,
    }

    # ---- optional window-BA refinement (BASELINE configs[2]).
    ba_res = None
    if args.ba_window:
        from ergo_uvo_tpu.optim import refine_mono_trajectory

        ba_res = refine_mono_trajectory(
            np.asarray(imgs), tss, outs, K, cfg,
            window_size=args.ba_window, keyframe_stride=args.keyframe_stride,
            ba_iters=args.ba_iters,
        )
        pos = ba_res.positions
        summary["ba_keyframes"] = int(len(ba_res.kf_indices))
        summary["ba_solves"] = int(ba_res.costs.shape[0])
        summary["ba_iters_per_s"] = round(ba_res.ba_iters_per_s, 2)

    # ---- optional loop closure + pose graph (BASELINE configs[3]).  When
    # combined with --ba-window the pose graph starts from the BA-refined
    # per-frame poses (its odometry edges), so the two stages compose instead
    # of loop closure discarding the BA result.
    if args.loop_closure:
        from ergo_uvo_tpu.optim import close_loops_and_optimize, integrate_mono_poses

        if ba_res is not None:
            R_wc, t_wc = ba_res.R_wc, ba_res.t_wc
        else:
            R_wc, t_wc, _ = integrate_mono_poses(
                outs.velocity, outs.R, tss, outs.published
            )
        pg = close_loops_and_optimize(
            np.asarray(imgs), R_wc, t_wc, np.asarray(rgs), K, cfg,
            key=jax.random.PRNGKey(args.seed + 1),
        )
        pos = pg.positions
        summary["loops_accepted"] = len(pg.loops)

    np.savetxt(os.path.splitext(args.out)[0] + "_trajectory.txt", pos)
    if gt_positions is not None:
        from ergo_uvo_tpu.eval import ate_rmse

        summary["ate_m"] = ate_rmse(pos, gt_positions - gt_positions[0])
    print(json.dumps(summary))


def _run_stereo(args):
    import jax
    import jax.numpy as jnp

    from ergo_uvo_tpu.config import StereoVOConfig, load_stereo_intrinsics, load_vo_params
    from ergo_uvo_tpu.eval import integrate_mono_trajectory
    from ergo_uvo_tpu.image import build_preprocess_plan, preprocess_frame
    from ergo_uvo_tpu.io import make_stereo_sequence
    from ergo_uvo_tpu.pipeline import run_stereo_vo
    from ergo_uvo_tpu.pipeline.stereo import StereoRig
    from ergo_uvo_tpu.utils import RunRecorder

    cfg = (
        load_vo_params(args.params, stereo=True)
        if args.params
        else StereoVOConfig()
    )
    gt_positions = None
    if args.synthetic:
        w_s, h_s = _parse_size(args.synthetic_size)
        seq = make_stereo_sequence(n_frames=args.synthetic, height=h_s, width=w_s)
        imgs_l, imgs_r, tss = seq.imgs_left, seq.imgs_right, seq.timestamps
        gt_positions = seq.positions
        rig = StereoRig(
            K_left=jnp.asarray(seq.K), K_right=jnp.asarray(seq.K),
            R_right=jnp.eye(3), t_right=jnp.asarray([-0.33, 0.0, 0.0]),
        )
    else:
        # Real-data path: synced left/right JPEG directories + the reference's
        # stereo intrinsics YAML (visual_odometry.h:766-776,
        # get_stereo_camera_parameters VO_utility.cpp:408-453).
        if not (args.frames_left and args.frames_right and args.intrinsics
                and args.camera):
            raise SystemExit("--frames-left, --frames-right, --intrinsics and "
                             "--camera required (or use --synthetic N)")
        intr = load_stereo_intrinsics(args.intrinsics, args.camera)
        raw_l = _load_frames_dir(args.frames_left)
        raw_r = _load_frames_dir(args.frames_right)
        if len(raw_l) != len(raw_r):
            n = min(len(raw_l), len(raw_r))
            raw_l, raw_r = raw_l[:n], raw_r[:n]
        h, w = raw_l.shape[1:3]
        plan_l = build_preprocess_plan(
            intr.left.K(), intr.left.dist_coeffs(), w, h,
            cfg.preprocessing.desired_width,
            cfg.preprocessing.clahe, cfg.preprocessing.clip_limit,
        )
        plan_r = build_preprocess_plan(
            intr.right.K(), intr.right.dist_coeffs(), w, h,
            cfg.preprocessing.desired_width,
            cfg.preprocessing.clahe, cfg.preprocessing.clip_limit,
        )
        pre_l = jax.jit(jax.vmap(lambda im: preprocess_frame(plan_l, im)))
        pre_r = jax.jit(jax.vmap(lambda im: preprocess_frame(plan_r, im)))
        imgs_l = np.asarray(pre_l(jnp.asarray(raw_l)))
        imgs_r = np.asarray(pre_r(jnp.asarray(raw_r)))
        tss = np.arange(len(imgs_l), dtype=np.float32) / cfg.node_freq
        rig = StereoRig(
            K_left=jnp.asarray(plan_l.new_K),
            K_right=jnp.asarray(plan_r.new_K),
            R_right=jnp.asarray(np.asarray(intr.R_right, np.float32)),
            t_right=jnp.asarray(np.asarray(intr.t_right, np.float32).reshape(3)),
        )

    n_frames = len(imgs_l)
    state, outs = run_stereo_vo(
        jnp.asarray(imgs_l), jnp.asarray(imgs_r),
        jnp.asarray(tss), rig, cfg, jax.random.PRNGKey(args.seed),
    )
    outs = jax.tree.map(np.asarray, outs)
    rec = RunRecorder(args.out)
    for i in range(n_frames):
        rec.record_frame(i, jax.tree.map(lambda v, i=i: v[i], outs))
    rec.close()
    # Stereo publishes velocity = t_prevCam_currCam / dt and R_currCam_prevCam
    # — the same prev-cam-frame displacement convention as mono, so the same
    # integrator applies (stereo_output_computation, visual_odometry.h:148-159).
    pos = integrate_mono_trajectory(outs.velocity, outs.R, tss, outs.published)
    np.savetxt(os.path.splitext(args.out)[0] + "_trajectory.txt", pos)
    summary = {
        "frames": int(n_frames),
        "published": int(outs.published.sum()),
        "valid": int(outs.validity.sum()),
    }
    if gt_positions is not None:
        from ergo_uvo_tpu.eval import ate_rmse

        summary["ate_m"] = ate_rmse(pos, gt_positions - gt_positions[0])
    print(json.dumps(summary))


def main(argv=None):
    p = argparse.ArgumentParser(prog="ergo_uvo_tpu")
    sub = p.add_subparsers(dest="mode", required=True)
    for mode in ("mono", "stereo"):
        sp = sub.add_parser(mode)
        sp.add_argument("--params", help="reference-format *_VO_parameters.yaml")
        sp.add_argument("--intrinsics", help="reference-format intrinsics yaml")
        sp.add_argument("--camera", help="camera block name (e.g. downward_camera)")
        sp.add_argument("--frames", help="directory of JPEG frames (mono)")
        sp.add_argument("--frames-left", help="directory of left JPEG frames (stereo)")
        sp.add_argument("--frames-right", help="directory of right JPEG frames (stereo)")
        sp.add_argument("--ranges", help="text file of per-frame range readings")
        sp.add_argument("--synthetic", type=int, default=0,
                        help="run on an N-frame synthetic sequence instead")
        sp.add_argument("--synthetic-size", default="640x480",
                        help="synthetic frame size as WxH (default 640x480)")
        sp.add_argument("--out", default="run.jsonl")
        sp.add_argument("--seed", type=int, default=0)
        sp.add_argument("--ba-window", type=int, default=0,
                        help="refine with sliding-window BA of this many "
                             "keyframes (0 = off)")
        sp.add_argument("--keyframe-stride", type=int, default=3)
        sp.add_argument("--ba-iters", type=int, default=12)
        sp.add_argument("--loop-closure", action="store_true",
                        help="run retrieval + pose-graph loop closure")
        sp.add_argument("--chunk-size", type=int, default=16,
                        help="streaming chunk length (real-data mono)")
    args = p.parse_args(argv)
    if args.mode == "mono":
        _run_mono(args)
    else:
        _run_stereo(args)


if __name__ == "__main__":
    main()
