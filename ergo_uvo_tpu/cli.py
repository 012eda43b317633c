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


def _list_frames(directory):
    paths = sorted(glob.glob(os.path.join(directory, "*.jpg"))) + sorted(
        glob.glob(os.path.join(directory, "*.jpeg"))
    )
    if not paths:
        raise SystemExit(f"no JPEG frames under {directory}")
    return paths


def _load_frames_dir(directory, gray=True):
    paths = _list_frames(directory)
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


def _stream_ckpt_example(init_state, out_type):
    """Structure template for load_stream_checkpoint: (frames_done, VO state,
    stacked per-frame outputs, PRNG key). Leaf shapes/dtypes come from the
    file; only the tree structure matters here."""
    return (
        np.int64(0),
        init_state,
        out_type(*([np.zeros(0)] * len(out_type._fields))),
        np.zeros(2, np.uint32),
    )


def _make_stream_ckpt_cb(path, every, offset=0, outs_prefix=None):
    """Chunk callback that persists streaming-VO progress every `every`
    chunks (crash-resumable; see utils.checkpoint.save_stream_checkpoint).
    `offset`/`outs_prefix` carry progress restored from a previous run so a
    resumed run's checkpoints stay self-contained."""
    import jax

    from ergo_uvo_tpu.utils.checkpoint import save_stream_checkpoint

    def cb(frames_done, state, chunks, key):
        if every > 1 and len(chunks) % every:
            return
        outs = jax.tree.map(lambda *xs: np.concatenate(xs), *chunks)
        if outs_prefix is not None:
            outs = jax.tree.map(
                lambda a, b: np.concatenate([np.asarray(a), b]), outs_prefix, outs
            )
        save_stream_checkpoint(
            path,
            (
                np.int64(offset + frames_done),
                jax.tree.map(np.asarray, state),
                outs,
                np.asarray(key),
            ),
        )

    return cb


def _resume_stream(args, init_state, out_type):
    """Load (start_frame, state, outs_prefix, key) from --checkpoint if
    --resume was given and the file exists; else fresh-start values."""
    import jax
    import jax.numpy as jnp

    if args.resume:
        if not args.checkpoint:
            raise SystemExit("--resume requires --checkpoint PATH")
        if os.path.exists(args.checkpoint):
            from ergo_uvo_tpu.utils.checkpoint import load_stream_checkpoint

            fd, st, outs_prev, k = load_stream_checkpoint(
                args.checkpoint, _stream_ckpt_example(init_state, out_type)
            )
            return int(fd), jax.tree.map(jnp.asarray, st), outs_prev, jnp.asarray(k)
    return 0, None, None, jax.random.PRNGKey(args.seed)


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
            from ergo_uvo_tpu.pipeline.mono import MonoFrameOutput, mono_vo_init

            start, state0, outs_prev, key0 = _resume_stream(
                args, mono_vo_init(cfg.max_keypoints, cfg.descriptor_dim),
                MonoFrameOutput,
            )
            cb = (
                _make_stream_ckpt_cb(args.checkpoint, args.checkpoint_every,
                                     offset=start, outs_prefix=outs_prev)
                if args.checkpoint else None
            )
            if start >= len(paths_p):
                outs = outs_prev  # checkpoint already covers the sequence
            else:
                source = JpegDirectorySource(
                    paths_p[start:], timestamps=tss_p[start:],
                    ranges=rgs_p[start:],
                )
                state, outs = run_mono_vo_streaming(
                    source, plan, jnp.asarray(K), cfg, key0,
                    chunk_size=chunk, state=state0, chunk_callback=cb,
                )
                if outs_prev is not None:
                    outs = jax.tree.map(
                        lambda a, b: np.concatenate([np.asarray(a), np.asarray(b)]),
                        outs_prev, outs,
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
        from PIL import Image

        from ergo_uvo_tpu.io.sequence import JpegPairSource
        from ergo_uvo_tpu.pipeline.stereo import (
            StereoFrameOutput,
            run_stereo_vo_streaming,
            stereo_vo_init,
        )

        intr = load_stereo_intrinsics(args.intrinsics, args.camera)
        paths_l = _list_frames(args.frames_left)
        paths_r = _list_frames(args.frames_right)
        if len(paths_l) != len(paths_r):
            n = min(len(paths_l), len(paths_r))
            paths_l, paths_r = paths_l[:n], paths_r[:n]
        with Image.open(paths_l[0]) as im0:
            w, h = im0.size
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
        rig = StereoRig(
            K_left=jnp.asarray(plan_l.new_K),
            K_right=jnp.asarray(plan_r.new_K),
            R_right=jnp.asarray(np.asarray(intr.R_right, np.float32)),
            t_right=jnp.asarray(np.asarray(intr.t_right, np.float32).reshape(3)),
        )
        # STREAMING ingestion (mirrors the mono path): pad the synced path
        # lists to a chunk multiple, stream decode → preprocess → scan, trim.
        n_real = len(paths_l)
        tss = np.arange(n_real, dtype=np.float32) / cfg.node_freq
        chunk = max(min(args.chunk_size, n_real), 1)
        pad = (-n_real) % chunk
        paths_lp = paths_l + [paths_l[-1]] * pad
        paths_rp = paths_r + [paths_r[-1]] * pad
        tss_p = np.concatenate([tss, np.full(pad, tss[-1], np.float32)])
        start, state0, outs_prev, key0 = _resume_stream(
            args, stereo_vo_init(cfg.max_keypoints, cfg.descriptor_dim),
            StereoFrameOutput,
        )
        cb = (
            _make_stream_ckpt_cb(args.checkpoint, args.checkpoint_every,
                                 offset=start, outs_prefix=outs_prev)
            if args.checkpoint else None
        )
        if start >= len(paths_lp):
            outs = outs_prev
        else:
            source = JpegPairSource(paths_lp[start:], paths_rp[start:],
                                    timestamps=tss_p[start:])
            state, outs = run_stereo_vo_streaming(
                source, plan_l, plan_r, rig, cfg, key0,
                chunk_size=chunk, state=state0, chunk_callback=cb,
            )
            if outs_prev is not None:
                outs = jax.tree.map(
                    lambda a, b: np.concatenate([np.asarray(a), np.asarray(b)]),
                    outs_prev, outs,
                )
        outs = jax.tree.map(lambda v: np.asarray(v)[:n_real], outs)
        n_frames = n_real
        rec = RunRecorder(args.out)
        for i in range(n_frames):
            rec.record_frame(i, jax.tree.map(lambda v, i=i: v[i], outs))
        rec.close()
        pos = integrate_mono_trajectory(outs.velocity, outs.R, tss,
                                        outs.published)
        np.savetxt(os.path.splitext(args.out)[0] + "_trajectory.txt", pos)
        summary = {
            "frames": int(n_frames),
            "published": int(outs.published.sum()),
            "valid": int(outs.validity.sum()),
        }
        print(json.dumps(summary))
        return

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
                        help="streaming chunk length (real-data runs)")
        sp.add_argument("--checkpoint",
                        help="stream-checkpoint file (.npz): progress is "
                             "persisted during real-data streaming runs")
        sp.add_argument("--checkpoint-every", type=int, default=4,
                        help="checkpoint every N chunks (default 4)")
        sp.add_argument("--resume", action="store_true",
                        help="resume a real-data run from --checkpoint "
                             "(fresh start if the file does not exist yet)")
    args = p.parse_args(argv)
    if args.mode == "mono":
        _run_mono(args)
    else:
        _run_stereo(args)


if __name__ == "__main__":
    main()
