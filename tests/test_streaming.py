"""Streaming ingestion tests: FrameSource -> chunked mono VO (VERDICT r1 #10).

The streaming runner must agree with the bulk scan (same fixture, same
accuracy band) and the JPEG directory source must deliver frames in order
through the out-of-order native prefetch ring.
"""

import os

import pytest

import jax
import jax.numpy as jnp
import numpy as np

from ergo_uvo_tpu.config import MonoVOConfig, SurfConfig
from ergo_uvo_tpu.eval import ate_rmse
from ergo_uvo_tpu.image import build_preprocess_plan
from ergo_uvo_tpu.io import make_mono_sequence
from ergo_uvo_tpu.io.sequence import ArraySource, JpegDirectorySource
from ergo_uvo_tpu.optim.trajectory import integrate_mono_poses
from ergo_uvo_tpu.pipeline import run_mono_vo
from ergo_uvo_tpu.pipeline.mono import run_mono_vo_streaming


def test_streaming_matches_bulk_accuracy():
    cfg = MonoVOConfig(
        surf=SurfConfig(min_hessian=60.0), max_keypoints=256, num_hypotheses=128
    )
    seq = make_mono_sequence(n_frames=20, height=240, width=320, dt=0.25, seed=9)
    plan = build_preprocess_plan(
        seq.K.astype(np.float64), np.zeros(4), 320, 240, 320,
        clahe_enabled=False, clip_limit=3.0,
    )
    K = jnp.asarray(seq.K)

    _, bulk = run_mono_vo(
        jnp.asarray(seq.imgs_left), jnp.asarray(seq.timestamps),
        jnp.asarray(seq.ranges), K, cfg, jax.random.PRNGKey(1),
    )
    bulk = jax.tree.map(np.asarray, bulk)

    src = ArraySource(seq.imgs_left, seq.timestamps, ranges=seq.ranges)
    _, stream = run_mono_vo_streaming(
        src, plan, K, cfg, jax.random.PRNGKey(1), chunk_size=5
    )

    assert len(stream.published) == 20
    assert int(stream.published.sum()) >= int(bulk.published.sum()) - 1
    gt = seq.positions - seq.positions[0]
    _, _, pos_b = integrate_mono_poses(
        bulk.velocity, bulk.R, seq.timestamps, bulk.published
    )
    _, _, pos_s = integrate_mono_poses(
        stream.velocity, stream.R, seq.timestamps, stream.published
    )
    ate_b = ate_rmse(pos_b, gt)
    ate_s = ate_rmse(pos_s, gt)
    assert ate_s < max(2.0 * ate_b, 0.05), (ate_b, ate_s)


def test_jpeg_directory_source_order_and_stream(tmp_path):
    """Frames tagged by intensity must come back in path order."""
    from PIL import Image

    n, h, w = 12, 32, 48
    for i in range(n):
        arr = np.full((h, w), 10 + 20 * i, np.uint8)
        Image.fromarray(arr, "L").save(tmp_path / f"frame_{i:04d}.jpg", quality=95)
    paths = sorted(str(p) for p in tmp_path.iterdir())
    src = JpegDirectorySource(paths, gray=True)
    got = []
    for batch in src.batches(4):
        assert batch.imgs.shape == (4, h, w)
        got.extend(float(im.mean()) for im in batch.imgs)
    assert len(got) == 12
    # JPEG is lossy but flat frames survive within ~2 gray levels.
    expect = [10 + 20 * i for i in range(12)]
    assert all(abs(g - e) < 3 for g, e in zip(got, expect)), got


def test_stereo_streaming_matches_bulk_accuracy():
    """Stereo streaming runner vs the bulk stereo scan on the same fixture:
    same accuracy band (PRNG splitting differs chunk-wise, so statistical
    agreement, not bit equality)."""
    from ergo_uvo_tpu.config import StereoVOConfig
    from ergo_uvo_tpu.io import make_stereo_sequence
    from ergo_uvo_tpu.pipeline import run_stereo_vo
    from ergo_uvo_tpu.pipeline.stereo import StereoRig, run_stereo_vo_streaming

    cfg = StereoVOConfig(
        surf=SurfConfig(min_hessian=60.0), max_keypoints=256, num_hypotheses=128
    )
    seq = make_stereo_sequence(n_frames=12, height=240, width=320, dt=0.25, seed=4)
    rig = StereoRig(
        K_left=jnp.asarray(seq.K), K_right=jnp.asarray(seq.K),
        R_right=jnp.eye(3), t_right=jnp.asarray([-0.33, 0.0, 0.0]),
    )
    plan = build_preprocess_plan(
        seq.K.astype(np.float64), np.zeros(4), 320, 240, 320,
        clahe_enabled=False, clip_limit=3.0,
    )
    _, bulk = run_stereo_vo(
        jnp.asarray(seq.imgs_left), jnp.asarray(seq.imgs_right),
        jnp.asarray(seq.timestamps), rig, cfg, jax.random.PRNGKey(2),
    )
    bulk = jax.tree.map(np.asarray, bulk)

    src = ArraySource(seq.imgs_left, seq.timestamps, imgs_right=seq.imgs_right)
    _, stream = run_stereo_vo_streaming(
        src, plan, plan, rig, cfg, jax.random.PRNGKey(2), chunk_size=4
    )
    assert len(stream.published) == 12
    assert int(stream.published.sum()) >= int(bulk.published.sum()) - 1
    gt = seq.positions - seq.positions[0]
    pos_b = np.cumsum(
        bulk.velocity * np.gradient(seq.timestamps)[:, None] * bulk.published[:, None],
        axis=0,
    )
    pos_s = np.cumsum(
        stream.velocity * np.gradient(seq.timestamps)[:, None]
        * stream.published[:, None],
        axis=0,
    )
    # Both runs must recover motion along the dominant axis to similar scale.
    err_b = ate_rmse(pos_b, gt)
    err_s = ate_rmse(pos_s, gt)
    assert err_s < max(2.0 * err_b, 0.30), (err_b, err_s)


def test_stream_checkpoint_resume_bitexact(tmp_path):
    """Crash at chunk 2 of 4, resume from the stream checkpoint: the resumed
    run's outputs must be BIT-IDENTICAL to the uninterrupted run (state + PRNG
    key round-trip through the npz exactly)."""
    from ergo_uvo_tpu.pipeline.mono import MonoFrameOutput, mono_vo_init_from
    from ergo_uvo_tpu.utils.checkpoint import (
        load_stream_checkpoint,
        save_stream_checkpoint,
    )

    cfg = MonoVOConfig(
        surf=SurfConfig(min_hessian=60.0), max_keypoints=256, num_hypotheses=128
    )
    seq = make_mono_sequence(n_frames=20, height=240, width=320, dt=0.25, seed=9)
    plan = build_preprocess_plan(
        seq.K.astype(np.float64), np.zeros(4), 320, 240, 320,
        clahe_enabled=False, clip_limit=3.0,
    )
    K = jnp.asarray(seq.K)
    ckpt = str(tmp_path / "stream.npz")

    # Uninterrupted run (checkpointing every chunk as a side effect).  The
    # pipeline hands the callback ONLY the new chunk (ADVICE r3: O(chunk)
    # checkpoint IO); this test accumulates locally to keep the flat format.
    acc = []

    def cb(frames_done, state, chunk, key):
        acc.append(chunk)
        outs = jax.tree.map(lambda *xs: np.concatenate(xs), *acc)
        save_stream_checkpoint(
            ckpt,
            (np.int64(frames_done), jax.tree.map(np.asarray, state), outs,
             np.asarray(key)),
        )

    src = ArraySource(seq.imgs_left, seq.timestamps, ranges=seq.ranges)

    def cb_capture(frames_done, state, chunk, key):
        cb(frames_done, state, chunk, key)
        if frames_done == 10:  # keep the mid-run checkpoint bytes
            import shutil

            shutil.copy(ckpt, ckpt + ".mid")

    _, full = run_mono_vo_streaming(
        src, plan, K, cfg, jax.random.PRNGKey(1), chunk_size=5,
        chunk_callback=cb_capture,
    )
    assert os.path.exists(ckpt + ".mid")

    # "Crash" after frame 10 -> restore and run the remaining frames.
    example = (
        np.int64(0),
        mono_vo_init_from(cfg),
        MonoFrameOutput(*([np.zeros(0)] * len(MonoFrameOutput._fields))),
        np.zeros(2, np.uint32),
    )
    fd, st, outs_prev, key = load_stream_checkpoint(ckpt + ".mid", example)
    assert int(fd) == 10
    src2 = ArraySource(
        seq.imgs_left[10:], seq.timestamps[10:], ranges=seq.ranges[10:]
    )
    _, tail = run_mono_vo_streaming(
        src2, plan, K, cfg, jnp.asarray(key), chunk_size=5,
        state=jax.tree.map(jnp.asarray, st),
    )
    resumed = jax.tree.map(
        lambda a, b: np.concatenate([np.asarray(a), np.asarray(b)]),
        outs_prev, tail,
    )
    for name in full._fields:
        np.testing.assert_array_equal(
            np.asarray(getattr(full, name)), np.asarray(getattr(resumed, name)),
            err_msg=name,
        )


@pytest.mark.fast
def test_segmented_checkpoint_roundtrip_and_chunk_change(tmp_path):
    """Segmented stream checkpoints (ADVICE r3): segments append O(chunk)
    bytes, pad rows are trimmed before persisting, and a resume may use a
    DIFFERENT --chunk-size because frames_done counts real frames only."""
    from ergo_uvo_tpu.pipeline.mono import MonoFrameOutput, mono_vo_init_from
    from ergo_uvo_tpu.utils.checkpoint import (
        append_stream_segment,
        load_stream_run,
        save_stream_head,
    )

    cfg = MonoVOConfig(
        surf=SurfConfig(min_hessian=60.0), max_keypoints=128, num_hypotheses=64
    )
    state = mono_vo_init_from(cfg)
    ckpt = str(tmp_path / "run.npz")

    def fake_outs(n, base):
        return MonoFrameOutput(*[
            np.full((n,), base + i, np.float32)
            for i in range(len(MonoFrameOutput._fields))
        ])

    # Two segments of 4 + 3 real frames (the second trimmed from a padded
    # 4-frame chunk by the writer), head says 7 real frames done.
    append_stream_segment(ckpt, 0, fake_outs(4, 0.0))
    append_stream_segment(ckpt, 1, fake_outs(3, 100.0))
    save_stream_head(ckpt, 7, jax.tree.map(np.asarray, state),
                     np.zeros(2, np.uint32), 2, n_real=10, chunk_size=4)

    fd, st, outs, key, meta = load_stream_run(
        ckpt, state,
        MonoFrameOutput(*([np.zeros(0)] * len(MonoFrameOutput._fields))),
    )
    assert fd == 7
    assert meta == {"n_real": 10, "chunk_size": 4, "n_segments": 2,
                    "seq_digest": ""}
    assert outs.velocity.shape == (7,)
    np.testing.assert_array_equal(outs.velocity[:4], 0.0)
    np.testing.assert_array_equal(outs.velocity[4:], 100.0)
    # State round-trips structurally.
    assert st.prev_xy.shape == state.prev_xy.shape


@pytest.mark.fast
def test_cli_ckpt_cb_trims_pads_and_buffers(tmp_path):
    """The CLI chunk callback must trim tail pad rows and honor
    --checkpoint-every buffering (pending chunks merge into one segment)."""
    from ergo_uvo_tpu import cli
    from ergo_uvo_tpu.pipeline.mono import MonoFrameOutput, mono_vo_init_from
    from ergo_uvo_tpu.utils.checkpoint import load_stream_run

    cfg = MonoVOConfig(max_keypoints=64)
    state = mono_vo_init_from(cfg)
    ckpt = str(tmp_path / "cb.npz")
    # n_real=10 streamed from start=0 in chunks of 4 -> 12 padded rows.
    cb = cli._make_stream_ckpt_cb(ckpt, every=2, n_real=10, chunk_size=4,
                                  start=0, n_segments=0)

    def chunk(n, base):
        return MonoFrameOutput(*[
            np.full((n,), base, np.float32)
            for _ in range(len(MonoFrameOutput._fields))
        ])

    key = np.zeros(2, np.uint32)
    cb(4, state, chunk(4, 1.0), key)    # buffered
    cb(8, state, chunk(4, 2.0), key)    # segment 0 = frames 0..7
    cb(12, state, chunk(4, 3.0), key)   # buffered (trimmed to 2 real rows)
    # Head after the 2nd call: 8 real frames in 1 segment.
    fd, _, outs, _, meta = load_stream_run(
        ckpt, state,
        MonoFrameOutput(*([np.zeros(0)] * len(MonoFrameOutput._fields))),
    )
    assert fd == 8 and meta["n_segments"] == 1
    assert outs.velocity.shape == (8,)
    cb(16, state, chunk(4, 4.0), key)   # pure pad -> nothing kept; head final
    fd, _, outs, _, meta = load_stream_run(
        ckpt, state,
        MonoFrameOutput(*([np.zeros(0)] * len(MonoFrameOutput._fields))),
    )
    assert fd == 10 and meta["n_segments"] == 2
    assert outs.velocity.shape == (10,)
    np.testing.assert_array_equal(outs.velocity[8:], 3.0)


@pytest.mark.fast
def test_resume_refuses_sequence_digest_mismatch(tmp_path):
    """Resume must refuse a checkpoint recorded for a different frame
    sequence (digest mismatch) unless --force-resume is given (ADVICE r4)."""
    import argparse

    from ergo_uvo_tpu import cli
    from ergo_uvo_tpu.pipeline.mono import MonoFrameOutput, mono_vo_init_from
    from ergo_uvo_tpu.utils.checkpoint import save_stream_head

    cfg = MonoVOConfig(max_keypoints=64)
    state = mono_vo_init_from(cfg)
    ckpt = str(tmp_path / "run.npz")
    old_digest = cli._seq_digest(["a.jpg", "b.jpg"])
    save_stream_head(ckpt, 0, jax.tree.map(np.asarray, state),
                     np.zeros(2, np.uint32), 0, n_real=2, chunk_size=2,
                     seq_digest=old_digest)

    new_digest = cli._seq_digest(["a.jpg", "c.jpg"])
    assert new_digest != old_digest
    assert cli._seq_digest(["a.jpg", "b.jpg"]) == old_digest  # deterministic

    args = argparse.Namespace(
        resume=True, checkpoint=ckpt, checkpoint_every=1, chunk_size=2,
        seed=0, force_resume=False,
    )
    with pytest.raises(SystemExit, match="force-resume"):
        cli._run_streamed(args, 2, np.zeros(2, np.float32), state,
                          MonoFrameOutput, None, seq_digest=new_digest)
    # --force-resume (or a matching digest) proceeds: resumed at frame 0 with
    # no segments, launch runs — pass one that returns empty outs.
    outs_tmpl = MonoFrameOutput(
        *([np.zeros((2,), np.float32)] * len(MonoFrameOutput._fields))
    )
    launch = lambda *a: (None, outs_tmpl)  # noqa: E731
    args.force_resume = True
    outs, _ = cli._run_streamed(args, 2, np.zeros(2, np.float32), state,
                                MonoFrameOutput, launch,
                                seq_digest=new_digest)
    assert outs.velocity.shape == (2,)
