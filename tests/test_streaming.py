"""Streaming ingestion tests: FrameSource -> chunked mono VO (VERDICT r1 #10).

The streaming runner must agree with the bulk scan (same fixture, same
accuracy band) and the JPEG directory source must deliver frames in order
through the out-of-order native prefetch ring.
"""

import os

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
