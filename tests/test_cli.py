"""CLI integration tests: the L3/L4 user surface end-to-end.

Covers the real-data mono streaming path (every frame must survive a
non-chunk-multiple sequence — ADVICE r2 medium), the synthetic paths, and
the --ba-window/--loop-closure composition (ADVICE r2: the pose graph must
start from the BA-refined poses, not discard them).
"""

import json

import numpy as np
import pytest

from ergo_uvo_tpu import cli
from ergo_uvo_tpu.io import make_mono_sequence

PARAMS_YAML = """
node_freq: 4.0
preprocessing:
  desired_width: 320
  clahe: false
  clip_limit: 3.0
vo_params:
  feature_detector: SURF
  lowe_ratio_test: 0.7
  min_num_features: 10
surf_params:
  min_hessian: 60.0
tpu_params:
  max_keypoints: 128
  num_hypotheses: 32
"""

INTRINSICS_YAML = """
test_camera:
  camera_intrinsic:
    fx: {fx}
    fy: {fy}
    ccx: {ccx}
    ccy: {ccy}
  distortion_coefficient:
    radial: {{k1: 0.0, k2: 0.0}}
    tangential: {{p1: 0.0, p2: 0.0}}
"""


@pytest.fixture(scope="module")
def mono_dataset(tmp_path_factory):
    """11 synthetic frames (NOT a multiple of the chunk size) as JPEGs +
    intrinsics/params YAMLs + ranges file."""
    from PIL import Image

    root = tmp_path_factory.mktemp("cli_mono")
    seq = make_mono_sequence(n_frames=11, height=240, width=320, dt=0.25, seed=3)
    frames = root / "frames"
    frames.mkdir()
    for i, img in enumerate(seq.imgs_left):
        Image.fromarray(np.clip(img, 0, 255).astype(np.uint8), "L").save(
            frames / f"f_{i:04d}.jpg", quality=97
        )
    (root / "params.yaml").write_text(PARAMS_YAML)
    (root / "intrinsics.yaml").write_text(
        INTRINSICS_YAML.format(
            fx=seq.K[0, 0], fy=seq.K[1, 1], ccx=seq.K[0, 2], ccy=seq.K[1, 2]
        )
    )
    np.savetxt(root / "ranges.txt", seq.ranges)
    return root, seq


def _run(capsys, argv):
    cli.main(argv)
    out = capsys.readouterr().out.strip().splitlines()[-1]
    return json.loads(out)


class TestMonoRealData:
    def test_streaming_keeps_trailing_frames(self, mono_dataset, capsys, tmp_path):
        """11 frames at --chunk-size 4: the padded streaming loop must emit
        records and a trajectory for all 11, not truncate to 8."""
        root, seq = mono_dataset
        out = tmp_path / "run.jsonl"
        summary = _run(capsys, [
            "mono", "--params", str(root / "params.yaml"),
            "--intrinsics", str(root / "intrinsics.yaml"),
            "--camera", "test_camera",
            "--frames", str(root / "frames"),
            "--ranges", str(root / "ranges.txt"),
            "--out", str(out), "--chunk-size", "4",
        ])
        assert summary["frames"] == 11
        traj = np.loadtxt(tmp_path / "run_trajectory.txt")
        assert traj.shape == (11, 3)
        with open(out) as f:
            records = [json.loads(l) for l in f]
        assert len(records) == 11
        # The pipeline must actually track (frame 0 never publishes).
        assert summary["published"] >= 8

    def test_ranges_length_validated(self, mono_dataset, capsys, tmp_path):
        root, _ = mono_dataset
        short = tmp_path / "short_ranges.txt"
        np.savetxt(short, np.ones(3))
        with pytest.raises(SystemExit, match="3 entries for 11 frames"):
            cli.main([
                "mono", "--params", str(root / "params.yaml"),
                "--intrinsics", str(root / "intrinsics.yaml"),
                "--camera", "test_camera",
                "--frames", str(root / "frames"),
                "--ranges", str(short),
                "--out", str(tmp_path / "r.jsonl"),
            ])


class TestSyntheticAndRefinement:
    def test_mono_synthetic_reports_ate(self, capsys, tmp_path):
        summary = _run(capsys, [
            "mono", "--synthetic", "10", "--synthetic-size", "320x240",
            "--out", str(tmp_path / "s.jsonl"),
        ])
        assert summary["frames"] == 10
        assert "ate_m" in summary and np.isfinite(summary["ate_m"])

    def test_ba_and_loop_closure_compose(self, mono_dataset, capsys, tmp_path):
        """Both flags together: BA stats AND loop stats in one run, with the
        pose graph consuming the BA-refined odometry (no crash, finite
        trajectory over all frames)."""
        root, _ = mono_dataset
        summary = _run(capsys, [
            "mono", "--params", str(root / "params.yaml"),
            "--intrinsics", str(root / "intrinsics.yaml"),
            "--camera", "test_camera",
            "--frames", str(root / "frames"),
            "--ranges", str(root / "ranges.txt"),
            "--out", str(tmp_path / "b.jsonl"),
            "--ba-window", "4", "--keyframe-stride", "2", "--ba-iters", "5",
            "--loop-closure",
        ])
        assert summary["frames"] == 11
        assert "ba_keyframes" in summary and summary["ba_keyframes"] >= 4
        assert "loops_accepted" in summary
        traj = np.loadtxt(tmp_path / "b_trajectory.txt")
        assert traj.shape == (11, 3)
        assert np.isfinite(traj).all()
