"""Aux subsystems: checkpoint round-trip, recorder, profiling helpers."""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ergo_uvo_tpu.pipeline import mono_vo_init
from ergo_uvo_tpu.utils import FrameRateCounter, RunRecorder, stage
from ergo_uvo_tpu.utils.checkpoint import restore_state, save_state

pytestmark = pytest.mark.fast  # smoke tier: small shapes, cheap compiles


class TestCheckpoint:
    def test_roundtrip_mono_state(self, tmp_path):
        state = mono_vo_init(64, 64)
        state = state._replace(
            SF=jnp.asarray(2.5), t=jnp.asarray([1.0, 2.0, 3.0]),
            initialized=jnp.asarray(True),
        )
        path = str(tmp_path / "ckpt")
        save_state(path, state)
        restored = restore_state(path, mono_vo_init(64, 64))
        assert type(restored) is type(state)
        np.testing.assert_allclose(float(restored.SF), 2.5)
        np.testing.assert_allclose(np.asarray(restored.t), [1.0, 2.0, 3.0])
        assert bool(restored.initialized)


class TestRecorder:
    def test_jsonl_records(self, tmp_path):
        p = str(tmp_path / "run.jsonl")
        rec = RunRecorder(p)
        rec.record_frame(0, {"velocity": jnp.asarray([1.0, 0, 0]), "validity": True},
                         note="x")
        rec.record_frame(1, {"velocity": jnp.asarray([0.0, 1, 0]), "validity": False})
        rec.close()
        lines = [json.loads(l) for l in open(p)]
        assert lines[0]["frame"] == 0
        assert lines[0]["velocity"] == [1.0, 0.0, 0.0]
        assert lines[0]["note"] == "x"
        assert lines[1]["validity"] is False


class TestProfiling:
    def test_stage_scope_composes_with_jit(self):
        @jax.jit
        def f(x):
            with stage("double"):
                return x * 2

        assert float(f(jnp.asarray(3.0))) == 6.0

    def test_frame_rate_counter(self):
        c = FrameRateCounter()
        c.tick()
        fps = c.tick()
        assert fps > 0
        assert c.total_frames == 2


class TestNanGuard:
    def test_assert_finite_passes_and_raises(self):
        import jax.numpy as jnp
        import pytest

        from ergo_uvo_tpu.utils import assert_finite

        assert_finite({"a": jnp.ones(3), "b": jnp.zeros((2, 2))})
        with pytest.raises(FloatingPointError):
            assert_finite({"a": jnp.asarray([1.0, jnp.nan])})

    def test_nan_guard_catches_nan(self):
        import jax
        import jax.numpy as jnp
        import pytest

        from ergo_uvo_tpu.utils import nan_guard

        @jax.jit
        def bad(x):
            return jnp.log(x)  # log(-1) -> NaN

        with nan_guard():
            with pytest.raises(FloatingPointError):
                jax.block_until_ready(bad(jnp.asarray([-1.0])))
        # guard restored: no raise outside
        jax.block_until_ready(bad(jnp.asarray([-1.0])))

    def test_mono_outputs_finite_under_guard(self):
        """The full mono step keeps all published outputs finite."""
        import jax
        import jax.numpy as jnp

        from ergo_uvo_tpu.config import MonoVOConfig, SurfConfig
        from ergo_uvo_tpu.io import make_mono_sequence
        from ergo_uvo_tpu.pipeline import run_mono_vo
        from ergo_uvo_tpu.utils import assert_finite

        cfg = MonoVOConfig(
            surf=SurfConfig(min_hessian=80.0, n_octaves=2),
            max_keypoints=128, num_hypotheses=64,
        )
        seq = make_mono_sequence(n_frames=4, height=128, width=160, seed=3)
        _, outs = run_mono_vo(
            jnp.asarray(seq.imgs_left), jnp.asarray(seq.timestamps),
            jnp.asarray(seq.ranges), jnp.asarray(seq.K), cfg,
            jax.random.PRNGKey(0),
        )
        assert_finite(outs._asdict(), "mono outputs")


@pytest.mark.fast
def test_bench_emit_skips_nonfinite_and_orders_headline_last(capsys):
    """bench.py plumbing (ADVICE r4): NaN measurements are skipped with a
    note instead of emitted as garbage, slope inversions return NaN, and the
    headline metric prints LAST regardless of emission order."""
    import importlib
    import json
    import sys as _sys

    _sys.path.insert(0, os.path.dirname(os.path.dirname(__file__)))
    bench = importlib.import_module("bench")
    bench._LINES.clear()

    bench.emit("mono_uvo_frames_per_second_per_chip", 77.0, "frames/s", 3.85)
    bench.emit("ba_iters_per_second_8x512", float("nan"), "iters/s", 1.0)
    bench.emit("mono_ate_m_sift", 0.02, "m", 1.1)
    bench.flush_lines()
    out = [json.loads(l) for l in capsys.readouterr().out.strip().splitlines()]
    metrics = [d["metric"] for d in out]
    assert "ba_iters_per_second_8x512" not in metrics  # NaN skipped
    assert metrics[-1] == "mono_uvo_frames_per_second_per_chip"  # headline

    # Slope guard: jitter >= signal -> NaN, not a 1e10 throughput.
    times = {10: 2.0, 100: 1.9}  # t_hi <= t_lo
    rate = bench.size_slope_rate(lambda n: times[n], 10, 100, reps=1)
    assert rate != rate  # NaN
    bench._LINES.clear()
