"""Trajectory evaluation: ATE / RPE — the BASELINE.md accuracy metrics.

The reference has no evaluation tooling (SURVEY.md §4); the driver's metric is
ATE vs the reference trajectory, so the evaluator is a first-class component
here (SURVEY.md §7.2 step 11).
"""

from ergo_uvo_tpu.eval.ate import (  # noqa: F401
    ate_rmse,
    integrate_mono_poses,
    integrate_mono_trajectory,
    rpe_rmse,
    umeyama_alignment,
    velocity_rmse,
)
