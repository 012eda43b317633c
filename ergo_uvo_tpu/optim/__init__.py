"""Windowed optimization layers the reference lacks (SURVEY.md §0, §7.2 8-9):

  * ``ba``         — sliding-window bundle adjustment (LM + Schur complement);
  * ``keyframes``  — keyframe/landmark window bookkeeping feeding BA;
  * ``pose_graph`` — pose-graph optimization + descriptor-based loop closure.

These implement BASELINE.json configs[2] (mono + local BA), configs[3]
(pose graph + loop closure) and, with ``ergo_uvo_tpu.dist``, configs[4]
(multi-host distributed BA).
"""

from ergo_uvo_tpu.optim.ba import (  # noqa: F401
    BAProblem,
    BAState,
    ba_solve,
    ba_step,
    reprojection_residuals,
)
from ergo_uvo_tpu.optim.keyframes import KeyframeWindow, WindowedBA  # noqa: F401
from ergo_uvo_tpu.optim.pose_graph import (  # noqa: F401
    PoseGraph,
    optimize_pose_graph,
    detect_loop_closures,
)
from ergo_uvo_tpu.optim.trajectory import (  # noqa: F401
    BATrajectoryResult,
    PoseGraphResult,
    close_loops_and_optimize,
    close_loops_and_optimize_stereo,
    integrate_mono_poses,
    refine_mono_trajectory,
    verify_loop_candidate,
    verify_loop_candidate_pnp,
)
