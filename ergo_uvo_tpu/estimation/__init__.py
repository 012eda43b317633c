"""Relative-pose estimation — vectorized RANSAC/LMEDS on TPU.

Replaces the reference's OpenCV calib3d calls (SURVEY.md §2.1):
  * ``findEssentialMat`` + ``recoverPose`` (VO_utility.cpp:147-149)
    -> batched 8-point essential + cheirality vote,
  * ``findHomography`` + ``recover_pose_homography`` (VO_utility.cpp:152-154,
    :581-624) -> batched 4-point DLT + SVD decomposition + candidate vote,
  * ``solvePnPRansac`` (visual_odometry.h:647-648) -> batched DLT PnP +
    Gauss-Newton refinement,
  * the LMEDS/RANSAC loops -> one `vmap` over all hypothesis minimal sets
    with masked scoring (SURVEY.md §7.1 "Batched RANSAC").
"""

from ergo_uvo_tpu.estimation.sampling import sample_minimal_sets  # noqa: F401
from ergo_uvo_tpu.estimation.robust import (  # noqa: F401
    lmeds_inlier_mask,
    score_hypotheses,
)
from ergo_uvo_tpu.estimation.essential import (  # noqa: F401
    eight_point_essential,
    sampson_error_sq,
    recover_pose_from_essential,
    find_essential,
)
from ergo_uvo_tpu.estimation.homography import (  # noqa: F401
    four_point_homography,
    homography_transfer_error_sq,
    decompose_homography,
    recover_pose_homography,
    find_homography,
)
from ergo_uvo_tpu.estimation.pnp import solve_pnp_ransac  # noqa: F401
from ergo_uvo_tpu.estimation.relative_pose import (  # noqa: F401
    RelativePoseResult,
    estimate_relative_pose,
    select_estimation_method,
)
