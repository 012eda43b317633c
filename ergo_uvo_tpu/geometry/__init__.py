"""Pure-JAX geometry primitives (L0 of the reference layer map, SURVEY.md §1).

Covers rotations / SO(3), SE(3), camera models + distortion, triangulation and
masked statistics — the TPU-native equivalents of
``uvo_libraries/src/math_utility.cpp`` and the thin geometry parts of
``uvo_libraries/src/VO_utility.cpp``.
"""

from ergo_uvo_tpu.geometry.rotations import (  # noqa: F401
    rotx,
    roty,
    rotz,
    euler_to_rotation,
    rotation_to_euler,
    euler_to_quaternion,
    quaternion_to_rotation,
    rotation_to_quaternion,
    skew,
    is_rotation_matrix,
    project_to_so3,
    so3_exp,
    so3_log,
    rpy_rate_jacobian,
    wrap2pi,
)
from ergo_uvo_tpu.geometry.geodesy import (  # noqa: F401
    ll_to_ne,
    ne_to_ll,
    lld_to_ned,
    ned_to_lld,
)
from ergo_uvo_tpu.geometry.se3 import (  # noqa: F401
    SE3,
    se3_exp,
    se3_log,
)
from ergo_uvo_tpu.geometry.camera import (  # noqa: F401
    PinholeCamera,
    project_points,
    distort_normalized,
    undistort_normalized,
    pixel_to_normalized,
    normalized_to_pixel,
    projection_matrix,
    resize_camera_matrix,
)
from ergo_uvo_tpu.geometry.triangulation import (  # noqa: F401
    triangulate_points,
    reprojection_errors,
    filter_3d_points,
    transform_points,
    cheirality_mask,
)
from ergo_uvo_tpu.geometry.stats import (  # noqa: F401
    masked_median,
    masked_mean_and_variance,
    masked_mean,
)
