"""Image preprocessing — the TPU-native ``get_image`` (VO_utility.cpp:337-379).

Pipeline (identical order to the reference): area resize to the configured
width → RGB→gray → undistort into the alpha=0 optimal new camera → optional
CLAHE.  The undistortion sampling grid and the optimal new camera matrix are
computed once at init on the host; the per-frame path is pure JAX (gathers +
elementwise), jit/vmap-able and batchable over frames.
"""

from ergo_uvo_tpu.image.preprocess import (  # noqa: F401
    PreprocessPlan,
    build_preprocess_plan,
    preprocess_frame,
    resize_area,
    rgb_to_gray,
    remap_bilinear,
)
from ergo_uvo_tpu.image.undistort import (  # noqa: F401
    build_undistort_grid,
    optimal_new_camera,
)
from ergo_uvo_tpu.image.clahe import clahe  # noqa: F401
