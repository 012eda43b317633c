"""End-to-end VO pipelines: pure functions over a carried state, scanned
over frame streams (SURVEY.md §7.1-7.2 steps 6-7).

``mono``   — camera + range scale recovery (visual_odometry.h:167-398).
``stereo`` — stereo 3D-to-2D PnP motion (visual_odometry.h:406-741).
"""

from ergo_uvo_tpu.pipeline.mono import (  # noqa: F401
    MonoFrameOutput,
    MonoVOState,
    mono_vo_init,
    mono_vo_init_from,
    mono_vo_step,
    run_mono_vo,
    run_mono_vo_batched_features,
    mono_vo_step_with_features,
)
from ergo_uvo_tpu.pipeline.stereo import (  # noqa: F401
    StereoFrameOutput,
    StereoVOState,
    stereo_vo_init,
    stereo_vo_init_from,
    stereo_vo_step,
    run_stereo_vo,
)
