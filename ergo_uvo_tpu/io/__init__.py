"""Frame ingestion: array-based sequence sources + synthetic scene rendering.

Replaces the reference's ROS message plumbing (CompressedImage subscribers +
cv_bridge decode, visual_odometry.h:67-95, math_utility.cpp:154-173) with
array-based sequence ingestion per BASELINE.json; the synthetic renderer
provides ground-truthed underwater-like sequences for tests and benchmarks
(the reference's `test.bag` is distributed out-of-band and unavailable here —
SURVEY.md §6).
"""

from ergo_uvo_tpu.io.synthetic import (  # noqa: F401
    SyntheticSequence,
    make_seafloor_texture,
    render_frame,
    make_loop_sequence,
    make_mono_sequence,
    make_stereo_sequence,
)
from ergo_uvo_tpu.io.sequence import FrameSource, ArraySource  # noqa: F401
