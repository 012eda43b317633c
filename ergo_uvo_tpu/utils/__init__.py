"""Auxiliary subsystems (SURVEY.md §5): checkpointing, profiling, records."""

from ergo_uvo_tpu.utils.checkpoint import (  # noqa: F401
    restore_state,
    save_state,
)
from ergo_uvo_tpu.utils.profiling import (  # noqa: F401
    FrameRateCounter,
    stage,
    trace,
)
from ergo_uvo_tpu.utils.records import RunRecorder  # noqa: F401
from ergo_uvo_tpu.utils.visualize import (  # noqa: F401
    draw_matches,
    dump_matches,
    save_image,
)
from ergo_uvo_tpu.utils.debug import assert_finite, nan_guard  # noqa: F401
