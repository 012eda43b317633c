"""Device mesh, sharding and distributed bundle adjustment.

First-class new components (the reference is single-process, SURVEY.md §2.3):

  * ``mesh``        — mesh construction + sharding helpers;
  * ``sharded_ba``  — landmark-sharded Schur-complement BA: each device
    reduces its landmark blocks locally, the (6P x 6P) reduced camera system
    is formed with one ``psum`` over ICI, solved replicated, and landmark
    updates stay shard-local (BASELINE.json configs[4]);
  * ``window_ba``   — window/sequence-parallel BA on a 2-D ('kf', 'lm') mesh:
    keyframes sharded with a ppermute ring for the Schur cross-pose blocks
    (SURVEY.md §2.3 row 5);
  * ``data_parallel`` — frame/sequence data parallelism for the VO front end.
"""

from ergo_uvo_tpu.dist.mesh import (  # noqa: F401
    landmark_sharding,
    make_mesh,
    make_mesh_2d,
    replicated,
)
from ergo_uvo_tpu.dist.window_ba import (  # noqa: F401
    make_window_sharded_ba_step,
    window_sharded_ba_solve,
)
from ergo_uvo_tpu.dist.sharded_ba import (  # noqa: F401
    make_sharded_ba_step,
    sharded_ba_solve,
)
from ergo_uvo_tpu.dist.data_parallel import (  # noqa: F401
    run_mono_vo_batch,
    shard_frame_batches,
)
