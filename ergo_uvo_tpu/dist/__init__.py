"""Device mesh, sharding and distributed bundle adjustment.

First-class new components (the reference is single-process, SURVEY.md §2.3):

  * ``mesh``        — mesh construction + sharding helpers;
  * ``sharded_ba``  — landmark-sharded Schur-complement BA: each device
    reduces its landmark blocks locally, the (6P x 6P) reduced camera system
    is formed with one ``psum`` over ICI, solved replicated, and landmark
    updates stay shard-local (BASELINE.json configs[4]);
  * ``data_parallel`` — frame/sequence data parallelism for the VO front end.
"""

from ergo_uvo_tpu.dist.mesh import (  # noqa: F401
    landmark_sharding,
    make_mesh,
    replicated,
)
from ergo_uvo_tpu.dist.sharded_ba import (  # noqa: F401
    make_sharded_ba_step,
    sharded_ba_solve,
)
from ergo_uvo_tpu.dist.data_parallel import run_mono_vo_batch  # noqa: F401
