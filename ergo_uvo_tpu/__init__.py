"""ergo_uvo_tpu — a TPU-native underwater visual-odometry / SfM engine.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of the
`team-ergo-unipi/ergo_uvo` ROS/OpenCV reference (frame-to-frame monocular and
stereo underwater VO), extended with sliding-window bundle adjustment,
pose-graph optimization and multi-device distributed BA.

Design stance (see SURVEY.md §7.1):
  * fixed shapes + validity masks everywhere (no dynamic compaction),
  * pure functions over a carried ``VOState`` scanned over frame streams,
  * batched/vectorized RANSAC instead of iterative loops,
  * Pallas kernels for the hot ops (descriptor distance matrix, CLAHE),
  * ``jax.sharding.Mesh`` + ``shard_map`` for distributed bundle adjustment.
"""

__version__ = "0.1.0"

import jax as _jax

# Geometry pipelines (triangulation, pose solvers, BA) need true float32
# matmuls; the TPU MXU default (bfloat16 inputs) loses ~3 decimal digits and
# breaks RANSAC thresholds.  Hot large-matmul kernels (descriptor distance
# matrix) opt back into bf16 explicitly via `preferred_element_type` /
# `precision=` at the call site.
_jax.config.update("jax_default_matmul_precision", "float32")

from ergo_uvo_tpu import geometry  # noqa: F401
