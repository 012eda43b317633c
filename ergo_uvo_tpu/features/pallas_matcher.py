"""Fused Pallas TPU kernel: descriptor distance matrix + row top-2.

The matcher's hot op (SURVEY.md §2.1 row 2: "Pallas matmul-based distance
matrix (MAX_KPTS x MAX_KPTS), top-2 row reduction").  The kernel tiles the
query dimension, computes one (TQ, T) squared-distance tile on the MXU via the
matmul identity ||q-t||^2 = ||q||^2 + ||t||^2 - 2 q.t, and reduces it to
(min, argmin, second-min) per row while the tile is still in VMEM — the full
distance matrix never reaches HBM.  For the default 512x512x64 problem this is
one grid step; the same kernel scales to several thousand keypoints.

Shapes are handled internally: Q is padded to the tile multiple, T and D to
lane multiples (padded train columns are masked invalid), so any keypoint
budget works.  `fits_vmem` reports whether a problem size fits the kernel's
VMEM plan — the matcher falls back to the XLA path (with a warning) when not.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_BIG = 3.4e38  # stand-in for +inf (avoids inf-inf NaNs in-kernel)

# VMEM budget for the kernel's working set (v5e has ~16 MB per core; leave
# headroom for double-buffering and the compiler's own temporaries).
_VMEM_BUDGET_BYTES = 8 * 1024 * 1024


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _plan(Q: int, T: int, D: int):
    """(TQ, Qp, Tp, Dp): query tile + padded operand sizes."""
    Dp = _round_up(D, 128)
    Tp = _round_up(T, 128)
    TQ = min(_round_up(Q, 8), 256)
    Qp = _round_up(Q, TQ)
    return TQ, Qp, Tp, Dp


def fits_vmem(Q: int, T: int, D: int) -> bool:
    """Whether the kernel's per-step working set fits the VMEM budget."""
    TQ, _, Tp, Dp = _plan(Q, T, D)
    # double-buffered q tile + constant train block + distance tile and a
    # same-size temporary (all f32).
    working = 4 * (2 * TQ * Dp + Tp * Dp + 2 * TQ * Tp)
    return working <= _VMEM_BUDGET_BYTES


def _top2_kernel(q_ref, t_ref, tmask_ref, min1_ref, idx1_ref, min2_ref):
    q = q_ref[:]  # (TQ, D)
    t = t_ref[:]  # (T, D)
    cross = jax.lax.dot_general(
        q,
        t,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (TQ, T)
    qn = jnp.sum(q * q, axis=1, keepdims=True)
    tn = jnp.sum(t * t, axis=1)[None, :]
    d2 = jnp.maximum(qn + tn - 2.0 * cross, 0.0)
    valid = tmask_ref[:][None, :] != 0
    d2 = jnp.where(valid, d2, _BIG)

    min1 = jnp.min(d2, axis=1)
    cols = jax.lax.broadcasted_iota(jnp.int32, d2.shape, 1)
    # argmin via masked index-min (ties -> lowest index, like jnp.argmin).
    idx1 = jnp.min(jnp.where(d2 == min1[:, None], cols, jnp.int32(2**30)), axis=1)
    d2_wo = jnp.where(cols == idx1[:, None], _BIG, d2)
    min2 = jnp.min(d2_wo, axis=1)

    min1_ref[:] = min1[:, None]
    idx1_ref[:] = idx1[:, None]
    min2_ref[:] = min2[:, None]


@functools.partial(jax.jit, static_argnames=("interpret",))
def top2_distances_pallas(
    desc_q: jax.Array,
    desc_t: jax.Array,
    mask_t: jax.Array,
    interpret: bool = False,
):
    """Row-wise (min, argmin, second-min) squared L2 distances, fused on TPU.

    Returns float32/int32/float32 arrays of shape (Q,); invalid train columns
    are excluded.  Rows with no valid candidate return +inf distances.  Any
    (Q, T, D) works: operands are padded internally to tile multiples.
    """
    Q, D = desc_q.shape
    T, _ = desc_t.shape
    TQ, Qp, Tp, Dp = _plan(Q, T, D)

    q = jnp.zeros((Qp, Dp), jnp.float32).at[:Q, :D].set(desc_q.astype(jnp.float32))
    t = jnp.zeros((Tp, Dp), jnp.float32).at[:T, :D].set(desc_t.astype(jnp.float32))
    tm = jnp.zeros((Tp,), jnp.int32).at[:T].set(mask_t.astype(jnp.int32))

    min1, idx1, min2 = pl.pallas_call(
        _top2_kernel,
        grid=(Qp // TQ,),
        in_specs=[
            pl.BlockSpec((TQ, Dp), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((Tp, Dp), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((Tp,), lambda i: (0,), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((TQ, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((TQ, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((TQ, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((Qp, 1), jnp.float32),
            jax.ShapeDtypeStruct((Qp, 1), jnp.int32),
            jax.ShapeDtypeStruct((Qp, 1), jnp.float32),
        ],
        interpret=interpret,
    )(q, t, tm)

    min1 = min1[:Q, 0]
    idx1 = idx1[:Q, 0]
    min2 = min2[:Q, 0]
    # Map the _BIG sentinel back to +inf so downstream isfinite checks work.
    min1 = jnp.where(min1 >= _BIG, jnp.inf, min1)
    min2 = jnp.where(min2 >= _BIG, jnp.inf, min2)
    return min1, idx1, min2
