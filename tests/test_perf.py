"""Pinned performance regressions (VERDICT r3 weak #4).

Wall-clock on a shared CI host is too noisy to catch small slides, so the
primary pin is DETERMINISTIC: XLA's flop estimate for the compiled BA step
(``compiled.cost_analysis()``).  Compute creep (a re-materialized Schur
product, an accidental double solve, a lost fusion that doubles flops) moves
this number on any machine, load-independent.  A loose wall-clock floor
backs it up against order-of-magnitude scheduling regressions.
"""

import time

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ergo_uvo_tpu.optim.ba import BAProblem, ba_solve


def _ba_setup():
    rng = np.random.default_rng(0)
    Pp, L = 8, 512
    X = np.stack(
        [rng.uniform(-3, 3, L), rng.uniform(-2, 2, L), rng.uniform(5, 9, L)],
        -1,
    ).astype(np.float32)
    K = np.array([[300.0, 0, 160], [0, 300, 120], [0, 0, 1]], np.float32)
    obs = np.zeros((Pp, L, 2), np.float32)
    ts = np.zeros((Pp, 3), np.float32)
    Rs = np.tile(np.eye(3, dtype=np.float32), (Pp, 1, 1))
    for p in range(Pp):
        ts[p] = [0.25 * p, 0.0, 0.0]
        pc = X + ts[p]
        obs[p] = pc[:, :2] / pc[:, 2:3] * [K[0, 0], K[1, 1]] + [K[0, 2], K[1, 2]]
    obs += 0.1 * rng.standard_normal(obs.shape).astype(np.float32)
    prob = BAProblem(
        K=jnp.asarray(K), obs_uv=jnp.asarray(obs),
        obs_mask=jnp.ones((Pp, L), bool), num_fixed_poses=2,
    )
    X0 = jnp.asarray(X + 0.2 * rng.standard_normal(X.shape).astype(np.float32))
    return prob, jnp.asarray(Rs), jnp.asarray(ts), X0


ITERS = 30


@pytest.fixture(scope="module")
def compiled_ba():
    prob, R, t, X0 = _ba_setup()
    fn = jax.jit(lambda R, t, X: ba_solve(prob, R, t, X, iters=ITERS)[1])
    return fn.lower(R, t, X0).compile(), (R, t, X0)


def test_ba_step_flops_pinned(compiled_ba):
    """XLA flop estimate for the 30-iteration 8x512 BA solve.

    Measured 2026-08-20 on the CPU backend (the suite's pinned platform,
    conftest.py): 1.028e7 total = 3.43e5 flops/iter.  Gate at 1.35x: a >35%
    compute growth is a structural regression — re-measure and update
    CONSCIOUSLY if an intended change moves it.  (The estimate is
    backend-specific; this pin is for the CPU test platform.)
    """
    compiled, _ = compiled_ba
    ca = compiled.cost_analysis()
    ca = ca[0] if isinstance(ca, (list, tuple)) else ca
    flops = float(ca.get("flops", 0.0))
    if flops <= 0:
        pytest.skip("backend reports no flop estimate")
    per_iter = flops / ITERS
    assert per_iter < 1.35 * 3.43e5, f"BA flops/iter grew to {per_iter:.3e}"


def test_ba_iters_per_second_floor(compiled_ba):
    """Loose wall-clock floor (order-of-magnitude guard, load-tolerant)."""
    compiled, (R, t, X0) = compiled_ba
    jax.block_until_ready(compiled(R, t, X0))
    best = 0.0
    for _ in range(3):
        t0 = time.perf_counter()
        jax.block_until_ready(compiled(R, t, X0))
        best = max(best, ITERS / (time.perf_counter() - t0))
    assert best > 100.0, f"BA iters/s collapsed: {best:.0f}"
