"""BA step bisection on TPU: residuals/jacobians/normal-eq/schur/solve."""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

N = 10


def bench_scan(step, x0, name, reps=3):
    import jax

    @jax.jit
    def run(x0):
        c, _ = jax.lax.scan(step, x0, None, length=N)
        return c

    out = run(x0)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = run(x0)
        jax.block_until_ready(out)
    ms = (time.perf_counter() - t0) / (reps * N) * 1e3
    print(f"{name:52s} {ms:8.3f} ms/iter", flush=True)
    return ms


def main():
    import jax
    import jax.numpy as jnp

    print("backend:", jax.default_backend(), flush=True)
    from ergo_uvo_tpu.optim.ba import (
        BAState,
        _jacobians,
        _normal_equations,
        _schur_solve,
        ba_step,
        reprojection_residuals,
    )

    rng = np.random.default_rng(0)
    P, L = 8, 512
    X = jnp.asarray(
        np.stack(
            [rng.uniform(-3, 3, L), rng.uniform(-2, 2, L), rng.uniform(5, 9, L)], -1
        ).astype(np.float32)
    )
    K = jnp.asarray(np.array([[300.0, 0, 160], [0, 300, 120], [0, 0, 1]], np.float32))
    R = jnp.asarray(np.tile(np.eye(3, dtype=np.float32), (P, 1, 1)))
    t = jnp.asarray(
        np.stack([[0.25 * p, 0.0, 0.0] for p in range(P)]).astype(np.float32)
    )
    obs = jnp.einsum("pij,lj->pli", R, X) + t[:, None, :]
    obs = obs[..., :2] / obs[..., 2:3] * 300.0 + jnp.asarray([160.0, 120.0])
    mask = jnp.ones((P, L), bool)

    def resid_step(c, _):
        r, pc, iz = reprojection_residuals(K, R, t, c, obs, mask)
        return c + jnp.sum(r) * 1e-9 + jnp.sum(pc) * 1e-12, None

    def jac_step(c, _):
        r, pc, iz = reprojection_residuals(K, R, t, c, obs, mask)
        Jp, Jl = _jacobians(K, R, pc, iz, mask)
        return c + (jnp.sum(Jp) + jnp.sum(Jl)) * 1e-9, None

    def normal_step(c, _):
        r, pc, iz = reprojection_residuals(K, R, t, c, obs, mask)
        Jp, Jl = _jacobians(K, R, pc, iz, mask)
        Hpp, Hll, Hpl, bp, bl = _normal_equations(Jp, Jl, r)
        s = sum(jnp.sum(x) for x in (Hpp, Hll, Hpl, bp, bl))
        return c + s * 1e-9, None

    def schur_step(c, _):
        r, pc, iz = reprojection_residuals(K, R, t, c, obs, mask)
        Jp, Jl = _jacobians(K, R, pc, iz, mask)
        Hpp, Hll, Hpl, bp, bl = _normal_equations(Jp, Jl, r)
        dp, dl = _schur_solve(Hpp, Hll, Hpl, bp, bl, jnp.asarray(1e-3), 2)
        return c + (jnp.sum(dp) + jnp.sum(dl)) * 1e-9, None

    def full_step(c, _):
        st = BAState(R=R, t=t, X=c, lm_lambda=jnp.asarray(1e-3))
        st2, cost = ba_step(K, obs, mask, st, 2)
        return st2.X, None

    bench_scan(resid_step, X, "residuals")
    bench_scan(jac_step, X, "+ jacobians")
    bench_scan(normal_step, X, "+ normal equations")
    bench_scan(schur_step, X, "+ schur solve")
    bench_scan(full_step, X, "full ba_step")


if __name__ == "__main__":
    main()
