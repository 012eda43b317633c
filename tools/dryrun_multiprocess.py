"""Two-process ``jax.distributed`` dryrun (VERDICT r3 missing #4).

The entire dist/ stack is routinely exercised on a single-process virtual
mesh; this tool covers the multi-HOST half of SURVEY.md §2.3 row 6 / §5
row 8 without hardware: two OS processes, each contributing two virtual CPU
devices to one global 4-device 'data' mesh via ``jax.distributed``.

Per process:
  1. landmark-sharded Schur BA (dist/sharded_ba.py): each process feeds ONLY
     the landmark rows its addressable devices own
     (``jax.make_array_from_process_local_data``) and runs LM steps whose
     psum collectives cross the process boundary; the cost trajectory must
     match the single-process dense solve (optim/ba.ba_solve) on the same
     problem.
  2. sharded frame ingestion (dist/data_parallel.shard_frame_batches_multiprocess):
     each process decodes only its half of every global frame batch; the
     assembled global array must reduce to the full-batch sum.

Run:  python tools/dryrun_multiprocess.py           (launcher, spawns 2 procs)
      python tools/dryrun_multiprocess.py --proc I  (worker, internal)

Exit code 0 + one {"ok": true, ...} JSON line = pass.
"""

import json
import os
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

NPROC = 2
DEV_PER_PROC = 2
PORT = int(os.environ.get("DRYRUN_MP_PORT", "47013"))


def worker(proc_id: int) -> None:
    import numpy as np

    import jax

    # CPU cross-process collectives ride gloo; must be selected before the
    # backend initializes.
    try:
        jax.config.update("jax_cpu_collectives_implementation", "gloo")
    except Exception:
        pass
    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(
        coordinator_address=f"localhost:{PORT}",
        num_processes=NPROC,
        process_id=proc_id,
    )
    import jax.numpy as jnp
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    assert jax.process_count() == NPROC, jax.process_count()
    devs = jax.devices()
    n = len(devs)
    assert n == NPROC * DEV_PER_PROC, n
    mesh = Mesh(np.array(devs), ("data",))

    # ---- 1. landmark-sharded BA with per-process shard feeding.
    from ergo_uvo_tpu.dist.sharded_ba import make_sharded_ba_step
    from ergo_uvo_tpu.optim.ba import BAProblem, ba_solve

    rng = np.random.default_rng(0)
    Pp, L = 4, 16 * n  # L divisible by the mesh
    X = np.stack(
        [rng.uniform(-2, 2, L), rng.uniform(-2, 2, L), rng.uniform(4, 8, L)], -1
    ).astype(np.float32)
    K = np.array([[100.0, 0, 40], [0, 100.0, 30], [0, 0, 1]], np.float32)
    obs = np.zeros((Pp, L, 2), np.float32)
    Rs = np.tile(np.eye(3, dtype=np.float32), (Pp, 1, 1))
    ts = np.zeros((Pp, 3), np.float32)
    for p in range(Pp):
        ts[p] = [0.2 * p, 0.0, 0.0]
        pc = X + ts[p]
        obs[p] = pc[:, :2] / pc[:, 2:3] * [K[0, 0], K[1, 1]] + [K[0, 2], K[1, 2]]
    obs += 0.05 * rng.standard_normal(obs.shape).astype(np.float32)
    X0 = X + 0.1 * rng.standard_normal((L, 3)).astype(np.float32)

    # This process's landmark rows: global row-block layout over the mesh.
    per_dev = L // n
    lo = proc_id * DEV_PER_PROC * per_dev
    hi = lo + DEV_PER_PROC * per_dev
    sh_obs = NamedSharding(mesh, P(None, "data", None))
    sh_msk = NamedSharding(mesh, P(None, "data"))
    sh_X = NamedSharding(mesh, P("data", None))
    rep = NamedSharding(mesh, P())
    obs_g = jax.make_array_from_process_local_data(
        sh_obs, jnp.asarray(obs[:, lo:hi]), (Pp, L, 2)
    )
    msk_g = jax.make_array_from_process_local_data(
        sh_msk, jnp.ones((Pp, hi - lo), bool), (Pp, L)
    )
    X_g = jax.make_array_from_process_local_data(
        sh_X, jnp.asarray(X0[lo:hi]), (L, 3)
    )
    put = lambda a: jax.device_put(jnp.asarray(a), rep)  # noqa: E731
    R_g, t_g, K_g = put(Rs), put(ts), put(K)
    lam = put(np.float32(1e-3))

    step = make_sharded_ba_step(mesh, num_fixed=2)
    iters = 5
    costs = []
    R_c, t_c, X_c = R_g, t_g, X_g
    for _ in range(iters):
        R_c, t_c, X_c, lam, cost = step(K_g, obs_g, msk_g, R_c, t_c, X_c, lam)
        costs.append(float(cost))

    # Single-process dense reference on the identical problem.
    prob = BAProblem(
        K=jnp.asarray(K), obs_uv=jnp.asarray(obs),
        obs_mask=jnp.ones((Pp, L), bool), num_fixed_poses=2,
    )
    _, ref_costs = ba_solve(
        prob, jnp.asarray(Rs), jnp.asarray(ts), jnp.asarray(X0), iters=iters
    )
    ref_costs = np.asarray(ref_costs)
    assert np.all(np.isfinite(costs)), costs
    assert np.allclose(costs, ref_costs, rtol=2e-3), (costs, ref_costs)

    # ---- 2. per-process sharded frame ingestion.
    from ergo_uvo_tpu.dist.data_parallel import shard_frame_batches_multiprocess
    from ergo_uvo_tpu.io.sequence import ArraySource

    B, H, W = 4, 8, 8
    frames = np.arange(2 * B * H * W, dtype=np.float32).reshape(2 * B, H, W)
    tss_all = np.arange(2 * B, dtype=np.float32)
    # This process's share of each global batch: the rows its devices own.
    local_rows = np.concatenate([
        frames[g * B:(g + 1) * B][lo_b:hi_b]
        for g in range(2)
        for lo_b, hi_b in [(proc_id * B // NPROC, (proc_id + 1) * B // NPROC)]
    ])
    local_tss = np.concatenate([
        tss_all[g * B:(g + 1) * B][proc_id * B // NPROC:(proc_id + 1) * B // NPROC]
        for g in range(2)
    ])
    src = ArraySource(local_rows, local_tss)
    tot = jax.jit(lambda a: jnp.sum(a), out_shardings=rep)
    seen = []
    for g, (imgs_g, tss_g, _) in enumerate(
        shard_frame_batches_multiprocess(src, mesh, B)
    ):
        assert imgs_g.shape == (B, H, W)
        s = float(tot(imgs_g))
        expect = float(frames[g * B:(g + 1) * B].sum())
        assert abs(s - expect) < 1e-3, (g, s, expect)
        seen.append(g)
    assert seen == [0, 1], seen

    if proc_id == 0:
        print(json.dumps({
            "ok": True,
            "processes": NPROC,
            "global_devices": n,
            "ba_costs": [round(c, 3) for c in costs],
            "ref_costs": [round(float(c), 3) for c in ref_costs],
        }))
    jax.distributed.shutdown()


def launcher() -> int:
    env = {
        **os.environ,
        "JAX_PLATFORMS": "cpu",
        "XLA_FLAGS": f"--xla_force_host_platform_device_count={DEV_PER_PROC}",
        "JAX_COMPILATION_CACHE_DIR": "",
    }
    procs = [
        subprocess.Popen(
            [sys.executable, os.path.abspath(__file__), "--proc", str(i)],
            env=env,
        )
        for i in range(NPROC)
    ]
    rcs = [p.wait(timeout=600) for p in procs]
    if any(rcs):
        print(json.dumps({"ok": False, "rcs": rcs}))
        return 1
    return 0


if __name__ == "__main__":
    if "--proc" in sys.argv:
        worker(int(sys.argv[sys.argv.index("--proc") + 1]))
    else:
        sys.exit(launcher())
