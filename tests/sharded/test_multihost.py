"""Multi-process (multi-host analog) distributed correctness: two CPU
processes × 4 virtual devices form one 8-device global mesh via
jax.distributed; the row-sharded solve must produce BIT-IDENTICAL
stepsize/stopping scalars on every process (SURVEY.md §4: multi-host
logic testable with multi-process CPU JAX; the determinism requirement
of BASELINE.json)."""

import os
import subprocess
import sys
import textwrap

_WORKER = textwrap.dedent("""
    import sys
    import jax
    jax.config.update("jax_platforms", "cpu")
    pid, nproc, port = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]
    jax.distributed.initialize(coordinator_address=f"localhost:{port}",
                               num_processes=nproc, process_id=pid)
    jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp
    import numpy as np
    sys.path.insert(0, "@REPO@")
    import problems
    from fasta_tpu import FastaOptions, make_solver
    from fasta_tpu import sharding as sh
    assert jax.process_count() == nproc
    mesh = sh.make_mesh()
    prob = problems.build("lasso", m=240, n=96, k=10, dtype=jnp.float64)
    sp = sh.shard_problem(prob, mesh)
    fn = make_solver(FastaOptions(max_iters=40, tol=1e-9))
    out = fn(sp.op, sp.fterm, sp.gterm, jnp.asarray(sp.x0), 0.05)
    k = int(out.iteration_count)
    taus = np.asarray(out.taus)[:k]
    # TV halo path: cross-process ppermute on both stencil legs
    tv = problems.build("tv", h=64, w=32, dtype=jnp.float64)
    stv = sh.shard_problem(tv, mesh)
    assert isinstance(stv.op, sh.RowShardedTVDivOp)
    tout = fn(stv.op, stv.fterm, stv.gterm, jnp.asarray(stv.x0), 2.0)
    tk = int(tout.iteration_count)
    ttaus = np.asarray(tout.taus)[:tk]
    # planar 2-D mesh: (Ar, Ai) grid-sharded across both processes, the
    # planar signal sharded on its signal axis — cross-process coverage
    # of GridShardedPlanarDenseOp's two-psum gradmap
    pr = problems.build("phase_retrieval", m=64, n=16, planar=True,
                        dtype=jnp.float64)
    mesh2 = sh.make_mesh_2d(2, 4)
    spr = sh.shard_problem_2d(pr, mesh2)
    assert isinstance(spr.op, sh.GridShardedPlanarDenseOp)
    pout = fn(spr.op, spr.fterm, spr.gterm, jnp.asarray(spr.x0), 1.0)
    pk = int(pout.iteration_count)
    ptaus = np.asarray(pout.taus)[:pk]
    print(f"RESULT {k} {taus.sum():.17e} "
          f"{float(out.residuals[k-1]):.17e} "
          f"TV {tk} {ttaus.sum():.17e} "
          f"{float(tout.residuals[tk-1]):.17e} "
          f"PR {pk} {ptaus.sum():.17e}", flush=True)
""").replace("@REPO@", os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))))


def test_two_process_solve_identical_scalars(tmp_path):
    script = tmp_path / "worker.py"
    script.write_text(_WORKER)
    env = dict(os.environ)
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    env.pop("JAX_PLATFORMS", None)
    port = "12411"
    procs = [
        subprocess.Popen([sys.executable, str(script), str(i), "2", port],
                         stdout=subprocess.PIPE, stderr=subprocess.PIPE,
                         env=env, text=True)
        for i in range(2)
    ]
    outs = []
    for p in procs:
        stdout, stderr = p.communicate(timeout=260)
        assert p.returncode == 0, f"worker failed:\n{stderr[-2000:]}"
        lines = [l for l in stdout.splitlines() if l.startswith("RESULT")]
        assert lines, f"no RESULT line:\n{stdout[-500:]}"
        outs.append(lines[0])
    # both processes: identical iteration count and scalar sequence
    assert outs[0] == outs[1], f"processes diverged: {outs}"
