"""Hardware validation batch — run on a LIVE TPU after kernel or
precision changes (the CPU suite cannot catch Mosaic layout bugs:
interpret mode lowers differently).  Serially, one process.
1. TV hp XLA wall at 512x512 (checks the 2-stage dd collapse on chip)
2. non-pow2 hp TV microsolve vs XLA hp trajectories ON HARDWARE
3. bench.py-equivalent headline sanity
"""
import time
import jax, jax.numpy as jnp, numpy as np
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import problems
from fasta_tpu import FastaOptions, make_solver, microsolve

tiny = jax.jit(lambda i: jnp.sum(jnp.zeros(8) + i)); float(tiny(0))
rtt = min((lambda t0=time.perf_counter(): (float(tiny(i)), time.perf_counter()-t0)[1])() for i in range(1,4))
print(f"RTT {rtt*1e3:.1f} ms")

# 1. TV hp XLA wall (2-stage dd collapse now in the path)
p512 = problems.build("tv")
s = make_solver(FastaOptions(max_iters=3000, tol=1e-5))
args = (p512.op, p512.fterm, p512.gterm, jnp.asarray(p512.x0), jnp.asarray(2.0, jnp.float32))
out = s(*args); float(jnp.sum(out.taus))
best = 1e9
for _ in range(3):
    t0 = time.perf_counter(); out = s(*args); float(jnp.sum(out.taus)); best = min(best, time.perf_counter()-t0)
print(f"TV 512 XLA hp: {(best-rtt)*1e3:.1f} ms net, {int(out.iteration_count)} iters (pre-change same-state: 125.9 ms)")

# 2. non-pow2 hp microsolver ON HARDWARE vs XLA hp
prob = problems.build("tv", h=48, w=24, dtype=jnp.float32)
r = microsolve(prob, tau0=2.0, max_iters=120, tol=0.0, hp=True)
prob.tau0 = 2.0
rx = prob.solve(tol=1e-12, max_iters=120, fuse=False, stop_rule="iterations", precision="auto")
np.testing.assert_allclose(np.asarray(r.taus[:12]), np.asarray(rx.taus[:12]), rtol=1e-4)
rc = microsolve(prob, tau0=2.0, max_iters=600, tol=1e-5, hp=True)
rxc = prob.solve(tol=1e-5, max_iters=600, fuse=False, precision="auto")
xr = prob.recover(np.asarray(rc.solution)); xx = prob.recover(np.asarray(rxc.solution))
d = float(np.max(np.abs(xr - xx)))
print(f"non-pow2 48x24 HW: taus match 12-iter rtol 1e-4; converged primal diff {d:.1e} "
      f"({int(rc.iteration_count)} vs {int(rxc.iteration_count)} iters)")
assert d < 1e-3

# 3. also a 24x24 convergence check on hardware
p24 = problems.build("tv", h=24, w=24, dtype=jnp.float32)
r24 = microsolve(p24, tau0=2.0, max_iters=600, tol=1e-5, hp=True)
print(f"24x24 HW: converged={r24.converged} in {r24.iteration_count} iters")
print("ALL REVALIDATION OK")
