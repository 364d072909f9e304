"""Hardware validation batch — run on a LIVE TPU after kernel or
precision changes (the CPU suite cannot catch Mosaic layout bugs:
interpret mode lowers differently).  Serially, one process.

Checks (each prints a line; asserts abort):
 1. tunnel RTT (single-dispatch readback round trip)
 2. TV hp XLA wall at 512x512 (2-stage dd collapse on chip)
 3. non-pow2 hp TV microsolve vs XLA hp trajectories ON HARDWARE
 4. 24x24 hp TV microsolve convergence
 5. DEPENDENCY-CHAINED streaming-gradmap re-measurement at 8192x16384
    with an implied-GB/s roofline sanity column (round-2 VERDICT weak
    #2: the 0.41 ms/eval record implied 153% of the v5e HBM roofline —
    the K-chain must carry a data dependency so every eval really
    streams A)
 6. planar one-pass kernel: hardware correctness vs the XLA two-pass
    at 512x1024, then chained perf at 16384x4096 (512 MB planar)
 7. dense microsolver hp + FISTA on hardware: prefix parity vs the XLA
    hp path + wall at the 1000x2000 baseline
 8. planar PhaseMax microsolver: prefix parity vs the XLA path + wall
    at the 16384x256 flagship (Ar+Ai pinned in VMEM)

Usage: python benchmarks/hw_validate.py [--quick]
"""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import problems
from fasta_tpu import FastaOptions, make_solver, microsolve

QUICK = "--quick" in sys.argv
HBM_GBPS = 819.0        # v5e HBM roofline


def readback_rtt():
    tiny = jax.jit(lambda i: jnp.sum(jnp.zeros(8) + i))
    float(tiny(0))
    return min((lambda t0=time.perf_counter():
                (float(tiny(i)), time.perf_counter() - t0)[1])()
               for i in range(1, 4))


def chain(gradmap, K):
    """K gradient evaluations per readback with a REAL data dependency:
    the next trial point is x0 + 0·g (not constant-foldable — 0·NaN is
    NaN under IEEE), so XLA cannot CSE or reorder the A reads.

    Operands are jit ARGUMENTS, not closure constants: a closed-over
    512 MB matrix gets baked into the HLO and the tunneled
    remote-compile POST rejects the payload (HTTP 413)."""
    def run(x, *ops):
        def step(xc, _):
            _d, f, g = gradmap(xc, *ops)
            return x + 0.0 * g, f

        _xf, fs = jax.lax.scan(step, x, None, length=K)
        return jnp.sum(fs)

    return jax.jit(run)


def timed(fn, *args, rtt, repeats=3):
    float(fn(*args))                    # warm/compile
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        float(fn(*args))
        best = min(best, time.perf_counter() - t0)
    return max(best - rtt, 1e-9)


rtt = readback_rtt()
print(f"[1] RTT {rtt*1e3:.2f} ms")

# ---- 2. TV hp XLA wall --------------------------------------------------
p512 = problems.build("tv")
s = make_solver(FastaOptions(max_iters=3000, tol=1e-5))
args = (p512.op, p512.fterm, p512.gterm, jnp.asarray(p512.x0),
        jnp.asarray(2.0, jnp.float32))
out = s(*args); float(jnp.sum(out.taus))
best = 1e9
for _ in range(3):
    t0 = time.perf_counter(); out = s(*args); float(jnp.sum(out.taus))
    best = min(best, time.perf_counter() - t0)
print(f"[2] TV 512 XLA hp: {(best-rtt)*1e3:.1f} ms net, "
      f"{int(out.iteration_count)} iters (2026-08-17 same-state: 125.9 ms)")

# ---- 3. non-pow2 hp microsolver ON HARDWARE vs XLA hp -------------------
prob = problems.build("tv", h=48, w=24, dtype=jnp.float32)
r = microsolve(prob, tau0=2.0, max_iters=120, tol=0.0, hp=True)
prob.tau0 = 2.0
rx = prob.solve(tol=1e-12, max_iters=120, fuse=False,
                stop_rule="iterations", precision="auto")
np.testing.assert_allclose(np.asarray(r.taus[:12]),
                           np.asarray(rx.taus[:12]), rtol=1e-4)
rc = microsolve(prob, tau0=2.0, max_iters=600, tol=1e-5, hp=True)
rxc = prob.solve(tol=1e-5, max_iters=600, fuse=False, precision="auto")
xr = prob.recover(np.asarray(rc.solution))
xx = prob.recover(np.asarray(rxc.solution))
d = float(np.max(np.abs(xr - xx)))
print(f"[3] non-pow2 48x24 HW: taus match 12-iter rtol 1e-4; converged "
      f"primal diff {d:.1e} ({int(rc.iteration_count)} vs "
      f"{int(rxc.iteration_count)} iters)")
assert d < 1e-3

# ---- 4. 24x24 convergence ------------------------------------------------
p24 = problems.build("tv", h=24, w=24, dtype=jnp.float32)
r24 = microsolve(p24, tau0=2.0, max_iters=600, tol=1e-5, hp=True)
print(f"[4] 24x24 HW: converged={r24.converged} in "
      f"{r24.iteration_count} iters")

# ---- 5. chained streaming gradmap + roofline sanity ----------------------
from fasta_tpu.kernels import fused_lstsq_gradmap, lstsq_gradmap_reference

rng = np.random.default_rng(0)
if QUICK:
    # Quick mode = layout-bug fast-fail.  A 33 MB operand is (a) below
    # the VMEM-residency threshold, so an implied-GB/s roofline assert
    # is conceptually wrong (operands can legally exceed HBM bandwidth
    # from VMEM), and (b) so fast that the chain costs less than one
    # tunnel RTT, making the subtracted timing meaningless.  Check the
    # fused kernel's HARDWARE CORRECTNESS here; timing + roofline run
    # in the full pass only.
    m, n = 2048, 4096
    A = jnp.asarray(rng.standard_normal((m, n)), jnp.float32)
    x = jnp.asarray(rng.standard_normal(n), jnp.float32)
    b = jnp.asarray(rng.standard_normal(m), jnp.float32)
    d1q, f1q, g1q = jax.block_until_ready(fused_lstsq_gradmap(A, x, b))
    d0q, f0q, g0q = lstsq_gradmap_reference(A, x, b)
    np.testing.assert_allclose(np.asarray(g1q), np.asarray(g0q),
                               rtol=2e-4, atol=1e-3)
    np.testing.assert_allclose(float(f1q), float(f0q), rtol=1e-5)
    print(f"[5] (quick) fused lstsq gradmap HW-correct at {m}x{n} "
          f"(g diff {float(jnp.max(jnp.abs(g1q - g0q))):.1e}); "
          f"timing + roofline deferred to the full run")
    K = 4   # keeps [6b]'s quick timing cheap; its assert is also gated
else:
    m, n = 8192, 16384
    A = jnp.asarray(rng.standard_normal((m, n)), jnp.float32)
    x = jnp.asarray(rng.standard_normal(n), jnp.float32)
    b = jnp.asarray(rng.standard_normal(m), jnp.float32)
    # K chained evals per readback: net wall must DOMINATE the RTT for
    # the subtraction to be trustworthy (two-pass ≈ 1.3 ms/eval → K=256
    # is ~330 ms net vs a worst-day ~30 ms barrier).
    K = 256
    gb = m * n * 4 / 1e9
    t2 = timed(chain(lambda v, A_, b_: lstsq_gradmap_reference(A_, v, b_),
                     K), x, A, b, rtt=rtt) / K
    t1 = timed(chain(lambda v, A_, b_: fused_lstsq_gradmap(A_, v, b_),
                     K), x, A, b, rtt=rtt) / K
    assert t2 * K >= 3 * rtt, \
        f"two-pass chain ({t2*K*1e3:.1f} ms) not RTT-dominant vs {rtt*1e3:.1f} ms"
    g2, g1 = 2 * gb / t2, gb / t1
    ok5 = ("OK" if max(g1, g2) <= 1.05 * HBM_GBPS
           else "EXCEEDED — measurement artifact, investigate")
    print(f"[5] streaming gradmap {m}x{n} (A = {gb:.2f} GB), K={K} chained: "
          f"XLA two-pass {t2*1e3:.2f} ms/eval -> {g2:.0f} GB/s implied; "
          f"fused one-pass {t1*1e3:.2f} ms/eval -> {g1:.0f} GB/s implied; "
          f"speedup {t2/t1:.2f}x  "
          f"[roofline {HBM_GBPS:.0f} GB/s: {ok5}]")
    assert g1 <= 1.1 * HBM_GBPS and g2 <= 1.1 * HBM_GBPS, \
        "implied bandwidth exceeds the HBM roofline: the chain is not " \
        "serializing full A reads"

# ---- 6. planar one-pass kernel: correctness + perf -----------------------
from fasta_tpu.kernels import (fused_planar_hinge_gradmap,
                               fused_planar_lstsq_gradmap,
                               planar_hinge_gradmap_reference,
                               planar_lstsq_gradmap_reference)

mp, np_ = 512, 1024
Ar = jnp.asarray(rng.standard_normal((mp, np_)), jnp.float32)
Ai = jnp.asarray(rng.standard_normal((mp, np_)), jnp.float32)
xp = jnp.asarray(rng.standard_normal((np_, 2)), jnp.float32)
bp = jnp.asarray(rng.standard_normal((mp, 2)), jnp.float32)
bh = jnp.abs(jnp.asarray(rng.standard_normal(mp), jnp.float32)) + 0.1
d1_, f1_, g1_ = jax.block_until_ready(
    fused_planar_lstsq_gradmap(Ar, Ai, xp, bp))
d0_, f0_, g0_ = planar_lstsq_gradmap_reference(Ar, Ai, xp, bp)
np.testing.assert_allclose(np.asarray(g1_), np.asarray(g0_),
                           rtol=2e-4, atol=1e-3)
dh1, fh1, gh1 = jax.block_until_ready(
    fused_planar_hinge_gradmap(Ar, Ai, xp, bh))
dh0, fh0, gh0 = planar_hinge_gradmap_reference(Ar, Ai, xp, bh)
np.testing.assert_allclose(np.asarray(gh1), np.asarray(gh0),
                           rtol=2e-4, atol=1e-3)
print(f"[6a] planar kernels HW-correct at {mp}x{np_} "
      f"(lstsq g diff {float(jnp.max(jnp.abs(g1_-g0_))):.1e}, "
      f"hinge g diff {float(jnp.max(jnp.abs(gh1-gh0))):.1e})")

if QUICK:
    print("[6b] (quick) planar streaming timing + roofline deferred to "
          "the full run (quick sizes are VMEM-resident and sub-RTT)")
else:
    ms, ns = 16384, 4096
    Ar = jnp.asarray(rng.standard_normal((ms, ns)), jnp.float32)
    Ai = jnp.asarray(rng.standard_normal((ms, ns)), jnp.float32)
    xs = jnp.asarray(rng.standard_normal((ns, 2)), jnp.float32)
    bs = jnp.abs(jnp.asarray(rng.standard_normal(ms), jnp.float32)) + 0.1
    gbp = 2 * ms * ns * 4 / 1e9
    tp2 = timed(chain(lambda v, r_, i_, b_:
                      planar_hinge_gradmap_reference(r_, i_, v, b_), K),
                xs, Ar, Ai, bs, rtt=rtt) / K
    tp1 = timed(chain(lambda v, r_, i_, b_:
                      fused_planar_hinge_gradmap(r_, i_, v, b_), K),
                xs, Ar, Ai, bs, rtt=rtt) / K
    assert tp2 * K >= 3 * rtt, \
        f"planar chain ({tp2*K*1e3:.1f} ms) not RTT-dominant vs {rtt*1e3:.1f} ms"
    gp2, gp1 = 2 * gbp / tp2, gbp / tp1
    ok6 = "OK" if max(gp1, gp2) <= 1.05 * HBM_GBPS else "EXCEEDED"
    print(f"[6b] planar hinge gradmap {ms}x{ns} (Ar+Ai = {gbp:.2f} GB), "
          f"K={K}: XLA two-pass {tp2*1e3:.2f} ms -> {gp2:.0f} GB/s; fused "
          f"one-pass {tp1*1e3:.2f} ms -> {gp1:.0f} GB/s; "
          f"speedup {tp2/tp1:.2f}x "
          f"[target >=1.5x; roofline {ok6}]")
    assert gp1 <= 1.1 * HBM_GBPS and gp2 <= 1.1 * HBM_GBPS

# ---- 7. dense microsolver hp + FISTA on hardware -------------------------
pl_ = problems.build("lasso", m=1000, n=2000, k=100, dtype=jnp.float32)
inst = pl_.instance
pl_.tau0 = 0.05
r_hp = microsolve(pl_, max_iters=400, tol=1e-5, hp=True)
rx = pl_.solve(tol=1e-12, max_iters=15, fuse=False,
               stop_rule="iterations", precision="auto")
np.testing.assert_allclose(np.asarray(r_hp.taus[:10]),
                           np.asarray(rx.taus[:10]), rtol=1e-4)
r_fista = microsolve(pl_, max_iters=1000, tol=1e-5, hp=True,
                     accelerate=True)
# Walls time the RAW kernel with ONE scalar readback: microsolve()'s
# convenience packaging does several host transfers (int(k), bool(conv),
# two np.asarray) and each costs a tunnel RTT — timing it measures the
# network, not the kernel.
from fasta_tpu.kernels.microsolver import microsolve_lasso

A7 = jnp.asarray(pl_.op.A, jnp.float32)
b7 = jnp.asarray(pl_.fterm.b, jnp.float32)
x07 = jnp.asarray(pl_.x0, jnp.float32)
mu7 = float(np.asarray(pl_.gterm.mu))
KCH = 256       # dense solves chained per readback: one ~0.2 ms solve
                # is far under the tunnel RTT (negative walls otherwise;
                # 16 was still sub-RTT on a 29 ms day)
KCH8 = 32       # planar solves are ~5 ms each — 32 ≈ 170 ms per readback


def chain_solves(kernel_call, x0_, K):
    """K whole-solve kernel launches per readback, data-chained through
    x0 (x0 + 0·sol is not constant-foldable) so they serialize."""
    def step(xc, _):
        sol, k_ = kernel_call(xc)
        return x0_ + 0.0 * sol, k_

    @jax.jit
    def run(xs):
        _xf, ks = jax.lax.scan(step, xs, None, length=K)
        return ks[-1]

    return run


walls = {}
for label, kw in (("plain", {}), ("hp", dict(hp=True)),
                  ("fista-hp", dict(hp=True, accelerate=True))):
    mi = 400 if label != "fista-hp" else 1000

    def call7(xc, kw=kw, mi=mi):
        x, _t, _r, k_, _c = microsolve_lasso(
            A7, b7, xc, 0.05, mu7, max_iters=mi, tol=1e-5, prox="l1",
            **kw)
        return x, k_

    run7 = chain_solves(call7, x07, KCH)
    iters = int(run7(x07))              # warm/compile
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        int(run7(x07))
        best = min(best, time.perf_counter() - t0 - rtt)
    walls[label] = (best / KCH, iters)
print(f"[7] dense micro 1000x2000 HW ({KCH} chained solves/readback): "
      f"taus[0:10] match XLA hp rtol 1e-4; "
      + "; ".join(f"{k}: {v[0]*1e3:.2f} ms/{v[1]} iters"
                  for k, v in walls.items()))

# ---- 8. planar PhaseMax microsolver on hardware ---------------------------
ppr = problems.build("phase_retrieval", planar=True, dtype=jnp.float32)
ppr.tau0 = 1.0
r_pm = microsolve(ppr, max_iters=300, tol=0.0)
rx_pm = make_solver(FastaOptions(max_iters=12, stop_rule="iterations",
                                 precision="standard", fuse=False))(
    ppr.op, ppr.fterm, ppr.gterm, jnp.asarray(ppr.x0),
    jnp.asarray(1.0, jnp.float32))
np.testing.assert_allclose(np.asarray(r_pm.taus[:12]),
                           np.asarray(rx_pm.taus)[:12], rtol=5e-3)
from fasta_tpu.kernels.microsolver_planar import microsolve_planar_phasemax

Ar8 = jnp.asarray(ppr.op.Ar, jnp.float32)
Ai8 = jnp.asarray(ppr.op.Ai, jnp.float32)
b8 = jnp.asarray(ppr.fterm.b, jnp.float32)
c8 = jnp.asarray(ppr.gterm.c, jnp.float32)
x08 = jnp.asarray(ppr.x0, jnp.float32)


def call8(xc):
    x, _t, _r, k_, _c = microsolve_planar_phasemax(
        Ar8, Ai8, b8, c8, xc, 1.0, max_iters=300, tol=1e-5, hp=True)
    return x, k_


run8 = chain_solves(call8, x08, KCH8)
iters8 = int(run8(x08))
best = 1e9
for _ in range(3):
    t0 = time.perf_counter()
    int(run8(x08))
    best = min(best, time.perf_counter() - t0 - rtt)
print(f"[8] planar micro 16384x256 HW ({KCH8} chained solves/readback): "
      f"taus[0:12] match XLA rtol 5e-3; to-tol {best/KCH8*1e3:.2f} ms / "
      f"{iters8} iters (XLA loop was ~93 us/iter on 2026-08-17)")

# ---- 9. dense microsolver NEW LOSSES (logistic / squared hinge) ----------
# The loss='logistic'/'squared_hinge' kernel branches (round-3) only ran
# in interpret mode until this check: exp/log1p and the hinge's select
# must lower through Mosaic.  Prefix parity under hp (dd scalars keep
# the comparison tight); converged-objective parity per structure.
for pname, kwargs in (("logistic", dict()), ("svm", dict())):
    px = problems.build(pname, dtype=jnp.float32, **kwargs)
    px.tau0 = 0.05
    r9 = microsolve(px, max_iters=120, tol=0.0, hp=True)
    rx9 = px.solve(tol=1e-12, max_iters=15, fuse=False,
                   stop_rule="iterations", precision="auto")
    np.testing.assert_allclose(np.asarray(r9.taus[:10]),
                               np.asarray(rx9.taus)[:10], rtol=1e-4)
    rc9 = microsolve(px, max_iters=2000, tol=1e-5, hp=True)
    rxc9 = px.solve(tol=1e-5, max_iters=2000, fuse=False,
                    precision="auto")
    xs = jnp.asarray(rc9.solution)
    fk9 = float(px.fterm.value(px.op(xs)) + px.gterm.value(xs))
    xx9 = jnp.asarray(rxc9.solution)
    fx9 = float(px.fterm.value(px.op(xx9)) + px.gterm.value(xx9))
    assert abs(fk9 - fx9) <= 1e-4 * (1.0 + abs(fx9)), (pname, fk9, fx9)
    # FISTA mode of the new loss lowers and converges on chip too
    ra9 = microsolve(px, max_iters=3000, tol=1e-5, hp=True,
                     accelerate=True)
    print(f"[9] {pname} micro HW: taus[0:10] match XLA hp rtol 1e-4; "
          f"obj {fk9:.6f} vs XLA {fx9:.6f} "
          f"({int(rc9.iteration_count)} vs {int(rxc9.iteration_count)} "
          f"iters); fista k={int(ra9.iteration_count)} "
          f"conv={ra9.converged}")

# ---- 10. batched microsolver (vmap -> leading grid axis) ------------------
# microsolve_batch lowers jax.vmap over the whole-solve kernel to a
# Pallas GRID axis — a lowering path interpret mode does not exercise.
# Correctness: per-instance equality vs separate launches ON CHIP.
# Perf: batch-of-B in one launch vs B data-chained single launches.
from fasta_tpu import microsolve_batch

pb = problems.build("lasso", dtype=jnp.float32)     # 1000x2000 baseline
pb.tau0 = 0.05
b10 = jnp.asarray(pb.fterm.b, jnp.float32)
B10 = 32
bs10 = jnp.stack([b10 * (1.0 + 0.01 * i) for i in range(B10)])
rb = microsolve_batch(pb, bs10, max_iters=400, tol=1e-5)
for i in (0, B10 // 2, B10 - 1):
    pi = pb.with_parts(fterm=type(pb.fterm)(bs10[i]))
    ri = microsolve(pi, tau0=0.05, max_iters=400, tol=1e-5)
    assert rb.iteration_counts[i] == ri.iteration_count, (
        i, rb.iteration_counts[i], ri.iteration_count)
    np.testing.assert_array_equal(np.asarray(rb.solutions[i]),
                                  np.asarray(ri.solution))
# timing: one 21-iter solve is ~0.07 ms — thousands per readback or
# the tunnel RTT swamps the wall (negative-net on a 29 ms day).  Both
# arms run KB10 x B10 identical solves; the batched arm scans KB10
# vmapped launches (data-chained through x0s), the single arm chains
# KB10*B10 individual launches.
from fasta_tpu.kernels.microsolver import microsolve_lasso as _msl

A10 = jnp.asarray(pb.op.A, jnp.float32)
x010 = jnp.asarray(pb.x0, jnp.float32)
mu10 = float(np.asarray(pb.gterm.mu))
KB10 = 160                      # 160*32 = 5120 solves ≈ 350 ms/readback
bs_same = jnp.stack([b10] * B10)
x0s_same = jnp.stack([x010] * B10)


@jax.jit
def run_batch(x0s_):
    def step(xc, _):
        x, _t, _r, k_, _c = jax.vmap(
            lambda bb, xx: _msl(A10, bb, xx, 0.05, mu10, max_iters=400,
                                tol=1e-5))(bs_same, xc)
        return x0s_ + 0.0 * x, k_
    _xf, ks = jax.lax.scan(step, x0s_, None, length=KB10)
    return jnp.sum(ks[-1])


float(run_batch(x0s_same))
bt = 1e9
for _ in range(3):
    t0 = time.perf_counter(); float(run_batch(x0s_same))
    bt = min(bt, time.perf_counter() - t0 - rtt)


def call10(xc):
    x, _t, _r, k_, _c = _msl(A10, b10, xc, 0.05, mu10, max_iters=400,
                             tol=1e-5)
    return x, k_


run_single = chain_solves(call10, x010, KB10 * B10)
int(run_single(x010))
st = 1e9
for _ in range(3):
    t0 = time.perf_counter(); int(run_single(x010))
    st = min(st, time.perf_counter() - t0 - rtt)
nsol = KB10 * B10
print(f"[10] batched micro B={B10} HW: instances bit-match separate "
      f"launches; {bt/nsol*1e3:.4f} ms/solve batched vs "
      f"{st/nsol*1e3:.4f} ms/solve chained-single "
      f"({st/bt:.2f}x, {nsol} solves per readback)")

# ---- 11. mu as a runtime SMEM scalar + regularization-path sweep ----------
# The penalty weight moved from a compile-time constant to ts_ref[1]
# (one executable per option set; vmap over mu = path in one launch).
# Verify the SMEM read lowers correctly and the sweep bit-matches
# per-mu launches ON CHIP.
from fasta_tpu import microsolve_sweep
from fasta_tpu.terms import L1Norm as _L1

mus11 = jnp.asarray([0.02, 0.05, 0.2], jnp.float32)
rs11 = microsolve_sweep(pb, mus11, tau0=0.05, max_iters=400, tol=1e-5)
for i, mu_ in enumerate(np.asarray(mus11)):
    pi = pb.with_parts(gterm=_L1(float(mu_)))
    ri = microsolve(pi, tau0=0.05, max_iters=400, tol=1e-5)
    assert rs11.iteration_counts[i] == ri.iteration_count, (
        i, rs11.iteration_counts[i], ri.iteration_count)
    np.testing.assert_array_equal(np.asarray(rs11.solutions[i]),
                                  np.asarray(ri.solution))
ptv11 = problems.build("tv", h=64, w=64, dtype=jnp.float32)
rtv11 = microsolve_sweep(ptv11, jnp.asarray([0.05, 0.1], jnp.float32),
                         tau0=2.0, max_iters=600, tol=1e-5)
print(f"[11] mu-sweep HW: dense path bit-matches per-mu launches "
      f"(iters {list(rs11.iteration_counts)}); tv sweep iters "
      f"{list(rtv11.iteration_counts)} conv="
      f"{bool(np.all(rtv11.converged))}")

# ---- 12. round-4 kernel features on chip ---------------------------------
# Selectable stop rules, f-value recording, per-instance tau0 batching
# and the warm-started in-kernel mu-path only ran in interpret mode
# when they landed; each is a distinct lowering (static branches, a new
# SMEM vector layout, grid-persistent scratch).
r12 = microsolve(pb, tau0=0.05, max_iters=400, tol=1e-5,
                 stop_rule="residual", record_fvals=True)
rx12 = pb.solve(tol=1e-5, max_iters=400, fuse=False,
                precision="standard", stop_rule="residual")
np.testing.assert_allclose(np.asarray(r12.taus[:10]),
                           np.asarray(rx12.taus)[:10], rtol=1e-4)
np.testing.assert_allclose(np.asarray(r12.fvals[:10]),
                           np.asarray(rx12.fvals)[:10], rtol=1e-3)
assert r12.converged

# per-instance tau0: batch with heterogeneous tau0s bit-matches
# separate launches (the (B,1,2) SMEM path table on chip)
t0s = jnp.asarray([0.03, 0.05, 0.08], jnp.float32)
bs12 = jnp.stack([b10] * 3)
rb12 = microsolve_batch(pb, bs12, tau0=t0s, max_iters=400, tol=1e-5)
for i, t0_ in enumerate(np.asarray(t0s)):
    ri = microsolve(pb, tau0=float(t0_), max_iters=400, tol=1e-5)
    assert rb12.iteration_counts[i] == ri.iteration_count, (
        i, rb12.iteration_counts[i], ri.iteration_count)
    np.testing.assert_array_equal(np.asarray(rb12.solutions[i]),
                                  np.asarray(ri.solution))

# warm-started in-kernel mu-path (strongest-first continuation) vs the
# cold sweep: same converged objectives, fewer total iterations
mus12 = jnp.asarray([0.2, 0.1, 0.05, 0.02], jnp.float32)
rw = microsolve_sweep(pb, mus12, tau0=0.05, max_iters=400, tol=1e-5,
                      stop_rule="residual", warm_start=True)
rc_ = microsolve_sweep(pb, mus12, tau0=0.05, max_iters=400, tol=1e-5,
                       stop_rule="residual")
A12 = jnp.asarray(pb.op.A, jnp.float32)
for i, mu_ in enumerate(np.asarray(mus12)):
    for rr in (rw, rc_):
        xs_ = jnp.asarray(rr.solutions[i])
        f_ = float(0.5 * jnp.sum((A12 @ xs_ - b10) ** 2)
                   + mu_ * jnp.sum(jnp.abs(xs_)))
        x_c = jnp.asarray(rc_.solutions[i])
        f_c = float(0.5 * jnp.sum((A12 @ x_c - b10) ** 2)
                    + mu_ * jnp.sum(jnp.abs(x_c)))
        assert abs(f_ - f_c) <= 1e-4 * (1.0 + abs(f_c)), (i, f_, f_c)
ww, cc = int(np.sum(rw.iteration_counts)), int(np.sum(rc_.iteration_counts))

# TV warm mu-path (same continuation kernel mechanics, distinct
# lowering: grid-persistent (h,w) VMEM scratch + field outputs).
# Contract on chip: point 0 bit-matches the cold sweep's point 0, all
# points converge, objectives match the cold sweep per mu.
tv12 = problems.build("tv", h=64, w=64)
tvmus = jnp.asarray([0.2, 0.1, 0.05], jnp.float32)
# tol=1e-4: at 64x64 f32 the mu=0.2 residual plateaus ~1.1e-5 on
# chip (warm AND cold identically) — 1e-5 is below the f32 floor for
# this config
rtw = microsolve_sweep(tv12, tvmus, tau0=2.0, max_iters=2000, tol=1e-4,
                       stop_rule="residual", warm_start=True)
rtc = microsolve_sweep(tv12, tvmus, tau0=2.0, max_iters=2000, tol=1e-4,
                       stop_rule="residual")
assert rtw.converged.all() and rtc.converged.all()
assert rtw.iteration_counts[0] == rtc.iteration_counts[0]
np.testing.assert_array_equal(np.asarray(rtw.solutions[0]),
                              np.asarray(rtc.solutions[0]))
btv = jnp.asarray(tv12.fterm.b, jnp.float32)
for i, mu_ in enumerate(np.asarray(tvmus)):
    dw = float(tv12.fterm.value(
        mu_ * tv12.op.op(jnp.asarray(rtw.solutions[i]))))
    dc = float(tv12.fterm.value(
        mu_ * tv12.op.op(jnp.asarray(rtc.solutions[i]))))
    assert abs(dw - dc) <= 1e-3 * (1.0 + abs(dc)), (i, dw, dc)
twv, tcv = int(np.sum(rtw.iteration_counts)), int(np.sum(rtc.iteration_counts))

print(f"[12] round-4 features HW: residual-rule fvals match XLA "
      f"(10-iter rtol 1e-3); heterogeneous-tau0 batch bit-matches "
      f"separate launches; warm mu-path {ww} total iters vs cold {cc} "
      f"(objectives match per mu); TV warm path point-0 bit-match + "
      f"objectives match ({twv} vs {tcv} total iters — no-win finding "
      f"per microsolve_tv_path docstring)")

# ---- 12b. round-5 features on chip ---------------------------------------
# In-kernel nonfinite guard + status code, and the C5 backtrack-count
# row — both are new lowerings (int32 halt in the carry, a fourth
# accumulator row): interpret mode cannot certify them (CLAUDE.md).
r12b = microsolve(pb, tau0=float("nan"), max_iters=400, tol=1e-5)
assert r12b.status == "nonfinite" and not r12b.converged, (
    r12b.status, r12b.iteration_count)
assert r12b.iteration_count <= 3, r12b.iteration_count

pb.tau0 = 0.5          # oversized tau0 forces real line-search activity
r12c = microsolve(pb, max_iters=400, tol=1e-5, record_objs=True,
                  record_nres=True)
rx12c = pb.solve(tol=1e-5, max_iters=400, fuse=False,
                 precision="standard", record_objective=True)
pb.tau0 = 0.05         # restore the check-12 setting
assert r12c.status == "converged"
assert r12c.iteration_count == rx12c.iteration_count
assert r12c.backtracks is not None and r12c.backtracks.sum() > 0
np.testing.assert_array_equal(
    r12c.backtracks, np.asarray(rx12c.backtracks)[:r12c.iteration_count])
# objective series (record_objs, 5th accumulator row) matches the XLA
# record_objective series on the same trajectory
np.testing.assert_allclose(
    r12c.objectives,
    np.asarray(rx12c.objectives)[:r12c.iteration_count],
    rtol=1e-4, atol=1e-5)
# normalized-residual row (record_nres, 6th accumulator row) — with
# it the dense kernel exports the COMPLETE FastaResult contract
np.testing.assert_allclose(
    r12c.norm_residuals,
    np.asarray(rx12c.norm_residuals)[:r12c.iteration_count],
    rtol=1e-3, atol=1e-6)
assert r12c.best_index == int(np.argmin(r12c.objectives))

# record_iterates (in-loop 8-row-block DMA to HBM — a Mosaic lowering
# interpret mode cannot certify): trajectory == the XLA recorder's
pb.tau0 = 0.05
r12d = microsolve(pb, max_iters=400, tol=1e-5, record_iterates=True)
rx12d = pb.solve(tol=1e-5, max_iters=400, fuse=False,
                 precision="standard", record_iterates=True)
assert r12d.iteration_count == rx12d.iteration_count
np.testing.assert_allclose(
    r12d.iterates, np.asarray(rx12d.iterates)[:r12d.iteration_count],
    atol=2e-5)
np.testing.assert_array_equal(r12d.iterates[-1],
                              np.asarray(r12d.solution))

# planar record_iterates (both channels side-by-side in the DMA
# block) at the flagship shape
ppr12 = problems.build("phase_retrieval", planar=True,
                       dtype=jnp.float32)
ppr12.tau0 = 1.0
r12e = microsolve(ppr12, max_iters=200, tol=1e-5, hp=True,
                  record_iterates=True)
assert r12e.status == "converged"
np.testing.assert_array_equal(r12e.iterates[-1],
                              np.asarray(r12e.solution))
rx12e = ppr12.solve(tol=1e-5, max_iters=200, fuse=False,
                    precision="auto", record_iterates=True)
kk12 = min(r12e.iteration_count, rx12e.iteration_count, 12)
np.testing.assert_allclose(r12e.iterates[:kk12],
                           np.asarray(rx12e.iterates)[:kk12],
                           atol=5e-4)

# a poisoned instance inside a batch must not disturb its neighbors
rb12b = microsolve_batch(
    pb, jnp.stack([b10, b10, b10]),
    tau0=jnp.asarray([0.05, float("nan"), 0.05], jnp.float32),
    max_iters=400, tol=1e-5)
assert list(rb12b.statuses) == ["converged", "nonfinite", "converged"]
assert rb12b.iteration_counts[0] == rb12b.iteration_counts[2] > 3
assert rb12b.iteration_counts[1] <= 3

print(f"[12b] round-5 features HW: NaN-tau0 solve aborts in "
      f"{r12b.iteration_count} iter(s) with status=nonfinite; backtrack "
      f"row matches the XLA recorder ({int(r12c.backtracks.sum())} "
      f"trials over {r12c.iteration_count} iters); objective + "
      f"normalized-residual rows match the XLA recorder (rtol "
      f"1e-4/1e-3); record_iterates trajectories match the XLA "
      f"recorder (dense {r12d.iterates.shape[0]}x"
      f"{r12d.iterates.shape[1]}, planar {r12e.iterates.shape[0]}x"
      f"{r12e.iterates.shape[1]}x2, via 8-row-block HBM DMA); "
      f"poisoned batch lane isolated "
      f"(statuses {list(rb12b.statuses)})")

# ---- 13. full-solve STREAMING rows (512 MB, current session) --------------
# Round-3 VERDICT missing #1: the quoted full-solve streaming numbers
# (f32 1.78x / bf16 4.1x / logistic 1.81x) were 2026-08-17
# builder-recorded rows; the gradmap alone re-measured 2.00x.  This
# check re-pairs the FULL adaptive solve kernel-on vs kernel-off in the
# same session, plus the bf16-storage and logistic-pointwise rows.
if QUICK:
    print("[13] (quick) full-solve streaming rows deferred to the full "
          "run (512 MB operands)")
else:
    import os
    from fasta_tpu import LowPrecDenseOp, make_solver as _mk

    def timed_solve(prob_, opts_, tau0_):
        sv = _mk(opts_)
        args_ = (prob_.op, prob_.fterm, prob_.gterm,
                 jnp.asarray(prob_.x0), jnp.asarray(tau0_, jnp.float32))
        out = sv(*args_); float(jnp.sum(out.taus))
        barrier = 1e9
        for _ in range(3):
            t0 = time.perf_counter(); float(jnp.sum(out.taus))
            barrier = min(barrier, time.perf_counter() - t0)
        best = 1e9
        for _ in range(3):
            t0 = time.perf_counter()
            o = sv(*args_); float(jnp.sum(o.taus))
            best = min(best, time.perf_counter() - t0)
        return opts_.max_iters / max(best - barrier, 1e-9)

    ITER13 = 600
    opts13 = FastaOptions(max_iters=ITER13, stop_rule="iterations",
                          adaptive=True, backtrack=True)
    pl13 = problems.build("lasso", m=8192, n=16384, k=400)
    # save/restore any user-exported FASTA_TPU_PALLAS around the
    # kernel-off timings instead of clobbering it (round-4 ADVICE)
    _saved_pallas = os.environ.get("FASTA_TPU_PALLAS")

    def _restore_pallas():
        if _saved_pallas is None:
            os.environ.pop("FASTA_TPU_PALLAS", None)  # auto -> ON @512MB
        else:
            os.environ["FASTA_TPU_PALLAS"] = _saved_pallas

    try:
        os.environ["FASTA_TPU_PALLAS"] = "0"
        off_ips = timed_solve(pl13, opts13, 2e-3)
    finally:
        _restore_pallas()
    on_ips = timed_solve(pl13, opts13, 2e-3)
    p16 = pl13.with_parts(op=LowPrecDenseOp.from_dense(
        jnp.asarray(pl13.op.A, jnp.float32)))
    bf_ips = timed_solve(p16, opts13, 2e-3)
    del pl13, p16
    plog = problems.build("logistic", m=8192, n=16384, k=400)
    try:
        os.environ["FASTA_TPU_PALLAS"] = "0"
        log_off = timed_solve(plog, opts13, 2e-3)
    finally:
        _restore_pallas()
    log_on = timed_solve(plog, opts13, 2e-3)
    del plog
    print(f"[13] full-solve streaming 8192x16384 ({ITER13} fixed iters, "
          f"net): f32 XLA {off_ips:.0f} it/s -> kernel {on_ips:.0f} it/s "
          f"({on_ips/off_ips:.2f}x); bf16 storage {bf_ips:.0f} it/s "
          f"({bf_ips/off_ips:.2f}x vs f32 XLA); logistic pointwise "
          f"{log_off:.0f} -> {log_on:.0f} it/s ({log_on/log_off:.2f}x)  "
          f"[2026-08-17 rows: 1.78x / 4.1x / 1.81x]")

print("ALL REVALIDATION OK")
