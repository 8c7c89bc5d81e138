"""On-chip validation of the whole-solve kernel families (run on TPU).

Phases (each prints PASS/FAIL; keep going on failure to map breakage):
  1. fixed-grid whole-solve (rk4, grid=t and finer grid, packing)
  2. fixed-grid fused adjoint (two-kernel rk4 training parity)
  3. fixed-step Adams AB/ABM kernel parity + NFE
  4. VCABM whole-solve kernel parity (status + step envelope)
  5. fused hypersolver parity + NFE
  6. grid-ADJOINT big-batch training parity
  7. PLAN-adjoint (arbitrary plain-jnp dynamics, adaptive dopri5)
     cotangent parity vs the generic continuous adjoint
"""
import sys
sys.path.insert(0, '/root/repo')
import time
import traceback
import jax
import jax.numpy as jnp
import numpy as np

# The fused kernels always pin dot precision to HIGHEST in-kernel; the
# generic-oracle side must match, or on-chip XLA lowers the user func's
# matmuls to one bf16 pass and the ORACLE becomes the inaccurate side
# (~1e-2 trajectory error on these dynamics — measured, see BASELINE.md).
jax.config.update("jax_default_matmul_precision", "highest")

# PER-PHASE on-chip fused-vs-generic parity tolerances, each ~20-100x the
# parity measured on this hardware 2026-08-18 (BASELINE.md round-3 table)
# so a genuine ~1e-3-class regression FAILS instead of hiding under one
# uniform 5e-3 blanket. CPU interpret parity (same XLA ops both sides) is
# tested tighter (1e-5) in tests/.
TOL = {
    "fixed-forward": 2e-5,        # measured 2.4-8.3e-7
    "fixed-adjoint": 2e-5,        # measured rel 1.7-1.9e-7
    "adams-abm": 5e-5,            # measured 1.2-1.9e-6
    "vcabm": 5e-4,                # measured 2.1e-5 (controller ulp cascade)
    "hyper": 2e-5,                # measured 7-9.5e-7
    "grid-adjoint-bigbatch": 2e-4,  # measured rel 2-8e-6
    # Adaptive two-kernel plan adjoint: both sides re-solve at their own
    # step sequences, so parity is solve-tolerance-noise-bound (~1e-3
    # worst-element measured on a sensitivity-amplified config).
    "plan-adjoint": 2e-3,
}

print("devices:", jax.devices(), flush=True)
from tfdiffeq_tpu import odeint_adjoint, solve

rng = np.random.RandomState(0)
W1 = jnp.asarray(rng.randn(2, 24) * 0.3, jnp.float32)
b1 = jnp.asarray(rng.randn(24) * 0.05, jnp.float32)
W2 = jnp.asarray(rng.randn(24, 2) * 0.3, jnp.float32)


def f(t, y):
    return jnp.tanh((y ** 3) @ W1 + b1) @ W2


y0 = jnp.asarray(rng.randn(256, 2), jnp.float32)
t = jnp.linspace(0.0, 2.0, 9, dtype=jnp.float32)
results = {}


def phase(name, fn):
    t0 = time.time()
    try:
        fn()
        results[name] = "PASS"
        print(f"[{name}] PASS ({time.time()-t0:.1f}s)", flush=True)
    except Exception as e:                                  # noqa: BLE001
        results[name] = f"FAIL: {e}"
        print(f"[{name}] FAIL ({time.time()-t0:.1f}s)", flush=True)
        traceback.print_exc()


def p1():
    for method, opts in [("rk4", {}), ("rk4", {"num_steps": 64}),
                         ("euler", {"num_steps": 128})]:
        rf = solve(f, y0, t, method=method, options={"fuse": True, **opts})
        rg = solve(f, y0, t, method=method, options=opts)
        assert int(rf.stats.status) == 0
        assert int(rf.stats.nfe) == int(rg.stats.nfe)
        d = float(jnp.max(jnp.abs(rf.ys - rg.ys)))
        print(f"  {method} {opts}: maxdiff {d:.2e}", flush=True)
        assert d < TOL["fixed-forward"], d


def p2():
    g_out = jnp.asarray(rng.randn(9, 256, 2), jnp.float32)

    def loss(p, fuse):
        def dyn(tt, yy, pp):
            return jnp.tanh((yy ** 3) @ pp["w1"] + pp["b1"]) @ pp["w2"]
        opts = {"fuse": True, "num_steps": 16} if fuse \
            else {"num_steps": 16}
        ys = odeint_adjoint(dyn, y0, t, params=p, method="rk4",
                            options=opts,
                            adjoint_options={"num_steps": 8})
        return jnp.sum(ys * g_out)

    p = {"w1": W1, "b1": b1, "w2": W2}
    gf = jax.jit(jax.grad(lambda pp: loss(pp, True)))(p)
    gg = jax.jit(jax.grad(lambda pp: loss(pp, False)))(p)
    for k in gf:
        d = float(jnp.max(jnp.abs(gf[k] - gg[k])))
        m = float(jnp.max(jnp.abs(gg[k]))) + 1e-8
        print(f"  d{k}: rel {d/m:.2e}", flush=True)
        assert d / m < TOL["fixed-adjoint"]


def p3():
    for method in ("explicit_adams", "fixed_adams"):
        opts = {"num_steps": 32, "max_order": 4}
        rf = solve(f, y0, t, method=method, options={"fuse": True, **opts})
        rg = solve(f, y0, t, method=method, options=opts)
        assert int(rf.stats.nfe) == int(rg.stats.nfe), method
        d = float(jnp.max(jnp.abs(rf.ys - rg.ys)))
        print(f"  {method}: maxdiff {d:.2e} nfe {int(rf.stats.nfe)}",
              flush=True)
        assert d < TOL["adams-abm"], d


def p4():
    opts = {"first_step": 0.02}
    rf = solve(f, y0, t, rtol=1e-6, atol=1e-8, method="adams",
               options={"fuse": True, **opts})
    rg = solve(f, y0, t, rtol=1e-6, atol=1e-8, method="adams",
               options=opts)
    sf = [int(x) for x in (rf.stats.nfe, rf.stats.n_accepted,
                           rf.stats.n_rejected, rf.stats.status)]
    sg = [int(x) for x in (rg.stats.nfe, rg.stats.n_accepted,
                           rg.stats.n_rejected, rg.stats.status)]
    d = float(jnp.max(jnp.abs(rf.ys - rg.ys)))
    print(f"  vcabm: maxdiff {d:.2e} stats {sf} vs {sg}", flush=True)
    assert sf[3] == 0 and sg[3] == 0
    assert abs(sf[0] - sg[0]) <= 0.15 * sg[0] + 5
    assert d < 5e-4, d


def p5():
    Hw = jnp.asarray(rng.randn(5, 16) * 0.2, jnp.float32)
    Hv = jnp.asarray(rng.randn(16, 2) * 0.2, jnp.float32)

    def g(tt, yy, ff):
        tcol = jnp.broadcast_to(jnp.reshape(tt, (1, 1)), (yy.shape[0], 1))
        return jnp.tanh(jnp.concatenate([yy, ff, tcol], axis=1)
                        @ Hw) @ Hv

    for method in ("hyper_euler", "hyper_heun"):
        rf = solve(f, y0, t, method=method,
                   options={"fuse": True, "hypernet": g, "num_steps": 64})
        rg = solve(f, y0, t, method=method,
                   options={"hypernet": g, "num_steps": 64})
        assert int(rf.stats.nfe) == int(rg.stats.nfe), method
        d = float(jnp.max(jnp.abs(rf.ys - rg.ys)))
        print(f"  {method}: maxdiff {d:.2e}", flush=True)
        assert d < TOL["hyper"], d


def p6():
    from tfdiffeq_tpu.fast import MLPSpec, mlp_apply, odeint_adjoint_mlp
    B = 131072
    yb = jnp.asarray(rng.randn(B, 2), jnp.float32)
    tb = jnp.linspace(0.0, 5.0, 8, dtype=jnp.float32)
    gseed = jnp.asarray(rng.randn(8, B, 2), jnp.float32) * 0.1
    spec = MLPSpec(activation="tanh", input_power=3)
    w = ((W1 * 0.3, jnp.zeros(24, jnp.float32)),
         (W2 * 0.3, jnp.zeros(2, jnp.float32)))

    def loss_fused(w_):
        ys = odeint_adjoint_mlp(spec, w_, yb, tb, rtol=1e-6, atol=1e-8)
        return jnp.sum(ys * gseed)

    def loss_gen(w_):
        ys = odeint_adjoint(lambda tt, yy, p: mlp_apply(spec, p, yy),
                            yb, tb, params=w_, rtol=1e-6, atol=1e-8)
        return jnp.sum(ys * gseed)

    import warnings
    with warnings.catch_warnings():
        warnings.simplefilter("error")      # VMEM-fallback warning = FAIL
        gf = jax.jit(jax.grad(loss_fused))(w)
        jax.block_until_ready(gf)
    gg = jax.jit(jax.grad(loss_gen))(w)
    jax.block_until_ready(gg)
    for a, b in zip(jax.tree_util.tree_leaves(gf),
                    jax.tree_util.tree_leaves(gg)):
        d = float(jnp.max(jnp.abs(a - b)))
        m = float(jnp.max(jnp.abs(b))) + 1e-8
        print(f"  {a.shape}: rel {d/m:.2e}", flush=True)
        assert d / m < TOL["grid-adjoint-bigbatch"]


def p7():
    # Plan-driven two-kernel adjoint (ops/plan_adjoint.py): on-chip
    # cotangent parity for ARBITRARY plain-jnp dynamics with ADAPTIVE
    # stepping both directions, vs the generic continuous adjoint — the
    # path `odeint_adjoint(..., options={'fuse': True})` takes. Checks
    # weight, bias, AND y0 cotangents.
    g_out = jnp.asarray(rng.randn(9, 256, 2), jnp.float32)

    def loss(p, yy0, fuse):
        def dyn(tt, yy, pp):
            return jnp.tanh((yy ** 3) @ pp["w1"] + pp["b1"]) @ pp["w2"]
        opts = {"first_step": 0.02}
        if fuse:
            opts["fuse"] = True
        ys = odeint_adjoint(dyn, yy0, t, params=p, rtol=1e-6, atol=1e-8,
                            options=opts)
        return jnp.sum(ys * g_out)

    p = {"w1": W1, "b1": b1, "w2": W2}
    gf = jax.jit(jax.grad(lambda pp, yy: loss(pp, yy, True),
                          argnums=(0, 1)))(p, y0)
    gg = jax.jit(jax.grad(lambda pp, yy: loss(pp, yy, False),
                          argnums=(0, 1)))(p, y0)
    worst = 0.0
    for a, b in zip(jax.tree_util.tree_leaves(gf),
                    jax.tree_util.tree_leaves(gg)):
        d = float(jnp.max(jnp.abs(a - b)))
        m = float(jnp.max(jnp.abs(b))) + 1e-8
        worst = max(worst, d / m)
        print(f"  {a.shape}: rel {d/m:.2e}", flush=True)
        assert d / m < TOL["plan-adjoint"]
    print(f"  plan-adjoint worst rel: {worst:.2e}", flush=True)


phase("fixed-forward", p1)
phase("fixed-adjoint", p2)
phase("adams-abm", p3)
phase("vcabm", p4)
phase("hyper", p5)
phase("grid-adjoint-bigbatch", p6)
phase("plan-adjoint", p7)
print("SUMMARY:", results, flush=True)
if all(v == "PASS" for v in results.values()):
    print("ALL KERNELS VALIDATED ON CHIP", flush=True)
