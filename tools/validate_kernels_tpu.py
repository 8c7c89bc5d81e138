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
  8. mixed-precision ADAPTIVE tier (2-pass dots) vs HIGHEST on the same
     quantized-weight model (error estimate stays usable)
  9. per-lane ADJOINT training vs vmap-of-generic (exact per-sample
     oracle, incl. per-sample parameter cotangents)
 10. streamed bsum solves (batch-coupled past VMEM): bit-identical to
     the in-VMEM kernel, forward and training
 11. rank-3 pytree fused state parity vs the generic engine
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
    # Round-5 kernels. mixed-adaptive compares against HIGHEST run on
    # the SAME quantized weights (both sides integrate the bf16-weight
    # model; the gap is dot-split noise through the controller, measured
    # ~8e-6 on the CPU interpret battery, amplified on chip by each
    # side's own step sequence).
    "mixed-adaptive": 5e-3,
    "perlane-adjoint": 1e-5,      # measured 5.6e-7 compiled on chip
    "tree-rank3": 5e-5,           # measured 1.5e-5 flat-leaf analogue
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


def p8():
    # Mixed-precision ADAPTIVE tier: dopri5 with bf16-quantized weights x
    # hi/lo-split activations (2 systolic passes, f32 accumulation) must
    # track the HIGHEST solve of the SAME quantized-weight model to
    # ~dot-split accuracy — far inside the ~2e-3 weight-quantization gap
    # to the f32 model, proving the error estimate stayed usable.
    import dataclasses
    from tfdiffeq_tpu.fast import MLPSpec, solve_mlp_spec
    dims = (64, 128, 128, 64)
    ws = [(jnp.asarray(rng.randn(dims[i], dims[i + 1])
                       / np.sqrt(dims[i]), jnp.float32),
           jnp.zeros((dims[i + 1],), jnp.float32)) for i in range(3)]
    yw = jnp.asarray(rng.randn(256, 64) * 0.5, jnp.float32)
    tw = jnp.linspace(0.0, 2.0, 5, dtype=jnp.float32)
    spec = MLPSpec(activation="tanh", matmul="mxu")
    wq = [(W.astype(jnp.bfloat16).astype(jnp.float32), b) for W, b in ws]
    r_mx = solve_mlp_spec(dataclasses.replace(spec, dot_precision="mixed"),
                          ws, yw, tw, rtol=1e-6, atol=1e-6,
                          first_step=0.01)
    r_hq = solve_mlp_spec(spec, wq, yw, tw, rtol=1e-6, atol=1e-6,
                          first_step=0.01)
    d = float(jnp.max(jnp.abs(r_mx.ys - r_hq.ys)))
    nfe_m, nfe_h = int(r_mx.stats.nfe), int(r_hq.stats.nfe)
    print(f"  mixed vs highest-on-quantized: maxdiff {d:.2e} "
          f"nfe {nfe_m}/{nfe_h}", flush=True)
    assert d < TOL["mixed-adaptive"], d
    assert nfe_m <= 1.3 * nfe_h + 6, (nfe_m, nfe_h)  # estimate usable

    # Same tier through the PLAN path (arbitrary bridge-compiled
    # dynamics, options={'fuse': True, 'dot_precision': 'mixed'}).
    def dyn(tt, yy, w):
        h = yy
        for i, (W, b) in enumerate(w):
            h = h @ W + b
            if i < len(w) - 1:
                h = jnp.tanh(h)
        return h

    r_pm = solve(lambda tt, yy: dyn(tt, yy, ws), yw, tw,
                 rtol=1e-6, atol=1e-6,
                 options={"fuse": True, "dot_precision": "mixed",
                          "first_step": 0.01})
    r_pq = solve(lambda tt, yy: dyn(tt, yy, wq), yw, tw,
                 rtol=1e-6, atol=1e-6,
                 options={"fuse": True, "first_step": 0.01})
    d2 = float(jnp.max(jnp.abs(r_pm.ys - r_pq.ys)))
    print(f"  plan-mixed vs highest-on-quantized: maxdiff {d2:.2e} "
          f"nfe {int(r_pm.stats.nfe)}/{int(r_pq.stats.nfe)}", flush=True)
    assert d2 < TOL["mixed-adaptive"], d2


def p9():
    # Per-lane ADJOINT training: per-sample stepping both sweeps; grads
    # must match jax.vmap of the generic adjoint (the exact per-sample
    # oracle) on a stiffness-spread battery, incl. per-sample ('batch')
    # parameter cotangents.
    Bl = 256
    wl = jnp.asarray(rng.rand(Bl) * 31 + 1, jnp.float32)   # 32x spread
    yl = jnp.asarray(rng.randn(Bl, 2) + 2, jnp.float32)
    tl = jnp.linspace(0.0, 1.0, 5, dtype=jnp.float32)

    def dynl(tt, yy, ww):
        return -ww[:, None] * yy * 0.1 + 0.05 * jnp.tanh(yy)

    def loss_pl(ww, yy):
        ys = odeint_adjoint(dynl, yy, tl, params=ww, rtol=1e-5, atol=1e-7,
                            options={"fuse": True, "per_sample": True})
        return jnp.sum(ys ** 2)

    def one(ww, yy):
        ys = odeint_adjoint(
            lambda tt, y1, w1: -w1 * y1 * 0.1 + 0.05 * jnp.tanh(y1),
            yy, tl, params=ww, rtol=1e-5, atol=1e-7)
        return jnp.sum(ys ** 2)

    gf = jax.jit(jax.grad(loss_pl, argnums=(0, 1)))(wl, yl)
    go = jax.vmap(jax.grad(one, argnums=(0, 1)))(wl, yl)
    for a, b in zip(jax.tree_util.tree_leaves(gf),
                    jax.tree_util.tree_leaves(go)):
        d = float(jnp.max(jnp.abs(a - b)))
        m = float(jnp.max(jnp.abs(b))) + 1e-8
        print(f"  {a.shape}: rel {d/m:.2e}", flush=True)
        assert d / m < TOL["perlane-adjoint"]


def p10():
    # Streamed bsum solves (batch-coupled past the VMEM budget): one
    # controller + HBM-streamed trajectory must be BIT-identical to the
    # in-VMEM fused kernel, forward and training. Budget forced tiny so
    # the 256-lane problem takes the streamed path.
    import warnings
    import tfdiffeq_tpu.fast as fast

    def mf(tt, yy):
        return jnp.tanh(yy) - 0.5 * (yy - jnp.mean(yy, axis=0))

    def loss(w_, yy, fuse):
        def dyn(tt, y1, ww):
            return jnp.tanh(y1 @ ww) - 0.5 * (y1 - jnp.mean(y1, axis=0))
        ys = odeint_adjoint(dyn, yy, t, params=w_, rtol=1e-6, atol=1e-8,
                            options={"fuse": True} if fuse else None)
        return jnp.sum(ys ** 2)

    wmf = jnp.asarray(rng.randn(2, 2) * 0.3, jnp.float32)
    r_ref = solve(mf, y0, t, rtol=1e-6, atol=1e-8,
                  options={"fuse": True})
    g_ref = jax.jit(jax.grad(loss, argnums=(0, 1)),
                    static_argnums=2)(wmf, y0, True)
    old = fast._VMEM_BUDGET
    try:
        fast._VMEM_BUDGET = 10_000
        with warnings.catch_warnings():
            warnings.simplefilter("error")   # fallback warning = FAIL
            r_st = solve(mf, y0, t, rtol=1e-6, atol=1e-8,
                         options={"fuse": True})
            g_st = jax.jit(jax.grad(loss, argnums=(0, 1)),
                           static_argnums=2)(wmf, y0, True)
    finally:
        fast._VMEM_BUDGET = old
    d_f = float(jnp.max(jnp.abs(r_st.ys - r_ref.ys)))
    assert d_f == 0.0 and int(r_st.stats.nfe) == int(r_ref.stats.nfe), d_f
    for a, b in zip(jax.tree_util.tree_leaves(g_st),
                    jax.tree_util.tree_leaves(g_ref)):
        assert float(jnp.max(jnp.abs(a - b))) == 0.0
    print(f"  streamed forward+training bit-identical "
          f"(nfe {int(r_st.stats.nfe)})", flush=True)


def p11():
    # Rank-3 pytree {field [B,4,4], aux [B]} fused state with cross-leaf
    # coupling: on-chip parity vs the precision-pinned generic engine.
    import warnings
    yp = {"field": jnp.asarray(rng.randn(256, 4, 4), jnp.float32),
          "aux": jnp.asarray(rng.randn(256), jnp.float32)}

    def dynp(tt, yy):
        fld = yy["field"]
        df = -fld + 0.2 * jnp.tanh(fld) * yy["aux"][:, None, None]
        da = -0.1 * yy["aux"] + 0.01 * jnp.sum(fld * fld, axis=(1, 2))
        return {"field": df, "aux": da}

    with warnings.catch_warnings():
        warnings.simplefilter("error")       # fallback warning = FAIL
        rf = solve(dynp, yp, t, rtol=1e-6, atol=1e-8,
                   options={"fuse": True})
    rg = solve(dynp, yp, t, rtol=1e-6, atol=1e-8,
               options={"loop": "while"})
    worst = max(float(jnp.max(jnp.abs(rf.ys[k] - rg.ys[k]))) for k in yp)
    print(f"  rank-3 tree fused maxdiff {worst:.2e}", flush=True)
    assert worst < TOL["tree-rank3"], worst


phase("fixed-forward", p1)
phase("fixed-adjoint", p2)
phase("adams-abm", p3)
phase("vcabm", p4)
phase("hyper", p5)
phase("grid-adjoint-bigbatch", p6)
phase("plan-adjoint", p7)
phase("mixed-adaptive", p8)
phase("perlane-adjoint", p9)
phase("streamed-bsum", p10)
phase("tree-rank3", p11)
print("SUMMARY:", results, flush=True)
if all(v == "PASS" for v in results.values()):
    print("ALL KERNELS VALIDATED ON CHIP", flush=True)
