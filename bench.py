"""Benchmark harness.

Headline metric (BASELINE.md): dopri5 NFE/sec on the batched spiral neural
ODE, measured on whatever accelerator JAX sees (TPU v5e under the driver).

`vs_baseline` compares against a torch-eager dopri5 proxy run in-process on
CPU: the reference (tfdiffeq, TF eager) publishes no numbers and is not
installed here, so the proxy reproduces its architecture — host-side
accept/reject control flow, one kernel dispatch per tensor op — which is the
thing the TPU-native design eliminates. See BASELINE.md for the protocol.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", "details"}.
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

BATCH = 4096
T_OUT = 64
# Governs the bench protocol (BASELINE.md "Measurement protocol"): every
# BENCH_r*.json since round 1 was measured at 1e-6.
RTOL = ATOL = 1e-6
SPAN = 25.0


def _params(hidden=50, dim=2, seed=0):
    rng = np.random.RandomState(seed)
    return {
        "w1": jnp.asarray(rng.randn(dim, hidden) * 0.1, jnp.float32),
        "b1": jnp.zeros((hidden,), jnp.float32),
        "w2": jnp.asarray(rng.randn(hidden, dim) * 0.1, jnp.float32),
        "b2": jnp.zeros((dim,), jnp.float32),
    }


def _median_iqr(fn, k: int = 5):
    """Median and inter-quartile range of k timed calls (BASELINE.md: the
    tunnel makes single-run numbers weather; median-of-k plus spread is the
    quantity that survives round-over-round comparison)."""
    ts = []
    for _ in range(k):
        t0 = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - t0)
    ts.sort()
    n = len(ts)
    med = ts[n // 2] if n % 2 else 0.5 * (ts[n // 2 - 1] + ts[n // 2])
    q1 = ts[int(0.25 * (n - 1))]
    q3 = ts[min(n - 1, int(round(0.75 * (n - 1))))]
    return med, q3 - q1


def _bench_sustained(one, y0, reps: int, k: int = 5, chains: int = 2):
    """Sustained throughput of `one(y) -> (ys, nfe)` via chained solves.

    Times chains of several lengths inside single compiled programs
    (sequential data dependency so XLA cannot hoist), then regresses out
    the fixed per-dispatch latency: fit median_time = a + b*nfe by least
    squares over the chain lengths; the marginal cost per solver step is
    the slope b — the stable quantity on this testbed (BASELINE.md
    "variance caveat"). With chains>=3 the fit residual (max relative
    deviation of the fit from the measured medians) is reported so a
    fragile regression is visible in the record (round-4 verdict item 6).

    Returns (nfe_per_sec, marginal_us_per_step, median_s, iqr_s, nfe_full,
    fit_residual_pct).
    """
    def make_chain(n):
        @jax.jit
        def run(y0):
            def body(c, _):
                y, tot = c
                ys, nfe = one(y)
                # Real data dependency: each rep starts from the previous
                # endpoint (bounded dynamics keep the chain in
                # distribution).
                return (ys[-1], tot + nfe), None
            (_, tot), _ = jax.lax.scan(body, (y0, jnp.int32(0)), None,
                                       length=n)
            return tot
        return run

    if chains >= 3:
        lengths = [reps, max(reps // 2, 1), max(reps // 4, 1)]
    else:
        lengths = [reps, max(reps // 2, 1)]
    lengths = sorted(set(lengths), reverse=True)

    meds, nfes = [], []
    iqr_f = 0.0
    for i, n in enumerate(lengths):
        run = make_chain(n)
        nfes.append(int(run(y0)))     # also compiles
        med, iqr = _median_iqr(
            lambda run=run: jax.block_until_ready(run(y0)), k)
        meds.append(med)
        if i == 0:
            iqr_f = iqr
    med_f, nfe_full = meds[0], nfes[0]

    if len(lengths) >= 3:
        # Least-squares fit t = a + b*nfe over >=3 chain lengths.
        m = np.asarray(nfes, np.float64)
        tt = np.asarray(meds, np.float64)
        A = np.stack([np.ones_like(m), m], axis=1)
        (a, b), *_ = np.linalg.lstsq(A, tt, rcond=None)
        pred = a + b * m
        resid_pct = float(np.max(np.abs(pred - tt) / tt) * 100.0)
        marginal_us = float(b) * 1e6
    else:
        marginal_us = ((meds[0] - meds[1])
                       / max(nfes[0] - nfes[1], 1)) * 1e6
        resid_pct = None
    return (nfe_full / med_f, marginal_us, med_f, iqr_f, nfe_full,
            resid_pct)


def _spiral_dyn(p):
    def dyn(tt, yy):
        # HIGHEST matmul precision: TPU's default bf16 matmuls inject ~1e-3
        # relative noise into the error estimate, inflating step counts ~9x.
        h = jnp.tanh(jnp.dot(yy ** 3, p["w1"],
                             precision=jax.lax.Precision.HIGHEST) + p["b1"])
        return jnp.dot(h, p["w2"],
                       precision=jax.lax.Precision.HIGHEST) + p["b2"]
    return dyn


def bench_jax_nfe_per_sec(reps: int = 16):
    """Generic-path NFE/s (arbitrary user func, XLA while-loop).

    Sustained like the fused headline: `reps` chained solves inside one
    compiled program, so the testbed's fixed ~26 ms per-dispatch tunnel
    latency doesn't masquerade as solver cost; single-call latency is
    reported separately in details."""
    from tfdiffeq_tpu import solve

    p = _params()
    y0 = jnp.asarray(np.random.RandomState(1).randn(BATCH, 2) * 1.5,
                     jnp.float32)
    t = jnp.linspace(0.0, SPAN, T_OUT, dtype=jnp.float32)
    dyn = _spiral_dyn(p)

    def one(y):
        res = solve(dyn, y, t, rtol=RTOL, atol=ATOL, method="dopri5",
                    options={"loop": "while"})
        return res.ys, res.stats.nfe

    @jax.jit
    def run_single(y0):
        return one(y0)

    ys, nfe1 = run_single(y0)
    jax.block_until_ready(ys)
    best1, _ = _median_iqr(
        lambda: jax.block_until_ready(run_single(y0)[0]), 3)

    nfe_s, marginal_us, med, iqr, _, _ = _bench_sustained(
        one, y0, reps, k=5)
    return nfe_s, int(nfe1), best1, marginal_us, med, iqr


def bench_fused_auto_nfe_per_sec(reps: int = 64):
    """Auto-fused generic path: the SAME plain-jnp user function as
    `bench_jax_nfe_per_sec`, routed through the jaxpr->Pallas bridge
    (`options={'fuse': True}`) so the whole solve runs as one kernel —
    no MLPSpec, no hand-written kernel for these dynamics."""
    from tfdiffeq_tpu import solve

    p = _params()
    y0 = jnp.asarray(np.random.RandomState(1).randn(BATCH, 2) * 1.5,
                     jnp.float32)
    t = jnp.linspace(0.0, SPAN, T_OUT, dtype=jnp.float32)
    dyn = _spiral_dyn(p)

    def one(y):
        res = solve(dyn, y, t, rtol=RTOL, atol=ATOL, method="dopri5",
                    options={"fuse": True, "first_step": 0.01})
        return res.ys, res.stats.nfe

    nfe_s, marginal_us, med, iqr, _, _ = _bench_sustained(
        one, y0, reps, k=5)
    return nfe_s, marginal_us


def bench_fixed_rk4_nfe_per_sec(reps: int = 64):
    """Fixed-grid serving tier: rk4 on the benchmark spiral MLP at a step
    budget matched to the adaptive solve's typical accepted-step count,
    through the fixed whole-solve kernel (`ops/pallas_fixed.py`) — no
    controller, no rejected work, deterministic cost."""
    from tfdiffeq_tpu.fast import MLPSpec, solve_mlp_spec

    p = _params()
    weights = [(p["w1"], p["b1"]), (p["w2"], p["b2"])]
    spec = MLPSpec(activation="tanh", input_power=3)
    y0 = jnp.asarray(np.random.RandomState(1).randn(BATCH, 2) * 1.5,
                     jnp.float32)
    t = jnp.linspace(0.0, SPAN, T_OUT, dtype=jnp.float32)

    def one(y):
        res = solve_mlp_spec(spec, weights, y, t, method="rk4",
                             num_steps=512)
        return res.ys, res.stats.nfe

    nfe_s, marginal_us, med, iqr, _, _ = _bench_sustained(
        one, y0, reps, k=5)
    return nfe_s, marginal_us


def bench_adams_nfe_per_sec(reps: int = 8):
    """VCABM ('adams') sustained NFE/s on the batched spiral — the
    hardest solver in the registry (SURVEY.md §7 hard-part 2), previously
    unbenchmarked."""
    from tfdiffeq_tpu import solve

    p = _params()
    y0 = jnp.asarray(np.random.RandomState(1).randn(BATCH, 2) * 1.5,
                     jnp.float32)
    t = jnp.linspace(0.0, SPAN, T_OUT, dtype=jnp.float32)
    dyn = _spiral_dyn(p)

    def one(y):
        res = solve(dyn, y, t, rtol=RTOL, atol=ATOL, method="adams")
        return res.ys, res.stats.nfe

    nfe_s, marginal_us, med, iqr, _, _ = _bench_sustained(
        one, y0, reps, k=3)
    return nfe_s, marginal_us


def bench_adams_fused_nfe_per_sec(reps: int = 32):
    """VCABM through the whole-solve kernel (ops/pallas_vcabm): the full
    Shampine-Gordon order/step machinery in ONE launch."""
    from tfdiffeq_tpu import solve

    p = _params()
    y0 = jnp.asarray(np.random.RandomState(1).randn(BATCH, 2) * 1.5,
                     jnp.float32)
    t = jnp.linspace(0.0, SPAN, T_OUT, dtype=jnp.float32)
    dyn = _spiral_dyn(p)

    def one(y):
        res = solve(dyn, y, t, rtol=RTOL, atol=ATOL, method="adams",
                    options={"fuse": True, "first_step": 0.01})
        return res.ys, res.stats.nfe

    nfe_s, marginal_us, med, iqr, _, _ = _bench_sustained(
        one, y0, reps, k=5)
    return nfe_s, marginal_us


def bench_fused_nfe_per_sec(reps: int = 64):
    """Headline: sustained NFE/s of the whole-solve Pallas kernel.

    `reps` chained solves run inside ONE compiled program (sequential data
    dependency), amortizing this environment's fixed ~26 ms per-dispatch
    tunnel latency the way a production serving loop would; single-call
    latency is reported separately in details."""
    from tfdiffeq_tpu.fast import solve_mlp

    p = _params()
    y0 = jnp.asarray(np.random.RandomState(1).randn(BATCH, 2) * 1.5,
                     jnp.float32)
    t = jnp.linspace(0.0, SPAN, T_OUT, dtype=jnp.float32)

    def one(y):
        r = solve_mlp(p, y, t, rtol=RTOL, atol=ATOL, first_step=0.01)
        return r.ys, r.stats.nfe

    @jax.jit
    def run_single(y0):
        ys, nfe = one(y0)
        return ys, nfe

    ys, nfe1 = run_single(y0)
    jax.block_until_ready(ys)
    best1, _ = _median_iqr(
        lambda: jax.block_until_ready(run_single(y0)[0]), 5)

    nfe_s, marginal_us, med, iqr, _, resid = _bench_sustained(
        one, y0, reps, k=5, chains=3)
    return nfe_s, int(nfe1), best1, marginal_us, med, iqr, resid


def bench_wide_mlp_nfe_per_sec(reps: int = 128):
    """MXU-bound tier: a WIDE-state MLP neural ODE (128 -> 256 -> 256 ->
    128, every contraction dim >= 128 so the systolic array can actually
    fill) through the whole-solve kernel. This is the workload whose MFU
    is meaningful — the headline 2-D spiral is inherently VPU-bound
    (contraction dim 2 caps MXU utilization at 2/128).

    reps=128 (round-4 verdict item 6): chain compute must dominate the
    ~25 ms/dispatch tunnel floor for the marginal fit to be stable — at
    32 solves/chain the slope moved 2x between sessions (6.30 vs 12.95
    us/NFE); at 128/64/32 the fit residual lands ~1%.

    Returns (nfe_per_sec, marginal_us_per_step, mfu_details)."""
    from tfdiffeq_tpu.fast import MLPSpec, solve_mlp_spec
    from tfdiffeq_tpu.utils.flops import (mlp_flops_per_nfe,
                                          solver_overhead_flops_per_step)

    D, H, B = 128, 256, 1024
    rng = np.random.RandomState(0)
    weights = [
        (jnp.asarray(rng.randn(D, H) / np.sqrt(D), jnp.float32),
         jnp.zeros((H,), jnp.float32)),
        (jnp.asarray(rng.randn(H, H) / np.sqrt(H), jnp.float32),
         jnp.zeros((H,), jnp.float32)),
        (jnp.asarray(rng.randn(H, D) / np.sqrt(H), jnp.float32),
         jnp.zeros((D,), jnp.float32)),
    ]
    spec = MLPSpec(activation="tanh", matmul="auto")
    y0 = jnp.asarray(rng.randn(B, D) * 0.5, jnp.float32)
    t = jnp.linspace(0.0, 2.0, 8, dtype=jnp.float32)

    def one(y):
        r = solve_mlp_spec(spec, weights, y, t, rtol=RTOL, atol=ATOL,
                           first_step=0.01)
        return r.ys, r.stats.nfe

    nfe_s, marginal_us, med, iqr, nfe_full, resid = _bench_sustained(
        one, y0, reps, k=5, chains=3)
    fc = mlp_flops_per_nfe([(D, H), (H, H), (H, D)], B, matmul="auto")
    # Both numerators, explicitly (round-4 verdict item 6): sustained
    # embeds the ~26 ms/dispatch tunnel latency floor; marginal is the
    # kernel-speed number.
    det = {"sustained": fc.achieved(nfe_s),
           "marginal": fc.achieved(1e6 / marginal_us)
           if marginal_us > 0 else None,
           "nfe_per_solve": nfe_full // max(reps, 1),
           "marginal_fit_residual_pct":
               round(resid, 2) if resid is not None else None,
           "solver_overhead_vpu_flops_per_step":
               solver_overhead_flops_per_step(D, B)}
    return nfe_s, marginal_us, det


def _wide_weights():
    D, H = 128, 256
    rng = np.random.RandomState(0)
    return D, H, [
        (jnp.asarray(rng.randn(D, H) / np.sqrt(D), jnp.float32),
         jnp.zeros((H,), jnp.float32)),
        (jnp.asarray(rng.randn(H, H) / np.sqrt(H), jnp.float32),
         jnp.zeros((H,), jnp.float32)),
        (jnp.asarray(rng.randn(H, D) / np.sqrt(H), jnp.float32),
         jnp.zeros((D,), jnp.float32)),
    ]


def bench_bf16_serving(reps: int = 16):
    """bf16 single-pass MXU serving tier (`MLPSpec(dot_precision='bf16')`)
    vs the HIGHEST (3-pass) default: fixed-grid rk4 x 128 steps on the wide
    MLP — fixed-grid has no embedded error estimate for the bf16 noise to
    poison, so serving may trade ~3e-3 trajectory rel-err for one systolic
    pass per dot (measured 4.9x / 80% of the v5e bf16 peak, BASELINE.md
    round-4 table).

    Returns {precision: (marginal_us_per_nfe, mfu_details)}."""
    from tfdiffeq_tpu.fast import MLPSpec, solve_mlp_spec
    from tfdiffeq_tpu.utils.flops import mlp_flops_per_nfe

    D, H, weights = _wide_weights()
    B = 1024
    y0 = jnp.asarray(np.random.RandomState(1).randn(B, D) * 0.5,
                     jnp.float32)
    t = jnp.asarray([0.0, 2.0], jnp.float32)
    fc = mlp_flops_per_nfe([(D, H), (H, H), (H, D)], B, matmul="mxu")

    out = {}
    for prec in ("highest", "bf16"):
        spec = MLPSpec(activation="tanh", matmul="mxu", dot_precision=prec)

        def one(y, spec=spec):
            r = solve_mlp_spec(spec, weights, y, t, method="rk4",
                               num_steps=128)
            return r.ys * 0.5, r.stats.nfe

        nfe_s, marg_us, _, _, _, _ = _bench_sustained(
            one, y0, reps, k=5)
        det = fc.achieved(1e6 / marg_us if marg_us > 0 else nfe_s)
        out[prec] = (marg_us, det)
    return out


def bench_mixed_adaptive(reps: int = 128):
    """Mixed-precision ADAPTIVE MXU tier (round-4 verdict item 2):
    `MLPSpec(dot_precision='mixed')` — bf16 weights x hi/lo-split
    activations, TWO systolic passes per dot vs HIGHEST's three, with the
    embedded error estimate intact — on the wide-MLP dopri5 workload at
    the bench tolerances. Reports marginal us/NFE and NFE/solve for both
    tiers so NFE economics (nfe x passes) are auditable on the record.

    Returns {precision: (marginal_us, nfe_per_solve)}."""
    import dataclasses as _dc

    from tfdiffeq_tpu.fast import MLPSpec, solve_mlp_spec

    D, H, weights = _wide_weights()
    B = 1024
    y0 = jnp.asarray(np.random.RandomState(1).randn(B, D) * 0.5,
                     jnp.float32)
    t = jnp.linspace(0.0, 2.0, 8, dtype=jnp.float32)

    out = {}
    for prec in ("highest", "mixed"):
        spec = MLPSpec(activation="tanh", matmul="mxu",
                       dot_precision=prec)

        def one(y, spec=spec):
            r = solve_mlp_spec(spec, weights, y, t, rtol=RTOL, atol=ATOL,
                               first_step=0.01)
            return r.ys, r.stats.nfe

        nfe_s, marg_us, _, _, nfe_full, _ = _bench_sustained(
            one, y0, reps, k=5, chains=3)
        out[prec] = (marg_us, nfe_full // max(reps, 1))
    return out


def bench_per_lane(reps: int = 16):
    """Per-lane adaptive stepping (`options={'fuse': True, 'per_sample':
    True}`) vs jax.vmap of the generic engine (the semantic oracle path)
    on a B=4096 battery with a ~100x per-sample stiffness spread (the
    spiral dynamics time-rescaled per lane). Reported as marginal ns per
    LANE-NFE (sum of per-sample evals), chain-regressed like the headline.

    Returns (kernel_ns, vmap_ns, kernel_lane_nfe_per_solve)."""
    from tfdiffeq_tpu import solve

    B = 4096
    p = _params()
    base = _spiral_dyn(p)
    sc = jnp.asarray(np.logspace(0.0, 2.0, B), jnp.float32)
    y0 = jnp.asarray(np.random.RandomState(1).randn(B, 2) * 1.5,
                     jnp.float32)
    t = jnp.linspace(0.0, 2.0, 5, dtype=jnp.float32)

    def dyn(tt, yy):
        return sc[:, None] * base(tt, yy)

    def make_one(opts):
        def one(y):
            r = solve(dyn, y, t, rtol=RTOL, atol=ATOL, method="dopri5",
                      options=opts)
            # Renormalize so every chain link does the same work (the
            # fast lanes decay to ~0 over one solve; a data dependency on
            # ys keeps XLA from hoisting).
            y_next = y0 + 0.0 * r.ys[-1]
            total = jnp.sum(r.lane_stats.nfe).astype(jnp.int32)
            return y_next[None], total
        return one

    kern = make_one({"fuse": True, "per_sample": True})
    _, k_marg_us, _, _, k_nfe, _ = _bench_sustained(
        kern, y0, reps, k=5)

    # vmap oracle, written the way a user would (the generic
    # `options={'per_sample': True}` fallback cannot thread the
    # per-sample stiffness const through its closure): one generic solve
    # per sample under jax.vmap, XLA batches the while loop.
    def one_vmap(y):
        def single(yb, kb):
            res = solve(lambda tt, yy: kb * base(tt, yy), yb[None, :], t,
                        rtol=RTOL, atol=ATOL, method="dopri5",
                        options={"loop": "while"})
            return res.ys[:, 0], res.stats.nfe
        ys_b, nfe_b = jax.vmap(single)(y, sc)
        y_next = y0 + 0.0 * ys_b[:, -1]
        return y_next[None], jnp.sum(nfe_b).astype(jnp.int32)

    _, v_marg_us, _, _, _, _ = _bench_sustained(one_vmap, y0,
                                                max(reps // 2, 4), k=3)
    return k_marg_us * 1e3, v_marg_us * 1e3, k_nfe // reps


def bench_per_lane_training(reps: int = 8):
    """Per-lane TRAINING (round-5 two-pass per-lane adjoint kernel):
    `odeint_adjoint(options={'fuse': True, 'per_sample': True})` vs
    jax.vmap of the generic adjoint (the exact per-sample oracle) on the
    same stiffness battery. Marginal ms per TRAIN STEP (fwd+bwd),
    chain-regressed; lane counts are inside the step so the marginal is
    per optimization step at B=4096.

    Returns (kernel_ms_per_step, vmap_ms_per_step)."""
    from tfdiffeq_tpu import odeint_adjoint

    B = 4096
    p = _params()
    sc = jnp.asarray(np.logspace(0.0, 2.0, B), jnp.float32)
    y0 = jnp.asarray(np.random.RandomState(1).randn(B, 2) * 1.5,
                     jnp.float32)
    t = jnp.linspace(0.0, 2.0, 5, dtype=jnp.float32)
    W = (p["w1"], p["b1"], p["w2"])

    def dyn(tt, yy, pp):
        w1, b1, w2 = pp
        return sc[:, None] * (jnp.tanh((yy ** 3) @ w1 + b1) @ w2)

    def make_one(fuse):
        opts = ({"fuse": True, "per_sample": True} if fuse else None)

        def one(y):
            def loss(pp):
                if fuse:
                    ys = odeint_adjoint(dyn, y, t, params=pp, rtol=RTOL,
                                        atol=ATOL, options=opts)
                    return jnp.sum(ys ** 2)

                def single(yb, kb):
                    ys = odeint_adjoint(
                        lambda tt, yy, p2: kb * (jnp.tanh(
                            (yy ** 3) @ p2[0] + p2[1]) @ p2[2]),
                        yb[None, :], t, params=pp, rtol=RTOL, atol=ATOL)
                    return jnp.sum(ys ** 2)

                return jnp.sum(jax.vmap(single)(y, sc))
            g = jax.grad(loss)(W)
            # Chain links re-start from y0 + a data dependency on g.
            y_next = y0 + 0.0 * jnp.sum(g[0]) + 0.0 * y
            return y_next[None], jnp.int32(1)
        return one

    _, k_us, _, _, _, _ = _bench_sustained(make_one(True), y0, reps, k=3,
                                           chains=3)
    _, v_us, _, _, _, _ = _bench_sustained(make_one(False), y0,
                                           max(reps // 2, 3), k=3,
                                           chains=3)
    return k_us / 1e3, v_us / 1e3


def bench_meanfield_nfe_per_sec(reps: int = 16):
    """Batch-coupled (mean-field) dynamics — the class that fell back to
    the generic engine before round 4's `bsum` bridge op: the headline
    spiral MLP plus an attraction-to-the-batch-mean term, auto-fused at
    B=4096 vs the generic while-loop on the same dynamics. T=16 output
    times: batch-coupled plans run unpacked single-block (a group- or
    block-local sum would silently differ from the global one), so the
    headline T=64 trajectory buffer would not fit the kernel's VMEM
    budget at this batch.

    Returns (fused_nfe_per_sec, fused_marginal_us, generic_nfe_per_sec)."""
    from tfdiffeq_tpu import solve

    p = _params()
    base = _spiral_dyn(p)
    y0 = jnp.asarray(np.random.RandomState(1).randn(BATCH, 2) * 1.5,
                     jnp.float32)
    t = jnp.linspace(0.0, SPAN, 16, dtype=jnp.float32)

    def dyn(tt, yy):
        m = jnp.mean(yy, axis=0)        # cross-sample coupling (bsum)
        return base(tt, yy) - 0.1 * (yy - m)

    def make_one(opts):
        def one(y):
            r = solve(dyn, y, t, rtol=RTOL, atol=ATOL, method="dopri5",
                      options=opts)
            return r.ys, r.stats.nfe
        return one

    f_nfe_s, f_marg_us, _, _, _, _ = _bench_sustained(
        make_one({"fuse": True}), y0, reps, k=5)
    g_nfe_s, _, _, _, _, _ = _bench_sustained(
        make_one({"loop": "while"}), y0, max(reps // 2, 4), k=3)

    # Round-4 verdict item 7: B=131072 puts the [T, D, B] trajectory
    # past the VMEM budget; a bsum cannot grid-block (per-block
    # controllers = a different ODE), so the kernel keeps ONE controller
    # and STREAMS rows through HBM (whole_solve_call stream_out). Short
    # horizon (fewer output times) keeps this a marginal-cost row.
    try:
        y0_big = jnp.asarray(
            np.random.RandomState(2).randn(131072, 2) * 1.5, jnp.float32)
        t_big = jnp.linspace(0.0, SPAN / 4, 16, dtype=jnp.float32)

        def one_big(y):
            r = solve(dyn, y, t_big, rtol=RTOL, atol=ATOL,
                      method="dopri5", options={"fuse": True})
            return r.ys, r.stats.nfe

        _, big_marg_us, _, _, _, _ = _bench_sustained(
            one_big, y0_big, 8, k=3, chains=3)
    except Exception:
        big_marg_us = None
    return f_nfe_s, f_marg_us, g_nfe_s, big_marg_us


def bench_doublefloat():
    """The double-float accuracy tier ON the bench record (round-3 verdict
    item 3c): `solve_df` at rtol 1e-10 / atol 1e-12 on the north-star
    protocol (dopri5 batched spiral, span 25, B=32, 64 output times),
    trajectory error vs an in-process CPU float64 oracle.

    Returns (max_abs_err_vs_f64, nfe, seconds_per_solve, nfe_per_sec)."""
    from tfdiffeq_tpu import solve, solve_df

    B = 32
    A32 = jnp.asarray([[-0.1, 2.0], [-2.0, -0.1]], jnp.float32)
    y0 = jnp.asarray(np.random.RandomState(1).randn(B, 2) * 1.5,
                     jnp.float32)
    t = jnp.linspace(0.0, SPAN, T_OUT, dtype=jnp.float32)

    def dyn(tt, yy):
        return jnp.dot(yy ** 3, A32, precision=jax.lax.Precision.HIGHEST)

    run = jax.jit(lambda y: solve_df(dyn, y, t, rtol=1e-10, atol=1e-12))
    res = run(y0)
    jax.block_until_ready(res.ys)
    med, _ = _median_iqr(lambda: jax.block_until_ready(run(y0).ys), 3)
    nfe = int(res.stats.nfe)

    # f64 oracle on the host CPU (the chip has no f64 ALU; x64 scoped to
    # this trace only).
    cpu = jax.devices("cpu")[0]
    with jax.enable_x64(), jax.default_device(cpu):
        A64 = jnp.asarray(np.asarray(A32), jnp.float64)
        ref = solve(lambda tt, yy: (yy ** 3) @ A64,
                    jnp.asarray(np.asarray(y0), jnp.float64),
                    jnp.asarray(np.asarray(t), jnp.float64),
                    rtol=1e-12, atol=1e-14,
                    options={"loop": "while"}).ys
    err = float(np.max(np.abs(np.asarray(res.ys, np.float64)
                              - np.asarray(ref))))
    return err, nfe, med, nfe / med


def bench_torch_proxy_nfe_per_sec():
    """Minimal torch-eager dopri5 (reference-architecture proxy, CPU)."""
    import torch

    torch.set_num_threads(max(1, torch.get_num_threads()))
    rng = np.random.RandomState(0)
    w1 = torch.tensor(rng.randn(2, 50) * 0.1, dtype=torch.float32)
    b1 = torch.zeros(50)
    w2 = torch.tensor(rng.randn(50, 2) * 0.1, dtype=torch.float32)
    b2 = torch.zeros(2)
    y0 = torch.tensor(np.random.RandomState(1).randn(BATCH, 2) * 1.5,
                      dtype=torch.float32)

    C = [1 / 5, 3 / 10, 4 / 5, 8 / 9, 1.0, 1.0]
    A = [
        [1 / 5],
        [3 / 40, 9 / 40],
        [44 / 45, -56 / 15, 32 / 9],
        [19372 / 6561, -25360 / 2187, 64448 / 6561, -212 / 729],
        [9017 / 3168, -355 / 33, 46732 / 5247, 49 / 176, -5103 / 18656],
        [35 / 384, 0.0, 500 / 1113, 125 / 192, -2187 / 6784, 11 / 84],
    ]
    B = [35 / 384, 0.0, 500 / 1113, 125 / 192, -2187 / 6784, 11 / 84, 0.0]
    BH = [5179 / 57600, 0.0, 7571 / 16695, 393 / 640, -92097 / 339200,
          187 / 2100, 1 / 40]
    E = [b - bh for b, bh in zip(B, BH)]

    nfe = [0]

    def f(t, y):
        nfe[0] += 1
        return torch.tanh((y ** 3) @ w1 + b1) @ w2 + b2

    def step(t, y, f0, dt):
        k = [f0]
        for i in range(6):
            yi = y
            for a, kk in zip(A[i], k):
                if a != 0.0:
                    yi = yi + dt * a * kk
            k.append(f(t + C[i] * dt, yi))
        y1 = y
        for b, kk in zip(B, k):
            if b != 0.0:
                y1 = y1 + dt * b * kk
        err = None
        for e, kk in zip(E, k):
            if e != 0.0:
                err = dt * e * kk if err is None else err + dt * e * kk
        return y1, k[-1], err

    t_end = SPAN
    start = time.perf_counter()
    budget = 20.0                     # cap proxy wall-clock
    t, y = 0.0, y0.clone()
    f0 = f(t, y)
    dt = 0.01
    n_acc = 0
    while t < t_end and (time.perf_counter() - start) < budget:
        dt = min(dt, t_end - t)
        y1, f1, err = step(t, y, f0, dt)
        scale = ATOL + RTOL * torch.maximum(y.abs(), y1.abs())
        ratio = float(torch.sqrt(torch.mean((err / scale) ** 2)))
        if ratio <= 1.0:
            t, y, f0 = t + dt, y1, f1
            n_acc += 1
            dt = dt * min(10.0, max(1.0, 0.9 * ratio ** -0.2))
        else:
            dt = dt * max(0.2, min(1.0, 0.9 * ratio ** -0.2))
    elapsed = time.perf_counter() - start
    frac = t / t_end
    return nfe[0] / elapsed, nfe[0], elapsed, frac


def bench_latent_ode_iter_ms(fused: bool, iters: int = 40):
    """Sustained latent-ODE training-iteration wall-clock (pipelined: no
    per-iteration host sync, the way a real epoch runs — per-dispatch
    tunnel latency overlaps via async dispatch).

    fused=True decodes through the fully-fused Pallas path (whole-solve
    forward kernel + one-kernel adjoint sweep, fast.odeint_adjoint_mlp);
    fused=False is the generic differentiable bounded loop.
    """
    import os
    import sys
    sys.path.insert(0, os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "examples"))
    import optax
    from latent_ode import (TrainState, build_model, generate_spirals,
                            init_params, make_train_step, parse_args)

    args = parse_args(["--fused"] if fused else [])
    args.nspiral, args.nsample = 512, 64
    _, samp_trajs, _, samp_ts = generate_spirals(
        nspiral=args.nspiral, nsample=args.nsample, seed=0)
    xs = jnp.asarray(samp_trajs, jnp.float32)
    samp_ts = jnp.asarray(samp_ts, jnp.float32)

    rec, dyn, dec = build_model(args)
    key = jax.random.PRNGKey(0)
    params = init_params(args, rec, dyn, dec, key)
    opt = optax.adam(args.lr)
    state = TrainState(params, opt.init(params))
    train_step, _ = make_train_step(args, rec, dyn, dec, opt, samp_ts)

    state, loss = train_step(state, xs, key)   # compile
    jax.block_until_ready(loss)
    t0 = time.perf_counter()
    for i in range(iters):
        state, loss = train_step(state, xs, jax.random.fold_in(key, i))
    jax.block_until_ready(loss)
    return (time.perf_counter() - t0) / iters * 1000.0


def bench_conv_ode_us_per_sample(iters: int = 10):
    """Fused conv-ODE tier (MNIST ODEBlock dynamics, 7x7x64, B=16 native
    block) vs the generic NHWC engine at the same batch: sustained
    us/sample over 8 chained solves per dispatch."""
    import numpy as np

    from tfdiffeq_tpu import solve
    from tfdiffeq_tpu.fast import solve_conv_ode
    from tfdiffeq_tpu.models.odenet import ODEConvFunc

    mod = ODEConvFunc(features=64, groups=32)
    x = jnp.asarray(np.random.RandomState(0).randn(16, 7, 7, 64) * 0.5,
                    jnp.float32)
    vs = mod.init(jax.random.PRNGKey(0), 0.0, x)
    t = jnp.asarray([0.0, 1.0], jnp.float32)

    def chain(step):
        @jax.jit
        def run(x):
            y = x
            for _ in range(8):
                y = step(y)[-1] * 0.98
            return y

        y = run(x)
        y.block_until_ready()
        t0 = time.perf_counter()
        for _ in range(iters):
            y = run(x)
        y.block_until_ready()
        return (time.perf_counter() - t0) / iters / 8 * 1e6 / x.shape[0]

    fused_us = chain(lambda y: solve_conv_ode(
        vs, y, t, rtol=1e-3, atol=1e-3).ys)
    gen_us = chain(lambda y: solve(
        lambda tt, yy: mod.apply(vs, tt, yy), y, t, rtol=1e-3, atol=1e-3,
        method="dopri5", options={"loop": "while"}).ys)
    return fused_us, gen_us


def bench_fused_train_nfe_per_sec(iters: int = 20):
    """Training-step NFE/s on the fused adjoint path (BASELINE.json config
    3: spiral neural-ODE training with O(1)-memory gradients): full SGD
    steps through fast.odeint_adjoint_mlp (one forward kernel + one
    adjoint-sweep kernel), pipelined. NFE per iteration = forward +
    backward solver evaluations (read from the kernels' on-device stats).
    """
    from tfdiffeq_tpu.fast import (MLPSpec, odeint_adjoint_mlp,
                                   solve_mlp_spec)
    from tfdiffeq_tpu.ops.pallas_adjoint import mlp_adjoint_solve
    from tfdiffeq_tpu.ops.pallas_kernels import pad_mlp_weights

    p = _params()
    spec = MLPSpec(activation="tanh", input_power=3)
    weights = ((p["w1"], p["b1"]), (p["w2"], p["b2"]))
    y0 = jnp.asarray(np.random.RandomState(1).randn(BATCH, 2) * 1.5,
                     jnp.float32)
    t = jnp.linspace(0.0, SPAN, T_OUT, dtype=jnp.float32)
    target = jnp.asarray(
        np.random.RandomState(2).randn(T_OUT, BATCH, 2) * 0.5, jnp.float32)
    lr = 1e-3

    @jax.jit
    def train_step(w):
        def loss(w_):
            ys = odeint_adjoint_mlp(spec, w_, y0, t, rtol=RTOL, atol=ATOL)
            return jnp.mean((ys - target) ** 2)

        g = jax.grad(loss)(w)
        return jax.tree_util.tree_map(lambda a, b: a - lr * b, w, g)

    # NFE accounting from on-device stats (one eager fwd + one direct
    # adjoint-kernel call; the timed loop runs the identical kernels).
    fwd = solve_mlp_spec(spec, weights, y0, t, rtol=RTOL, atol=ATOL)
    g_cot = 2.0 * (fwd.ys - target) / target.size
    warrays, dims = pad_mlp_weights(weights, jnp.float32)
    _, _, _, bstats = mlp_adjoint_solve(
        warrays, dims, jnp.transpose(fwd.ys, (0, 2, 1)),
        jnp.transpose(g_cot, (0, 2, 1)), t,
        0.1 * jnp.abs(t[-1] - t[-2]), RTOL, ATOL, 1.0,
        activation="tanh", input_power=3)
    nfe_iter = int(fwd.stats.nfe) + int(bstats[0])

    w = train_step(weights)
    jax.block_until_ready(w)
    t0 = time.perf_counter()
    for _ in range(iters):
        w = train_step(w)
    jax.block_until_ready(w)
    elapsed = time.perf_counter() - t0
    return nfe_iter * iters / elapsed, nfe_iter, elapsed / iters


def bench_auto_train_nfe_per_sec(iters: int = 20):
    """Training-step NFE/s through the PLAN-DRIVEN two-kernel adjoint
    (`fast.odeint_adjoint_fused`): the same spiral neural-ODE training as
    `bench_fused_train_nfe_per_sec`, but the dynamics are plain jnp code
    the library has never seen — no MLPSpec, no hand-written kernel.
    Measures what an arbitrary user's training step costs on the fused
    tier."""
    from tfdiffeq_tpu.fast import odeint_adjoint_fused
    from tfdiffeq_tpu.ops import jaxpr_bridge as jb
    from tfdiffeq_tpu.ops.pallas_kernels import _LANE, _round_up
    from tfdiffeq_tpu.ops.plan_adjoint import plan_adjoint_solve

    p = _params()
    y0 = jnp.asarray(np.random.RandomState(1).randn(BATCH, 2) * 1.5,
                     jnp.float32)
    t = jnp.linspace(0.0, SPAN, T_OUT, dtype=jnp.float32)
    target = jnp.asarray(
        np.random.RandomState(2).randn(T_OUT, BATCH, 2) * 0.5, jnp.float32)
    lr = 1e-3

    def dyn(tt, yy, w):
        return jnp.tanh((yy ** 3) @ w["w1"] + w["b1"]) @ w["w2"] + w["b2"]

    @jax.jit
    def train_step(w):
        def loss(w_):
            ys = odeint_adjoint_fused(dyn, y0, t, params=w_, rtol=RTOL,
                                      atol=ATOL)
            return jnp.mean((ys - target) ** 2)

        g = jax.grad(loss)(w)
        return jax.tree_util.tree_map(lambda a, b: a - lr * b, w, g)

    # Exact NFE/iter from on-device stats: one eager forward
    # (return_stats) + one direct adjoint-sweep kernel call; the timed
    # loop runs the identical kernels.
    ys, fstats = odeint_adjoint_fused(dyn, y0, t, params=p, rtol=RTOL,
                                      atol=ATOL, return_stats=True)
    g_cot = 2.0 * (ys - target) / target.size
    plan, consts = jb.build_plan(lambda tt, yy: dyn(tt, yy, p), t[0], y0,
                                 matmul="auto")
    BP = _round_up(max(BATCH, _LANE), _LANE)
    packed = tuple(jb.pack_consts(plan, consts, jnp.float32, BP))
    _, _, _, bstats = plan_adjoint_solve(
        plan, packed, jnp.transpose(ys, (0, 2, 1)),
        jnp.transpose(g_cot, (0, 2, 1)), t,
        0.1 * jnp.abs(t[-1] - t[-2]), RTOL, ATOL, 1.0)
    nfe_iter = int(fstats.nfe) + int(bstats[0])

    w = train_step(p)
    jax.block_until_ready(w)
    t0 = time.perf_counter()
    for _ in range(iters):
        w = train_step(w)
    jax.block_until_ready(w)
    elapsed = time.perf_counter() - t0
    return nfe_iter * iters / elapsed, nfe_iter, elapsed / iters


def batch_sweep():
    """BASELINE.md protocol: sustained fused NFE/s swept over batch sizes.

    Runs by default (budget-capped at reps=32 per size); the B=4096 point
    reuses the headline measurement, so the sweep adds two compiles."""
    global BATCH
    out = {}
    for b in (1, 256, 4096):
        saved, BATCH = BATCH, b
        try:
            nfe_s = bench_fused_nfe_per_sec(reps=32)[0]
            out[b] = round(nfe_s, 1)
        except Exception:
            out[b] = None
        finally:
            BATCH = saved
    return out


def main():
    import sys
    (fused_nfe_s, fused_nfe1, fused_t1, fused_marg_us, fused_med,
     fused_iqr, fused_resid) = bench_fused_nfe_per_sec()
    try:
        (gen_nfe_s, gen_nfe, gen_time, gen_marg_us, _gen_med,
         _gen_iqr) = bench_jax_nfe_per_sec()
    except Exception:
        gen_nfe_s = gen_nfe = gen_time = gen_marg_us = None
    try:
        auto_nfe_s, auto_marg_us = bench_fused_auto_nfe_per_sec()
    except Exception:
        auto_nfe_s = auto_marg_us = None
    try:
        adams_nfe_s, adams_marg_us = bench_adams_nfe_per_sec()
    except Exception:
        adams_nfe_s = adams_marg_us = None
    try:
        rk4_nfe_s, rk4_marg_us = bench_fixed_rk4_nfe_per_sec()
    except Exception:
        rk4_nfe_s = rk4_marg_us = None
    try:
        adams_f_nfe_s, adams_f_marg_us = bench_adams_fused_nfe_per_sec()
    except Exception:
        adams_f_nfe_s = adams_f_marg_us = None
    try:
        torch_nfe_s, _, _, frac = bench_torch_proxy_nfe_per_sec()
        vs = fused_nfe_s / torch_nfe_s
    except Exception:
        torch_nfe_s, vs = None, None
    try:
        latent_ms = bench_latent_ode_iter_ms(fused=False)
    except Exception:
        latent_ms = None
    try:
        latent_fused_ms = bench_latent_ode_iter_ms(fused=True)
    except Exception:
        latent_fused_ms = None
    try:
        train_nfe_s, train_nfe_iter, train_iter_s = \
            bench_fused_train_nfe_per_sec()
    except Exception:
        train_nfe_s = train_nfe_iter = train_iter_s = None
    try:
        auto_train_nfe_s, auto_train_nfe_iter, auto_train_iter_s = \
            bench_auto_train_nfe_per_sec()
    except Exception:
        auto_train_nfe_s = auto_train_nfe_iter = auto_train_iter_s = None
    try:
        conv_fused_us, conv_gen_us = (
            (None, None) if "--no-conv" in sys.argv
            else bench_conv_ode_us_per_sample())
    except Exception:
        conv_fused_us = conv_gen_us = None
    try:
        wide_nfe_s, wide_marg_us, wide_mfu = bench_wide_mlp_nfe_per_sec()
    except Exception:
        wide_nfe_s = wide_marg_us = wide_mfu = None
    try:
        bf16_tiers = bench_bf16_serving()
    except Exception:
        bf16_tiers = None
    try:
        mixed_tiers = bench_mixed_adaptive()
    except Exception:
        mixed_tiers = None
    try:
        pl_kern_ns, pl_vmap_ns, pl_lane_nfe = bench_per_lane()
    except Exception:
        pl_kern_ns = pl_vmap_ns = pl_lane_nfe = None
    try:
        plt_kern_ms, plt_vmap_ms = bench_per_lane_training()
    except Exception:
        plt_kern_ms = plt_vmap_ms = None
    try:
        df_err, df_nfe, df_sec, df_nfe_s = bench_doublefloat()
    except Exception:
        df_err = df_nfe = df_sec = df_nfe_s = None
    try:
        mf_nfe_s, mf_marg_us, mf_gen_nfe_s, mf_big_marg_us = \
            bench_meanfield_nfe_per_sec()
    except Exception:
        mf_nfe_s = mf_marg_us = mf_gen_nfe_s = mf_big_marg_us = None

    # FLOPs/MFU accounting (tfdiffeq_tpu/utils/flops.py): achieved FLOP/s
    # and fraction-of-peak for each workload at its measured throughput.
    # The headline 2-D spiral routes every layer to the VPU (contraction
    # dim 2), so its mxu fields are honestly zero — the wide-MLP tier is
    # the MXU-meaningful number.
    from tfdiffeq_tpu.utils.flops import (conv_ode_flops_per_nfe,
                                          mlp_flops_per_nfe)
    mfu = {}
    try:
        head_fc = mlp_flops_per_nfe([(2, 50), (50, 2)], BATCH,
                                    input_power=3, matmul="auto")
        # Both numerators (round-4 verdict item 6): sustained embeds the
        # ~26 ms/dispatch tunnel floor, marginal is the kernel number.
        mfu["headline_mlp_b4096"] = {
            "sustained": head_fc.achieved(fused_nfe_s),
            "marginal": head_fc.achieved(1e6 / fused_marg_us)
            if fused_marg_us > 0 else None,
        }
        if wide_mfu is not None:
            mfu["wide_mlp_128_256_256_128_b1024"] = wide_mfu
        if conv_fused_us:
            # One B=16 solve at rtol 1e-3 does 26 NFE (measured, stable
            # since round 2); us/sample -> solve seconds -> NFE/s. The
            # 8-solve chain already amortizes dispatch, so this is the
            # sustained numerator.
            conv_nfe_s = 26.0 / (16 * conv_fused_us * 1e-6)
            mfu["conv_ode_7x7x64_b16"] = {
                "sustained": conv_ode_flops_per_nfe(
                    7, 7, 64, 16).achieved(conv_nfe_s)}
    except Exception:
        pass

    # Headline value = chain-regressed MARGINAL throughput (1e6/us-per-
    # step): the quantity that is stable across sessions (BASELINE.md
    # variance caveat; sustained numbers swing +-40% with tunnel weather
    # and live in details.fused_sustained_nfe_per_sec).
    marginal_nfe_s = 1e6 / fused_marg_us if fused_marg_us > 0 else fused_nfe_s
    vs_marg = (marginal_nfe_s / torch_nfe_s) if torch_nfe_s else None

    details = {
        "batch": BATCH,
        "mode": "fused whole-solve Pallas kernel; value = chain-"
                "regressed marginal NFE/s (stable metric, BASELINE.md"
                " protocol note); sustained in fused_sustained_nfe_per_sec",
        "fused_sustained_nfe_per_sec": round(fused_nfe_s, 1),
        "vs_baseline_sustained": round(vs, 2) if vs else None,
        "fused_single_solve_nfe": fused_nfe1,
        "fused_single_solve_ms": round(fused_t1 * 1000, 2),
        "fused_chain_median_s": round(fused_med, 4),
        "fused_chain_iqr_s": round(fused_iqr, 4),
        "fused_marginal_us_per_step": round(fused_marg_us, 3),
        "fused_marginal_fit_residual_pct":
            round(fused_resid, 2) if fused_resid is not None else None,
        "generic_path_nfe_per_sec":
            round(gen_nfe_s, 1) if gen_nfe_s else None,
        "generic_single_solve_ms":
            round(gen_time * 1000, 2) if gen_time else None,
        "generic_marginal_us_per_step":
            round(gen_marg_us, 3) if gen_marg_us else None,
        "generic_path_fused_auto_nfe_per_sec":
            round(auto_nfe_s, 1) if auto_nfe_s else None,
        "generic_path_fused_auto_marginal_us_per_step":
            round(auto_marg_us, 3) if auto_marg_us else None,
        "adams_vcabm_nfe_per_sec":
            round(adams_nfe_s, 1) if adams_nfe_s else None,
        "adams_vcabm_marginal_us_per_step":
            round(adams_marg_us, 3) if adams_marg_us else None,
        "fixed_rk4_nfe_per_sec":
            round(rk4_nfe_s, 1) if rk4_nfe_s else None,
        "fixed_rk4_marginal_us_per_step":
            round(rk4_marg_us, 3) if rk4_marg_us else None,
        "adams_vcabm_fused_nfe_per_sec":
            round(adams_f_nfe_s, 1) if adams_f_nfe_s else None,
        "adams_vcabm_fused_marginal_us_per_step":
            round(adams_f_marg_us, 3) if adams_f_marg_us else None,
        "torch_eager_cpu_proxy_nfe_per_sec":
            round(torch_nfe_s, 1) if torch_nfe_s else None,
        "latent_ode_train_iter_ms":
            round(latent_ms, 2) if latent_ms else None,
        "latent_ode_train_iter_ms_fused":
            round(latent_fused_ms, 2) if latent_fused_ms else None,
        "train_step_nfe_per_sec_fused_adjoint":
            round(train_nfe_s, 1) if train_nfe_s else None,
        "train_step_nfe_per_iter": train_nfe_iter,
        "train_step_iter_ms":
            round(train_iter_s * 1000, 2) if train_iter_s else None,
        "auto_train_step_nfe_per_sec_two_kernel":
            round(auto_train_nfe_s, 1) if auto_train_nfe_s else None,
        "auto_train_step_nfe_per_iter": auto_train_nfe_iter,
        "auto_train_step_iter_ms":
            round(auto_train_iter_s * 1000, 2) if auto_train_iter_s
            else None,
        "conv_ode_us_per_sample_fused":
            round(conv_fused_us, 1) if conv_fused_us else None,
        "conv_ode_us_per_sample_generic":
            round(conv_gen_us, 1) if conv_gen_us else None,
        "wide_mlp_mxu_nfe_per_sec":
            round(wide_nfe_s, 1) if wide_nfe_s else None,
        "wide_mlp_mxu_marginal_us_per_step":
            round(wide_marg_us, 3) if wide_marg_us else None,
        "flops_mfu": mfu or None,
        "bf16_serving_marginal_us_per_nfe":
            round(bf16_tiers["bf16"][0], 3) if bf16_tiers else None,
        "bf16_serving_vs_highest":
            round(bf16_tiers["highest"][0] / bf16_tiers["bf16"][0], 2)
            if bf16_tiers else None,
        "bf16_serving_mfu_bf16_pct":
            bf16_tiers["bf16"][1]["mfu_mxu_bf16_pct"]
            if bf16_tiers else None,
        "mixed_adaptive_marginal_us_per_nfe":
            round(mixed_tiers["mixed"][0], 3) if mixed_tiers else None,
        "mixed_adaptive_highest_marginal_us_per_nfe":
            round(mixed_tiers["highest"][0], 3) if mixed_tiers else None,
        "mixed_adaptive_nfe_per_solve":
            mixed_tiers["mixed"][1] if mixed_tiers else None,
        "mixed_adaptive_highest_nfe_per_solve":
            mixed_tiers["highest"][1] if mixed_tiers else None,
        "mixed_adaptive_vs_highest":
            round(mixed_tiers["highest"][0] / mixed_tiers["mixed"][0], 2)
            if mixed_tiers and mixed_tiers["mixed"][0] else None,
        "per_lane_kernel_ns_per_lane_nfe":
            round(pl_kern_ns, 3) if pl_kern_ns else None,
        "per_lane_vmap_generic_ns_per_lane_nfe":
            round(pl_vmap_ns, 3) if pl_vmap_ns else None,
        "per_lane_vs_vmap":
            round(pl_vmap_ns / pl_kern_ns, 2)
            if pl_kern_ns and pl_vmap_ns else None,
        "per_lane_lane_nfe_per_solve": pl_lane_nfe,
        "per_lane_train_marginal_ms_per_step":
            round(plt_kern_ms, 3) if plt_kern_ms else None,
        "per_lane_train_vmap_marginal_ms_per_step":
            round(plt_vmap_ms, 3) if plt_vmap_ms else None,
        "per_lane_train_vs_vmap":
            round(plt_vmap_ms / plt_kern_ms, 2)
            if plt_kern_ms and plt_vmap_ms else None,
        "df_traj_err_vs_f64":
            float(f"{df_err:.3g}") if df_err is not None else None,
        "df_nfe": df_nfe,
        "df_seconds_per_solve": round(df_sec, 3) if df_sec else None,
        "df_nfe_per_sec": round(df_nfe_s, 1) if df_nfe_s else None,
        "meanfield_fused_nfe_per_sec":
            round(mf_nfe_s, 1) if mf_nfe_s else None,
        "meanfield_fused_marginal_us_per_step":
            round(mf_marg_us, 3) if mf_marg_us else None,
        "meanfield_generic_nfe_per_sec":
            round(mf_gen_nfe_s, 1) if mf_gen_nfe_s else None,
        "meanfield_streamed_b131072_marginal_us_per_step":
            round(mf_big_marg_us, 3) if mf_big_marg_us else None,
        "batch_sweep_nfe_per_sec":
            None if "--no-sweep" in sys.argv else batch_sweep(),
        "device": str(jax.devices()[0]),
    }

    # --- Output protocol (round-4 verdict item 1) ---------------------
    # The driver records only the LAST 2000 chars of stdout and parses the
    # final line as JSON; round 4's single fat line outgrew that window
    # and the round scored blank. So: full details go FIRST (their own
    # line + BENCH_DETAILS.json on disk), and stdout ENDS with a compact
    # (<1500 char) headline line that always survives the tail capture.
    full_record = {
        "metric": "dopri5_nfe_per_sec_batched_spiral",
        "value": round(marginal_nfe_s, 1),
        "unit": "nfe/s",
        "vs_baseline": round(vs_marg, 2) if vs_marg else None,
        "details": details,
    }
    details_line = json.dumps({"bench_details": full_record})
    print(details_line)
    try:
        import os
        with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                               "BENCH_DETAILS.json"), "w") as fh:
            fh.write(details_line + "\n")
    except OSError:
        pass

    wide_marg_nfe = wide_mfu if isinstance(wide_mfu, dict) else None
    compact = {
        "metric": "dopri5_nfe_per_sec_batched_spiral",
        "value": round(marginal_nfe_s, 1),
        "unit": "nfe/s",
        "vs_baseline": round(vs_marg, 2) if vs_marg else None,
        "details": {
            "headline": "chain-regressed marginal NFE/s, fused whole-solve"
                        " Pallas kernel, B=4096; full record on the"
                        " bench_details line above + BENCH_DETAILS.json",
            "fused_marginal_us_per_step": round(fused_marg_us, 3),
            "fused_sustained_nfe_per_sec": round(fused_nfe_s, 1),
            "fused_marginal_fit_residual_pct":
                round(fused_resid, 2) if fused_resid is not None else None,
            "wide_mlp_marginal_us_per_step":
                round(wide_marg_us, 3) if wide_marg_us else None,
            "wide_mlp_nfe_per_solve":
                wide_marg_nfe.get("nfe_per_solve") if wide_marg_nfe
                else None,
            "wide_mlp_mfu_mxu_f32_pct_marginal":
                (wide_marg_nfe.get("marginal") or {}).get("mfu_mxu_f32_pct")
                if wide_marg_nfe else None,
            "bf16_serving_mfu_bf16_pct":
                bf16_tiers["bf16"][1]["mfu_mxu_bf16_pct"]
                if bf16_tiers else None,
            "mixed_adaptive_marginal_us_per_nfe":
                round(mixed_tiers["mixed"][0], 3) if mixed_tiers else None,
            "mixed_adaptive_vs_highest":
                round(mixed_tiers["highest"][0] / mixed_tiers["mixed"][0],
                      2) if mixed_tiers and mixed_tiers["mixed"][0]
                else None,
            "per_lane_vs_vmap":
                round(pl_vmap_ns / pl_kern_ns, 2)
                if pl_kern_ns and pl_vmap_ns else None,
            "df_traj_err_vs_f64":
                float(f"{df_err:.3g}") if df_err is not None else None,
            "meanfield_fused_vs_generic":
                round(mf_nfe_s / mf_gen_nfe_s, 2)
                if mf_nfe_s and mf_gen_nfe_s else None,
            "latent_ode_train_iter_ms_fused":
                round(latent_fused_ms, 2) if latent_fused_ms else None,
            "device": str(jax.devices()[0]),
        },
    }
    compact_line = json.dumps(compact)
    # Hard guarantee: the final line parses from a 2000-char tail capture.
    assert len(compact_line) + 1 <= 1500, len(compact_line)
    simulated = (details_line + "\n" + compact_line + "\n")[-2000:]
    assert json.loads(simulated.splitlines()[-1])["value"] == \
        compact["value"]
    print(compact_line)


if __name__ == "__main__":
    main()
