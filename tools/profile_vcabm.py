"""Profile the fused VCABM ('adams') kernel vs the fused dopri5 kernel
(round-4 verdict item 10: "fused VCABM is 471k vs RK's 730k NFE/s —
profile whether the masked order-adaptation scalars or the phi-stack
traffic dominate, and either close some of the 1.55x or document why it's
inherent").

Measured quantities (chain-regressed marginals, the stable metric):

- us per ATTEMPT (accepted + rejected step), the solver-machinery unit.
  VCABM does 2 NFE per accepted attempt (predictor+corrector f evals) and
  1 per rejected; dopri5 does 6 per attempt (7 stages, FSAL). NFE/s across
  METHODS therefore measures f-eval throughput, not machinery efficiency —
  the per-attempt marginal is the like-for-like number.
- a batch sweep (B=512 vs 4096): if us/attempt is ~flat in B the kernel is
  bound by the serial masked scalar recurrences (g/beta/c chains unrolled
  over MAX_ORDER on the scalar core); if it scales ~linearly it is bound
  by the [D, B] phi-plane traffic (ephi/phip recompute per attempt + the
  14-row phi shift per accepted step).
- time-to-solution + total NFE at matched tolerance on the bench spiral —
  the user-relevant axis on which an Adams method's whole point is
  spending FEWER f evals per unit accuracy.

Run on the real chip: python tools/profile_vcabm.py
"""
import sys
sys.path.insert(0, "/root/repo")

import jax                                                   # noqa: E402
import jax.numpy as jnp                                      # noqa: E402
import numpy as np                                           # noqa: E402

from tfdiffeq_tpu import solve                               # noqa: E402


def profile_method(method, B, t_span=25.0, t_out=64, rtol=1e-6,
                   atol=1e-8, reps=64, max_order=None):
    """Chain-regressed marginal cost via bench.py's `_bench_sustained`
    harness (lax.scan chains of reps and reps//2 solves; the slope
    regresses out the ~26 ms fixed dispatch latency, which otherwise
    swamps short-chain deltas on this testbed)."""
    import bench

    # The bench headline's MLP-spiral dynamics (the workload behind the
    # 730k-vs-471k NFE/s numbers this profile decomposes). A pure cubic
    # spiral decays to the y=0 fixed point over span 25, collapsing later
    # chain links into degenerate near-zero solves whose NFE deltas are
    # noise; the MLP's bias drift keeps the chain in distribution.
    y0 = jnp.asarray(np.random.RandomState(1).randn(B, 2) * 1.5,
                     jnp.float32)
    t = jnp.linspace(0.0, t_span, t_out, dtype=jnp.float32)
    dyn = bench._spiral_dyn(bench._params())

    opts = {"fuse": True}
    if max_order is not None:
        opts["max_order"] = int(max_order)

    def one(y):
        r = solve(dyn, y, t, rtol=rtol, atol=atol, method=method,
                  options=dict(opts))
        return r.ys, r.stats.nfe

    r = jax.jit(lambda y: solve(dyn, y, t, rtol=rtol, atol=atol,
                                method=method,
                                options=dict(opts)).stats)(y0)
    jax.block_until_ready(r)
    nfe = int(r.nfe)
    attempts = int(r.n_accepted) + int(r.n_rejected)

    nfe_s, marg_us_per_nfe, med, _, _ = bench._bench_sustained(
        one, y0, reps, k=5)
    per_solve = marg_us_per_nfe * nfe * 1e-6
    return {
        "method": method, "B": B, "nfe": nfe, "attempts": attempts,
        "accepted": int(r.n_accepted), "rejected": int(r.n_rejected),
        "per_solve_s": per_solve,
        "us_per_attempt": per_solve / attempts * 1e6,
        "us_per_nfe": marg_us_per_nfe,
        "nfe_per_sec": 1e6 / marg_us_per_nfe,
    }


def main():
    print("devices:", jax.devices(), flush=True)
    rows = []
    for method in ("dopri5", "adams"):
        for B in (512, 4096):
            r = profile_method(method, B)
            rows.append(r)
            print(f"{method:8s} B={B:5d}: {r['nfe']:5d} NFE "
                  f"{r['attempts']:5d} attempts  "
                  f"{r['us_per_attempt']:7.2f} us/attempt  "
                  f"{r['us_per_nfe']:6.2f} us/NFE  "
                  f"{r['per_solve_s']*1e3:7.2f} ms/solve  "
                  f"{r['nfe_per_sec']/1e3:7.1f}k NFE/s", flush=True)

    d5 = [r for r in rows if r["method"] == "dopri5"]
    ad = [r for r in rows if r["method"] == "adams"]
    print("\n--- breakdown ---")
    for m, rs in (("dopri5", d5), ("adams", ad)):
        scale = rs[1]["us_per_attempt"] / rs[0]["us_per_attempt"]
        print(f"{m}: us/attempt B=4096 / B=512 = {scale:.2f} "
              f"(1.0 => scalar/control-bound, 8.0 => vector-bound)")
    print(f"time-to-solution (B=4096, rtol 1e-6, span 25): "
          f"dopri5 {d5[1]['per_solve_s']*1e3:.2f} ms ({d5[1]['nfe']} NFE) "
          f"vs adams {ad[1]['per_solve_s']*1e3:.2f} ms "
          f"({ad[1]['nfe']} NFE)")

    # Static max_order lever: unroll bounds + phi rows shrink with the
    # user's cap (K = max_order + 2 rows instead of 14).
    for mo in (5,):
        r = profile_method("adams", 4096, max_order=mo)
        print(f"adams(max_order={mo}) B=4096: {r['nfe']} NFE "
              f"{r['us_per_attempt']:.2f} us/attempt  "
              f"{r['us_per_nfe']:.2f} us/NFE  "
              f"{r['nfe_per_sec']/1e3:.1f}k NFE/s "
              f"(vs {ad[1]['us_per_attempt']:.2f} us/attempt at "
              f"max_order=12)", flush=True)


if __name__ == "__main__":
    main()
