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
import time

sys.path.insert(0, "/root/repo")

import jax                                                   # noqa: E402
import jax.numpy as jnp                                      # noqa: E402
import numpy as np                                           # noqa: E402

from tfdiffeq_tpu import solve                               # noqa: E402


def _params():
    A = jnp.asarray([[-0.1, 2.0], [-2.0, -0.1]], jnp.float32)
    return A


def _chain(fn, y0, n_links):
    """Run fn n_links times with a data dependency; return seconds."""
    def chained(y):
        stats_sum = jnp.int32(0)
        for _ in range(n_links):
            r = fn(y)
            y = y0 + 0.0 * r.ys[-1]
            stats_sum = stats_sum + r.stats.nfe + r.stats.n_accepted \
                + r.stats.n_rejected
        return y, stats_sum

    c = jax.jit(chained)
    out = c(y0)
    jax.block_until_ready(out)
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        jax.block_until_ready(c(y0))
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def profile_method(method, B, t_span=25.0, t_out=64, rtol=1e-6,
                   atol=1e-8):
    A = _params()
    y0 = jnp.asarray(np.random.RandomState(1).randn(B, 2) * 1.5,
                     jnp.float32)
    t = jnp.linspace(0.0, t_span, t_out, dtype=jnp.float32)

    def dyn(tt, yy):
        return jnp.dot(yy ** 3, A,
                       precision=jax.lax.Precision.HIGHEST)

    def one(y):
        return solve(dyn, y, t, rtol=rtol, atol=atol, method=method,
                     options={"fuse": True})

    r = jax.jit(one)(y0)
    jax.block_until_ready(r.ys)
    nfe = int(r.stats.nfe)
    nacc = int(r.stats.n_accepted)
    nrej = int(r.stats.n_rejected)
    attempts = nacc + nrej

    # chain-regressed marginal: time K1 and K2 links, slope = per-solve
    k1, k2 = 4, 16
    t1 = _chain(one, y0, k1)
    t2 = _chain(one, y0, k2)
    per_solve = (t2 - t1) / (k2 - k1)
    return {
        "method": method, "B": B, "nfe": nfe, "attempts": attempts,
        "accepted": nacc, "rejected": nrej,
        "per_solve_s": per_solve,
        "us_per_attempt": per_solve / attempts * 1e6,
        "us_per_nfe": per_solve / nfe * 1e6,
        "nfe_per_sec": nfe / per_solve,
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


if __name__ == "__main__":
    main()
