"""Hypersolver demo: train a learned correction for cheap fixed-step
solves, then serve it FUSED.

Capability parity with upstream `tfdiffeq/hyper_solvers.py` usage
(SURVEY.md §2 [MED], Poli et al. 2020 "Hypersolvers: Toward Fast
Continuous-Depth Models"): a small MLP g(t, y, f) is trained to
approximate the base method's local truncation error divided by
dt^(p+1), letting a 1-eval/step Euler walk reach orders-of-magnitude
better accuracy at a FIXED step budget. Training differentiates the
generic fixed-grid scan (plain jax.grad through `solve`); serving runs
`options={'fuse': True}` so the whole corrected walk — dynamics AND
hypernet — is one Pallas kernel launch (fast.solve_hyper).

Run:  python examples/hypersolver.py --num_steps 32 --iters 1500
"""

from __future__ import annotations

import argparse
import os
import time

import jax
import jax.numpy as jnp
import numpy as np
import optax

import sys as _sys
_sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))  # run as a script from anywhere
from tfdiffeq_tpu import solve


def parse_args():
    p = argparse.ArgumentParser()
    p.add_argument("--kind", default="euler",
                   choices=["euler", "midpoint", "heun"])
    p.add_argument("--num_steps", type=int, default=32,
                   help="fixed step budget over the integration span")
    p.add_argument("--hidden", type=int, default=32)
    p.add_argument("--iters", type=int, default=1500)
    p.add_argument("--lr", type=float, default=3e-3)
    p.add_argument("--batch", type=int, default=256)
    p.add_argument("--span", type=float, default=2.0)
    p.add_argument("--scale", type=float, default=1.0,
                   help="initial-condition disk radius. The cubic spiral "
                        "amplifies rotation as |y|^2: Euler is only "
                        "conditionally stable, so large radii / long "
                        "spans need more steps")
    return p.parse_args()


A = jnp.asarray([[-0.1, 2.0], [-2.0, -0.1]], jnp.float32)


def _disk(rng, n, radius):
    """Uniform initial conditions in a disk (bounded |y| keeps the
    conditionally-stable base methods stable at the demo step budget)."""
    th = rng.rand(n) * 2.0 * np.pi
    rr = radius * np.sqrt(rng.rand(n))
    return jnp.asarray(np.stack([rr * np.cos(th), rr * np.sin(th)], 1),
                       jnp.float32)


def f(t, y):
    return (y ** 3) @ A


def init_hypernet(key, hidden):
    k1, k2 = jax.random.split(key)
    return {
        # inputs: [y (2), f (2), t (1)] -> correction (2)
        "w1": jax.random.normal(k1, (5, hidden), jnp.float32) * 0.3,
        "b1": jnp.zeros((hidden,), jnp.float32),
        "w2": jax.random.normal(k2, (hidden, 2), jnp.float32) * 0.1,
        "b2": jnp.zeros((2,), jnp.float32),
    }


def hypernet(params):
    def g(t, y, fv):
        tt = jnp.broadcast_to(jnp.reshape(t, (1, 1)), (y.shape[0], 1))
        h = jnp.concatenate([y, fv, tt], axis=1)
        return jnp.tanh(h @ params["w1"] + params["b1"]) \
            @ params["w2"] + params["b2"]
    return g


def main():
    args = parse_args()
    method = f"hyper_{args.kind}"
    rng = np.random.RandomState(0)
    t = jnp.linspace(0.0, args.span, args.num_steps + 1,
                     dtype=jnp.float32)

    # Ground truth at tight tolerance (the fixed-grid solvers output at
    # every grid node, so supervise every node).
    y0s = _disk(rng, args.batch, args.scale)
    truth = solve(f, y0s, t, rtol=1e-7, atol=1e-9, method="dopri5").ys

    params = init_hypernet(jax.random.PRNGKey(0), args.hidden)
    opt = optax.adam(args.lr)
    opt_state = opt.init(params)

    def loss_fn(p, y0_, target):
        ys = solve(f, y0_, t, method=method,
                   options={"hypernet": hypernet(p)}).ys
        return jnp.mean(jnp.abs(ys - target))

    @jax.jit
    def train_step(p, s, y0_, target):
        l, g = jax.value_and_grad(loss_fn)(p, y0_, target)
        upd, s = opt.update(g, s)
        return optax.apply_updates(p, upd), s, l

    base = solve(f, y0s, t, method=args.kind).ys   # uncorrected baseline
    base_err = float(jnp.max(jnp.abs(base - truth)))
    print(f"[init] {args.kind} x{args.num_steps} max err: {base_err:.4e}")

    t0 = time.time()
    for it in range(1, args.iters + 1):
        params, opt_state, l = train_step(params, opt_state, y0s, truth)
        if it % 300 == 0 or it == 1:
            print(f"iter {it:5d}  loss {float(l):.3e}  "
                  f"({time.time() - t0:.1f}s)")

    # Evaluate on FRESH initial conditions: generic vs fused hypersolver.
    y0e = _disk(rng, args.batch, args.scale)
    truth_e = solve(f, y0e, t, rtol=1e-7, atol=1e-9, method="dopri5").ys
    g_net = hypernet(params)
    hyp = solve(f, y0e, t, method=method, options={"hypernet": g_net})
    fus = solve(f, y0e, t, method=method,
                options={"hypernet": g_net, "fuse": True})
    base_e = solve(f, y0e, t, method=args.kind).ys
    err_base = float(jnp.max(jnp.abs(base_e - truth_e)))
    err_hyp = float(jnp.max(jnp.abs(hyp.ys - truth_e)))
    err_fus = float(jnp.max(jnp.abs(fus.ys - truth_e)))
    print(f"[eval] base {args.kind}: {err_base:.4e}   "
          f"hyper: {err_hyp:.4e} ({err_base / max(err_hyp, 1e-12):.1f}x "
          f"better)   fused-kernel hyper: {err_fus:.4e} "
          f"(NFE {int(fus.stats.nfe)})")

    # Fused serving wall-clock (post-compile, pipelined).
    run = jax.jit(lambda y: solve(
        f, y, t, method=method,
        options={"hypernet": g_net, "fuse": True}).ys)
    jax.block_until_ready(run(y0e))
    t0 = time.time()
    reps = 50
    for _ in range(reps):
        out = run(y0e)
    jax.block_until_ready(out)
    dt_ms = (time.time() - t0) / reps * 1e3
    print(f"[serve] fused {method} x{args.num_steps}: {dt_ms:.3f} ms/solve"
          f" (B={args.batch})")


if __name__ == "__main__":
    main()
