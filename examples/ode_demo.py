"""Spiral neural-ODE training demo.

Capability parity with upstream `examples/ode_demo.py` (SURVEY.md §2, §3.4):
ground truth dy/dt = y^3 A integrated once with dopri5; train an MLP ODEFunc
on random trajectory windows (batch_time=10, batch_size=20) with L1 loss and
RMSprop(lr=1e-3); optional phase-portrait visualization; `--adjoint` flag
switches to O(1)-memory adjoint gradients.

TPU-native: the whole train step (solve + loss + grads + optimizer update)
jits into one XLA program; batching is a leading state axis, not a Python
loop.
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
from tfdiffeq_tpu import odeint, odeint_adjoint
from tfdiffeq_tpu.models.dynamics import make_ode_func, spiral_dynamics


def parse_args():
    p = argparse.ArgumentParser()
    p.add_argument("--method", default="dopri5")
    p.add_argument("--data_size", type=int, default=1000)
    p.add_argument("--batch_time", type=int, default=10)
    p.add_argument("--batch_size", type=int, default=20)
    p.add_argument("--niters", type=int, default=2000)
    p.add_argument("--test_freq", type=int, default=20)
    p.add_argument("--lr", type=float, default=1e-3)
    p.add_argument("--adjoint", action="store_true")
    p.add_argument("--fused", action="store_true",
                   help="train through the fully-fused Pallas path (one "
                        "whole-solve kernel forward + one adjoint-sweep "
                        "kernel backward); implies adjoint gradients")
    p.add_argument("--viz", action="store_true")
    p.add_argument("--viz_dir", default="png")
    p.add_argument("--seed", type=int, default=0)
    return p.parse_args()


class RunningAverageMeter:
    """Parity with the reference's RunningAverageMeter."""

    def __init__(self, momentum=0.97):
        self.momentum = momentum
        self.val = None
        self.avg = 0.0

    def update(self, val):
        if self.val is None:
            self.avg = val
        else:
            self.avg = self.avg * self.momentum + val * (1 - self.momentum)
        self.val = val


def main():
    args = parse_args()
    key = jax.random.PRNGKey(args.seed)

    true_y0 = jnp.asarray([[2.0, 0.0]])
    t = jnp.linspace(0.0, 25.0, args.data_size)
    true_y = odeint(spiral_dynamics, true_y0, t, method="dopri5",
                    options={"loop": "while"})  # [T, 1, 2]

    func, params = make_ode_func(seed=args.seed)
    opt = optax.rmsprop(args.lr)
    opt_state = opt.init(params)

    def get_batch(key):
        key, sub = jax.random.split(key)
        s = jax.random.choice(
            sub, args.data_size - args.batch_time, (args.batch_size,),
            replace=False)
        batch_y0 = true_y[s]                                  # [B, 1, 2]
        batch_t = t[: args.batch_time]                        # [Tb]
        idx = s[None, :] + jnp.arange(args.batch_time)[:, None]
        batch_y = true_y[idx]                                 # [Tb, B, 1, 2]
        return key, batch_y0, batch_t, batch_y

    if args.fused:
        # Fully-fused Pallas training path: the 2->50 tanh(y^3) MLP is an
        # MLPSpec, so the whole forward solve and the whole adjoint
        # backward sweep are one kernel each (tfdiffeq_tpu.fast).
        from tfdiffeq_tpu.fast import (MLPSpec, odeint_adjoint_mlp,
                                       weights_from_flax_dense)
        spec = MLPSpec(activation="tanh", input_power=3)

        def pred_fn(p, y0, ts):
            weights = weights_from_flax_dense(p)
            ys = odeint_adjoint_mlp(spec, weights, y0[:, 0, :], ts,
                                    rtol=1e-6, atol=1e-8,
                                    method=args.method)
            return ys[:, :, None, :]            # [Tb, B, 1, 2]
    elif args.adjoint:
        def pred_fn(p, y0, ts):
            return odeint_adjoint(func, y0, ts, params=p,
                                  method=args.method)
    else:
        def pred_fn(p, y0, ts):
            return odeint(lambda tt, yy: func(tt, yy, p), y0, ts,
                          method=args.method,
                          options={"max_steps": 512, "chunk_size": 16})

    @jax.jit
    def train_step(p, opt_state, batch_y0, batch_t, batch_y):
        def loss_fn(p):
            pred = pred_fn(p, batch_y0, batch_t)
            return jnp.mean(jnp.abs(pred - batch_y))

        loss, grads = jax.value_and_grad(loss_fn)(p)
        updates, opt_state = opt.update(grads, opt_state)
        p = optax.apply_updates(p, updates)
        return p, opt_state, loss

    @jax.jit
    def eval_loss(p):
        pred = odeint(lambda tt, yy: func(tt, yy, p), true_y0, t,
                      method=args.method, options={"loop": "while"})
        return jnp.mean(jnp.abs(pred - true_y)), pred

    loss_meter = RunningAverageMeter()
    time_meter = RunningAverageMeter()
    end = time.time()

    for itr in range(1, args.niters + 1):
        key, by0, bt, by = get_batch(key)
        params, opt_state, loss = train_step(params, opt_state, by0, bt, by)
        loss_meter.update(float(loss))
        time_meter.update(time.time() - end)
        end = time.time()

        if itr % args.test_freq == 0:
            test_loss, pred = eval_loss(params)
            print(f"Iter {itr:05d} | train {loss_meter.avg:.6f} | "
                  f"total {float(test_loss):.6f} | "
                  f"{time_meter.avg * 1000:.1f} ms/it")
            if args.viz:
                visualize(args, itr, t, true_y, pred, func, params)

    return params


def visualize(args, itr, t, true_y, pred_y, func, params):
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    from tfdiffeq_tpu.utils.viz import plot_phase_portrait

    os.makedirs(args.viz_dir, exist_ok=True)
    fig, axes = plt.subplots(1, 3, figsize=(14, 4))
    axes[0].plot(np.asarray(t), np.asarray(true_y)[:, 0, 0], "g-",
                 label="true x")
    axes[0].plot(np.asarray(t), np.asarray(pred_y)[:, 0, 0], "b--",
                 label="pred x")
    axes[0].legend(); axes[0].set_title("trajectory")
    axes[1].plot(np.asarray(true_y)[:, 0, 0], np.asarray(true_y)[:, 0, 1],
                 "g-")
    axes[1].plot(np.asarray(pred_y)[:, 0, 0], np.asarray(pred_y)[:, 0, 1],
                 "b--")
    axes[1].set_title("phase")
    plot_phase_portrait(lambda tt, yy: func(tt, yy[None], params)[0],
                        ax=axes[2], lim=2.0, n=40)
    axes[2].set_title("learned vector field")
    fig.tight_layout()
    fig.savefig(os.path.join(args.viz_dir, f"{itr:05d}.png"), dpi=100)
    plt.close(fig)


if __name__ == "__main__":
    main()
