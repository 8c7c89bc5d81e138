"""Fixed-grid explicit solvers: euler, midpoint, rk4 (+ generic tableaus).

Capability parity with upstream `tfdiffeq/fixed_grid.py` and the
`FixedGridODESolver` lifecycle in `tfdiffeq/solvers.py` (SURVEY.md §2, §3.2).

TPU-native design: the reference walks the grid in host Python, dispatching
eager TF ops per arithmetic step. Here the entire integration is ONE
`lax.scan` over grid intervals — compiled once, fully fused, differentiable
with standard `jax.grad` (reverse-mode through the scan gives the exact
discrete gradient, the analogue of the reference's taped backprop in
SURVEY.md §3.4). Outputs are emitted directly from the scan when the grid is
the requested times (the reference's default `grid_constructor`), otherwise
linearly interpolated onto `t` afterwards, matching reference semantics.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.rk import runge_kutta_step
from ..ops.tableaus import ButcherTableau
from .base import (CanonicalProblem, SolveResult, SolverStats, Status,
                   hermite_interp_at)

Array = jax.Array


def _tableau_step(tableau: ButcherTableau):
    """One fixed step y(t0) -> y(t0+dt) via an explicit tableau.

    Returns (y1, f0, n_evals, delta, f1): f0 = func(t0, y) feeds the
    cubic-Hermite output interpolation; f1 = func(t0+dt, y1) (which the
    non-FSAL runge_kutta_step computes anyway) is chained into the NEXT
    step's f0 so the grid walk costs exactly `stages` evaluations per step
    (upstream NFE parity — previously the discarded f1 inflated the count).
    """

    def step(func, t0, dt, y, f0=None):
        n = tableau.stages
        if f0 is None:
            f0 = func(t0, y)
            n += 1
        res = runge_kutta_step(func, y, f0, t0, dt, tableau)
        return res.y1, f0, n, res.delta, res.f1

    return step


def solve_fixed_grid(
    prob: CanonicalProblem,
    tableau: ButcherTableau,
    grid: Optional[Array] = None,
    step_fn: Optional[Callable] = None,
) -> SolveResult:
    """Integrate on a fixed grid (default: the requested times themselves).

    `grid`, if given, must be a static-length increasing array in tau-space
    covering [tau[0], tau[-1]] (the reference's `grid_constructor` contract).
    `step_fn(func, t0, dt, y) -> (y1, f0, n_evals[, delta])` overrides the
    tableau step (used by hypersolvers, SURVEY.md §2 `hyper_solvers.py`):
    f0 is func(t0, y) so the engine can Hermite-interpolate outputs; the
    optional 4th element is the exact increment for Kahan accumulation.
    """
    func, y0, tau = prob.func, prob.y0, prob.tau
    step = step_fn if step_fn is not None else _tableau_step(tableau)
    T = tau.shape[0]

    if grid is None:
        grid = tau
        grid_is_t = True
    else:
        grid = jnp.asarray(grid, tau.dtype)
        grid_is_t = False

    G = grid.shape[0]
    if G < 2:
        # Nothing to integrate: every output is y0.
        ys = jnp.broadcast_to(y0[None], (T,) + y0.shape)
        return SolveResult(ys, _stats(0, 0))

    pairs = (grid[:-1], grid[1:])
    chained = step_fn is None   # tableau steps chain f1 -> next f0

    def body(carry, t01):
        y, comp, f_prev = carry
        t0, t1 = t01
        if chained:
            y1, f0, _, delta, f1 = step(func, t0, t1 - t0, y, f_prev)
            # Kahan-compensated accumulation: long float32 grids otherwise
            # accumulate a sqrt(n)-ulp random walk in the state.
            adj = delta - comp
            y1 = y + adj
            comp = (y1 - y) - adj
            f_prev = f1
        else:
            out = step(func, t0, t1 - t0, y)
            y1, f0 = out[0], out[1]
        return (y1, comp, f_prev), (y1, f0)

    f_init = func(grid[0], y0) if chained else jnp.zeros_like(y0)
    (y_end, _, f_end), (ys_tail, fs_head) = jax.lax.scan(
        body, (y0, jnp.zeros_like(y0), f_init), pairs)

    if chained:
        nfe = 1 + tableau.stages * (G - 1)
    else:
        nfe = _count_evals(step, func, grid, y0) * (G - 1)

    if grid_is_t:
        out = jnp.concatenate([y0[None], ys_tail], axis=0)
    else:
        # Cubic-Hermite onto the requested times using the node derivatives
        # the steps already computed (the chained f_end is free; the
        # step_fn path pays one extra eval for the final node).
        ys_grid = jnp.concatenate([y0[None], ys_tail], axis=0)
        if not chained:
            f_end = func(grid[-1], y_end)
            nfe += 1
        fs_grid = jnp.concatenate([fs_head, f_end[None]], axis=0)
        out = hermite_interp_at(grid, ys_grid, fs_grid, tau)
        out = out.at[0].set(y0)

    return SolveResult(out, _stats(nfe, G - 1))


def _count_evals(step, func, grid, y0) -> int:
    """Static evals-per-step (trace-free: use eval_shape to avoid compute)."""
    count = [0]

    def counting_func(t, y):
        count[0] += 1
        return func(t, y)

    jax.eval_shape(lambda y: step(counting_func, grid[0], grid[1] - grid[0],
                                  y)[:2], y0)
    return count[0]


def _stats(nfe, n_steps) -> SolverStats:
    return SolverStats(
        jnp.asarray(nfe, jnp.int32),
        jnp.asarray(n_steps, jnp.int32),
        jnp.asarray(0, jnp.int32),
        jnp.asarray(int(Status.OK), jnp.int32),
    )


def build_grid_from_options(t: Array, options: dict,
                            prob: CanonicalProblem) -> Optional[Array]:
    """Resolve reference-style grid options to a static grid in tau-space.

    Supports `grid_constructor(func, y0, t) -> grid` (called with the USER's
    original func/y0/t, matching the upstream contract), `step_size`
    (uniform grid; needs concrete t so the length is static), and
    `num_steps` (static int: uniform grid of n+1 points — works with traced
    endpoints; used by the adjoint backward pass).
    """
    grid_constructor = options.get("grid_constructor")
    step_size = options.get("step_size")
    num_steps = options.get("num_steps")
    if grid_constructor is None and step_size is None and num_steps is None:
        return None
    if num_steps is not None:
        n = int(num_steps)
        if n < 1:
            raise ValueError(f"num_steps must be >= 1, got {n}")
        return jnp.linspace(prob.tau[0], prob.tau[-1],
                            n + 1).astype(prob.time_dtype)
    if isinstance(t, jax.core.Tracer):
        raise ValueError(
            "grid_constructor/step_size need concrete (non-traced) t so the "
            "grid length is static under jit; pass t as a constant, use "
            "options={'num_steps': n}, or use the default grid (t itself).")
    if grid_constructor is not None:
        user_func = prob.user_func if prob.user_func is not None else prob.func
        user_y0 = prob.user_y0 if prob.user_y0 is not None else prob.y0
        grid = jnp.asarray(grid_constructor(user_func, user_y0,
                                            jnp.asarray(t)))
        grid = (prob.sign * grid.astype(prob.time_dtype))
        return grid
    t_np = np.asarray(t, dtype=np.float64)
    span = abs(float(t_np[-1] - t_np[0]))
    n = max(1, int(np.ceil(span / float(step_size) - 1e-12)))
    grid = jnp.linspace(prob.tau[0], prob.tau[-1], n + 1)
    return grid.astype(prob.time_dtype)
