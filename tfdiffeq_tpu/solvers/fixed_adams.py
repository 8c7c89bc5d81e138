"""Fixed-step Adams–Bashforth (explicit) and Adams–Bashforth–Moulton
(predictor–corrector) solvers, orders 1..12.

Capability parity with upstream `tfdiffeq/fixed_adams.py` (SURVEY.md §2):
`explicit_adams` (corrector off) and `fixed_adams` (AB predictor + AM
corrector with functional iteration, `options: max_order, max_iters`).

TPU-native redesign:
- The reference hardcodes rational coefficient tables
  (`_BASHFORTH_COEFFICIENTS`, `_MOULTON_COEFFICIENTS`). Here both tables are
  *generated exactly* at import time by integrating Lagrange basis polynomials
  with `fractions.Fraction` — the same numbers, derived rather than
  transcribed, to machine precision for any order.
- The whole integration is a single `lax.scan` over the grid carrying a
  fixed-size `[max_order, N]` derivative-history ring; order ramp-up during
  startup is a dynamic row-select into the padded coefficient table (no
  dynamic shapes, no retraces).
- Corrector iterations are trace-time unrolled (`max_iters`, default 4) with
  a convergence mask in the tolerance norm, so converged states stop updating
  exactly like the reference's early exit — without host control flow.

Like the reference's implementation, coefficients assume a uniform grid;
pass `options['step_size']` or a uniform `grid_constructor` for best accuracy
when the requested output times are unevenly spaced.
"""

from __future__ import annotations

from fractions import Fraction as Fr
from typing import List

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.norms import rms_norm
from .base import (CanonicalProblem, SolveResult, SolverStats, Status,
                   hermite_interp_at)
from .fixed_grid import build_grid_from_options

Array = jax.Array

MAX_ORDER = 12


def _poly_mul(p: List[Fr], q: List[Fr]) -> List[Fr]:
    out = [Fr(0)] * (len(p) + len(q) - 1)
    for i, a in enumerate(p):
        for j, b in enumerate(q):
            out[i + j] += a * b
    return out


def _lagrange_integral_01(nodes: List[Fr], j: int) -> Fr:
    """Integral over [0,1] of the Lagrange basis polynomial L_j(s) through
    the given nodes."""
    num = [Fr(1)]
    denom = Fr(1)
    for i, xi in enumerate(nodes):
        if i == j:
            continue
        num = _poly_mul(num, [-xi, Fr(1)])  # (s - xi)
        denom *= (nodes[j] - xi)
    integral = sum(c / (p + 1) for p, c in enumerate(num))
    return integral / denom


def _bashforth_row(k: int) -> List[Fr]:
    """AB-k weights: y_{n+1} = y_n + h * sum_j beta_j f_{n-j}."""
    nodes = [Fr(-i) for i in range(k)]
    return [_lagrange_integral_01(nodes, j) for j in range(k)]


def _moulton_row(k: int) -> List[Fr]:
    """AM-k weights: y_{n+1} = y_n + h*(g_0 f_{n+1} + sum_{m>=1} g_m f_{n+1-m})."""
    nodes = [Fr(1 - m) for m in range(k)]
    return [_lagrange_integral_01(nodes, m) for m in range(k)]


def _build_table(row_fn) -> np.ndarray:
    table = np.zeros((MAX_ORDER, MAX_ORDER), dtype=np.float64)
    for k in range(1, MAX_ORDER + 1):
        row = row_fn(k)
        table[k - 1, :k] = [float(x) for x in row]
    return table

BASHFORTH_TABLE = _build_table(_bashforth_row)   # [12, 12]
MOULTON_TABLE = _build_table(_moulton_row)       # [12, 12]


def solve_fixed_adams(
    prob: CanonicalProblem,
    options: dict,
    rtol,
    atol,
    *,
    implicit: bool,
) -> SolveResult:
    func, y0, tau = prob.func, prob.y0, prob.tau
    dtype = prob.dtype
    T = tau.shape[0]

    max_order = int(options.get("max_order", 4))
    if not 1 <= max_order <= MAX_ORDER:
        raise ValueError(f"max_order must be in [1, {MAX_ORDER}]")
    max_iters = int(options.get("max_iters", 4)) if implicit else 0

    grid = build_grid_from_options(tau * prob.sign, options, prob)
    if grid is None:
        grid = tau
        grid_is_t = True
    else:
        grid_is_t = False
    G = grid.shape[0]
    if G < 2:
        ys = jnp.broadcast_to(y0[None], (T,) + y0.shape)
        return SolveResult(ys, _stats(0, 0))

    ab = jnp.asarray(BASHFORTH_TABLE[:max_order, :max_order], dtype)
    am = jnp.asarray(MOULTON_TABLE[:max_order, :max_order], dtype)
    rtol = jnp.asarray(rtol, jnp.finfo(dtype).dtype)
    atol = jnp.asarray(atol, jnp.finfo(dtype).dtype)

    f0 = func(grid[0], y0)
    hist0 = jnp.zeros((max_order,) + y0.shape, dtype).at[0].set(f0)

    # Startup: the reference ramps the order from 1 (Euler first step) as
    # history fills, which costs O(h^2) startup error at fixed h. We instead
    # bootstrap the first max_order-1 steps with RK4 (O(h^5) local), a strict
    # accuracy improvement with identical API behavior.
    from ..ops.rk import runge_kutta_step
    from ..ops.tableaus import RK4
    bootstrap = max_order - 1

    def body(carry, t01):
        y, hist, n, nfe = carry  # hist[j] = f_{current - j}
        t0, t1 = t01
        dt = t1 - t0
        dt_y = jnp.asarray(dt, dtype)

        def adams_step(y, hist):
            k_eff = jnp.minimum(n + 1, max_order)  # usable history length
            beta = ab[k_eff - 1]                   # [K]
            y_pred = y + dt_y * jnp.tensordot(beta, hist, axes=1)
            if not implicit:
                return y_pred, func(t1, y_pred), jnp.asarray(1, jnp.int32)
            gamma = am[k_eff - 1]                  # [K]
            # Corrector history part: g_1 f_n + g_2 f_{n-1} + ...
            hist_part = jnp.tensordot(gamma[1:], hist[:-1], axes=1)
            base = y + dt_y * hist_part
            g0 = gamma[0]

            def corrector(state, _):
                y_cur, done, nfe_c = state
                f_new = func(t1, y_cur)
                y_next = base + dt_y * g0 * f_new
                scale = atol + rtol * jnp.maximum(jnp.abs(y_cur),
                                                  jnp.abs(y_next))
                delta = rms_norm((y_next - y_cur) / scale)
                y_out = jnp.where(done, y_cur, y_next)
                return (y_out, done | (delta <= 1.0), nfe_c + 1), None

            (y1, _, nfe_c), _ = jax.lax.scan(
                corrector, (y_pred, jnp.asarray(False),
                            jnp.asarray(0, jnp.int32)), None,
                length=max_iters)
            return y1, func(t1, y1), nfe_c + 1

        def rk4_step(y, hist):
            # RK4 is non-FSAL: runge_kutta_step already evaluated
            # f1 = func(t0+dt, y1); reuse it instead of re-evaluating.
            res = runge_kutta_step(func, y, hist[0], t0, dt, RK4)
            return res.y1, res.f1, jnp.asarray(res.n_evals, jnp.int32)

        if bootstrap > 0:
            y1, f1, n_evals = jax.lax.cond(n < bootstrap, rk4_step,
                                           adams_step, y, hist)
        else:
            y1, f1, n_evals = adams_step(y, hist)

        hist = jnp.roll(hist, 1, axis=0).at[0].set(f1)
        return (y1, hist, n + 1, nfe + n_evals), (y1, f1)

    init = (y0, hist0, jnp.asarray(0, jnp.int32), jnp.asarray(1, jnp.int32))
    (_, _, _, nfe), (ys_tail, fs_tail) = jax.lax.scan(
        body, init, (grid[:-1], grid[1:]))
    ys_grid = jnp.concatenate([y0[None], ys_tail], axis=0)
    fs_grid = jnp.concatenate([f0[None], fs_tail], axis=0)

    if grid_is_t:
        out = ys_grid
    else:
        out = hermite_interp_at(grid, ys_grid, fs_grid, tau).at[0].set(y0)
    return SolveResult(out, _stats(nfe, G - 1))


def _stats(nfe, n_steps) -> SolverStats:
    return SolverStats(jnp.asarray(nfe, jnp.int32),
                       jnp.asarray(n_steps, jnp.int32),
                       jnp.asarray(0, jnp.int32),
                       jnp.asarray(int(Status.OK), jnp.int32))


def _explicit(prob, options, rtol, atol):
    return solve_fixed_adams(prob, options, rtol, atol, implicit=False)


def _implicit(prob, options, rtol, atol):
    return solve_fixed_adams(prob, options, rtol, atol, implicit=True)


# Register into the public SOLVERS dict (parity with upstream names:
# 'explicit_adams' = AdamsBashforth, 'fixed_adams' = AdamsBashforthMoulton).
from ..odeint import register_solver  # noqa: E402

_ADAMS_GRID_OPTIONS = {"max_order", "max_iters", "step_size", "num_steps",
                       "grid_constructor", "fuse"}
register_solver("explicit_adams", "custom", _explicit,
                allowed=_ADAMS_GRID_OPTIONS)
register_solver("fixed_adams", "custom", _implicit,
                allowed=_ADAMS_GRID_OPTIONS)
