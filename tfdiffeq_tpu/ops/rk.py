"""Explicit Runge–Kutta stage evaluation and dense-output interpolation.

Capability parity with upstream `tfdiffeq/rk_common.py` (`_runge_kutta_step`)
and `tfdiffeq/interp.py` (`_interp_fit` / `_interp_evaluate`) — see SURVEY.md
§2. The TPU-native redesign differs structurally:

- The reference dispatches one TF eager kernel per arithmetic op, crossing the
  host↔device boundary ~6× per stage. Here the whole step traces into one XLA
  computation: the static Python loop over stages unrolls at trace time and
  XLA fuses all stage combinations into a handful of elementwise kernels
  (optionally replaced by a single Pallas kernel, see ops/pallas_kernels.py).
- Zero coefficients are skipped at trace time (static), so e.g. dopri5's
  b_sol[1] == 0 costs nothing.
- Dense-output coefficients are stored as one stacked ``[5, N]`` array so the
  adaptive loop carry has a fixed structure (required by `lax.while_loop`).
"""

from __future__ import annotations

from typing import Callable, NamedTuple, Tuple

import jax
import jax.numpy as jnp

from .tableaus import ButcherTableau

Array = jax.Array


class RKStepResult(NamedTuple):
    y1: Array          # [N] solution at t0 + dt
    f1: Array          # [N] derivative at (t0 + dt, y1)
    y_err: Array       # [N] embedded error estimate (zeros if no estimate)
    k: Array           # [S, N] stage derivatives
    n_evals: int       # static: fresh func evaluations performed
    delta: Array = None  # [N] y1 - y0 as the exact weighted stage sum
    #                      (for compensated accumulation at the loop level)


def _combine(y0: Array, dt: Array, coeffs, k_list) -> Array:
    """y0 + dt * sum(coeffs[i] * k[i]), skipping static zeros."""
    acc = None
    for c, k in zip(coeffs, k_list):
        if c == 0.0:
            continue
        term = c * k
        acc = term if acc is None else acc + term
    if acc is None:
        return y0
    return y0 + dt * acc


def _weighted_sum(dt: Array, coeffs, k_list) -> Array:
    """dt * sum(coeffs[i] * k[i]), skipping static zeros."""
    acc = None
    for c, k in zip(coeffs, k_list):
        if c == 0.0:
            continue
        term = c * k
        acc = term if acc is None else acc + term
    if acc is None:
        return jnp.zeros_like(k_list[0])
    return dt * acc


def runge_kutta_step(
    func: Callable[[Array, Array], Array],
    y0: Array,
    f0: Array,
    t0: Array,
    dt: Array,
    tableau: ButcherTableau,
) -> RKStepResult:
    """Take one explicit RK step from (t0, y0) with derivative cache f0.

    Equivalent role to upstream `_runge_kutta_step` in `tfdiffeq/rk_common.py`
    (SURVEY.md §2), rebuilt as a trace-time-unrolled, fully fused computation.
    """
    S = tableau.stages
    # Stage times use the (possibly wider) time dtype; state combines stay in
    # the state dtype so a float64 time axis never upcasts TPU f32 states.
    dt = jnp.asarray(dt)
    dt_y = jnp.asarray(dt, y0.dtype) if dt.dtype != y0.dtype else dt
    k_list = [f0]
    for i in range(1, S):
        ti = t0 + dt * tableau.c[i]
        yi = _combine(y0, dt_y, tableau.a[i - 1], k_list)
        k_list.append(func(ti, yi))

    # FSAL tableaus have last stage == (t0+dt, y1), so y1 uses b_sol == a[-1]
    # and f1 is the last stage for free.
    delta = _weighted_sum(dt_y, tableau.b_sol, k_list)
    y1 = y0 + delta
    if tableau.fsal:
        f1 = k_list[-1]
        n_evals = S - 1
    else:
        f1 = func(t0 + dt, y1)
        n_evals = S
    if tableau.b_err:
        y_err = _weighted_sum(dt_y, tableau.b_err, k_list)
    else:
        y_err = jnp.zeros_like(y0)
    return RKStepResult(y1, f1, y_err, jnp.stack(k_list), n_evals, delta)


# ---------------------------------------------------------------------------
# Dense output (parity: upstream `tfdiffeq/interp.py` `_interp_fit`,
# `_interp_evaluate`, `_interp_fit_dopri5`; SURVEY.md §2 "Dense-output
# interpolation"). Coefficients are for the scaled variable x = (t-t0)/dt:
#   p(x) = (((A*x + B)*x + C)*x + D)*x + E,  stacked as [5, N].
# ---------------------------------------------------------------------------

def interp_fit_quartic(y0: Array, y1: Array, y_mid: Array, f0: Array,
                       f1: Array, dt: Array) -> Array:
    """Fit the 4th-order polynomial through (y0, y_mid, y1) with end slopes.

    Matches the reference's `_interp_fit` contract: p(0)=y0, p(1)=y1,
    p(1/2)=y_mid, p'(0)=dt*f0, p'(1)=dt*f1.
    """
    df0 = dt * f0
    df1 = dt * f1
    r1 = y1 - y0 - df0
    r2 = df1 - df0
    r3 = 16.0 * (y_mid - y0) - 8.0 * df0
    a = r3 + 2.0 * r2 - 8.0 * r1
    b = r2 - 2.0 * r1 - 2.0 * a
    c = r1 - a - b
    return jnp.stack([a, b, c, df0, y0])


def interp_fit_cubic_hermite(y0: Array, y1: Array, f0: Array, f1: Array,
                             dt: Array) -> Array:
    """3rd-order Hermite interpolant (used when a tableau has no c_mid)."""
    df0 = dt * f0
    df1 = dt * f1
    b = 2.0 * (y0 - y1) + df0 + df1
    c = 3.0 * (y1 - y0) - 2.0 * df0 - df1
    a = jnp.zeros_like(y0)
    return jnp.stack([a, b, c, df0, y0])


def interp_fit(tableau: ButcherTableau, y0: Array, y1: Array, f0: Array,
               f1: Array, k: Array, dt: Array) -> Array:
    """Build dense-output coefficients for one accepted step.

    Uses the tableau's 4th-order midpoint weights when available (dopri5's
    DPS_C_MID in the reference), else cubic Hermite.
    """
    if tableau.c_mid is not None:
        k_list = [k[i] for i in range(tableau.stages)]
        y_mid = _combine(y0, dt, tableau.c_mid, k_list)
        return interp_fit_quartic(y0, y1, y_mid, f0, f1, dt)
    return interp_fit_cubic_hermite(y0, y1, f0, f1, dt)


def interp_evaluate(coeffs: Array, t0: Array, dt: Array, t: Array) -> Array:
    """Evaluate dense-output polynomial(s) at time(s) t.

    coeffs: [5, *state]; t: scalar or [T]. Returns [*state] or [T, *state].
    Parity: upstream `_interp_evaluate` (SURVEY.md §2).
    """
    x = ((t - t0) / dt).astype(coeffs.dtype)
    a, b, c, d, e = coeffs
    if jnp.ndim(x) != 0:
        x = x.reshape(x.shape + (1,) * (coeffs.ndim - 1))  # [T, 1...]
    return (((a * x + b) * x + c) * x + d) * x + e
