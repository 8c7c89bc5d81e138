"""Hypersolvers: fixed-grid solvers with a learned local-error correction.

Capability parity with upstream `tfdiffeq/hyper_solvers.py` (SURVEY.md §2,
[MED]): `HyperEuler`, `HyperMidpoint`, `HyperHeun` (Poli et al. 2020,
"Hypersolvers: Toward Fast Continuous-Depth Models"). Each takes a base
explicit step of order p and adds a learned residual term

    y_{n+1} = y_n + dt * base_update(t_n, y_n) + dt^(p+1) * g(t_n, y_n, f_n)

where ``g`` (the "hypernet") is trained to approximate the base method's
local truncation error divided by dt^(p+1), letting a cheap low-order solver
reach higher accuracy at fixed step count.

TPU-native design: the reference wraps Keras modules; here ``g`` is any JAX
callable ``g(t, y, f) -> dy-like pytree`` passed via
``options={'hypernet': g}`` (parameters closure-captured). The whole solve
is the standard fixed-grid `lax.scan`, so training the hypernet is plain
`jax.grad` through the solver. Method names: ``'hyper_euler'``,
``'hyper_midpoint'``, ``'hyper_heun'``.

Times/values are mapped back to user space (t = sign * tau, f = sign * g_tau)
before calling the hypernet, so a net trained on forward-time residuals sees
the same inputs regardless of integration direction.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp

from ..ops.pytree import flatten_state
from .base import CanonicalProblem, SolveResult
from .fixed_grid import build_grid_from_options, solve_fixed_grid

Array = jax.Array


def _wrap_hypernet(prob: CanonicalProblem, hypernet: Callable) -> Callable:
    """Lift a user-space hypernet g(t, y_pytree, f_pytree) -> pytree to flat
    tau-space: inputs are unraveled, the output is raveled, and time /
    derivative are converted back to user space."""
    unravel = prob.unravel
    sign = prob.sign
    dtype = prob.dtype
    native = prob.native

    def g_flat(tau: Array, y_flat: Array, f_flat: Array) -> Array:
        t_user = (sign * tau).astype(prob.time_dtype)
        f_user = unravel((sign.astype(dtype) * f_flat))
        out = hypernet(t_user, unravel(y_flat), f_user)
        if native:
            out = jnp.asarray(out)
            if out.shape != y_flat.shape:
                raise ValueError(
                    f"hypernet returned shape {out.shape}, expected the "
                    f"state shape {y_flat.shape}")
            return out.astype(dtype)
        out_flat, _ = flatten_state(out)
        return out_flat.astype(dtype)

    return g_flat


def _hyper_step(prob: CanonicalProblem, hypernet: Callable, kind: str):
    g = _wrap_hypernet(prob, hypernet)
    dtype = prob.dtype
    # The solver integrates in tau = sign*t with dt_tau > 0; the learned
    # residual approximates the USER-time truncation error, whose step
    # factor is dt_user^(p+1) = (sign*dt_tau)^(p+1). For odd p+1 the sign
    # matters — without it a reverse-time solve ADDS the forward-trained
    # correction and degrades below the base method.
    sign_y = prob.sign.astype(dtype)

    def step(func, t0, dt, y):
        f0 = func(t0, y)
        dt_y = jnp.asarray(dt, dtype)
        if kind == "euler":          # order p = 1
            base = f0
            power, n_evals = 2, 1
        elif kind == "midpoint":     # order p = 2
            k2 = func(t0 + 0.5 * dt, y + 0.5 * dt_y * f0)
            base = k2
            power, n_evals = 3, 2
        elif kind == "heun":         # order p = 2
            k2 = func(t0 + dt, y + dt_y * f0)
            base = 0.5 * (f0 + k2)
            power, n_evals = 3, 2
        else:  # pragma: no cover
            raise ValueError(kind)
        y1 = y + dt_y * base + (sign_y * dt_y) ** power * g(t0, y, f0)
        return y1, f0, n_evals

    return step


def _make(kind: str):
    def impl(prob: CanonicalProblem, options: dict, rtol, atol
             ) -> SolveResult:
        hypernet = options.get("hypernet")
        if hypernet is None:
            raise ValueError(
                f"method 'hyper_{kind}' requires options={{'hypernet': g}} "
                "with g(t, y, f) -> pytree like y")
        grid = build_grid_from_options(prob.tau * prob.sign, options, prob)
        return solve_fixed_grid(prob, None, grid=grid,
                                step_fn=_hyper_step(prob, hypernet, kind))

    return impl


from ..odeint import register_solver  # noqa: E402

_HYPER_OPTIONS = {"hypernet", "step_size", "num_steps", "grid_constructor",
                  "fuse"}
register_solver("hyper_euler", "custom", _make("euler"),
                allowed=_HYPER_OPTIONS)
register_solver("hyper_midpoint", "custom", _make("midpoint"),
                allowed=_HYPER_OPTIONS)
register_solver("hyper_heun", "custom", _make("heun"),
                allowed=_HYPER_OPTIONS)
