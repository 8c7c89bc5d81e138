"""Analytic fixture problems with exact solutions.

Parity with upstream `tests/problems.py` (SURVEY.md §4): ConstantODE,
SineODE, LinearODE, each exposing `y_exact(t)`, built for forward and
reversed time via `construct_problem`.
"""

from __future__ import annotations

import dataclasses
from typing import Callable

import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass
class Problem:
    name: str
    func: Callable          # func(t, y) -> dy
    y0: jnp.ndarray
    t: jnp.ndarray
    y_exact: Callable        # y_exact(t) vectorized over 1-D t


def constant_ode(dtype=jnp.float64, npts=10, reverse=False) -> Problem:
    """dy/dt = a + (y - (a*t + b))^5 ; exact solution y = a*t + b.

    The quintic correction vanishes on the solution manifold but sharply
    penalizes drift (same spirit as the reference's ConstantODE)."""
    a, b = 0.2, 3.0

    def func(t, y):
        return a + (y - (a * t + b)) ** 5

    def y_exact(t):
        return (a * t + b)[:, None].astype(dtype)

    t = np.linspace(1.0, 8.0, npts)
    if reverse:
        t = t[::-1].copy()
    y0 = y_exact(jnp.asarray(t))[0]
    return Problem("constant", func, jnp.asarray(y0, dtype),
                   jnp.asarray(t, dtype), y_exact)


def sine_ode(dtype=jnp.float64, npts=10, reverse=False) -> Problem:
    """dy/dt derived from y = 0.5 + sin(t)/t (the reference's SineODE)."""

    def y_exact(t):
        return (0.5 + jnp.sin(t) / t)[:, None].astype(dtype)

    def func(t, y):
        # d/dt [0.5 + sin(t)/t] = cos(t)/t - sin(t)/t**2, written in terms of
        # y to exercise state dependence: sin(t)/t = y - 0.5.
        return jnp.cos(t) / t - (y - 0.5) / t

    t = np.linspace(1.0, 8.0, npts)
    if reverse:
        t = t[::-1].copy()
    y0 = y_exact(jnp.asarray(t))[0]
    return Problem("sine", func, jnp.asarray(y0, dtype),
                   jnp.asarray(t, dtype), y_exact)


_A = np.array([[-0.1, 2.0], [-2.0, -0.1]])


def linear_ode(dtype=jnp.float64, npts=10, reverse=False) -> Problem:
    """dy/dt = A y with the reference's spiral matrix; exact via expm."""
    lam = -0.1
    om = 2.0
    y0 = np.array([2.0, 0.0])

    def y_exact(t):
        t = jnp.asarray(t)
        tt = t - 1.0
        e = jnp.exp(lam * tt)
        c, s = jnp.cos(om * tt), jnp.sin(om * tt)
        # expm(A*tt) for A = [[lam, om], [-om, lam]] acting on y0 = [2, 0]
        x = e * (c * y0[0] + s * y0[1])
        y = e * (-s * y0[0] + c * y0[1])
        return jnp.stack([x, y], axis=-1).astype(dtype)

    A = jnp.asarray([[lam, om], [-om, lam]], dtype)

    def func(t, y):
        return y @ A.T

    t = np.linspace(1.0, 8.0, npts)
    if reverse:
        t = t[::-1].copy()
    y0j = y_exact(jnp.asarray(t))[0]
    return Problem("linear", func, jnp.asarray(y0j, dtype),
                   jnp.asarray(t, dtype), y_exact)


PROBLEMS = {
    "constant": constant_ode,
    "sine": sine_ode,
    "linear": linear_ode,
}


def construct_problem(name: str, dtype=jnp.float64, npts=10,
                      reverse=False) -> Problem:
    return PROBLEMS[name](dtype=dtype, npts=npts, reverse=reverse)
