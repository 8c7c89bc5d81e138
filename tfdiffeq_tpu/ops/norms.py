"""Error norms and initial-step selection.

Capability parity with upstream `tfdiffeq/misc.py`: `_compute_error_ratio`
(RMS norm of error over tolerance scale) and `_select_initial_step`
(Hairer–Nørsett–Wanner algorithm 4.14) — SURVEY.md §2 "Numerics utils".

TPU-native notes: all reductions are single fused XLA reductions over the
flat state vector; guards use the double-`where` pattern so reverse-mode
gradients through the (differentiable-by-default) solve never produce NaNs
from sqrt/pow at zero.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp

Array = jax.Array


def rms_norm(x: Array) -> Array:
    """Root-mean-square norm with a NaN-safe gradient at 0.

    Uses |x|^2 so complex states (supported as a capability extension over
    the reference) get the correct real-valued norm."""
    if jnp.issubdtype(x.dtype, jnp.complexfloating):
        m = jnp.mean(jnp.real(x * jnp.conj(x)))
    else:
        m = jnp.mean(x * x)
    safe = jnp.where(m > 0.0, m, 1.0)
    return jnp.where(m > 0.0, jnp.sqrt(safe), 0.0)


def max_norm(x: Array) -> Array:
    return jnp.max(jnp.abs(x))


def error_ratio(
    y_err: Array,
    rtol: Array,
    atol: Array,
    y0: Array,
    y1: Array,
    norm: Optional[Callable[[Array], Array]] = None,
) -> Array:
    """err / (atol + rtol*max(|y0|,|y1|)) under `norm` (default RMS).

    Accept a step iff the result <= 1 (reference: `_compute_error_ratio` +
    the accept test in `_adaptive_dopri5_step`, SURVEY.md §3.1).
    """
    norm = norm or rms_norm
    scale = atol + rtol * jnp.maximum(jnp.abs(y0), jnp.abs(y1))
    return norm(y_err / scale)


def select_initial_step_per_sample(
    func: Callable[[Array, Array], Array],
    t0: Array,
    y0: Array,
    f0: Array,
    order: int,
    rtol: Array,
    atol: Array,
) -> Array:
    """HNW initial steps PER SAMPLE over a batch-major [B, D] state, with
    ONE batched probe evaluation (per-lane adaptive stepping,
    `options={'per_sample': True}`).

    All norms reduce over the feature axis only (the per-sample RMS the
    per-lane kernel's controller uses). The Euler probe evaluates the
    BATCHED func once, at scalar time t0 + min(h0) with per-sample probe
    states y0 + h0*f0 — exact per-sample probe TIMES would need B separate
    evaluations and break batch-coupled dynamics (funcs closing over
    per-sample constants), so strongly time-dependent-at-t0 dynamics get a
    slightly conservative d2. The controller recovers within a step either
    way; pass first_step to pin dt0 exactly."""
    rdt = jnp.finfo(y0.dtype).dtype
    scale = atol + jnp.abs(y0) * rtol

    def nrm(x):
        m = jnp.mean(jnp.real(x * jnp.conj(x))
                     if jnp.issubdtype(x.dtype, jnp.complexfloating)
                     else x * x, axis=1)
        safe = jnp.where(m > 0.0, m, 1.0)
        return jnp.where(m > 0.0, jnp.sqrt(safe), 0.0)

    d0 = nrm(y0 / scale)
    d1 = nrm(f0 / scale)
    small = (d0 < 1e-5) | (d1 < 1e-5)
    h0 = jnp.where(small, jnp.asarray(1e-6, rdt),
                   0.01 * d0 / jnp.where(d1 > 0.0, d1, 1.0)).astype(rdt)

    y1 = y0 + h0[:, None].astype(y0.dtype) * f0
    f1 = func(t0 + jnp.min(h0), y1)
    d2 = nrm((f1 - f0) / scale) / h0

    d_max = jnp.maximum(d1, d2)
    h1 = jnp.where(
        d_max <= 1e-15,
        jnp.maximum(jnp.asarray(1e-6, rdt), h0 * 1e-3),
        (0.01 / jnp.where(d_max > 0.0, d_max, 1.0)) ** (1.0 / (order + 1)),
    )
    return jnp.minimum(100.0 * h0, h1).astype(rdt)


def select_initial_step(
    func: Callable[[Array, Array], Array],
    t0: Array,
    y0: Array,
    f0: Array,
    order: int,
    rtol: Array,
    atol: Array,
    norm: Optional[Callable[[Array], Array]] = None,
) -> Array:
    """Empirical first step size (HNW Algorithm 4.14).

    Same algorithm the reference uses in `_select_initial_step`
    (upstream `tfdiffeq/misc.py`, SURVEY.md §2): two trial norms give h0, one
    explicit-Euler probe step refines it to h1. Costs exactly one extra func
    evaluation, all on device.
    """
    norm = norm or rms_norm
    # Step sizes are REAL even for complex states (norms are real-valued).
    rdt = jnp.finfo(y0.dtype).dtype
    scale = atol + jnp.abs(y0) * rtol
    d0 = norm(y0 / scale)
    d1 = norm(f0 / scale)

    small = (d0 < 1e-5) | (d1 < 1e-5)
    h0 = jnp.where(small, jnp.asarray(1e-6, rdt),
                   0.01 * d0 / jnp.where(d1 > 0.0, d1, 1.0)).astype(rdt)

    y1 = y0 + h0.astype(y0.dtype) * f0
    f1 = func(t0 + h0, y1)
    d2 = norm((f1 - f0) / scale) / h0

    d_max = jnp.maximum(d1, d2)
    h1 = jnp.where(
        d_max <= 1e-15,
        jnp.maximum(jnp.asarray(1e-6, rdt), h0 * 1e-3),
        (0.01 / jnp.where(d_max > 0.0, d_max, 1.0)) ** (1.0 / (order + 1)),
    )
    return jnp.minimum(100.0 * h0, h1).astype(rdt)
