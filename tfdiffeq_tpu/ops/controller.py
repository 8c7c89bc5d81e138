"""PI step-size controller.

Generalizes the reference's I-only controller (`_optimal_step_size` in
upstream `tfdiffeq/misc.py`; SURVEY.md §2) to a proportional–integral
controller (Gustafsson/Söderlind):

    dt_next = dt * clip(safety * ratio^(-icoeff/k) * prev_ratio^(-pcoeff/k),
                        lo, hi)

with k = solver order. The reference's exact behavior is the default
(icoeff=1, pcoeff=0, safety=0.9, ifactor=10, dfactor=0.2): on accept the step
never shrinks (lower clip 1), on reject it never grows (upper clip 1). The
whole controller is branch-free arithmetic living inside the on-device solver
loop — no host round-trips (BASELINE.json north star).
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp

Array = jax.Array


@dataclasses.dataclass(frozen=True)
class StepController:
    safety: float = 0.9
    ifactor: float = 10.0    # max growth per step
    dfactor: float = 0.2     # max shrink per step
    icoeff: float = 1.0      # integral gain (reference-equivalent: 1)
    pcoeff: float = 0.0      # proportional gain (reference-equivalent: 0)


def next_step_size(
    dt: Array,
    ratio: Array,
    prev_ratio: Array,
    accepted: Array,
    order: int,
    ctrl: StepController,
) -> Tuple[Array, Array]:
    """Compute the next step size and updated error-ratio history.

    Returns (dt_next, prev_ratio_next). `ratio` is the current step's error
    ratio (accept iff <= 1); `prev_ratio` the last *accepted* step's ratio.
    """
    k = float(order)
    tiny = jnp.asarray(jnp.finfo(dt.dtype).tiny, dt.dtype)
    r = jnp.maximum(ratio, tiny)
    rp = jnp.maximum(prev_ratio, tiny)

    factor = ctrl.safety * r ** (-ctrl.icoeff / k)
    if ctrl.pcoeff != 0.0:
        factor = factor * (r / rp) ** (-ctrl.pcoeff / k)

    # ratio == 0 (exact solution / zero error): grow maximally,
    # matching the reference's `if error_ratio == 0: return last * ifactor`.
    factor = jnp.where(ratio <= 0.0, ctrl.ifactor, factor)

    # Accept with I-only gains: clip to [1, ifactor] (never shrink an
    # accepted step — the reference forces dfactor=1 when ratio < 1). A PI
    # controller (pcoeff != 0) must be able to damp an accepted step, so
    # its accept-side lower clip stays dfactor. Reject: clip to [dfactor, 1].
    lo_acc = 1.0 if ctrl.pcoeff == 0.0 else ctrl.dfactor
    lo = jnp.where(accepted, lo_acc, ctrl.dfactor)
    hi = jnp.where(accepted, ctrl.ifactor, 1.0)
    dt_next = dt * jnp.clip(factor, lo, hi)

    prev_next = jnp.where(accepted, jnp.maximum(ratio, tiny), prev_ratio)
    return dt_next.astype(dt.dtype), prev_next.astype(prev_ratio.dtype)
