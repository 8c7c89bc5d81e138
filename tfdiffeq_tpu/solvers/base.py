"""Problem canonicalization and solve results.

Capability parity with upstream `tfdiffeq/misc.py` `_check_inputs` /
`_ReverseFunc` / `_assert_increasing` and `tfdiffeq/solvers.py` base classes
(SURVEY.md §2, §3.1) — redesigned for XLA:

- The reference normalizes tuple-vs-tensor state and *eagerly* branches on
  whether `t` is decreasing, negating both `t` and `f`. Under `jit`, time
  values are traced, so direction is handled **algebraically**: we integrate
  in tau = sign * t (always increasing) with g(tau, y) = sign * f(sign*tau, y),
  where sign is a traced scalar. One compiled executable serves both
  directions with zero retraces.
- Status/error reporting: Python exceptions cannot cross `lax.while_loop`, so
  solves carry an integer status code out of the loop (SURVEY.md §5 "Failure
  detection"). `raise_on_failure` turns them into host-side errors via
  `jax.debug` / checkify-style helpers in utils.
"""

from __future__ import annotations

import enum
from typing import Any, Callable, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.pytree import flat_ode_func, flatten_state

Array = jax.Array


class Status(enum.IntEnum):
    OK = 0
    MAX_STEPS_REACHED = 1
    DT_UNDERFLOW = 2          # step size collapsed (usually non-finite f)
    INVALID_TIMES = 3         # non-increasing time span reached a compiled
    #                           solve (traced t bypasses eager validation)


class SolverStats(NamedTuple):
    nfe: Array            # number of func evaluations
    n_accepted: Array     # accepted steps
    n_rejected: Array     # rejected steps
    status: Array         # Status code (int32 scalar)


class SolveResult(NamedTuple):
    ys: Any               # pytree, leaves [T, ...]
    stats: SolverStats
    telemetry: Any = None  # optional StepTelemetry (options={'telemetry':1})
    dense: Any = None      # optional DenseOutput (options={'dense_output':1})
    # optional per-sample SolverStats with [B]-shaped leaves
    # (options={'per_sample': True} on the fused tier: every batch lane
    # ran its own step controller; see fast.solve_fused)
    lane_stats: Any = None


class DenseOutput(NamedTuple):
    """Per-accepted-step dense-output interpolants (bounded mode,
    `options={'dense_output': True}`): evaluate the solution anywhere in
    [t[0], t[-1]] after the solve, and drive the interpolated adjoint
    (Daulbaev et al. 2020). Arrays live in CANONICAL tau space
    (tau = sign * t increasing; see canonicalize)."""
    t0s: Array       # [S] step start times (tau)
    t1s: Array       # [S] step end times (tau, non-decreasing)
    dts: Array       # [S] step sizes (> 0)
    coeffs: Array    # [S, 5, N] quartic/Hermite coefficients (flat state)
    sign: Array      # scalar: tau = sign * t

    def eval_flat(self, t: Array) -> Array:
        """Evaluate the FLAT solution at time(s) t (user time space)."""
        import jax.numpy as jnp
        tau = (self.sign * jnp.asarray(t)).reshape(-1)
        idx = jnp.clip(jnp.searchsorted(self.t1s, tau, side="left"), 0,
                       self.t1s.shape[0] - 1)
        x = ((tau - self.t0s[idx]) / self.dts[idx])[:, None]
        x = x.astype(self.coeffs.dtype)
        c = self.coeffs[idx]
        out = ((((c[:, 0] * x + c[:, 1]) * x + c[:, 2]) * x + c[:, 3]) * x
               + c[:, 4])
        return out if jnp.ndim(t) else out[0]


@jax.tree_util.register_pytree_node_class
class BlockDenseOutput:
    """Dense output from a GRID-BLOCKED fused solve (batches past the
    kernel's VMEM budget run as sequential lane-block programs, each with
    its own controller and therefore its own accepted-step grid).

    Same `eval_flat` contract as :class:`DenseOutput` — evaluate the flat
    solution anywhere in [t[0], t[-1]] — but the interpolant search runs
    PER BLOCK (vmapped searchsorted over the block axis) and the flat
    state is reassembled from the block lane slices, dropping wrap-pad
    samples. Registered as a pytree (arrays are children; the static
    true-batch/dim are aux) so it crosses jit / custom_vjp boundaries.

    t0s/t1s/dts: [G, S] per-block step metadata (+inf t1 tail rows);
    coeffs: [G, S, 5, Nb] per-block flat interpolants (Nb = Bb * D,
    batch-major like DenseOutput); sign: tau = sign * t.
    """

    def __init__(self, t0s, t1s, dts, coeffs, sign, b_orig: int, d: int):
        self.t0s, self.t1s, self.dts = t0s, t1s, dts
        self.coeffs = coeffs
        self.sign = sign
        self.b_orig = int(b_orig)
        self.d = int(d)

    def tree_flatten(self):
        return ((self.t0s, self.t1s, self.dts, self.coeffs, self.sign),
                (self.b_orig, self.d))

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children, *aux)

    def eval_flat(self, t):
        """Evaluate the FLAT solution ([b_orig * d]) at time(s) t."""
        import jax
        import jax.numpy as jnp
        tau = (self.sign * jnp.asarray(t)).reshape(-1)

        def one_block(t0s, t1s, dts, coeffs):
            idx = jnp.clip(jnp.searchsorted(t1s, tau, side="left"), 0,
                           t1s.shape[0] - 1)
            x = ((tau - t0s[idx]) / dts[idx])[:, None]
            x = x.astype(coeffs.dtype)
            c = coeffs[idx]
            return ((((c[:, 0] * x + c[:, 1]) * x + c[:, 2]) * x
                     + c[:, 3]) * x + c[:, 4])      # [Q, Nb]

        per_block = jax.vmap(one_block)(self.t0s, self.t1s, self.dts,
                                        self.coeffs)   # [G, Q, Nb]
        G, Q, Nb = per_block.shape
        full = jnp.transpose(per_block, (1, 0, 2)).reshape(
            Q, G * (Nb // self.d), self.d)             # [Q, B_pad, D]
        out = full[:, :self.b_orig].reshape(Q, self.b_orig * self.d)
        return out if jnp.ndim(t) else out[0]


class CanonicalProblem(NamedTuple):
    func: Callable[[Array, Array], Array]   # g(tau, y_canon) -> dy_canon
    y0: Array                               # canonical initial state (see
    #                                         `native`): flat [N], or the
    #                                         user's own array shape
    tau: Array                              # [T] increasing times
    sign: Array                             # +1/-1 scalar (tau = sign * t)
    unravel: Callable[[Array], Any]
    dtype: Any                              # state dtype
    time_dtype: Any
    user_func: Any = None                   # original func(t, y_pytree)
    user_y0: Any = None                     # original pytree y0
    valid: Any = None                       # scalar bool: tau increasing
    #   (traced t bypasses the eager monotonicity check; solvers report
    #    Status.INVALID_TIMES when this is False)
    native: bool = False                    # y0 kept in its NATIVE shape
    #   (single-array states, ndim >= 1). On TPU, [N] <-> [B, D] reshapes
    #   are physical tile repacks costing ~60 us per dopri5 attempt at the
    #   benchmark config (~12 repacks/attempt, measured on v5e); keeping the
    #   user's shape through the engines removes them. Multi-leaf pytrees
    #   and rank-0 states still ravel to flat [N].


def canonicalize(func: Callable, y0: Any, t: Array) -> CanonicalProblem:
    """Normalize (func, y0, t) into a forward-time problem over a single
    canonical state array (the user's native array shape when y0 is one
    array, else the raveled flat [N] pytree vector)."""
    native = bool(jax.tree_util.all_leaves([y0])) and jnp.ndim(y0) >= 1
    if native:
        y_flat = jnp.asarray(y0)
        unravel = _identity_unravel
    else:
        y_flat, unravel = flatten_state(y0)
    if not jnp.issubdtype(y_flat.dtype, jnp.inexact):
        raise TypeError(
            f"y0 must have floating/complex dtype, got {y_flat.dtype}")
    dtype = y_flat.dtype

    t = jnp.asarray(t)
    if t.ndim == 0:
        t = t[None]
    if t.ndim != 1:
        raise ValueError(f"t must be a 1-D array of times, got shape {t.shape}")
    time_dtype = t.dtype if jnp.issubdtype(t.dtype, jnp.floating) else (
        jnp.real(y_flat).dtype if jnp.issubdtype(dtype, jnp.complexfloating)
        else dtype)
    t = t.astype(time_dtype)

    # Eager monotonicity validation when times are concrete (the reference's
    # `_assert_increasing`); skipped silently for traced t.
    if not isinstance(t, jax.core.Tracer) and t.shape[0] > 1:
        tv = np.asarray(t)
        d = np.diff(tv)
        if not (np.all(d > 0) or np.all(d < 0)):
            raise ValueError("t must be strictly monotonic (increasing or "
                             f"decreasing); got {tv}")

    sign = jnp.where(t[-1] >= t[0], 1.0, -1.0).astype(time_dtype)
    tau = sign * t
    valid = (jnp.all(jnp.diff(tau) > 0) if t.shape[0] > 1
             else jnp.asarray(True))

    if native:
        shape = y_flat.shape

        def f_flat(tt: Array, y: Array) -> Array:
            dy = jnp.asarray(func(tt, y))
            if dy.shape != shape:
                raise ValueError(
                    f"func(t, y) returned shape {dy.shape}, expected the "
                    f"state shape {shape}")
            return dy.astype(dtype)
    else:
        f_flat = flat_ode_func(func, unravel, dtype)

    def g(s: Array, y: Array) -> Array:
        return sign.astype(dtype) * f_flat((sign * s).astype(time_dtype), y)

    return CanonicalProblem(g, y_flat, tau, sign, unravel, dtype, time_dtype,
                            user_func=func, user_y0=y0, valid=valid,
                            native=native)


def _identity_unravel(x: Array) -> Array:
    return x


def time_mask_shape(n: int, y_ndim: int):
    """Broadcast shape for a [T] mask against a [T, *state] buffer."""
    return (n,) + (1,) * y_ndim


def empty_stats(nfe: int = 0) -> SolverStats:
    z = jnp.asarray(0, jnp.int32)
    return SolverStats(jnp.asarray(nfe, jnp.int32), z, z,
                       jnp.asarray(int(Status.OK), jnp.int32))


#: Options accepted by fixed-grid solvers (euler/midpoint/rk4/rk4_38).
FIXED_GRID_OPTIONS = frozenset({"grid_constructor", "step_size",
                                "num_steps", "fuse"})

#: Options accepted by adaptive embedded-RK solvers.
ADAPTIVE_OPTIONS = frozenset({
    "first_step", "safety", "ifactor", "dfactor", "max_num_steps", "norm",
    "max_steps", "chunk_size", "loop", "pcoeff", "icoeff", "dt_min",
    "telemetry", "unroll", "dense_output", "fuse", "per_sample",
})

_KNOWN_OPTIONS = frozenset({
    # reference-compatible (upstream solver `options` dicts, SURVEY.md §5
    # "Config / flag system")
    "first_step", "safety", "ifactor", "dfactor", "max_num_steps",
    "grid_constructor", "step_size", "num_steps", "max_order",
    "max_iters", "norm",
    # TPU-native extensions
    "max_steps", "chunk_size", "loop", "pcoeff", "icoeff", "dt_min",
    "implicit", "hypernet", "telemetry", "unroll", "dense_output", "fuse",
})


def check_options(options: Optional[dict], allowed: Optional[set] = None) -> dict:
    """Validate an options dict (reference: `_handle_unused_kwargs` warns on
    unused kwargs; we raise on unknown keys to fail fast under jit)."""
    options = dict(options or {})
    allowed = allowed if allowed is not None else _KNOWN_OPTIONS
    unknown = set(options) - set(allowed)
    if unknown:
        raise TypeError(f"Unknown solver options: {sorted(unknown)}; "
                        f"allowed: {sorted(allowed)}")
    return options


def linear_interp_at(grid: Array, ys_grid: Array, ts: Array) -> Array:
    """Linearly interpolate a grid trajectory onto requested times.

    grid: [G] increasing; ys_grid: [G, *state]; ts: [T] (within
    [grid[0], grid[-1]]). Parity: the fixed-grid output interpolation in
    upstream `tfdiffeq/solvers.py` `FixedGridODESolver.integrate`
    (SURVEY.md §3.2).
    """
    idx = jnp.clip(jnp.searchsorted(grid, ts, side="left"), 1,
                   grid.shape[0] - 1)
    t_lo = grid[idx - 1]
    t_hi = grid[idx]
    span = t_hi - t_lo
    w = jnp.where(span > 0, (ts - t_lo) / jnp.where(span > 0, span, 1.0), 0.0)
    w = w.astype(ys_grid.dtype).reshape(
        time_mask_shape(ts.shape[0], ys_grid.ndim - 1))
    return ys_grid[idx - 1] * (1.0 - w) + ys_grid[idx] * w


def hermite_interp_at(grid: Array, ys_grid: Array, fs_grid: Array,
                      ts: Array) -> Array:
    """Cubic-Hermite interpolation of a grid trajectory onto requested times.

    Upgrade over the reference's linear output interpolation (O(h^2)): uses
    the derivative values already computed at every grid node for O(h^4)
    output accuracy at zero extra func evaluations.

    grid: [G] increasing; ys_grid, fs_grid: [G, *state]; ts: [T].
    """
    idx = jnp.clip(jnp.searchsorted(grid, ts, side="left"), 1,
                   grid.shape[0] - 1)
    t_lo = grid[idx - 1]
    t_hi = grid[idx]
    h = t_hi - t_lo
    bshape = time_mask_shape(ts.shape[0], ys_grid.ndim - 1)
    x = jnp.where(h > 0, (ts - t_lo) / jnp.where(h > 0, h, 1.0), 0.0)
    x = x.astype(ys_grid.dtype).reshape(bshape)
    h = h.astype(ys_grid.dtype).reshape(bshape)
    y_lo, y_hi = ys_grid[idx - 1], ys_grid[idx]
    f_lo, f_hi = fs_grid[idx - 1], fs_grid[idx]
    x2 = x * x
    x3 = x2 * x
    h00 = 2 * x3 - 3 * x2 + 1
    h10 = x3 - 2 * x2 + x
    h01 = -2 * x3 + 3 * x2
    h11 = x3 - x2
    return h00 * y_lo + h10 * h * f_lo + h01 * y_hi + h11 * h * f_hi
