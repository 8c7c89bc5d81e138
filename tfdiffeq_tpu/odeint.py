"""`odeint` front-end: validate inputs, dispatch to a solver, integrate.

Capability parity with upstream `tfdiffeq/odeint.py` (SURVEY.md §2 "odeint
front-end"): same signature `odeint(func, y0, t, rtol, atol, method, options)`,
same `SOLVERS` method names, same defaults (rtol=1e-7, atol=1e-9,
method='dopri5'), tuple/pytree state, reverse time, options dict.

TPU-native extensions:
- `solve(...)` returns a `SolveResult` with on-device solver statistics
  (nfe / accepted / rejected / status) carried out of the compiled loop —
  the reference's NFE counters and `max_num_steps` eager raises, reworked for
  jit (SURVEY.md §5 "Tracing" / "Failure detection").
- `options['loop']`: 'bounded' (default; differentiable with plain jax.grad,
  closure-captured parameters included) or 'while' (fastest forward).
- rtol/atol may be scalars or pytrees matching y0 (per-leaf tolerances).
- Everything is jit-compatible: `jax.jit(lambda y0, t: odeint(f, y0, t))`
  compiles ONE executable per (method, state structure); t, rtol, atol are
  dynamic.
"""

from __future__ import annotations

from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp

from .ops.controller import StepController
from .ops.pytree import flatten_state, unravel_trajectory
from .ops import tableaus
from .solvers.adaptive import AdaptiveConfig, solve_adaptive
from .solvers.base import (ADAPTIVE_OPTIONS, FIXED_GRID_OPTIONS,
                           SolveResult, SolverStats, canonicalize,
                           check_options)
from .solvers.fixed_grid import build_grid_from_options, solve_fixed_grid

Array = jax.Array

_FIXED_TABLEAUS = {
    "euler": tableaus.EULER,
    "midpoint": tableaus.MIDPOINT,
    "rk4": tableaus.RK4,
    "rk4_38": tableaus.RK4_38,
}

_ADAPTIVE_TABLEAUS = {
    "dopri5": tableaus.DOPRI5,
    "bosh3": tableaus.BOSH3,
    "adaptive_heun": tableaus.ADAPTIVE_HEUN,
    "tsit5": tableaus.TSIT5,
    "dopri8": tableaus.DOPRI8,
}

#: Public solver registry (parity with upstream `SOLVERS` dict in
#: `tfdiffeq/odeint.py`; SURVEY.md §2). Adams-family methods are registered
#: by `solvers/fixed_adams.py` / `solvers/adams.py` at import time.
SOLVERS = {}
SOLVERS.update({k: ("fixed", v) for k, v in _FIXED_TABLEAUS.items()})
SOLVERS.update({k: ("adaptive", v) for k, v in _ADAPTIVE_TABLEAUS.items()})

#: Per-custom-solver option allowlists (populated by register_solver).
_CUSTOM_ALLOWED = {}


def register_solver(name: str, kind: str, impl, allowed=None) -> None:
    """Register a custom solver; `allowed` is its option allowlist (falls
    back to the permissive global set)."""
    SOLVERS[name] = (kind, impl)
    if allowed is not None:
        _CUSTOM_ALLOWED[name] = frozenset(allowed)


def _resolve_tolerance(tol, y0) -> Any:
    """Scalar tolerance passes through; a pytree matching y0's structure is
    broadcast leaf-wise to y0's leaf shapes, then aligned with the canonical
    state (the y0 array's own shape for native single-array states, the
    raveled flat [N] vector otherwise) — per-leaf scalar tolerances work."""
    if isinstance(tol, (int, float)) or (
            hasattr(tol, "ndim") and jnp.ndim(tol) == 0
            and not isinstance(tol, dict)):
        return tol
    tol_b = jax.tree_util.tree_map(
        lambda tl, yl: jnp.broadcast_to(jnp.asarray(tl, yl.dtype), yl.shape),
        tol, y0)
    if jax.tree_util.all_leaves([y0]) and jnp.ndim(y0) >= 1:
        return tol_b           # canonical state keeps the native shape
    flat, _ = flatten_state(tol_b)
    return flat


#: options the fused whole-solve kernel honors; any OTHER adaptive option
#: present alongside 'fuse' routes the call to the generic engine instead
#: (the kernel has no telemetry/dense-output/custom-norm machinery).
#: 'per_sample' runs the PER-LANE controller kernel (each batch element
#: steps adaptively on its own; SolveResult.lane_stats carries per-sample
#: nfe/accepted/rejected/status).
#: 'dot_precision' selects the MXU dot tier for the kernel's matmuls
#: ('highest' default / 'mixed' 2-pass adaptive-safe / 'bf16' one-pass
#: fixed-grid serving — MLPSpec.dot_precision's rules, applied to
#: arbitrary bridge-compiled dynamics). It is kernel-only by nature, so
#: unfusable dynamics raise instead of silently falling back to a
#: differently-precisioned generic solve.
_FUSABLE_OPTIONS = frozenset({"first_step", "max_num_steps", "safety",
                              "ifactor", "dfactor", "loop", "per_sample",
                              "dot_precision"})

#: fixed-grid options the fused fixed kernel honors (arbitrary
#: `grid_constructor` callables stay on the generic engine).
_FUSABLE_FIXED_OPTIONS = frozenset({"step_size", "num_steps",
                                    "dot_precision"})

#: fixed-step Adams methods with a whole-solve kernel (ops/pallas_fixed)
#: and the options it honors.
_FUSABLE_ADAMS_METHODS = frozenset({"explicit_adams", "fixed_adams"})
_FUSABLE_ADAMS_OPTIONS = frozenset({"step_size", "num_steps", "max_order",
                                    "max_iters"})

#: VCABM ('adams') whole-solve kernel options (ops/pallas_vcabm; custom
#: norms stay on the generic engine).
_FUSABLE_VCABM_OPTIONS = frozenset({"max_order", "first_step", "safety",
                                    "ifactor", "dfactor", "max_num_steps"})

#: hypersolver whole-solve kernel options (ops/pallas_fixed; the hypernet
#: itself must be fusable or the generic engine runs).
_FUSABLE_HYPER_METHODS = frozenset({"hyper_euler", "hyper_midpoint",
                                    "hyper_heun"})
_FUSABLE_HYPER_OPTIONS = frozenset({"hypernet", "step_size", "num_steps"})


def _try_fused(func, y0, t, rtol, atol, method, options, kind="adaptive"):
    """Attempt the jaxpr->Pallas fused solve; None => use the generic
    engine (with a warning naming the reason)."""
    import warnings

    from .ops.jaxpr_bridge import FusionError

    try:
        if (options.get("dot_precision", "highest") != "highest"
                and (method == "adams"
                     or method in _FUSABLE_ADAMS_METHODS)):
            raise ValueError(
                f"dot_precision={options['dot_precision']!r} is not "
                "supported on the Adams kernels (their corrector/order "
                "machinery assumes f32-accurate dots); use an RK method")
        if kind == "adaptive":
            allowed = _FUSABLE_OPTIONS
        elif method == "adams":
            allowed = _FUSABLE_VCABM_OPTIONS
        elif method in _FUSABLE_ADAMS_METHODS:
            allowed = _FUSABLE_ADAMS_OPTIONS
        elif method in _FUSABLE_HYPER_METHODS:
            allowed = _FUSABLE_HYPER_OPTIONS
        else:
            allowed = _FUSABLE_FIXED_OPTIONS
        unsupported = set(options) - allowed
        if unsupported:
            raise FusionError(f"options {sorted(unsupported)} are not "
                              "supported by the fused kernel")
        for tol in (rtol, atol):
            if not (isinstance(tol, (int, float)) or jnp.ndim(tol) == 0):
                raise FusionError("per-leaf tolerance pytrees are not "
                                  "supported by the fused kernel")
        # Pytree (tuple/dict) states ride the fused tier via the
        # feature-concat adapter (fast.tree_state_adapter) — the
        # reference's tuple-of-tensors capability on the fast path.
        # Hypersolvers are array-only (the correction net's [y; f] input
        # contract is defined on the flat feature axis).
        rebuild = None
        if method in _FUSABLE_HYPER_METHODS:
            if not (hasattr(y0, "ndim") and jnp.ndim(y0) in (1, 2)):
                raise FusionError(
                    "fused hypersolvers need a [B, D] (or [D]) array "
                    "state")
        else:
            from .fast import tree_state_adapter
            adapted = tree_state_adapter(func, y0)
            if adapted is not None:
                func, y0, rebuild = adapted
        from .fast import solve_fused
        if method in _FUSABLE_HYPER_METHODS:
            from .fast import solve_hyper
            hypernet = options.get("hypernet")
            if hypernet is None:
                raise ValueError(
                    f"method {method!r} requires options={{'hypernet': g}}")
            return solve_hyper(
                func, hypernet, y0, t, method=method,
                num_steps=options.get("num_steps"),
                step_size=options.get("step_size"))
        if method == "adams":
            res = solve_fused(
                func, y0, t, rtol=rtol, atol=atol, method=method,
                max_num_steps=options.get("max_num_steps"),
                first_step=options.get("first_step"),
                safety=float(options.get("safety", 0.9)),
                ifactor=float(options.get("ifactor", 10.0)),
                dfactor=float(options.get("dfactor", 0.2)),
                max_order=int(options.get("max_order", 12)))
        elif method in _FUSABLE_ADAMS_METHODS:
            res = solve_fused(
                func, y0, t, rtol=rtol, atol=atol, method=method,
                num_steps=options.get("num_steps"),
                step_size=options.get("step_size"),
                max_order=int(options.get("max_order", 4)),
                max_iters=int(options.get("max_iters", 4)))
        elif kind == "fixed":
            res = solve_fused(
                func, y0, t, method=method,
                num_steps=options.get("num_steps"),
                step_size=options.get("step_size"),
                dot_precision=options.get("dot_precision", "highest"))
        else:
            res = solve_fused(
                func, y0, t, rtol=rtol, atol=atol, method=method,
                max_num_steps=options.get("max_num_steps"),
                first_step=options.get("first_step"),
                safety=float(options.get("safety", 0.9)),
                ifactor=float(options.get("ifactor", 10.0)),
                dfactor=float(options.get("dfactor", 0.2)),
                per_sample=bool(options.get("per_sample", False)),
                dot_precision=options.get("dot_precision", "highest"))
        if rebuild is not None:
            res = res._replace(ys=rebuild(res.ys))
        return res
    except FusionError as e:
        if options.get("dot_precision", "highest") != "highest":
            # A reduced-precision request is kernel-only; the generic
            # engine would integrate a DIFFERENT (f32-weight, HIGHEST)
            # model, so fail loudly instead of silently falling back.
            raise ValueError(
                f"options={{'dot_precision': "
                f"{options['dot_precision']!r}}} requires the fused "
                f"kernel, but fusion failed: {e}") from e
        if (kind == "adaptive" and options.get("per_sample")
                and hasattr(y0, "ndim") and jnp.ndim(y0) == 2):
            # Per-sample semantics must survive the fallback: a shared-
            # controller generic solve is NOT what the user asked for, so
            # vmap the generic engine instead (slow but exact semantics).
            warnings.warn(
                f"odeint(options={{'fuse': True, 'per_sample': True}}): "
                f"falling back to jax.vmap of the generic engine — {e}",
                stacklevel=3)
            return _per_sample_vmap(func, y0, t, rtol, atol, method,
                                    options)
        warnings.warn(f"odeint(options={{'fuse': True}}): falling back to "
                      f"the generic engine — {e}", stacklevel=3)
        return None


def _per_sample_vmap(func, y0, t, rtol, atol, method, options):
    """jax.vmap of the generic adaptive solve, one controller per sample —
    the semantic fallback for options={'per_sample': True} when the
    per-lane kernel is unavailable. Returns a SolveResult whose scalar
    stats sum the per-sample counts (status = max) and whose lane_stats
    carry the [B]-shaped per-sample SolverStats."""
    opts = {k: v for k, v in options.items()
            if k not in ("fuse", "per_sample")}
    opts.setdefault("loop", "while")

    def one(yb):
        res = solve(func, yb[None, :], t, rtol=rtol, atol=atol,
                    method=method, options=opts)
        return res.ys[:, 0], res.stats

    ys_b, stats_b = jax.vmap(one)(y0)          # ys_b: [B, T, D]
    ys = jnp.transpose(ys_b, (1, 0, 2))
    st = SolverStats(jnp.sum(stats_b.nfe), jnp.sum(stats_b.n_accepted),
                     jnp.sum(stats_b.n_rejected),
                     jnp.max(stats_b.status))
    return SolveResult(ys, st, None, None, stats_b)


def solve(
    func: Callable,
    y0: Any,
    t,
    *,
    rtol=1e-7,
    atol=1e-9,
    method: Optional[str] = None,
    options: Optional[dict] = None,
) -> SolveResult:
    """Integrate dy/dt = func(t, y) and return trajectory + solver stats."""
    method = method or "dopri5"
    if method not in SOLVERS:
        raise ValueError(
            f"Unknown method {method!r}; available: {sorted(SOLVERS)}")
    kind = SOLVERS[method][0]
    # Per-method allowlists fail fast on options the chosen method would
    # silently ignore (the reference merely warns via _handle_unused_kwargs).
    if kind == "fixed":
        allowed = FIXED_GRID_OPTIONS
    elif kind == "adaptive":
        allowed = ADAPTIVE_OPTIONS
    else:
        allowed = _CUSTOM_ALLOWED.get(method)  # None -> global set
    if ((options or {}).get("fuse") and kind not in ("adaptive", "fixed")
            and method not in _FUSABLE_ADAMS_METHODS
            and method not in _FUSABLE_HYPER_METHODS
            and method != "adams"):
        raise ValueError("options={'fuse': True} is not supported for "
                         f"method {method!r} (every built-in method — "
                         "adaptive RK, fixed-grid, Adams, hypersolvers — "
                         "has a whole-solve kernel; custom registered "
                         "solvers run the generic engine)")
    if (options or {}).get("dot_precision", "highest") != "highest":
        # Kernel-only knob: validated here (ahead of the per-method
        # allowlists, which don't know it) so a reduced-precision request
        # can never silently run a HIGHEST generic solve.
        if not (options or {}).get("fuse"):
            raise ValueError(
                "options={'dot_precision': ...} requires the fused "
                "kernel: pass options={'fuse': True, 'dot_precision': "
                "...}")
    options = dict(options or {})
    _dot_prec = options.pop("dot_precision", None)
    options = check_options(options, allowed)
    if _dot_prec is not None and _dot_prec != "highest":
        # (an explicit 'highest' is the default — dropped so the generic
        # paths below never see the kernel-only key)
        options["dot_precision"] = _dot_prec

    # jaxpr -> Pallas auto-fusion (options={'fuse': True}): compile the
    # user dynamics into the whole-solve kernel when they fall inside the
    # fusable primitive subset; anything else falls back to the generic
    # engine below with a warning (fusion never changes semantics).
    if options.pop("fuse", False):
        res = _try_fused(func, y0, t, rtol, atol, method, options,
                         kind=kind)
        if res is not None:
            return res
    if options.pop("per_sample", False):
        # per_sample without fuse (or after a non-per-sample-preserving
        # fallback): one controller per sample via vmap of the generic
        # engine. The fused per-lane kernel is the fast path
        # (options={'fuse': True, 'per_sample': True}).
        if kind != "adaptive":
            raise ValueError("options={'per_sample': True} applies to "
                             "adaptive methods only")
        if not (hasattr(y0, "ndim") and jnp.ndim(y0) == 2):
            raise ValueError("per_sample needs a [B, D] array state")
        return _per_sample_vmap(func, y0, t, rtol, atol, method, options)

    prob = canonicalize(func, y0, t)
    rtol = _resolve_tolerance(rtol, y0)
    atol = _resolve_tolerance(atol, y0)

    _, impl = SOLVERS[method]
    if kind == "fixed":
        grid = build_grid_from_options(jnp.asarray(t), options, prob)
        result = solve_fixed_grid(prob, impl, grid=grid)
    elif kind == "adaptive":
        ctrl = StepController(
            safety=float(options.get("safety", 0.9)),
            ifactor=float(options.get("ifactor", 10.0)),
            dfactor=float(options.get("dfactor", 0.2)),
            icoeff=float(options.get("icoeff", 1.0)),
            pcoeff=float(options.get("pcoeff", 0.0)),
        )
        if options.get("telemetry") and options.get("loop",
                                                     "bounded") != "bounded":
            raise ValueError("options={'telemetry': True} requires the "
                             "bounded loop (per-attempt history needs a "
                             "static step budget)")
        norm = options.get("norm")
        if norm == "max":
            from .ops.norms import max_norm
            norm = max_norm
        elif norm == "rms":
            norm = None            # the default
        elif isinstance(norm, str):
            raise ValueError(f"unknown norm {norm!r}: expected 'rms', "
                             "'max', or a callable")
        if options.get("dense_output") and options.get(
                "loop", "bounded") != "bounded":
            raise ValueError("options={'dense_output': True} requires the "
                             "bounded loop (per-step interpolants need a "
                             "static step budget)")
        cfg = AdaptiveConfig(
            tableau=impl,
            controller=ctrl,
            loop=options.get("loop", "bounded"),
            telemetry=bool(options.get("telemetry", False)),
            max_steps=int(options.get("max_steps", 1024)),
            chunk_size=int(options.get("chunk_size", 32)),
            norm=norm,
            unroll=int(options.get("unroll", 1)),
            emit_dense=bool(options.get("dense_output", False)),
        )
        result = solve_adaptive(
            prob, cfg, rtol, atol,
            first_step=options.get("first_step"),
            dt_min=options.get("dt_min"),
            max_num_steps=options.get("max_num_steps"),
        )
    else:  # custom registered solver: impl(prob, options, rtol, atol)
        result = impl(prob, options, rtol, atol)

    # Traced non-monotonic t bypasses the eager check in canonicalize:
    # flag it on-device and zero the (meaningless) outputs beyond y0.
    stats = result.stats
    ys_flat = result.ys
    if prob.valid is not None:
        from .solvers.base import Status as _St
        stats = stats._replace(status=jnp.where(
            prob.valid, stats.status,
            jnp.asarray(int(_St.INVALID_TIMES), jnp.int32)))
        keep = prob.valid | (jnp.arange(ys_flat.shape[0]) == 0).reshape(
            (ys_flat.shape[0],) + (1,) * (ys_flat.ndim - 1))
        ys_flat = jnp.where(keep, ys_flat, jnp.zeros_like(ys_flat))
    ys = ys_flat if prob.native else unravel_trajectory(prob.unravel,
                                                        ys_flat)
    dense = result.dense
    if dense is not None:
        # Emissions are in tau space with the solver-local sign (always
        # +1); stamp the canonicalization sign so DenseOutput.eval_flat
        # maps user times correctly.
        dense = dense._replace(sign=prob.sign)
    return SolveResult(ys, stats, result.telemetry, dense)


def odeint(
    func: Callable,
    y0: Any,
    t,
    *,
    rtol=1e-7,
    atol=1e-9,
    method: Optional[str] = None,
    options: Optional[dict] = None,
) -> Any:
    """Reference-compatible front-end: returns the trajectory pytree whose
    leaves have a new leading time axis (ys[0] == y0).

    Differentiable with plain `jax.grad` (the analogue of the reference's
    taped direct backprop, SURVEY.md §3.4); use `odeint_adjoint` for
    O(1)-memory gradients.

    Failure surfacing (the reference raises on max_num_steps exhaustion):
    when the solver status is concrete (eager call), a non-OK status raises
    `RuntimeError`. Under jit/grad a Python raise is impossible, so the
    trajectory beyond y0 is NaN-poisoned instead — a truncated solve (e.g.
    exceeding the default bounded-mode budget of max_steps=1024) propagates
    loudly into any downstream loss rather than silently returning a stale
    tail. Use `solve(...)` to branch on `stats.status` yourself, or
    `utils.debug.checkify_solve` for in-jit functional errors.
    """
    res = solve(func, y0, t, rtol=rtol, atol=atol, method=method,
                options=options)
    status = res.stats.status
    if not isinstance(status, jax.core.Tracer):
        code = int(status)
        if code != 0:
            from .solvers.base import Status
            raise RuntimeError(
                f"odeint solver failed with status {Status(code).name}; "
                "raise options['max_steps'] (bounded-loop step budget, "
                "default 1024) or loosen tolerances. Use solve() to get "
                "partial results + stats instead of raising.")
        return res.ys
    ok = status == 0

    def _poison(leaf):
        T = leaf.shape[0]
        keep = ok | (jnp.arange(T) == 0)
        keep = keep.reshape((T,) + (1,) * (leaf.ndim - 1))
        return jnp.where(keep, leaf, jnp.asarray(jnp.nan, leaf.dtype))

    return jax.tree_util.tree_map(_poison, res.ys)
