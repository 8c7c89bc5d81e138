"""O(1)-memory gradients via the continuous adjoint ODE.

Capability parity with upstream `tfdiffeq/adjoint.py` (SURVEY.md §2, §3.3):
`odeint_adjoint` integrates the augmented adjoint system backward over each
observation interval, re-injecting the output cotangent at every observation
time, so memory is O(1) in trajectory length (the forward solve is not
taped).

JAX-native design differences:
- The reference requires `func` to be a `tf.keras.Model` so its `.variables`
  can be collected. JAX has no implicit variable collection: parameters are
  passed explicitly as a pytree via `params`, and `func` is called as
  `func(t, y, params)` (or `func(t, y)` when `params=None`). Gradients flow
  to `y0`, `t`, and `params` through `jax.custom_vjp`.
- The backward sweep over observation intervals is a `lax.scan`; each
  interval runs the SAME compiled on-device solver (`loop='while'`) on the
  augmented state, with `jax.vjp` of the dynamics inside the loop providing
  the adjoint right-hand side. Reverse time needs no special casing: the
  solver integrates decreasing-time intervals natively (solvers/base.py).
- Time gradients follow the standard continuous-adjoint recipe (as in
  `jax.experimental.ode`): the augmented state carries the accumulated
  d(loss)/d(t0) term, and each observation time's gradient is
  dot(func(t_i, y_i), g_i).
- Observability (reference parity: `odenet_mnist.py` logs forward AND
  backward NFE per step, SURVEY.md §2/§5): `return_stats=True` returns the
  forward `SolverStats` alongside the trajectory, and `nfe_meter=NFEMeter()`
  streams both forward and backward solve stats to the host — backward
  stats are produced inside the custom_vjp backward rule, where they cannot
  be returned as values, so they ride an unordered io_callback.
- Fixed-grid adjoints with `step_size` on an irregular observation grid get
  a PER-INTERVAL backward grid: one `lax.scan` over the concatenated
  per-interval grids (ceil(span_i/h) steps each) with cotangent injection
  and stored-state resets at observation boundaries — total work matches
  the actual spans instead of (T-1) x ceil(max_span/h) uniform steps.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from .odeint import solve
from .ops.pytree import flatten_state
from .solvers.base import SolverStats
from .utils.nfe import emit_bwd, emit_fwd

Array = jax.Array


@dataclasses.dataclass(frozen=True)
class _BackwardWalk:
    """Static per-interval backward grid (fixed-grid adjoint + step_size).

    Steps walk time BACKWARD (t0s[j] > t1s[j]); `reset[j]` marks the first
    step of an observation interval, where the integrated state is reset to
    the stored forward value ys[obs[j]] and the cotangent g[obs[j]] is
    injected into the adjoint.
    """
    t0s: tuple
    t1s: tuple
    reset: tuple
    obs: tuple


def _build_backward_walk(t_np: np.ndarray, step_size: float) -> _BackwardWalk:
    T = t_np.shape[0]
    t0s, t1s, reset, obs = [], [], [], []
    for i in range(T - 1, 0, -1):
        span = abs(float(t_np[i] - t_np[i - 1]))
        n = max(1, int(np.ceil(span / float(step_size) - 1e-12)))
        seg = np.linspace(t_np[i], t_np[i - 1], n + 1)
        for j in range(n):
            t0s.append(float(seg[j]))
            t1s.append(float(seg[j + 1]))
            reset.append(j == 0)
            obs.append(i)
    return _BackwardWalk(tuple(t0s), tuple(t1s), tuple(reset), tuple(obs))


def odeint_adjoint(
    func: Callable,
    y0: Any,
    t,
    *,
    params: Any = None,
    rtol=1e-7,
    atol=1e-9,
    method: Optional[str] = None,
    options: Optional[dict] = None,
    adjoint_rtol=None,
    adjoint_atol=None,
    adjoint_method: Optional[str] = None,
    adjoint_options: Optional[dict] = None,
    adjoint_seminorm: bool = False,
    adjoint_mode: str = "resets",
    return_stats: bool = False,
    nfe_meter=None,
    forward_solver: Optional[Callable] = None,
) -> Any:
    """Like `odeint`, but gradients use the augmented adjoint ODE.

    func: callable(t, y, params) -> dy (or callable(t, y) if params is None).
    Returns the trajectory pytree (leaves [T, ...]); with
    `return_stats=True`, returns `(trajectory, SolverStats)` where the stats
    are the FORWARD solve's (nfe/accepted/rejected/status, on-device).

    nfe_meter: an `NFEMeter` (utils/nfe.py); every forward and backward
    solve streams its stats to it via io_callback — the jit-compatible
    replacement for the reference's Python-side `ODEfunc.nfe` counter that
    also covers the backward pass (SURVEY.md §2 "Example: ODE-Net MNIST").

    adjoint_seminorm: control the backward step size with a seminorm over
    only the (y, adjoint-y) components, excluding the parameter/time
    adjoints — they are pure quadratures that never feed back into the
    augmented dynamics, so erroring on them wastes steps (Kidger et al.
    2020, "Hey, that's not an ODE": typically 20-60%% fewer backward NFE
    at unchanged gradient accuracy).

    adjoint_mode:
      'resets' (default): the augmented backward state carries y, re-solved
        alongside the adjoint and reset to the stored forward value at each
        observation time — O(1) memory in step count (the reference's
        scheme).
      'interpolated' (Daulbaev et al. 2020, "Interpolation Technique to
        Speed Up Gradients Propagation in Neural ODEs"): the forward solve
        stores its per-step dense-output interpolants
        (options={'dense_output': True}, bounded loop) and the backward
        pass EVALUATES y(s) from them instead of re-integrating it — the
        augmented state shrinks from (y, a_y, a_p, a_t) to (a_y, a_p, a_t),
        y cannot drift backward through unstable dynamics, and the backward
        solve is cheaper per step. Memory is O(forward steps x state size).
        Requires an adaptive forward method.

    forward_solver: optional replacement for the internal forward solve —
    `forward_solver(y0, t, params) -> (ys, SolverStats)` must integrate
    the SAME dynamics as `func` (e.g. a fused Pallas whole-solve kernel:
    `fast.solve_conv_ode` / `fast.solve_mlp_spec`). custom_vjp never
    differentiates the forward, so gradients stay exact as long as the
    trajectories agree; the backward sweep still evaluates `func` via
    `jax.vjp`. Only `adjoint_mode='resets'` (the default) — the
    interpolated mode needs the internal forward's dense output.
    """
    if params is None:
        user_func = lambda t_, y_, p_: func(t_, y_)
        params_in = ()
    else:
        user_func = func
        params_in = params

    adjoint_rtol = rtol if adjoint_rtol is None else adjoint_rtol
    adjoint_atol = atol if adjoint_atol is None else adjoint_atol
    adjoint_method = method if adjoint_method is None else adjoint_method
    from .odeint import SOLVERS

    def _is_adaptive(m):
        return SOLVERS.get(m or "dopri5", ("", None))[0] == "adaptive"

    fwd_options = dict(options or {})
    # Backward options inherit the USER's forward options (before the
    # forward-only rewrites below).
    bwd_options = dict(adjoint_options if adjoint_options is not None
                       else fwd_options)
    # 'fuse' engages the Pallas tier, best-effort: FULL two-kernel fusion
    # (plan-driven forward + in-kernel adjoint sweep, ops/plan_adjoint.py)
    # when the dynamics and options allow it, else fused forward + generic
    # backward, else all-generic.
    use_fuse = bool(fwd_options.pop("fuse", False))
    bwd_options.pop("fuse", None)
    if (fwd_options.get("dot_precision", "highest") != "highest"
            or bwd_options.get("dot_precision", "highest") != "highest"):
        # Reduced-precision MXU tiers are SERVING-only: training would
        # differentiate the bf16-weight model (a different program than
        # the f32 weights being optimized). Refuse rather than silently
        # train something else.
        raise ValueError(
            "odeint_adjoint does not support reduced dot_precision "
            "('mixed'/'bf16' are serving tiers); train at the default "
            "'highest' and apply the precision tier at inference")
    fwd_options.pop("dot_precision", None)
    bwd_options.pop("dot_precision", None)
    if adjoint_mode not in ("resets", "interpolated"):
        raise ValueError(f"adjoint_mode must be 'resets' or 'interpolated',"
                         f" got {adjoint_mode!r}")
    if (forward_solver is not None and adjoint_mode == "interpolated"
            and not getattr(forward_solver, "emits_dense", False)):
        raise ValueError(
            "forward_solver cannot be combined with "
            "adjoint_mode='interpolated' unless it returns per-step "
            "interpolants — (ys, stats, DenseOutput) with an "
            "`emits_dense = True` attribute (fast.solve_fused with "
            "dense_output=True provides this via options={'fuse': True})")
    if forward_solver is not None and options:
        raise ValueError(
            "options are ignored when forward_solver replaces the internal "
            "forward solve — configure the forward through the solver "
            "callable itself (adjoint_options still control the backward)")
    if adjoint_mode == "interpolated" and not _is_adaptive(method):
        raise ValueError("adjoint_mode='interpolated' needs the forward "
                         "dense-output interpolants, which only adaptive "
                         "methods emit; use an adaptive forward method or "
                         "adjoint_mode='resets'")
    if _is_adaptive(method):
        if adjoint_mode == "interpolated":
            # The backward pass interpolates the stored forward solution:
            # the forward must run the bounded loop and emit its per-step
            # interpolants.
            fwd_options["loop"] = "bounded"
            fwd_options["dense_output"] = True
        else:
            # The forward pass needs no reverse-differentiability
            # (custom_vjp supplies gradients): use the lean while-loop.
            # Telemetry needs the bounded loop, so it cannot apply here.
            fwd_options.setdefault("loop", "while")
        if fwd_options.get("loop") == "while":
            fwd_options.pop("telemetry", None)
    elif (fwd_options.get("step_size") is not None
          and "num_steps" not in fwd_options):
        # Inside custom_vjp the forward solve sees t as a TRACED argument
        # even when the caller's t is a constant, so resolve step_size to a
        # static num_steps now (both build the same uniform linspace grid
        # over [t[0], t[-1]] — see build_grid_from_options).
        t_arr = jnp.asarray(t)
        if not isinstance(t_arr, jax.core.Tracer) and t_arr.ndim >= 1 \
                and t_arr.shape[0] > 1:
            t_np = np.asarray(t_arr, dtype=np.float64)
            span = abs(float(t_np[-1] - t_np[0]))
            h = float(fwd_options.pop("step_size"))
            fwd_options["num_steps"] = max(
                1, int(np.ceil(span / h - 1e-12)))
    if _is_adaptive(adjoint_method):
        bwd_options.setdefault("loop", "while")
    else:
        bwd_options.pop("loop", None)

    # The backward sweep solves each observation interval with TRACED
    # endpoints (inside lax.scan), where grid options that need concrete t
    # cannot apply. A fixed-grid adjoint with step_size and concrete t gets
    # the per-interval backward walk below; with traced t the grid length
    # cannot be static, so require an explicit num_steps.
    bwd_options.pop("grid_constructor", None)
    step_size = bwd_options.pop("step_size", None)
    adj_is_adaptive = _is_adaptive(adjoint_method)
    adj_kind = SOLVERS.get(adjoint_method or "dopri5", ("",))[0]
    backward_walk = None
    if (step_size is not None and "num_steps" not in bwd_options
            and not adj_is_adaptive
            and isinstance(jnp.asarray(t), jax.core.Tracer)):
        raise ValueError(
            "odeint_adjoint with a fixed-grid adjoint method and traced t "
            "cannot derive the backward grid from step_size; pass "
            "adjoint_options={'num_steps': n} (static steps per observation "
            "interval) instead.")
    if (adjoint_mode == "interpolated" and adj_kind == "fixed"
            and step_size is not None and "num_steps" not in bwd_options):
        raise ValueError(
            "adjoint_mode='interpolated' with a fixed-grid adjoint method "
            "derives its backward grid from num_steps; pass "
            "adjoint_options={'num_steps': n} (the per-interval walk that "
            "step_size builds integrates y as part of the augmented state, "
            "which 'interpolated' replaces)")
    if (step_size is not None and "num_steps" not in bwd_options
            and adj_kind == "fixed"):
        t_arr = jnp.asarray(t)
        if not isinstance(t_arr, jax.core.Tracer) and t_arr.ndim == 1 \
                and t_arr.shape[0] > 1:
            backward_walk = _build_backward_walk(
                np.asarray(t_arr, dtype=np.float64), float(step_size))
    elif step_size is not None and "num_steps" not in bwd_options:
        # Custom fixed-step methods (e.g. explicit_adams): uniform
        # per-interval step count derived from the widest span.
        t_arr = jnp.asarray(t)
        if not isinstance(t_arr, jax.core.Tracer) and t_arr.ndim == 1 \
                and t_arr.shape[0] > 1:
            max_span = float(np.max(np.abs(np.diff(
                np.asarray(t_arr, dtype=np.float64)))))
            bwd_options["num_steps"] = max(
                1, int(np.ceil(max_span / float(step_size))))

    # Keep only options the adjoint method's kind accepts: the forward dict
    # is copied wholesale and adaptive-only keys (max_steps, telemetry, ...)
    # would make the backward solve raise.
    from .solvers.base import ADAPTIVE_OPTIONS
    if adj_is_adaptive:
        _allowed = ADAPTIVE_OPTIONS - {"telemetry", "dense_output"}
    elif adj_kind == "fixed":
        _allowed = {"num_steps"}
    else:
        # Custom registered solver (e.g. 'adams'): filter the inherited
        # forward options against ITS allowlist, else adaptive-only keys
        # (max_steps, chunk_size, ...) raise at grad time.
        from .odeint import _CUSTOM_ALLOWED
        _allowed = _CUSTOM_ALLOWED.get(adjoint_method or "dopri5")
    if _allowed is not None:
        bwd_options = {k: v for k, v in bwd_options.items()
                       if k in _allowed}

    # options={'fuse': True}, tier 1: FULLY-fused training — forward is one
    # whole-solve kernel AND the backward is one in-kernel adjoint sweep
    # with the plan's reverse-mode VJP (fast.odeint_adjoint_fused). Only
    # when the option surface maps onto the kernels; FusionError falls
    # through to tier 2 (fused forward + generic backward).
    _FULL_FUSE_OPTS = {"first_step", "max_num_steps", "loop", "per_sample"}
    _FULL_FUSE_FIXED_OPTS = {"num_steps", "step_size"}
    _per_sample = bool(fwd_options.get("per_sample", False))
    bwd_options.pop("per_sample", None)
    _fwd_kind_ok = (_is_adaptive(method)
                    or SOLVERS.get(method or "dopri5", ("",))[0] == "fixed")
    _bwd_kind_ok = (adj_is_adaptive or adj_kind == "fixed")
    _fwd_allowed = (_FULL_FUSE_OPTS if _is_adaptive(method)
                    else _FULL_FUSE_FIXED_OPTS)
    _bwd_allowed = (_FULL_FUSE_OPTS if adj_is_adaptive
                    else _FULL_FUSE_FIXED_OPTS)
    # Options tier 1 would otherwise silently change: a fixed-adjoint
    # step_size resolved into a per-interval backward_walk, or a BACKWARD
    # max_num_steps different from the forward's (the fused front-ends
    # carry a single budget for both sweeps).
    _bwd_faithful = (
        backward_walk is None
        and bwd_options.get("max_num_steps",
                            fwd_options.get("max_num_steps"))
        == fwd_options.get("max_num_steps"))
    if (use_fuse and forward_solver is None and adjoint_mode == "resets"
            and _fwd_kind_ok and _bwd_kind_ok and _bwd_faithful
            and not (set(fwd_options) - _fwd_allowed)
            and not (set(bwd_options) - _bwd_allowed)
            and all(isinstance(tol, (int, float)) or jnp.ndim(tol) == 0
                    for tol in (rtol, atol, adjoint_rtol, adjoint_atol))):
        from .ops.jaxpr_bridge import FusionError
        try:
            from .fast import odeint_adjoint_fused, tree_state_parts
            # Pytree states ride the two-kernel path via the feature-
            # concat adapter (fast.tree_state_parts); the to_bd / rebuild
            # wrappers are plain traced JAX, so y0-pytree cotangents flow
            # through them automatically.
            _f3, _y0f, _rebuild = user_func, y0, None
            _parts = tree_state_parts(y0)
            if _parts is not None:
                _y0f, _to_bd, _from_bd, _rebuild = _parts
                _uf = user_func
                _f3 = (lambda tt, yy, pp:
                       _to_bd(_uf(tt, _from_bd(yy), pp)))
            out = odeint_adjoint_fused(
                _f3, _y0f, t, params=params_in, rtol=rtol, atol=atol,
                adjoint_rtol=adjoint_rtol, adjoint_atol=adjoint_atol,
                method=method or "dopri5", adjoint_method=adjoint_method,
                adjoint_seminorm=adjoint_seminorm,
                max_num_steps=fwd_options.get("max_num_steps"),
                first_step=fwd_options.get("first_step"),
                adjoint_first_step=bwd_options.get("first_step"),
                num_steps=fwd_options.get("num_steps"),
                step_size=fwd_options.get("step_size"),
                adjoint_num_steps=bwd_options.get("num_steps"),
                nfe_meter=nfe_meter, return_stats=return_stats,
                per_sample=_per_sample)
            if _rebuild is not None:
                out = ((_rebuild(out[0]),) + tuple(out[1:])
                       if return_stats else _rebuild(out))
            return out
        except FusionError as e:
            import warnings
            if _per_sample:
                # Per-sample SEMANTICS must survive the fallback: vmap of
                # the generic adjoint gives every sample its own
                # controller in both sweeps (at dispatch-bound speed).
                warnings.warn(
                    "odeint_adjoint(options={'fuse': True, 'per_sample': "
                    f"True}}): per-lane fusion unavailable — {e}; "
                    "falling back to jax.vmap of the generic adjoint",
                    stacklevel=2)
                y0a = jnp.asarray(y0)

                def _one(y0s, t_, p_):
                    return odeint_adjoint(
                        lambda tt, yy, pp: user_func(
                            tt, yy[None], pp)[0], y0s, t_, params=p_,
                        rtol=rtol, atol=atol, method=method,
                        adjoint_rtol=adjoint_rtol,
                        adjoint_atol=adjoint_atol,
                        adjoint_method=adjoint_method,
                        adjoint_seminorm=adjoint_seminorm,
                        adjoint_mode=adjoint_mode, return_stats=True)

                ys, st_b = jax.vmap(_one, in_axes=(0, None, None),
                                    out_axes=(1, 0))(
                    y0a, jnp.asarray(t), params_in)
                if return_stats:
                    return ys, SolverStats(
                        jnp.sum(st_b.nfe), jnp.sum(st_b.n_accepted),
                        jnp.sum(st_b.n_rejected), jnp.max(st_b.status))
                return ys
            warnings.warn(
                "odeint_adjoint(options={'fuse': True}): full two-kernel "
                f"fusion unavailable — {e}; using a fused forward with "
                "the generic backward", stacklevel=2)

    # tier 2: run the forward as ONE whole-solve Pallas kernel via the
    # jaxpr -> Pallas bridge (ops/jaxpr_bridge.py), keeping the generic
    # O(1)-memory adjoint backward — arbitrary-dynamics training with a
    # fused forward. Validated eagerly so unfusable dynamics fall back
    # (warning) instead of failing inside custom_vjp.
    if (use_fuse and forward_solver is None
            and (_is_adaptive(method) or (_fwd_kind_ok
                                          and adjoint_mode == "resets"))):
        forward_solver = _build_fused_forward(
            user_func, y0, t, params_in, rtol, atol, method, fwd_options,
            emit_dense=adjoint_mode == "interpolated")

    def _impl(y0_, t_, params_):
        res = None
        if forward_solver is not None:
            from .ops.jaxpr_bridge import FusionError
            try:
                fs_out = forward_solver(y0_, t_, params_)
            except FusionError as e:
                # Late fusion failures (e.g. a per-sample const meeting
                # the VMEM grid-block limit only at this batch size):
                # 'fuse' is best-effort, so fall back rather than crash.
                import warnings
                warnings.warn(
                    "odeint_adjoint(options={'fuse': True}): fused "
                    f"forward unavailable at solve time — {e}; running "
                    "the generic engine", stacklevel=2)
                fs_out = None
            if fs_out is not None:
                from .solvers.base import SolveResult
                if len(fs_out) == 3:
                    res = SolveResult(fs_out[0], fs_out[1],
                                      dense=fs_out[2])
                else:
                    res = SolveResult(*fs_out)
        if res is None:
            res = solve(lambda tt, yy: user_func(tt, yy, params_), y0_, t_,
                        rtol=rtol, atol=atol, method=method,
                        options=fwd_options)
        emit_fwd(nfe_meter, res.stats.nfe, res.stats.n_accepted)
        # Surface forward failures the same way odeint() does: raise when
        # the status is concrete, NaN-poison the trajectory beyond y0 when
        # traced. This matters most for adjoint_mode='interpolated', which
        # silently moves the forward onto the BUDGETED bounded loop
        # (default max_steps=1024): exhausting the budget would otherwise
        # return a truncated dense output and quietly wrong gradients.
        status = res.stats.status
        if not isinstance(status, jax.core.Tracer):
            code = int(status)
            if code != 0:
                from .solvers.base import Status
                raise RuntimeError(
                    f"odeint_adjoint forward solve failed with status "
                    f"{Status(code).name}; raise options['max_steps'] "
                    "(bounded-loop budget, default 1024) or loosen "
                    "tolerances")
            return res.ys, res.stats, res.dense
        ok = status == 0

        def _poison(leaf):
            T_ = leaf.shape[0]
            keep = ok | (jnp.arange(T_) == 0)
            keep = keep.reshape((T_,) + (1,) * (leaf.ndim - 1))
            return jnp.where(keep, leaf, jnp.asarray(jnp.nan, leaf.dtype))

        ys = jax.tree_util.tree_map(_poison, res.ys)
        return ys, res.stats, res.dense

    @jax.custom_vjp
    def _odeint(y0_, t_, params_):
        ys, stats, _ = _impl(y0_, t_, params_)
        return ys, stats

    def _fwd(y0_, t_, params_):
        ys, stats, dense = _impl(y0_, t_, params_)
        return (ys, stats), (ys, t_, params_, dense, stats.status)

    def _bwd(res, g):
        ys, t_, params_, dense, fwd_status = res
        g, _g_stats = g          # stats cotangents are symbolic zeros
        t_ = jnp.asarray(t_)
        T = t_.shape[0]

        # A failed forward poisons the OUTPUT ys (loss -> NaN), but sum/mean
        # cotangents stay finite, so the backward sweep would integrate the
        # truncated trajectory into finite, silently-wrong gradients —
        # poison them too.
        fwd_bad = fwd_status != 0

        def _loud_grads(grads):
            return jax.tree_util.tree_map(
                lambda x: jnp.where(fwd_bad,
                                    jnp.asarray(jnp.nan, x.dtype), x),
                grads)

        # Flatten trajectory and cotangents to [T, N].
        y_template = jax.tree_util.tree_map(lambda l: l[0], ys)
        _, unravel = flatten_state(y_template)
        ys_flat = jax.vmap(lambda tree: flatten_state(tree)[0])(ys)
        g_flat = jax.vmap(lambda tree: flatten_state(tree)[0])(g)
        N = ys_flat.shape[1]
        ydtype = ys_flat.dtype

        def f_flat(tt, y_flat, p_):
            dy = user_func(tt, unravel(y_flat), p_)
            return flatten_state(dy)[0].astype(ydtype)

        interpolated = adjoint_mode == "interpolated" and dense is not None

        if adjoint_seminorm and adj_is_adaptive:
            from .ops.norms import rms_norm

            if interpolated:
                def _seminorm(x_flat):
                    # Augmented flat layout: [a_y (N), a_params..., a_t].
                    return rms_norm(x_flat[:N])
            else:
                def _seminorm(x_flat):
                    # Augmented flat layout: [y (N), a_y (N), a_params...,
                    # a_t].
                    return rms_norm(x_flat[: 2 * N])

            bwd_options.setdefault("norm", _seminorm)

        def aug_dynamics(s, aug):
            y, a_y, a_p, a_t = aug
            dy, vjp_fn = jax.vjp(lambda y_, t__, p_: f_flat(t__, y_, p_),
                                 y, s, params_)
            v_y, v_t, v_p = vjp_fn(a_y)
            return (dy, -v_y,
                    jax.tree_util.tree_map(jnp.negative, v_p), -v_t)

        def aug_dynamics_interp(s, aug):
            # Interpolated adjoint (Daulbaev et al. 2020): y(s) comes from
            # the stored forward dense output instead of being re-solved —
            # no y in the augmented state, no backward drift.
            a_y, a_p, a_t = aug
            y = jax.lax.stop_gradient(dense.eval_flat(s))
            _, vjp_fn = jax.vjp(lambda y_, t__, p_: f_flat(t__, y_, p_),
                                y, s, params_)
            v_y, v_t, v_p = vjp_fn(a_y)
            return (-v_y,
                    jax.tree_util.tree_map(jnp.negative, v_p), -v_t)

        zero_p = jax.tree_util.tree_map(jnp.zeros_like, params_)

        if T > 1 and backward_walk is not None:
            y0_bar, ts_bar, a_p, b_nfe, b_acc = _bwd_fixed_grid_walk(
                backward_walk, SOLVERS[adjoint_method or "dopri5"][1],
                aug_dynamics, f_flat, params_, zero_p, ys_flat, g_flat,
                t_, N)
            emit_bwd(nfe_meter, b_nfe, b_acc)
            return _loud_grads((unravel(y0_bar), ts_bar.astype(t_.dtype),
                                a_p))

        def scan_fun(carry, i):
            a_y, a_p, a_t0, b_nfe, b_acc = carry
            # Gradient of the loss w.r.t. observation time t[i].
            f_i = f_flat(t_[i], ys_flat[i], params_)
            t_bar = jnp.dot(f_i, g_flat[i]).astype(t_.dtype)
            a_t0 = a_t0 - t_bar
            t_pair = jnp.stack([t_[i], t_[i - 1]])
            if interpolated:
                aug0 = (a_y, a_p, a_t0)
                res_i = solve(aug_dynamics_interp, aug0, t_pair,
                              rtol=adjoint_rtol, atol=adjoint_atol,
                              method=adjoint_method, options=bwd_options)
                a_y, a_p, a_t0 = jax.tree_util.tree_map(
                    lambda l: l[-1], res_i.ys)
            else:
                aug0 = (ys_flat[i], a_y, a_p, a_t0)
                res_i = solve(aug_dynamics, aug0, t_pair,
                              rtol=adjoint_rtol, atol=adjoint_atol,
                              method=adjoint_method, options=bwd_options)
                _, a_y, a_p, a_t0 = jax.tree_util.tree_map(
                    lambda l: l[-1], res_i.ys)
            a_y = a_y + g_flat[i - 1]
            b_nfe = b_nfe + res_i.stats.nfe + 1        # +1: the t_bar eval
            b_acc = b_acc + res_i.stats.n_accepted
            return (a_y, a_p, a_t0, b_nfe, b_acc), t_bar

        if T > 1:
            zero_i = jnp.asarray(0, jnp.int32)
            init = (g_flat[-1], zero_p, jnp.zeros((), t_.dtype),
                    zero_i, zero_i)
            idx = jnp.arange(T - 1, 0, -1)
            carry, rev_t_bars = jax.lax.scan(scan_fun, init, idx)
            a_y, a_p, a_t0, b_nfe, b_acc = carry
            emit_bwd(nfe_meter, b_nfe, b_acc)
            ts_bar = jnp.concatenate([a_t0[None], rev_t_bars[::-1]])
        else:
            a_y = g_flat[0]
            a_p = zero_p
            ts_bar = jnp.zeros_like(t_)

        y0_bar = unravel(a_y)
        return _loud_grads((y0_bar, ts_bar.astype(t_.dtype), a_p))

    _odeint.defvjp(_fwd, _bwd)
    t_in = jnp.asarray(t)
    if t_in.ndim == 0:
        # canonicalize accepts 0-d t for the forward pass; expand here so
        # the backward sweep's T = t.shape[0] is well-defined.
        t_in = t_in[None]
    ys_out, stats = _odeint(y0, t_in, params_in)
    if return_stats:
        return ys_out, SolverStats(*stats)
    return ys_out


def _build_fused_forward(user_func, y0, t, params, rtol, atol, method,
                         fwd_options, emit_dense: bool = False):
    """Build a fused-forward `forward_solver` for odeint_adjoint's
    options={'fuse': True}, or None (with a warning) when the dynamics /
    state fall outside the fusable subset. With `emit_dense` the solver
    also returns the in-kernel per-step interpolants as a DenseOutput
    (drives adjoint_mode='interpolated')."""
    import warnings

    from .ops.jaxpr_bridge import FusionError, build_plan

    method = method or "dopri5"
    try:
        if not (hasattr(y0, "ndim") and jnp.ndim(y0) == 2):
            raise FusionError("fused forward needs a single [B, D] array "
                              "state")
        if "grid_constructor" in fwd_options:
            raise FusionError("grid_constructor callables are not "
                              "supported by the fused fixed-grid kernel")
        if fwd_options.get("norm") is not None:
            raise FusionError("custom error norms are not supported by "
                              "the fused kernel")
        t0 = jnp.asarray(t).reshape(-1)[0]
        # Validation trace only (the real plan is rebuilt inside the
        # custom_vjp forward, where params are that trace's tracers).
        build_plan(lambda tt, yy: user_func(tt, yy, params), t0,
                   jnp.asarray(y0))
    except FusionError as e:
        warnings.warn(f"odeint_adjoint(options={{'fuse': True}}): forward "
                      f"runs the generic engine — {e}", stacklevel=3)
        return None

    first_step = fwd_options.get("first_step")
    max_num_steps = fwd_options.get("max_num_steps")
    num_steps = fwd_options.get("num_steps")
    step_size = fwd_options.get("step_size")
    safety = float(fwd_options.get("safety", 0.9))
    ifactor = float(fwd_options.get("ifactor", 10.0))
    dfactor = float(fwd_options.get("dfactor", 0.2))

    def forward_solver(y0_, t_, params_):
        from .fast import solve_fused
        res = solve_fused(lambda tt, yy: user_func(tt, yy, params_), y0_,
                          t_, rtol=rtol, atol=atol, method=method,
                          first_step=first_step,
                          max_num_steps=max_num_steps,
                          safety=safety, ifactor=ifactor, dfactor=dfactor,
                          dense_output=emit_dense, num_steps=num_steps,
                          step_size=step_size)
        if emit_dense:
            return res.ys, res.stats, res.dense
        return res.ys, res.stats

    forward_solver.emits_dense = emit_dense
    return forward_solver


def _bwd_fixed_grid_walk(walk: _BackwardWalk, tableau, aug_dynamics, f_flat,
                         params_, zero_p, ys_flat, g_flat, t_, N):
    """One scan over the concatenated per-interval backward grids.

    Equivalent to solving each observation interval [t_i, t_{i-1}] with a
    fixed grid of ceil(span_i/h) steps — but as a single fused scan whose
    total step count matches the actual spans (no per-interval padding to
    the widest gap). Observation boundaries are handled in-scan: the first
    step of each interval resets y to the stored forward value ys[i] and
    injects the cotangent g[i] (the same stored-state reset the interval
    formulation performs via aug0).
    """
    from .ops.pytree import flat_ode_func
    from .ops.rk import runge_kutta_step

    T = t_.shape[0]
    # d(loss)/d(t_i) = dot(f(t_i, y_i), g_i) for i >= 1 (i = 0 comes from
    # the integrated a_t quadrature).
    t_bars = jax.vmap(
        lambda ti, yi, gi: jnp.dot(f_flat(ti, yi, params_), gi)
    )(t_, ys_flat, g_flat).astype(t_.dtype)

    aug0 = (jnp.zeros_like(ys_flat[0]), jnp.zeros_like(g_flat[0]), zero_p,
            jnp.zeros((), t_.dtype))
    aug_flat0, unravel_aug = flatten_state(aug0)
    M = aug_flat0.shape[0]
    adtype = aug_flat0.dtype
    aug_f = flat_ode_func(aug_dynamics, unravel_aug, adtype)

    tdtype = t_.dtype
    xs = (jnp.asarray(walk.t0s, tdtype), jnp.asarray(walk.t1s, tdtype),
          jnp.asarray(walk.reset), jnp.asarray(walk.obs, jnp.int32))

    def body(carry, x):
        aug, comp, f_prev = carry
        t0, t1, reset, oi = x

        def with_reset(args):
            aug, comp = args
            aug = aug.at[0:N].set(ys_flat[oi].astype(adtype))
            aug = aug.at[N:2 * N].add(g_flat[oi].astype(adtype))
            aug = aug.at[M - 1].add((-t_bars[oi]).astype(adtype))
            # The reset replaces state, invalidating the compensation term.
            return aug, jnp.zeros_like(comp)

        aug, comp = jax.lax.cond(reset, with_reset, lambda a: a, (aug, comp))
        # FSAL-style chaining of the end derivative into the next step's f0;
        # a reset invalidates the cache, costing one fresh evaluation.
        f0 = jax.lax.cond(reset, lambda: aug_f(t0, aug), lambda: f_prev)
        res = runge_kutta_step(aug_f, aug, f0, t0, t1 - t0, tableau)
        # Kahan-compensated accumulation (matches solve_fixed_grid).
        adj = res.delta - comp
        aug_new = aug + adj
        comp = (aug_new - aug) - adj
        return (aug_new, comp, res.f1), None

    init = (aug_flat0, jnp.zeros_like(aug_flat0), jnp.zeros_like(aug_flat0))
    (aug_fin, _, _), _ = jax.lax.scan(body, init, xs)
    _, a_y, a_p, a_t = unravel_aug(aug_fin)
    y0_bar = a_y + g_flat[0]
    ts_bar = jnp.concatenate([a_t[None].astype(tdtype), t_bars[1:]])

    S = len(walk.t0s)
    n_resets = int(sum(walk.reset))
    # Per step: `stages` fresh evals (chained f1); resets re-evaluate f0;
    # plus the T evals of the t_bars vmap.
    b_nfe = jnp.asarray(S * tableau.stages + n_resets + T, jnp.int32)
    b_acc = jnp.asarray(S, jnp.int32)
    return y0_bar, ts_bar, a_p, b_nfe, b_acc
