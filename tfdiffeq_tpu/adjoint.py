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
"""

from __future__ import annotations

from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp

from .odeint import solve
from .ops.pytree import flatten_state

Array = jax.Array


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
) -> Any:
    """Like `odeint`, but gradients use the augmented adjoint ODE.

    func: callable(t, y, params) -> dy (or callable(t, y) if params is None).
    Returns the trajectory pytree (leaves [T, ...]).

    adjoint_seminorm: control the backward step size with a seminorm over
    only the (y, adjoint-y) components, excluding the parameter/time
    adjoints — they are pure quadratures that never feed back into the
    augmented dynamics, so erroring on them wastes steps (Kidger et al.
    2020, "Hey, that's not an ODE": typically 20-60%% fewer backward NFE
    at unchanged gradient accuracy).
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
    if _is_adaptive(method):
        # The forward pass needs no reverse-differentiability (custom_vjp
        # supplies gradients): use the lean while-loop. Telemetry needs the
        # bounded loop, so it cannot apply here.
        fwd_options.setdefault("loop", "while")
        if fwd_options.get("loop") == "while":
            fwd_options.pop("telemetry", None)
    bwd_options = dict(adjoint_options if adjoint_options is not None
                       else fwd_options)
    if _is_adaptive(adjoint_method):
        bwd_options.setdefault("loop", "while")
    else:
        bwd_options.pop("loop", None)

    # The backward sweep solves each observation interval with TRACED
    # endpoints (inside lax.scan), where grid options that need concrete t
    # cannot apply. Convert step_size to a static per-interval num_steps
    # when t is concrete; otherwise drop it with the adaptive default.
    bwd_options.pop("grid_constructor", None)
    step_size = bwd_options.pop("step_size", None)
    adj_is_adaptive = _is_adaptive(adjoint_method)
    if (step_size is not None and "num_steps" not in bwd_options
            and not adj_is_adaptive
            and isinstance(jnp.asarray(t), jax.core.Tracer)):
        raise ValueError(
            "odeint_adjoint with a fixed-grid adjoint method and traced t "
            "cannot derive the backward grid from step_size; pass "
            "adjoint_options={'num_steps': n} (static steps per observation "
            "interval) instead.")
    if step_size is not None and "num_steps" not in bwd_options:
        t_arr = jnp.asarray(t)
        if not isinstance(t_arr, jax.core.Tracer) and t_arr.ndim == 1                 and t_arr.shape[0] > 1:
            import numpy as _np
            max_span = float(_np.max(_np.abs(_np.diff(
                _np.asarray(t_arr, dtype=_np.float64)))))
            bwd_options["num_steps"] = max(
                1, int(_np.ceil(max_span / float(step_size))))

    # Keep only options the adjoint method's kind accepts: the forward dict
    # is copied wholesale and adaptive-only keys (max_steps, telemetry, ...)
    # would make the backward solve raise.
    from .solvers.base import ADAPTIVE_OPTIONS, FIXED_GRID_OPTIONS
    if adj_is_adaptive:
        _allowed = ADAPTIVE_OPTIONS - {"telemetry"}
    elif SOLVERS.get(adjoint_method or "dopri5", ("",))[0] == "fixed":
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

    def _impl(y0_, t_, params_):
        return solve(lambda tt, yy: user_func(tt, yy, params_), y0_, t_,
                     rtol=rtol, atol=atol, method=method,
                     options=fwd_options).ys

    @jax.custom_vjp
    def _odeint(y0_, t_, params_):
        return _impl(y0_, t_, params_)

    def _fwd(y0_, t_, params_):
        ys = _impl(y0_, t_, params_)
        return ys, (ys, t_, params_)

    def _bwd(res, g):
        ys, t_, params_ = res
        t_ = jnp.asarray(t_)
        T = t_.shape[0]

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

        if adjoint_seminorm and adj_is_adaptive:
            from .ops.norms import rms_norm

            def _seminorm(x_flat):
                # Augmented flat layout: [y (N), a_y (N), a_params..., a_t].
                return rms_norm(x_flat[: 2 * N])

            bwd_options.setdefault("norm", _seminorm)

        def aug_dynamics(s, aug):
            y, a_y, a_p, a_t = aug
            dy, vjp_fn = jax.vjp(lambda y_, t__, p_: f_flat(t__, y_, p_),
                                 y, s, params_)
            v_y, v_t, v_p = vjp_fn(a_y)
            return (dy, -v_y,
                    jax.tree_util.tree_map(jnp.negative, v_p), -v_t)

        zero_p = jax.tree_util.tree_map(jnp.zeros_like, params_)

        def scan_fun(carry, i):
            a_y, a_p, a_t0 = carry
            # Gradient of the loss w.r.t. observation time t[i].
            f_i = f_flat(t_[i], ys_flat[i], params_)
            t_bar = jnp.dot(f_i, g_flat[i]).astype(t_.dtype)
            a_t0 = a_t0 - t_bar
            aug0 = (ys_flat[i], a_y, a_p, a_t0)
            t_pair = jnp.stack([t_[i], t_[i - 1]])
            aug_ys = solve(aug_dynamics, aug0, t_pair,
                           rtol=adjoint_rtol, atol=adjoint_atol,
                           method=adjoint_method, options=bwd_options).ys
            _, a_y, a_p, a_t0 = jax.tree_util.tree_map(
                lambda l: l[-1], aug_ys)
            a_y = a_y + g_flat[i - 1]
            return (a_y, a_p, a_t0), t_bar

        if T > 1:
            init = (g_flat[-1], zero_p,
                    jnp.zeros((), t_.dtype))
            idx = jnp.arange(T - 1, 0, -1)
            (a_y, a_p, a_t0), rev_t_bars = jax.lax.scan(scan_fun, init, idx)
            ts_bar = jnp.concatenate([a_t0[None], rev_t_bars[::-1]])
        else:
            a_y = g_flat[0]
            a_p = zero_p
            ts_bar = jnp.zeros_like(t_)

        y0_bar = unravel(a_y)
        return (y0_bar, ts_bar.astype(t_.dtype), a_p)

    _odeint.defvjp(_fwd, _bwd)
    t_in = jnp.asarray(t)
    if t_in.ndim == 0:
        # canonicalize accepts 0-d t for the forward pass; expand here so
        # the backward sweep's T = t.shape[0] is well-defined.
        t_in = t_in[None]
    ys_out = _odeint(y0, t_in, params_in)
    return ys_out
