"""Adaptive-step embedded RK engine (dopri5, bosh3, adaptive_heun, tsit5).

Capability parity with upstream `tfdiffeq/solvers.py`
(`AdaptiveStepsizeODESolver`), `tfdiffeq/dopri5.py` (`_adaptive_dopri5_step`),
`tfdiffeq/bosh3.py`, `tfdiffeq/adaptive_heun.py` — SURVEY.md §2, §3.1.

TPU-native inversion of the reference's architecture: the reference runs the
accept/reject loop in host Python, materializing the error ratio to a host
bool on EVERY step (SURVEY.md §3.1 "control on host"). Here the entire
integration — stage evaluation, RMS error norm, PI controller, accept/reject,
dense-output fit, and output writes — lives on device in a single compiled
loop with no host round-trips (BASELINE.json north star).

Two loop modes share one step function:

- ``loop='while'``: a single `lax.while_loop`. Fastest forward path; exits
  the moment integration completes. Not reverse-differentiable (JAX
  limitation); used by `odeint_adjoint`'s forward pass and inference.
- ``loop='bounded'`` (default): a two-level `lax.scan` (chunks x steps) with
  per-chunk early-exit via `lax.cond` and `jax.checkpoint` per chunk for
  O(sqrt)-style memory. Fully reverse-differentiable with plain `jax.grad`,
  including closure-captured parameters — this is the analogue of the
  reference's taped direct backprop through solver steps (SURVEY.md §3.4).
  Requires a static step budget ``max_steps`` (default 1024); exceeding it
  sets `Status.MAX_STEPS_REACHED` in the returned stats.

Dense output: inside the loop each accepted step fits the 4th-order
interpolant (dopri5) or cubic Hermite; requested times are served either by
masked on-device buffer writes (while mode) or by a post-loop searchsorted
gather over the emitted per-step coefficients (bounded mode).
"""

from __future__ import annotations

import dataclasses
from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp

from ..ops.controller import StepController, next_step_size
from ..ops.norms import error_ratio, rms_norm, select_initial_step
from ..ops.rk import (RKStepResult, interp_evaluate, interp_fit,
                      interp_fit_quartic, runge_kutta_step)
from ..ops.tableaus import ButcherTableau
from .base import CanonicalProblem, SolveResult, SolverStats, Status

Array = jax.Array

_stop = jax.lax.stop_gradient


@dataclasses.dataclass(frozen=True)
class AdaptiveConfig:
    """Static solver configuration (hashable -> one compile per config)."""
    tableau: ButcherTableau
    controller: StepController = StepController()
    loop: str = "bounded"            # 'bounded' | 'while'
    max_steps: int = 1024            # static budget (bounded mode);
    #   compile time of the chunked scan scales with it — raise explicitly
    #   for long integrations
    chunk_size: int = 32             # steps per checkpointed chunk
    norm: Optional[Callable[[Array], Array]] = None
    # Per-attempt telemetry (bounded mode only): returns StepTelemetry with
    # [max_steps] arrays (t0, dt, accepted, active) for dt histograms /
    # accept-ratio diagnostics (SURVEY.md §5 "Tracing / profiling").
    telemetry: bool = False
    # Compensated (Kahan) accumulation of the state across accepted steps:
    # in float32, plain y += delta accumulates a sqrt(n_steps)-ulp random
    # walk that dominates tight-tolerance trajectories on TPU; the carried
    # compensation term removes it for ~4 extra elementwise ops per step.
    compensated: bool = True
    # Fused step kernel (Pallas fast path, ops/pallas_kernels.py):
    # step_override(t, y, f, dt) -> (y1, f1, err_ratio, y_mid, n_evals)
    # replaces runge_kutta_step + error norm + midpoint for known dynamics;
    # err_ratio is the fully-reduced scalar (accept iff <= 1), +inf when the
    # step is non-finite — so the loop body does no big-vector reductions.
    step_override: Optional[Callable] = None
    # Attempts per loop iteration. TPU while-loop iterations carry a fixed
    # per-iteration overhead (condition sync + kernel launches) that
    # dominates when the dynamics are small; executing `unroll` guarded
    # attempts per iteration amortizes it (~2x sustained NFE/s at unroll=8
    # for the benchmark MLP). Tail waste is bounded: once integration
    # completes, remaining attempts in the current iteration skip via cond.
    # In bounded mode this maps to the inner scan's native `unroll`.
    unroll: int = 1
    # Return the per-accepted-step dense-output interpolants (bounded mode
    # only) as SolveResult.dense — lets callers evaluate y(t) anywhere
    # post-hoc and drives the interpolated adjoint (Daulbaev et al. 2020).
    emit_dense: bool = False


class _Core(NamedTuple):
    """Loop-carried integration state (fixed structure for while/scan)."""
    t: Array            # current time (tau space)
    y: Array            # [N]
    comp: Array         # [N] Kahan compensation for y (zeros if disabled)
    f: Array            # [N] derivative at (t, y) (FSAL cache)
    dt: Array           # proposed next step size (> 0)
    prev_ratio: Array   # last accepted error ratio (PI history)
    n_acc: Array
    n_rej: Array
    nfe: Array
    status: Array


class StepTelemetry(NamedTuple):
    """Per-attempt solver telemetry (bounded mode)."""
    t0: Array          # [max_steps] attempt start times (tau space)
    dt: Array          # [max_steps] attempted step sizes
    accepted: Array    # [max_steps] bool
    active: Array      # [max_steps] bool: attempt actually executed


class _StepOut(NamedTuple):
    core: _Core
    accept: Array       # bool
    t0: Array           # step start time
    t1: Array           # exact step end time (NOT t0 + dt_step: the float
    #                     add can round 1 ulp below the carried value,
    #                     silently missing outputs at exact step ends)
    dt_step: Array      # actual attempted step size
    coeffs: Array       # [5, N] dense-output coeffs (valid iff accept)
    y1: Array           # [N] (valid iff accept)


def _make_attempt(func, cfg: AdaptiveConfig, rtol, atol, tau_end, dt_min,
                  max_num_steps):
    """Build the single-attempt step function shared by both loop modes."""
    tableau = cfg.tableau
    norm = cfg.norm or rms_norm

    def attempt(core: _Core) -> _StepOut:
        rem = tau_end - core.t
        dt_eff = jnp.minimum(core.dt, rem)
        is_last = core.dt >= rem
        t1 = jnp.where(is_last, tau_end, core.t + dt_eff)
        dt_step = t1 - core.t

        if cfg.step_override is not None:
            y1_o, f1_o, ratio, ymid_o, n_evals_o = cfg.step_override(
                core.t, core.y, core.f, dt_step)
            coeffs_o = interp_fit_quartic(
                core.y, y1_o, ymid_o, core.f, f1_o,
                dt_step.astype(core.y.dtype))
            res = RKStepResult(y1_o, f1_o, ratio, coeffs_o, n_evals_o,
                               None)
            finite = jnp.isfinite(ratio)   # kernel folds y1-finiteness in
        else:
            res = runge_kutta_step(func, core.y, core.f, core.t, dt_step,
                                   tableau)
            ratio = error_ratio(res.y_err, rtol, atol, core.y, res.y1, norm)
            finite = jnp.all(jnp.isfinite(res.y1)) & jnp.isfinite(ratio)
        accept = (ratio <= 1.0) & finite

        # Controller runs on a sanitized ratio (non-finite => force shrink).
        # Step sizes are treated as non-differentiable controller state
        # (stop_gradient): gradients of the solution w.r.t. inputs take the
        # realized discretization as fixed, which also keeps reverse-mode
        # clear of pow/sqrt-at-zero NaNs.
        big = jnp.asarray(2.0, ratio.dtype) ** 20
        ratio_ctrl = jnp.where(finite, ratio, big)
        dt_next, prev_next = next_step_size(
            _stop(dt_step), _stop(ratio_ctrl), _stop(core.prev_ratio),
            accept, tableau.order, cfg.controller)
        dt_next = _stop(dt_next)
        prev_next = _stop(prev_next)

        if cfg.step_override is not None:
            coeffs = res.k            # already the fitted coeffs (see above)
        else:
            coeffs = interp_fit(tableau, core.y, res.y1, core.f, res.f1,
                                res.k, dt_step.astype(core.y.dtype))

        n_att = core.n_acc + core.n_rej + 1
        status = core.status
        status = jnp.where(
            (dt_next < dt_min) & (core.t + dt_next < tau_end) &
            (status == Status.OK) & ~accept,
            jnp.asarray(int(Status.DT_UNDERFLOW), jnp.int32), status)
        status = jnp.where(
            (n_att >= max_num_steps) & (status == Status.OK) &
            ~((core.t >= tau_end) | (accept & is_last)),
            jnp.asarray(int(Status.MAX_STEPS_REACHED), jnp.int32), status)

        if cfg.compensated and res.delta is not None:
            # Kahan: y_new = y + (delta - comp), with updated compensation.
            adj = res.delta - core.comp
            y_new = core.y + adj
            comp_new = (y_new - core.y) - adj
        else:
            y_new = res.y1
            comp_new = core.comp
        new_core = _Core(
            t=jnp.where(accept, t1, core.t),
            y=jnp.where(accept, y_new, core.y),
            comp=jnp.where(accept, comp_new, core.comp),
            f=jnp.where(accept, res.f1, core.f),
            dt=jnp.maximum(dt_next, jnp.asarray(0.0, dt_next.dtype)),
            prev_ratio=prev_next,
            n_acc=core.n_acc + accept.astype(jnp.int32),
            n_rej=core.n_rej + (1 - accept.astype(jnp.int32)),
            nfe=core.nfe + res.n_evals,
            status=status,
        )
        return _StepOut(new_core, accept, core.t, t1, dt_step, coeffs,
                        res.y1)

    return attempt


def _init_core(prob: CanonicalProblem, cfg: AdaptiveConfig, rtol, atol,
               first_step) -> _Core:
    func, y0, tau = prob.func, prob.y0, prob.tau
    t0 = tau[0]
    f0 = func(t0, y0)
    nfe = 1
    rdtype = jnp.finfo(prob.time_dtype).dtype
    if first_step is None:
        dt0 = select_initial_step(func, t0, y0, f0, cfg.tableau.order - 1,
                                  rtol, atol, cfg.norm)
        dt0 = jnp.asarray(dt0, rdtype)
        nfe += 1
    else:
        dt0 = jnp.abs(jnp.asarray(first_step, rdtype))
    one = jnp.asarray(1.0, rdtype)
    return _Core(
        t=t0, y=y0, comp=jnp.zeros_like(y0), f=f0, dt=_stop(dt0),
        prev_ratio=one,
        n_acc=jnp.asarray(0, jnp.int32), n_rej=jnp.asarray(0, jnp.int32),
        nfe=jnp.asarray(nfe, jnp.int32),
        status=jnp.asarray(int(Status.OK), jnp.int32),
    )


def _default_dt_min(tau: Array) -> Array:
    span_scale = jnp.maximum(jnp.maximum(jnp.abs(tau[0]), jnp.abs(tau[-1])),
                             1.0)
    return 4.0 * jnp.finfo(tau.dtype).eps * span_scale


# ---------------------------------------------------------------------------
# while-loop mode
# ---------------------------------------------------------------------------

class _WhileState(NamedTuple):
    core: _Core
    out: Array       # [T, N] output buffer


def _solve_while(prob: CanonicalProblem, cfg: AdaptiveConfig, rtol, atol,
                 first_step, dt_min, max_num_steps) -> SolveResult:
    tau = prob.tau
    T = tau.shape[0]
    tau_end = tau[-1]
    attempt = _make_attempt(prob.func, cfg, rtol, atol, tau_end, dt_min,
                            max_num_steps)

    core0 = _init_core(prob, cfg, rtol, atol, first_step)
    out0 = jnp.zeros((T,) + prob.y0.shape, prob.dtype).at[0].set(prob.y0)

    def cond(s: _WhileState):
        return (s.core.t < tau_end) & (s.core.status == Status.OK)

    bshape = (T,) + (1,) * prob.y0.ndim

    def one_attempt(s: _WhileState):
        o = attempt(s.core)
        mask = o.accept & (tau > o.t0) & (tau <= o.t1)
        vals = interp_evaluate(o.coeffs, o.t0, o.dt_step, tau)
        # Exact endpoint: avoid interpolation roundoff at the step's end.
        vals = jnp.where((tau == o.t1).reshape(bshape), o.y1[None], vals)
        out = jnp.where(mask.reshape(bshape), vals, s.out)
        return _WhileState(o.core, out)

    unroll = max(1, int(cfg.unroll))
    if unroll == 1:
        body = one_attempt
    else:
        # k guarded attempts per while iteration: amortizes the TPU
        # while-loop per-iteration overhead over k steps; once integration
        # completes mid-iteration the remaining attempts branch to a no-op.
        def body(s: _WhileState):
            for _ in range(unroll):
                s = jax.lax.cond(cond(s), one_attempt, lambda x: x, s)
            return s

    final = jax.lax.while_loop(cond, body, _WhileState(core0, out0))
    stats = SolverStats(final.core.nfe, final.core.n_acc, final.core.n_rej,
                        final.core.status)
    return SolveResult(final.out, stats)


# ---------------------------------------------------------------------------
# bounded-scan mode (differentiable)
# ---------------------------------------------------------------------------

class _ScanState(NamedTuple):
    core: _Core
    cache_t0: Array      # last accepted step start
    cache_t1: Array      # last accepted step end (monotone non-decreasing)
    cache_dt: Array      # last accepted step size (>0)
    cache_coeffs: Array  # [5, N]


def _emission(s: _ScanState):
    return (s.cache_t0, s.cache_t1, s.cache_dt, s.cache_coeffs)


def _solve_bounded(prob: CanonicalProblem, cfg: AdaptiveConfig, rtol, atol,
                   first_step, dt_min, max_num_steps) -> SolveResult:
    tau = prob.tau
    T = tau.shape[0]
    tau_end = tau[-1]
    attempt = _make_attempt(prob.func, cfg, rtol, atol, tau_end, dt_min,
                            max_num_steps)

    core0 = _init_core(prob, cfg, rtol, atol, first_step)
    rdtype = core0.dt.dtype
    init = _ScanState(
        core=core0,
        cache_t0=tau[0].astype(rdtype),
        cache_t1=tau[0].astype(rdtype),
        cache_dt=jnp.asarray(1.0, rdtype),
        cache_coeffs=jnp.stack([jnp.zeros_like(prob.y0)] * 4 + [prob.y0]),
    )

    chunk = max(1, int(cfg.chunk_size))
    num_chunks = -(-int(cfg.max_steps) // chunk)

    def active(s: _ScanState):
        return (s.core.t < tau_end) & (s.core.status == Status.OK)

    def one_step(s: _ScanState):
        o = attempt(s.core)
        t1 = o.t1.astype(rdtype)
        s2 = _ScanState(
            core=o.core,
            cache_t0=jnp.where(o.accept, o.t0.astype(rdtype), s.cache_t0),
            cache_t1=jnp.where(o.accept, t1, s.cache_t1),
            cache_dt=jnp.where(o.accept, o.dt_step.astype(rdtype),
                               s.cache_dt),
            cache_coeffs=jnp.where(o.accept, o.coeffs, s.cache_coeffs),
        )
        tel = (o.t0.astype(rdtype), o.dt_step.astype(rdtype), o.accept,
               jnp.asarray(True))
        return s2, tel

    def skip_step(s):
        zero = jnp.asarray(0.0, rdtype)
        return s, (zero, zero, jnp.asarray(False), jnp.asarray(False))

    def inner(s, _):
        s2, tel = jax.lax.cond(active(s), one_step, skip_step, s)
        return s2, (_emission(s2), tel)

    def run_chunk(s):
        return jax.lax.scan(inner, s, None, length=chunk,
                            unroll=min(max(1, int(cfg.unroll)), chunk))

    def skip_chunk(s):
        zero = jnp.asarray(0.0, rdtype)
        em = (_emission(s), (zero, zero, jnp.asarray(False),
                             jnp.asarray(False)))
        ems = jax.tree_util.tree_map(
            lambda e: jnp.broadcast_to(e[None], (chunk,) + e.shape), em)
        return s, ems

    def chunk_body(s, _):
        return jax.lax.cond(active(s), run_chunk, skip_chunk, s)

    final, (ems, tels) = jax.lax.scan(jax.checkpoint(chunk_body), init,
                                      None, length=num_chunks)
    t0s, t1s, dts, coeffs = jax.tree_util.tree_map(
        lambda e: e.reshape((num_chunks * chunk,) + e.shape[2:]), ems)

    # Flag an exhausted budget that didn't finish the integration.
    status = jnp.where(
        (final.core.t < tau_end) & (final.core.status == Status.OK),
        jnp.asarray(int(Status.MAX_STEPS_REACHED), jnp.int32),
        final.core.status)

    # Post-loop dense-output gather: for each requested time find the
    # (unique, first) emitted step whose interval contains it. t1s is
    # non-decreasing by construction (cache only moves forward).
    taus = tau.astype(rdtype)
    idx = jnp.clip(jnp.searchsorted(t1s, taus[1:], side="left"), 0,
                   t1s.shape[0] - 1)
    out_tail = interp_evaluate_batched(coeffs[idx], t0s[idx], dts[idx],
                                       taus[1:], prob.dtype)
    out = jnp.concatenate([prob.y0[None], out_tail], axis=0)

    stats = SolverStats(final.core.nfe, final.core.n_acc, final.core.n_rej,
                        status)
    telemetry = None
    if cfg.telemetry:
        tt0, tdt, tacc, tact = jax.tree_util.tree_map(
            lambda e: e.reshape((num_chunks * chunk,) + e.shape[2:]), tels)
        telemetry = StepTelemetry(tt0, tdt, tacc, tact)
    dense = None
    if cfg.emit_dense:
        from .base import DenseOutput
        # Inactive tail entries replicate the last accepted step's cache;
        # t1s stays non-decreasing, so searchsorted evaluation is exact.
        # Native-shape states flatten their coefficients ONCE here (row-major
        # matches ravel order) so DenseOutput keeps its flat [S, 5, N]
        # contract for the interpolated adjoint.
        dcoeffs = coeffs
        if dcoeffs.ndim > 3:
            dcoeffs = dcoeffs.reshape(dcoeffs.shape[0], 5, -1)
        dense = DenseOutput(t0s, t1s, dts, dcoeffs, jnp.asarray(1.0, rdtype))
    return SolveResult(out, stats, telemetry, dense)


def interp_evaluate_batched(coeffs: Array, t0: Array, dt: Array, t: Array,
                            dtype) -> Array:
    """Evaluate per-time dense-output polynomials.

    coeffs: [T, 5, *state]; t0, dt, t: [T]. Returns [T, *state].
    """
    x = ((t - t0) / dt).astype(dtype)
    x = x.reshape(x.shape + (1,) * (coeffs.ndim - 2))
    a, b, c, d, e = (coeffs[:, i] for i in range(5))
    return (((a * x + b) * x + c) * x + d) * x + e


# ---------------------------------------------------------------------------
# entry point
# ---------------------------------------------------------------------------

def solve_adaptive(
    prob: CanonicalProblem,
    cfg: AdaptiveConfig,
    rtol,
    atol,
    first_step=None,
    dt_min=None,
    max_num_steps=None,
) -> SolveResult:
    tau = prob.tau
    rtol = jnp.asarray(rtol, jnp.finfo(prob.dtype).dtype)
    atol = jnp.asarray(atol, jnp.finfo(prob.dtype).dtype)
    if dt_min is None:
        dt_min = _default_dt_min(tau)
    if first_step is not None:
        # Clamp to dt_min: dt=0 is self-sustaining (zero error -> accepted,
        # t never advances) and would spin the while loop forever.
        first_step = jnp.maximum(
            jnp.abs(jnp.asarray(first_step, jnp.asarray(dt_min).dtype)),
            dt_min)
    if max_num_steps is None:
        max_num_steps = (2 ** 31 - 1) if cfg.loop == "while" else cfg.max_steps
    max_num_steps = jnp.asarray(max_num_steps, jnp.int32)

    if tau.shape[0] == 1:
        ys = prob.y0[None]
        stats = SolverStats(jnp.asarray(0, jnp.int32),
                            jnp.asarray(0, jnp.int32),
                            jnp.asarray(0, jnp.int32),
                            jnp.asarray(int(Status.OK), jnp.int32))
        return SolveResult(ys, stats)

    if cfg.loop == "while":
        return _solve_while(prob, cfg, rtol, atol, first_step, dt_min,
                            max_num_steps)
    elif cfg.loop == "bounded":
        return _solve_bounded(prob, cfg, rtol, atol, first_step, dt_min,
                              max_num_steps)
    raise ValueError(f"unknown loop mode {cfg.loop!r} "
                     "(expected 'while' or 'bounded')")
