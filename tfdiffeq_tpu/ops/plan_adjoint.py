"""Plan-driven fused adjoint: reverse-mode autodiff over the jaxpr-bridge
ISA, running the ENTIRE continuous-adjoint backward sweep of ARBITRARY
fusable user dynamics as ONE Pallas kernel.

Round 2 shipped the one-kernel adjoint sweep for hand-written MLP/CNF
dynamics (ops/pallas_adjoint.py); round 3's jaxpr->Pallas bridge
(ops/jaxpr_bridge.py) made the FORWARD kernel work for any plain-jnp
``func(t, y)`` in the fusable subset. This module closes the remaining
asymmetry: it differentiates a :class:`~.jaxpr_bridge.FusedPlan` directly —
a hand-rolled reverse-mode walk over the plan's instruction list, in the
same feature-major ``[rows, lanes]`` block layout — so the augmented
adjoint dynamics

    dy/dsigma      = -sign * f(t, y)
    da_y/dsigma    = +sign * (df/dy)^T a_y
    da_c/dsigma    = +sign * (df/dc)^T a_y    (per traced const c)
    da_t/dsigma    = +sign * a_y . df/dt      (when f depends on t)

evaluate inside `pallas_adjoint._make_adjoint_kernel` with one cotangent
accumulator per PACKED const (the same layouts `pack_consts` emits:
transposed-padded weights, column vectors, scalars, per-sample blocks).
The front-end (`fast.odeint_adjoint_fused`) then chains the packed-const
cotangents back to the user's params pytree through JAX's own transpose
of the host-side packing — the custom_vjp boundary sits at the packed
consts, so padding/transposes/closure arithmetic differentiate for free.

Cotangent convention: every intermediate cotangent is LANE-RESOLVED —
shape [rows(primal), B] even when the primal is lane-uniform ([d, 1]) or
scalar. Because every instruction treats lanes independently and the sweep
seeds only a_y (zeroed on pad lanes by the kernel), pad-lane cotangents
are identically zero up to Inf*0 contamination from pad-lane primals;
all terminal reductions (const collapses, weight outer-products, the a_t
quadrature) therefore mask lanes >= plan.batch explicitly.

Upstream parity note: the reference (tfdiffeq) builds its adjoint by
re-entering the eager odeint on an augmented func (SURVEY.md §3.3); there
is no analogue of differentiating a compiled RHS program. This is the
TPU-native answer: one launch for the whole backward pass, for dynamics
the library has never seen.
"""

from __future__ import annotations

import functools
from typing import List

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .jaxpr_bridge import (FusedPlan, FusionError, _materialize,
                           eval_plan, read_const_refs)
from .pallas_kernels import _LANE, _pad_rows, _round_up, rep_spec
from .pallas_kernels import solver_pallas_call

Array = jax.Array


# ---------------------------------------------------------------------------
# Static plan analysis
# ---------------------------------------------------------------------------

def _instr_in_vids(ins) -> list:
    """Val ids read by an instruction (excluding literals and dot weights)."""
    op = ins[0]
    if op == "litv":
        return []
    if op == "dot":
        return [ins[2]]
    if op == "concat":
        return [a[1] for a in ins[2] if a[0] == "v"]
    vids = []
    for x in ins[2:]:
        if isinstance(x, tuple) and len(x) == 2 and x[0] == "v":
            vids.append(x[1])
    return vids


def plan_uses_t(plan: FusedPlan) -> bool:
    """True when the plan output depends on the time input (the adjoint
    then integrates the a_t quadrature)."""
    live = {plan.t_id}
    for ins in plan.instrs:
        if any(v in live for v in _instr_in_vids(ins)):
            live.add(ins[1])
    # output reachable?
    return plan.out_id in live


#: unary ops with identically-zero gradients (cotangent dropped)
_ZERO_GRAD_UN = {"sign", "floor", "ceil", "round", "stop_gradient", "not"}

#: d out / d x as a function of (x, out)
_UN_GRADS = {
    "neg": lambda x, o: -1.0,
    "exp": lambda x, o: o,
    "log": lambda x, o: 1.0 / x,
    "log1p": lambda x, o: 1.0 / (1.0 + x),
    "tanh": lambda x, o: 1.0 - o * o,
    "logistic": lambda x, o: o * (1.0 - o),
    "sin": lambda x, o: jnp.cos(x),
    "cos": lambda x, o: -jnp.sin(x),
    "sqrt": lambda x, o: 0.5 / o,
    "rsqrt": lambda x, o: -0.5 * o / x,
    "abs": lambda x, o: jnp.sign(x),
    "copy": lambda x, o: 1.0,
    "expm1": lambda x, o: o + 1.0,
    "cosh": lambda x, o: 0.5 * (jnp.exp(x) - jnp.exp(-x)),
    "sinh": lambda x, o: 0.5 * (jnp.exp(x) + jnp.exp(-x)),
    # exact d erf/dx (the primal uses the A&S 7.1.26 approximation, whose
    # 1.5e-7 error is below f32 resolution — the exact derivative is both
    # simpler and more accurate than differentiating the approximation)
    "erf": lambda x, o: 1.1283791670955126 * jnp.exp(-x * x),
    "erfc": lambda x, o: -1.1283791670955126 * jnp.exp(-x * x),
    "tan": lambda x, o: 1.0 + o * o,
    "asinh": lambda x, o: jax.lax.rsqrt(x * x + 1.0),
    "acosh": lambda x, o: jax.lax.rsqrt(x * x - 1.0),
    "atanh": lambda x, o: 1.0 / (1.0 - x * x),
}

#: binary comparison / logical ops: no gradient flows
_NO_GRAD_BIN = {"and", "or", "xor", "gt", "lt", "ge", "le", "eq", "ne"}


def check_plan_adjoint(plan: FusedPlan) -> None:
    """Raise FusionError when the plan contains an instruction the in-kernel
    reverse walk cannot differentiate (callers fall back to the generic
    adjoint, or to fused-forward + generic-backward)."""
    for ins in plan.instrs:
        op = ins[0]
        if op == "reduce" and ins[3] in ("max", "min"):
            raise FusionError(
                "fused adjoint through reduce_max/reduce_min is "
                "unsupported (argmax routing); use the generic backward")
        if op == "reduce" and ins[4]:
            raise FusionError(
                "fused adjoint through a full (to-scalar) reduction is "
                "unsupported; use the generic backward")
        if op == "un" and ins[3] not in _UN_GRADS \
                and ins[3] not in _ZERO_GRAD_UN:
            raise FusionError(
                f"fused adjoint has no gradient rule for {ins[3]!r}")


# ---------------------------------------------------------------------------
# Reverse-mode walk over the plan
# ---------------------------------------------------------------------------

def _rows_of(v) -> int:
    return 1 if jnp.ndim(v) == 0 else v.shape[0]


def make_plan_aug_eval(plan: FusedPlan, wrefs, parts: str = "all"):
    """Build aug_eval(t, y [D, B], a_y [D, B]) ->
    (f [D, B], v_y = (df/dy)^T a_y [D, B],
     dconsts: one block per packed const (same shapes as `pack_consts`),
     v_t = a_y . df/dt per sample [1, B])

    — the `aug_factory` contract of `pallas_adjoint._make_adjoint_kernel`,
    for a jaxpr-bridge plan RHS. Forward values come from re-walking the
    plan (`eval_plan`); cotangents walk the instruction list in reverse.

    `parts` trims the walk for the per-lane adjoint's two-pass structure
    (pallas_adjoint._make_perlane_adjoint_kernel): 'dyn' -> (f, v_y),
    skipping the weight-cotangent outer products and the const-cotangent
    collection; 'quad' -> (dconsts, v_t) — the dh chain still runs. Every
    returned cotangent is linear in a_y, so the per-lane caller folds its
    quadrature weight row into a_y.
    """
    B_true = plan.batch

    def aug_eval(t, y, a_y):
        B = y.shape[1]
        dtype = y.dtype
        cvals = read_const_refs(plan, wrefs)
        env = eval_plan(plan, cvals, t, y)
        f = _materialize(env[plan.out_id], plan.dim, B, dtype)

        lane = jax.lax.broadcasted_iota(jnp.int32, (1, B), 1)
        lane_ok = lane < B_true

        ct: List = [None] * plan.n_vals
        dw_acc = {}                      # const idx -> padded wT cotangent

        def getp(a):
            """Primal value of an atom."""
            return a[1] if a[0] == "l" else env[a[1]]

        def unb(c, primal):
            """Reduce a lane-resolved cotangent to the primal's rows."""
            r = _rows_of(primal)
            if c.shape[0] == r:
                return c
            return jnp.sum(c, axis=0, keepdims=True)

        def addct(a, contrib):
            if a[0] == "l":
                return
            vid = a[1]
            contrib = unb(contrib, env[vid])
            ct[vid] = contrib if ct[vid] is None else ct[vid] + contrib

        # Seed: cotangent a_y on the output val (rows-reduced when the
        # raw env value is a broadcast source).
        out_seed = unb(a_y, env[plan.out_id])
        ct[plan.out_id] = out_seed

        for ins in reversed(plan.instrs):
            op = ins[0]
            if op == "litv":
                continue
            c = ct[ins[1]]
            if c is None:
                continue
            if op == "un":
                name = ins[3]
                if name in _ZERO_GRAD_UN:
                    continue
                x = getp(ins[2])
                o = env[ins[1]]
                addct(ins[2], c * _UN_GRADS[name](x, o))
            elif op == "bin":
                name = ins[4]
                if name in _NO_GRAD_BIN:
                    continue
                av, bv = getp(ins[2]), getp(ins[3])
                if name == "add":
                    addct(ins[2], c)
                    addct(ins[3], c)
                elif name == "sub":
                    addct(ins[2], c)
                    addct(ins[3], -c)
                elif name == "mul":
                    addct(ins[2], c * bv)
                    addct(ins[3], c * av)
                elif name == "div":
                    addct(ins[2], c / bv)
                    addct(ins[3], -c * av / (bv * bv))
                elif name in ("max", "min"):
                    # balanced ties (0.5/0.5), matching jax.lax's
                    # _balanced_eq so fused gradients agree with the
                    # generic adjoint at exact ties
                    win = (av > bv) if name == "max" else (av < bv)
                    w_a = jnp.where(av == bv, 0.5,
                                    jnp.where(win, 1.0, 0.0))
                    addct(ins[2], c * w_a)
                    addct(ins[3], c * (1.0 - w_a))
                elif name == "pow":
                    o = env[ins[1]]
                    addct(ins[2], c * bv * o / av)
                    addct(ins[3], c * o * jnp.log(av))
                else:                              # pragma: no cover
                    raise AssertionError(f"bin grad {name}")
            elif op == "ipow":
                n = ins[3]
                if n == 0:
                    continue
                x = getp(ins[2])
                if n == 1:
                    addct(ins[2], c)
                elif n >= 2:
                    xp = x
                    for _ in range(n - 2):
                        xp = xp * x
                    addct(ins[2], c * (float(n) * xp))
                else:
                    o = env[ins[1]]
                    addct(ins[2], c * (float(n) * o / x))
            elif op == "clamp":
                lov, xv, hiv = getp(ins[2]), getp(ins[3]), getp(ins[4])
                inmid = (xv >= lov) & (xv <= hiv)
                addct(ins[3], jnp.where(inmid, c, 0.0))
                addct(ins[2], jnp.where(xv < lov, c, 0.0))
                addct(ins[4], jnp.where(xv > hiv, c, 0.0))
            elif op == "select":
                predv = getp(ins[2])
                addct(ins[4], jnp.where(predv, c, 0.0))
                addct(ins[3], jnp.where(predv, 0.0, c))
            elif op == "cast":
                if not ins[3]:                     # float source
                    addct(ins[2], c)
            elif op == "bcast":
                addct(ins[2], c)                   # unb handles row-sum
            elif op == "reshape":
                addct(ins[2], c)
            elif op == "concat":
                off = 0
                for a in ins[2]:
                    r = _rows_of(getp(a))
                    addct(a, c[off:off + r, :])
                    off += r
            elif op == "slice":
                x = getp(ins[2])
                r = _rows_of(x)
                r0, r1 = ins[3], ins[4]
                cols = c.shape[1]
                pieces = []
                if r0 > 0:
                    pieces.append(jnp.zeros((r0, cols), dtype))
                pieces.append(c)
                if r - r1 > 0:
                    pieces.append(jnp.zeros((r - r1, cols), dtype))
                addct(ins[2], pieces[0] if len(pieces) == 1
                      else jnp.concatenate(pieces, axis=0))
            elif op == "rev":
                # linear: the transpose of a row flip is the row flip
                rows = ins[3]
                addct(ins[2], c if rows == 1 else jnp.concatenate(
                    [c[i:i + 1, :] for i in range(rows - 1, -1, -1)],
                    axis=0))
            elif op == "reduce":
                # max/min rejected by check_plan_adjoint
                x = getp(ins[2])
                r = _rows_of(x)
                addct(ins[2], jnp.broadcast_to(c, (r, c.shape[1])))
            elif op == "bsum":
                # Transpose of a masked batch-axis (lane) sum: collapse
                # the (possibly lane-resolved) output cotangent the same
                # way the col-const quadrature does, then broadcast it
                # back across the TRUE lanes (pad lanes get zero, exactly
                # mirroring the forward mask).
                r = ins[3]
                cc = c
                if jnp.ndim(cc) == 2 and cc.shape[1] > 1:
                    cc = jnp.sum(jnp.where(lane_ok, cc, 0.0), axis=1,
                                 keepdims=True)
                if ins[4] and jnp.ndim(cc) == 2:       # to-scalar bsum
                    cc = jnp.sum(cc)
                cb = _materialize(cc, r, B, dtype)
                addct(ins[2], jnp.where(lane_ok, cb, 0.0))
            elif op == "bmax":
                # Batch-axis max/min: route the cotangent to the
                # extremal lane(s), split evenly across exact ties
                # (JAX's reduce_max VJP semantics, so fused gradients
                # agree with the generic adjoint at ties). Pad lanes
                # never win (lane_ok mask; their primal may even be
                # non-finite).
                r = ins[3]
                v = _materialize(getp(ins[2]), r, B, dtype)
                s = env[ins[1]]                       # [r, 1] or scalar
                tie = jnp.where(lane_ok, (v == s).astype(dtype), 0.0)
                cc = c
                if jnp.ndim(cc) == 2 and cc.shape[1] > 1:
                    cc = jnp.sum(jnp.where(lane_ok, cc, 0.0), axis=1,
                                 keepdims=True)
                if ins[4]:                            # to-scalar
                    if jnp.ndim(cc) == 2:
                        cc = jnp.sum(cc)
                    cnt = jnp.sum(tie)
                else:
                    cnt = jnp.sum(tie, axis=1, keepdims=True)
                cb = _materialize(cc / cnt, r, B, dtype)
                addct(ins[2], tie * cb)
            elif op == "dot":
                _, out, a_id, cidx, din, dout, mxu = ins
                wT = cvals[cidx]                   # [doutP, dinP]
                doutP, dinP = wT.shape
                h = _materialize(env[a_id], din, B, dtype)
                # lane-mask BOTH factors of the weight outer-product: the
                # pad-lane primals can be non-finite (f evaluated at the
                # pinned-zero pad state, e.g. log(0)), and Inf * 0 = NaN
                # in either operand would pollute the batch reduction.
                h = jnp.where(lane_ok, h, 0.0)
                c_m = jnp.where(lane_ok, c, 0.0)
                if doutP != dout:
                    c_p = jnp.concatenate(
                        [c_m, jnp.zeros((doutP - dout, B), dtype)], axis=0)
                else:
                    c_p = c_m
                if mxu:
                    if parts != "dyn":
                        h_p = _pad_rows(h, dinP)
                        dW = jax.lax.dot_general(
                            c_p, h_p, (((1,), (1,)), ((), ())),
                            preferred_element_type=dtype,
                            precision=jax.lax.Precision.HIGHEST)
                    dh = jax.lax.dot_general(
                        wT, c_p, (((0,), (0,)), ((), ())),
                        preferred_element_type=dtype,
                        precision=jax.lax.Precision.HIGHEST)[:din, :]
                else:
                    if parts != "dyn":
                        cols = [jnp.sum(h[i:i + 1, :] * c_p, axis=1,
                                        keepdims=True) for i in range(din)]
                        if dinP != din:
                            cols.append(
                                jnp.zeros((doutP, dinP - din), dtype))
                        dW = jnp.concatenate(cols, axis=1)
                    rows = [jnp.sum(wT[:, i:i + 1] * c_p, axis=0,
                                    keepdims=True) for i in range(din)]
                    dh = jnp.concatenate(rows, axis=0)
                if parts != "dyn":
                    dw_acc[cidx] = (dW if cidx not in dw_acc
                                    else dw_acc[cidx] + dW)
                addct(("v", a_id), dh)
            else:                                  # pragma: no cover
                raise AssertionError(f"bad instr {op}")

        # ---- collect terminals ----
        v_y = ct[plan.y_id]
        if v_y is None:
            v_y = jnp.zeros((plan.dim, B), dtype)
        if parts == "dyn":
            return f, v_y
        tct = ct[plan.t_id]
        v_t = (jnp.where(lane_ok, tct, 0.0) if tct is not None
               else jnp.zeros((1, B), dtype))

        dconsts = []
        for cidx, layout in enumerate(plan.const_layouts):
            tag = layout[0]
            cval = cvals[cidx]
            shape = ((1, 1) if jnp.ndim(cval) == 0 else cval.shape)
            if tag == "wT":
                dconsts.append(dw_acc.get(
                    cidx, jnp.zeros(shape, dtype)))
                continue
            if tag == "unused":
                dconsts.append(jnp.zeros(shape, dtype))
                continue
            cc = ct[plan.const_val_ids[cidx]]
            if cc is None:
                dconsts.append(jnp.zeros(shape, dtype))
            elif tag in ("col", "scalar"):
                # lane-uniform const: collapse the lane-resolved cotangent
                # (masked — pad-lane primals may be non-finite)
                s = jnp.sum(jnp.where(lane_ok, cc, 0.0), axis=1,
                            keepdims=True)
                dconsts.append(s.reshape(shape))
            else:                                  # bvec / batch
                dconsts.append(jnp.where(lane_ok, cc, 0.0))
        if parts == "quad":
            return dconsts, v_t
        return f, v_y, dconsts, v_t

    return aug_eval


# ---------------------------------------------------------------------------
# Whole-sweep kernel entry
# ---------------------------------------------------------------------------

def _true_elems(plan: FusedPlan) -> int:
    """Number of TRUE (unpadded) elements across all const cotangent
    quadratures — the parameter share of the adjoint error-norm
    denominator (matches the generic adjoint's rms over the flattened
    augmented state)."""
    n = 0
    for layout in plan.const_layouts:
        tag = layout[0]
        if tag == "wT":
            n += layout[1] * layout[2]
        elif tag == "col":
            n += layout[1]
        elif tag == "scalar":
            n += 1
        elif tag == "bvec":
            n += plan.batch
        elif tag == "batch":
            n += layout[1] * plan.batch
    return n


@functools.partial(
    jax.jit,
    static_argnames=("plan", "method", "safety", "ifactor", "dfactor",
                     "max_steps", "interpret"))
def plan_perlane_adjoint_solve(plan: FusedPlan, consts_packed, ys: Array,
                               g: Array, tau: Array, dt0_row, rtol, atol,
                               sign, *, method: str = "dopri5",
                               safety: float = 0.9, ifactor: float = 10.0,
                               dfactor: float = 0.2,
                               max_steps: int = 2 ** 31 - 1,
                               interpret: bool = False):
    """Per-lane fused adjoint backward sweep for a jaxpr-bridge plan
    (round-4 verdict item 3): `plan_adjoint_solve` with a per-sample step
    controller. dt0_row may carry per-lane initial backward steps; the
    step-control norm is always the (y, a_y) seminorm; lanes stay
    unpacked/single-block. Batch-coupled plans are rejected (a bsum makes
    lanes interdependent — per-lane time skew would change the dynamics).

    Returns (ay0 [D, B], dconsts, at, stats [4], lane_stats [4, B])."""
    from . import tableaus as _tabs
    from .pallas_adjoint import perlane_adjoint_call

    check_plan_adjoint(plan)
    if plan.batch_coupled:
        raise ValueError("per_sample=True with batch-coupled dynamics is "
                         "unsupported (lanes are interdependent)")
    tab = _tabs.TABLEAUS_BY_NAME[method]
    T, D, B_in = ys.shape
    dtype = ys.dtype
    if B_in != plan.batch:
        raise ValueError(f"ys batch {B_in} != plan batch {plan.batch}")

    consts_packed = tuple(jnp.asarray(c, dtype) for c in consts_packed)
    time_input = plan_uses_t(plan)

    B = _round_up(max(B_in, _LANE), _LANE)
    if B != B_in:
        ys = jnp.pad(ys, ((0, 0), (0, 0), (0, B - B_in)))
        g = jnp.pad(g, ((0, 0), (0, 0), (0, B - B_in)))

    def dyn_factory(wrefs):
        return make_plan_aug_eval(plan, wrefs, parts="dyn")

    def quad_factory(wrefs):
        return make_plan_aug_eval(plan, wrefs, parts="quad")

    acc_shapes = [((1, 1) if jnp.ndim(c) == 0 else c.shape)
                  for c in consts_packed]
    ay0, dconsts, at, stats, lane_stats = perlane_adjoint_call(
        dyn_factory, quad_factory, consts_packed, acc_shapes, ys, g, tau,
        dt0_row, rtol, atol, sign, tab=tab, safety=safety,
        ifactor=ifactor, dfactor=dfactor, max_steps=int(max_steps),
        B_true=B_in, time_input=time_input, interpret=interpret)
    if B != B_in:
        ay0 = ay0[:, :B_in]
        lane_stats = lane_stats[:, :B_in]
    return ay0, dconsts, at, stats, lane_stats


@functools.partial(
    jax.jit,
    static_argnames=("plan", "method", "safety", "ifactor", "dfactor",
                     "max_steps", "seminorm", "interpret", "pack",
                     "n_blocks", "stream_io"))
def plan_adjoint_solve(plan: FusedPlan, consts_packed, ys: Array, g: Array,
                       tau: Array, dt0: Array, rtol, atol, sign, *,
                       method: str = "dopri5", safety: float = 0.9,
                       ifactor: float = 10.0, dfactor: float = 0.2,
                       max_steps: int = 2 ** 31 - 1, seminorm: bool = False,
                       interpret: bool = False, pack: str | int = "auto",
                       n_blocks: int = 1, stream_io: bool = False):
    """Fused adjoint backward sweep for a jaxpr-bridge plan, one kernel.

    consts_packed: tuple from `pack_consts` (BP = lane-padded batch).
    ys, g: [T, D, B_true] feature-major forward trajectory and output
    cotangents at the observation times tau ([T], increasing canonical;
    sign as in `plan_solve`). dt0: initial backward step in sigma = -tau.
    seminorm: exclude the const quadratures from step-size control
    (Kidger et al. 2020).

    Returns (ay0 [D, B_true] = dL/dy0, dconsts — one cotangent array per
    packed const, same shapes, at scalar (integrated time quadrature; 0
    for autonomous plans), stats [4] int32).
    """
    from . import tableaus as _tabs
    from .pallas_adjoint import (_adjoint_pack, _make_adjoint_kernel,
                                 pack_traj_blocks, packed_aug_factory)
    from .pallas_kernels import unpack_state_blocks

    tab = _tabs.TABLEAUS_BY_NAME[method]
    T, D, B = ys.shape
    dtype = ys.dtype

    if B != plan.batch:
        raise ValueError(f"ys batch {B} != plan batch {plan.batch}")
    if B % n_blocks:
        raise ValueError(f"batch {B} not divisible by n_blocks {n_blocks}")
    Bb = B // n_blocks
    if n_blocks > 1 and Bb % _LANE:
        raise ValueError(f"grid block lanes {Bb} not a multiple of "
                         f"{_LANE} (pad the batch first)")
    if n_blocks > 1 and any(
            l[0] in ("batch", "bvec") for l in plan.const_layouts):
        raise ValueError("per-sample consts are not block-shardable")
    if n_blocks > 1 and plan.batch_coupled:
        raise ValueError("batch-coupled plans are not block-shardable "
                         "(block-local sums)")

    if stream_io and n_blocks > 1:
        raise ValueError("stream_io is single-block only (one controller "
                         "streaming trajectory rows from HBM)")
    # Sublane packing (see pallas_adjoint._adjoint_pack): skipped for
    # plans with per-sample consts — their cotangent blocks are
    # lane-resolved at the FULL batch width — and for batch-coupled
    # plans (the masked lane sum assumes lanes == samples).
    kpk = 1
    if not stream_io and not plan.batch_coupled and not any(
            l[0] in ("batch", "bvec") for l in plan.const_layouts):
        kpk = _adjoint_pack(pack, D, Bb)
    if n_blocks > 1 and (Bb // kpk) % _LANE:
        kpk = 1                    # grid blocks must stay lane-aligned
    if kpk > 1:
        ys = pack_traj_blocks(ys, kpk, n_blocks)
        g = pack_traj_blocks(g, kpk, n_blocks)
        T, D, B = ys.shape

    B_true = B // n_blocks         # per-block true lanes
    if n_blocks == 1:
        BP = _round_up(max(B, _LANE), _LANE)
        if BP != B:
            ys = jnp.pad(ys, ((0, 0), (0, 0), (0, BP - B)))
            g = jnp.pad(g, ((0, 0), (0, 0), (0, BP - B)))
            B = BP

    consts_packed = tuple(jnp.asarray(c, dtype) for c in consts_packed)
    n_c = len(consts_packed)
    time_input = plan_uses_t(plan)

    sigma = (-tau).astype(dtype)
    dt_min = (4.0 * jnp.finfo(dtype).eps
              * jnp.maximum(jnp.maximum(jnp.abs(tau[0]), jnp.abs(tau[-1])),
                            1.0)).astype(dtype)
    # Clamp: dt0 == 0 would be accepted forever without progress.
    dt0 = jnp.maximum(jnp.abs(jnp.asarray(dt0, dtype)), dt_min)

    denom = (float(2 * D * B_true) if seminorm
             else float(2 * D * B_true + _true_elems(plan)
                        + (1 if time_input else 0)))

    def aug_factory(wrefs):
        return make_plan_aug_eval(plan, wrefs)
    if kpk > 1:
        aug_factory = packed_aug_factory(aug_factory, kpk, plan.dim)

    kernel = _make_adjoint_kernel(tab, T, safety, ifactor, dfactor,
                                  int(max_steps), denom, B_true,
                                  aug_factory, n_c, n_c,
                                  seminorm, time_input,
                                  per_block_io=n_blocks > 1,
                                  stream_io=stream_io)

    smem_t = pl.BlockSpec(memory_space=pltpu.SMEM)
    vmem = pl.BlockSpec(memory_space=pltpu.VMEM)
    NB = B // n_blocks

    out_shape = [jax.ShapeDtypeStruct((D, B), dtype)]
    for c in consts_packed:
        out_shape.append(jax.ShapeDtypeStruct(c.shape, dtype))
    out_shape.append(jax.ShapeDtypeStruct((n_blocks, 4), jnp.int32))
    out_shape.append(jax.ShapeDtypeStruct((1, n_blocks), dtype))

    scalar_ins = (
        sigma.reshape(1, T),
        jnp.broadcast_to(jnp.asarray(dt0, dtype).reshape(-1),
                         (n_blocks,)).reshape(1, n_blocks),
        jnp.reshape(jnp.asarray(rtol, dtype), (1, 1)),
        jnp.reshape(jnp.asarray(atol, dtype), (1, 1)),
        jnp.reshape(dt_min, (1, 1)),
        jnp.reshape(jnp.asarray(sign, dtype), (1, 1)))
    scratch = [pltpu.VMEM((D, NB), dtype)] * 4
    if stream_io:
        scratch = scratch + [pltpu.VMEM((1, D, NB), dtype)] * 2 \
            + [pltpu.SemaphoreType.DMA]

    if n_blocks == 1:
        traj = pl.BlockSpec(memory_space=pl.ANY) if stream_io else vmem
        in_specs = [smem_t] * 6 + [traj, traj] + [vmem] * n_c
        out_specs = [vmem] * (1 + n_c) + [smem_t, smem_t]
        grid_kw = {}
    else:
        # Sequential grid over lane blocks: block-sliced ys/g/ay0,
        # replicated consts, REVISITED cotangent windows accumulating
        # across programs (zeroed at program 0).
        traj_spec = pl.BlockSpec((T, D, NB), lambda i: (0, 0, i),
                                 memory_space=pltpu.VMEM)
        ay0_spec = pl.BlockSpec((D, NB), lambda i: (0, i),
                                memory_space=pltpu.VMEM)
        in_specs = ([smem_t] * 6 + [traj_spec, traj_spec]
                    + [rep_spec(c.shape) for c in consts_packed])
        out_specs = ([ay0_spec]
                     + [rep_spec(c.shape) for c in consts_packed]
                     + [smem_t, smem_t])
        grid_kw = {"grid": (n_blocks,)}

    if stream_io and not interpret:
        # The streamed sweep's stage liveness (ky/kay chains + the plan
        # re-walk + VJP temps, each [D, B] at the FULL batch) measured
        # ~69 x D*B*4 bytes at B=131072 — past the 64 MB default scoped
        # limit but well under the v5e 128 MB VMEM; raise the budget for
        # this launch only (the front-end guard caps B accordingly).
        grid_kw["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024)
    res = solver_pallas_call(
        kernel,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=scratch,
        interpret=interpret,
        **grid_kw,
    )(*scalar_ins, ys, g, *consts_packed)

    ay0 = res[0]
    dconsts = list(res[1:1 + n_c])
    st = res[1 + n_c]
    at_row = res[2 + n_c]
    if n_blocks == 1:
        stats = st[0]
        at = at_row[0, 0]
        if B != B_true:
            ay0 = ay0[:, :B_true]
    else:
        stats = jnp.concatenate(
            [jnp.sum(st[:, :3], axis=0), st[:, 3:4].max(axis=0)])
        at = jnp.sum(at_row)
    if kpk > 1:
        ay0 = unpack_state_blocks(ay0, kpk, plan.dim, n_blocks)
    return ay0, dconsts, at, stats
