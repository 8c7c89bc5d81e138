"""jaxpr -> Pallas bridge: auto-fuse ARBITRARY user dynamics.

The fused whole-solve kernel (ops/pallas_kernels.py) runs the entire
adaptive integration in one launch, but round 2 could only build its
in-kernel RHS for three hand-written dynamics families (MLP / CNF / conv).
This module closes that gap (round-2 verdict item 1): a user-written
``func(t, y)`` in plain jnp is traced to a jaxpr, a restricted primitive
subset (elementwise ops, ``dot_general`` against weight constants,
broadcasts, feature-axis reductions/concats, batch-axis SUMS for
mean-field couplings — exactly what neural-ODE dynamics use) is compiled
into a *plan*, and the plan is interpreted inside the kernel in the
feature-major ``[D, B]`` layout. Anything outside the
subset raises :class:`FusionError`, which the front-ends catch to fall back
to the generic XLA engine — fusion is an optimization, never a semantics
change.

Engagement points:
- ``odeint(..., options={'fuse': True})`` / ``solve(...)`` — forward solves.
- ``odeint_adjoint(..., options={'fuse': True})`` — fused forward kernel +
  generic O(1)-memory adjoint backward (via the ``forward_solver`` hook).
- ``fast.solve_fused(func, y0, t, ...)`` — direct front-end.

Layout convention (matches pallas_kernels): the batch axis lies along VPU
lanes. Every jaxpr value maps to a 2-D block:

    aval ()        -> traced scalar
    aval (B,)      -> [1, B]
    aval (B, d)    -> [d, B]        (feature-major transpose)
    aval (d,)      -> [d, 1]        (broadcasts over lanes)
    aval (1,d)/(d,1) non-batched -> [d, 1]
    aval (a, b) non-batched      -> dot_general weight only (stored as a
                                    zero-padded transposed VMEM ref, like
                                    pad_mlp_weights)

The batch size B must not collide with any feature dimension (checked; a
collision raises FusionError -> generic fallback). Contractions run on the
VPU (unrolled exact-f32 outer products) or the MXU (HIGHEST-precision dot)
per layer via the same static policy as MLPSpec(matmul='auto').

Upstream parity note: the reference (tfdiffeq) has no analogue — its eager
dispatch executes arbitrary funcs by construction, at one device round-trip
per tensor op (SURVEY.md §3.1). This bridge is how a TPU-native design
recovers "fast for arbitrary dynamics".
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array

_SUBLANE = 8


class FusionError(Exception):
    """Dynamics outside the fusable subset (callers fall back)."""


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


# ---------------------------------------------------------------------------
# In-kernel op tables (only ops verified to lower in Mosaic, or composed
# from them; see pallas_kernels._ACTIVATIONS for the precedent set)
# ---------------------------------------------------------------------------

def _erfc_tail(a):
    """erfc(a) for a >= 0 via Abramowitz & Stegun 7.1.26 (max abs error
    1.5e-7 — the f32 noise floor). The tail form poly*exp(-a^2) is
    cancellation-free where erfc is small."""
    t = 1.0 / (1.0 + 0.3275911 * a)
    poly = t * (0.254829592 + t * (-0.284496736 + t * (1.421413741
                + t * (-1.453152027 + t * 1.061405429))))
    return poly * jnp.exp(-a * a)


def _erf_approx(x):
    """erf via A&S 7.1.26: Mosaic has no erf/erfc lowering, but
    exp/div/abs/sign do lower, so exact-GELU dynamics stay fusable. The
    adjoint uses the EXACT derivative 2/sqrt(pi) e^{-x^2}
    (plan_adjoint._UN_GRADS)."""
    return jnp.sign(x) * (1.0 - _erfc_tail(jnp.abs(x)))


def _erfc_approx(x):
    """erfc = 1 - erf, tail-form on x >= 0 (jax.nn.gelu(approximate=False)
    traces to erfc)."""
    tail = _erfc_tail(jnp.abs(x))
    return jnp.where(x >= 0, tail, 2.0 - tail)


_UN_OPS = {
    "neg": lambda x: -x,
    "exp": jnp.exp,
    "log": jnp.log,
    "log1p": jnp.log1p,
    "tanh": jnp.tanh,
    "logistic": lambda x: 1.0 / (1.0 + jnp.exp(-x)),
    "sin": jnp.sin,
    "cos": jnp.cos,
    "sqrt": jnp.sqrt,
    "rsqrt": jax.lax.rsqrt,
    "abs": jnp.abs,
    "sign": jnp.sign,
    "floor": jnp.floor,
    "ceil": jnp.ceil,
    # round-half-to-EVEN (jnp.round semantics; a bare floor(x+0.5) would
    # break ties away from even and disagree with the generic engine):
    # ties have x+0.5 exactly representable, odd results get nudged down.
    "round": lambda x: (lambda r: jnp.where(
        ((x + 0.5) == r) & (jnp.floor(r * 0.5) * 2.0 != r),
        r - 1.0, r))(jnp.floor(x + 0.5)),
    "stop_gradient": lambda x: x,
    "copy": lambda x: x,
    "expm1": lambda x: jnp.exp(x) - 1.0,
    "cosh": lambda x: 0.5 * (jnp.exp(x) + jnp.exp(-x)),
    "sinh": lambda x: 0.5 * (jnp.exp(x) - jnp.exp(-x)),
    "not": jnp.logical_not,
    "erf": _erf_approx,
    "erfc": _erfc_approx,
    "tan": lambda x: jnp.sin(x) / jnp.cos(x),
    # inverse hyperbolics via log/sqrt (all lower in Mosaic)
    "asinh": lambda x: jnp.log(x + jnp.sqrt(x * x + 1.0)),
    "acosh": lambda x: jnp.log(x + jnp.sqrt(x * x - 1.0)),
    "atanh": lambda x: 0.5 * (jnp.log1p(x) - jnp.log1p(-x)),
}

_BIN_OPS = {
    "add": lambda a, b: a + b,
    "sub": lambda a, b: a - b,
    "mul": lambda a, b: a * b,
    "div": lambda a, b: a / b,
    "max": jnp.maximum,
    "min": jnp.minimum,
    # a**b via exp/log (scalar powf does not lower in Mosaic); valid for
    # a > 0 — integer exponents take the exact `integer_pow` path instead.
    "pow": lambda a, b: jnp.exp(b * jnp.log(a)),
    "and": jnp.logical_and,
    "or": jnp.logical_or,
    "xor": jnp.logical_xor,
    "gt": lambda a, b: a > b,
    "lt": lambda a, b: a < b,
    "ge": lambda a, b: a >= b,
    "le": lambda a, b: a <= b,
    "eq": lambda a, b: a == b,
    "ne": lambda a, b: a != b,
}

#: call-like primitives whose inner jaxpr is inlined transparently
_CALL_PRIMS = {"pjit", "jit", "closed_call", "core_call", "custom_jvp_call",
               "custom_vjp_call", "custom_jvp_call_jaxpr", "remat",
               "checkpoint", "custom_vjp_call_jaxpr"}


# ---------------------------------------------------------------------------
# Plan structure
# ---------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class FusedPlan:
    """Hashable in-kernel program: static per (func structure, shapes).

    instrs: tuple of instruction tuples (see _eval_plan for the ISA).
    const_layouts: per traced const —
        ('wT', din, dout, transpose) | ('col', d) | ('scalar',)
        | ('batch', d) | ('bvec',)
    """
    instrs: tuple
    n_vals: int
    const_layouts: tuple
    const_val_ids: tuple
    t_id: int
    y_id: int
    out_id: int
    batch: int
    dim: int
    matmul: str = "auto"
    #: output feature rows; == dim for ODE right-hand sides (the usual
    #: square case), smaller for rectangular auxiliary plans such as a
    #: hypersolver correction net g(t, [y; f]) -> dy (ops/pallas_fixed).
    dim_out: int = -1
    #: plan contains a batch-axis ('bsum') reduction — mean-field
    #: couplings like dy_i/dt = f(y_i) + g(mean_j y_j). Such plans run
    #: unpacked and single-block (a block-local sum over a batch slice
    #: would silently differ from the global sum), and refuse per-lane
    #: stepping (a cross-lane sum over states at different per-lane times
    #: is not the ODE the user wrote).
    batch_coupled: bool = False

    @property
    def out_rows(self) -> int:
        return self.dim if self.dim_out < 0 else self.dim_out


def _kind(shape: Tuple[int, ...], B: int):
    """Map an aval shape to its block layout ('scalar' | (rows, cols) |
    'mat'). Raises FusionError for unsupported ranks.

    Rank >= 3 batch-leading shapes [B, r1, ..., rk] FLATTEN TO FEATURES
    (round-4 verdict item 4): the block is (prod(r), B) with rows in
    row-major order over the trailing dims — exactly the layout
    jnp.reshape(x, (B, -1)) produces, so reshapes between [B, ...] views
    of the same element count are block identities. Ops whose flattened-
    row semantics would differ from their rank-3 semantics (partial-axis
    reduces, inner-axis slices/concats/flips, rank-3 dots, row-tiling
    broadcasts) are rejected at their handlers — flatten-to-features
    covers elementwise/broadcast dynamics on field-shaped states, not
    spatial ops (the conv tier handles those)."""
    if shape == ():
        return "scalar"
    if len(shape) == 1:
        return (1, B) if shape[0] == B else (shape[0], 1)
    if len(shape) == 2:
        if shape[0] == B:
            return (shape[1], B)
        if shape[0] == 1:
            return (shape[1], 1)
        if shape[1] == 1:
            return (shape[0], 1)
        return "mat"
    r = int(np.prod(shape[1:]))
    if shape[0] == B:
        return (r, B)
    if shape[0] == 1:
        return (r, 1)
    raise FusionError(f"rank-{len(shape)} intermediate {shape} unsupported")


def _check_no_batch_collision(shape, B):
    """B may only appear as the leading (batch) axis: a feature dim equal
    to B would make the layout ambiguous. B == 1 is safe (all
    interpretations coincide at block level)."""
    if B == 1:
        return
    for i, d in enumerate(shape):
        if d == B and i != 0:
            raise FusionError(
                f"batch size {B} collides with feature dim in {shape}")


class _PlanBuilder:
    def __init__(self, B: int, dim: int, matmul: str):
        self.B = B
        self.dim = dim
        self.matmul = matmul
        self.instrs: List[tuple] = []
        self.n_vals = 0
        self.consts: List[Any] = []        # traced const values (in order)
        self.const_ids: List[int] = []     # val id per const
        self.const_layouts: List[Any] = [] # layout per const (None=undecided)
        self.const_of_val = {}             # val id -> const index (aliases)
        self.batch_coupled = False         # any bsum instr emitted

    def new_val(self) -> int:
        self.n_vals += 1
        return self.n_vals - 1

    def add_const(self, value) -> int:
        vid = self.new_val()
        self.consts.append(value)
        self.const_ids.append(vid)
        self.const_layouts.append(None)
        self.const_of_val[vid] = len(self.consts) - 1
        return vid

    # ---- const layout bookkeeping ----
    def _set_const_layout(self, idx: int, layout):
        cur = self.const_layouts[idx]
        if cur is None:
            self.const_layouts[idx] = layout
        elif cur != layout:
            raise FusionError(
                f"const used in conflicting roles: {cur} vs {layout}")

    def finalize_default_layouts(self, used_vids):
        """Consts not consumed by dot_general get elementwise layouts from
        their shapes; consts never referenced by any instruction (e.g. the
        untransposed source of a host-folded transpose) are packed as
        dummies."""
        for i, c in enumerate(self.consts):
            if self.const_layouts[i] is not None:
                continue
            if self.const_ids[i] not in used_vids:
                self._set_const_layout(i, ("unused",))
                continue
            shape = tuple(np.shape(c))
            if not jnp.issubdtype(jnp.result_type(c), jnp.floating):
                raise FusionError(f"non-float const dtype "
                                  f"{jnp.result_type(c)}")
            k = _kind(shape, self.B)
            if k == "scalar":
                self._set_const_layout(i, ("scalar",))
            elif k == "mat":
                raise FusionError(
                    f"2-D const {shape} used outside dot_general")
            else:
                r, c_ = k
                if c_ == self.B and self.B != 1:
                    self._set_const_layout(
                        i, ("bvec",) if len(shape) == 1 else ("batch", r))
                else:
                    self._set_const_layout(i, ("col", r))


def _atom(builder: _PlanBuilder, env, v):
    """Map a jaxpr atom (Var or Literal) to a plan atom."""
    from jax._src.core import Literal
    if isinstance(v, Literal):
        val = v.val
        if np.ndim(val) == 0:
            return ("l", float(val))
        # inline array literal -> const
        vid = builder.add_const(jnp.asarray(val))
        return ("v", vid)
    return ("v", env[v])


def _trace_closed_jaxpr(builder: _PlanBuilder, closed, in_ids: Sequence):
    """Flatten a ClosedJaxpr into plan instructions; returns out val ids."""
    jaxpr = closed.jaxpr
    env = {}
    for var, cval in zip(jaxpr.constvars, closed.consts):
        if np.ndim(cval) == 0 and not isinstance(cval, jax.core.Tracer):
            # concrete scalar const: fold to a literal downstream
            vid = builder.new_val()
            builder.instrs.append(("litv", vid, float(np.asarray(cval))))
            env[var] = vid
        else:
            env[var] = builder.add_const(cval)
    for var, vid in zip(jaxpr.invars, in_ids):
        env[var] = vid
    for eqn in jaxpr.eqns:
        _trace_eqn(builder, env, eqn)
    outs = []
    for v in jaxpr.outvars:
        a = _atom(builder, env, v)
        if a[0] == "l":
            raise FusionError("literal output")
        outs.append(a[1])
    return outs


def _subjaxpr(params):
    for key in ("jaxpr", "call_jaxpr", "fun_jaxpr"):
        if key in params:
            sub = params[key]
            if hasattr(sub, "jaxpr"):        # ClosedJaxpr
                return sub
            import jax.core as jcore
            return jcore.ClosedJaxpr(sub, ())
    raise FusionError("call primitive without inner jaxpr")


def _trace_eqn(builder: _PlanBuilder, env, eqn):
    prim = eqn.primitive.name
    if prim == "add_any":        # linearization's tangent-sum == add
        prim = "add"
    B = builder.B

    if prim in _CALL_PRIMS:
        sub = _subjaxpr(eqn.params)
        in_ids = []
        for v in eqn.invars:
            a = _atom(builder, env, v)
            if a[0] == "l":
                vid = builder.new_val()
                builder.instrs.append(("litv", vid, a[1]))
                in_ids.append(vid)
            else:
                in_ids.append(a[1])
        # custom_vjp_call passes extra closure args first in some versions;
        # the inner jaxpr arity check below guards mismatches.
        if len(sub.jaxpr.invars) != len(in_ids):
            raise FusionError(
                f"{prim} arity mismatch: {len(sub.jaxpr.invars)} vs "
                f"{len(in_ids)}")
        outs = _trace_closed_jaxpr(builder, sub, in_ids)
        if len(outs) != len(eqn.outvars):
            raise FusionError(f"{prim} output arity mismatch")
        for var, vid in zip(eqn.outvars, outs):
            env[var] = vid
        return

    for ov in eqn.outvars:
        _check_no_batch_collision(ov.aval.shape, B)
    for iv in eqn.invars:
        if hasattr(iv, "aval"):
            _check_no_batch_collision(iv.aval.shape, B)

    def out_id():
        vid = builder.new_val()
        env[eqn.outvars[0]] = vid
        return vid

    if prim in _UN_OPS:
        a = _atom(builder, env, eqn.invars[0])
        builder.instrs.append(("un", out_id(), a, prim))
        return
    if prim in _BIN_OPS:
        a = _atom(builder, env, eqn.invars[0])
        b = _atom(builder, env, eqn.invars[1])
        builder.instrs.append(("bin", out_id(), a, b, prim))
        return
    if prim == "integer_pow":
        a = _atom(builder, env, eqn.invars[0])
        builder.instrs.append(("ipow", out_id(), a,
                               int(eqn.params["y"])))
        return
    if prim == "clamp":
        lo = _atom(builder, env, eqn.invars[0])
        x = _atom(builder, env, eqn.invars[1])
        hi = _atom(builder, env, eqn.invars[2])
        builder.instrs.append(("clamp", out_id(), lo, x, hi))
        return
    if prim == "select_n":
        if len(eqn.invars) != 3:
            raise FusionError("select_n with >2 cases")
        pred = _atom(builder, env, eqn.invars[0])
        c0 = _atom(builder, env, eqn.invars[1])
        c1 = _atom(builder, env, eqn.invars[2])
        builder.instrs.append(("select", out_id(), pred, c0, c1))
        return
    if prim == "convert_element_type":
        a = _atom(builder, env, eqn.invars[0])
        src = eqn.invars[0].aval.dtype if hasattr(eqn.invars[0], "aval") \
            else jnp.float32
        dst = eqn.params["new_dtype"]
        if jnp.issubdtype(dst, jnp.integer):
            raise FusionError("float->int conversion")
        builder.instrs.append(
            ("cast", out_id(), a, bool(jnp.issubdtype(src, jnp.bool_))))
        return
    if prim == "broadcast_in_dim":
        a = _atom(builder, env, eqn.invars[0])
        to_shape = tuple(eqn.params["shape"])
        to_k = _kind(to_shape, B)
        if to_k == "mat":
            raise FusionError(f"broadcast to mat {eqn.params['shape']}")
        src_shape = (tuple(eqn.invars[0].aval.shape)
                     if hasattr(eqn.invars[0], "aval") else ())
        if len(to_shape) >= 3 or len(src_shape) >= 3:
            # Flattened-rank-3 guard: only whole-row broadcasts are block
            # ops (source rows 1 or == target rows). A middle-axis tile
            # like [B, 1, r2] -> [B, r1, r2] would need row tiling the
            # bcast instr does not do.
            src_k = _kind(src_shape, B)
            src_rows = 0 if src_k == "scalar" else src_k[0]
            if src_k != "scalar" and src_rows not in (1, to_k[0]):
                raise FusionError(
                    f"broadcast {src_shape} -> {to_shape} tiles feature "
                    "rows (outside the flatten-to-features subset)")
        builder.instrs.append(("bcast", out_id(), a, to_k))
        return
    if prim in ("reshape", "squeeze", "expand_dims"):
        a = _atom(builder, env, eqn.invars[0])
        from_k = _kind(tuple(eqn.invars[0].aval.shape), B)
        to_k = _kind(tuple(eqn.outvars[0].aval.shape), B)
        if from_k == "mat" or to_k == "mat":
            raise FusionError("reshape through mat layout")
        if from_k != "scalar" and to_k != "scalar" and from_k != to_k:
            # (B,)<->(B,1) and (d,)<->(d,1)/(1,d) are block-identities;
            # anything that moves elements between rows/lanes is not.
            raise FusionError(
                f"reshape {eqn.invars[0].aval.shape} -> "
                f"{eqn.outvars[0].aval.shape} changes block layout")
        builder.instrs.append(("reshape", out_id(), a, to_k))
        return
    if prim == "concatenate":
        dim = int(eqn.params["dimension"])
        shapes = [tuple(v.aval.shape) for v in eqn.invars]
        # Batch-leading, concat on the OUTERMOST feature axis: flattened
        # rows stay contiguous per input (rank >= 3 rides the
        # flatten-to-features layout; inner-axis concats would interleave
        # rows and are rejected).
        ok = all(len(s) >= 2 and s[0] == B for s in shapes) and dim == 1
        ok = ok or (all(len(s) == 1 and s[0] != B for s in shapes)
                    and dim == 0)
        ok = ok or (B == 1 and dim == 1
                    and all(len(s) >= 2 and s[0] == 1 for s in shapes))
        if not ok:
            raise FusionError(f"concatenate dim={dim} shapes={shapes}")
        atoms = tuple(_atom(builder, env, v) for v in eqn.invars)
        builder.instrs.append(("concat", out_id(), atoms))
        return
    if prim in ("reduce_sum", "reduce_max", "reduce_min"):
        axes = tuple(eqn.params["axes"])
        shape = tuple(eqn.invars[0].aval.shape)
        k = _kind(shape, B)
        if k == "scalar" or k == "mat":
            raise FusionError(f"reduce over {shape}")
        out_k = _kind(tuple(eqn.outvars[0].aval.shape), B)
        if out_k == "mat":
            raise FusionError(f"reduce over {shape} axes {axes} leaves a "
                              "mat-layout result")
        r, c = k
        # Size-1 axes reduce to the identity at block level (e.g. the
        # axis-0 "reduce" of a (1, d) value is a squeeze) — without this,
        # the generic reduce instr would wrongly fold the FEATURE rows.
        eff_axes = tuple(ax for ax in axes if shape[ax] != 1)
        if len(shape) >= 3:
            # Flattened rank-3: the block reduce folds ALL feature rows,
            # so a partial reduce (some non-size-1 trailing axis kept)
            # would be silently wrong — reject it.
            lead_batch = 1 if (shape[0] in (B, 1)) else 0
            feat = {i for i in range(lead_batch, len(shape))
                    if shape[i] != 1}
            if eff_axes and not feat.issubset(set(eff_axes)):
                raise FusionError(
                    f"partial feature reduce over {shape} axes {axes} "
                    "(flatten-to-features folds all feature rows)")
        a = _atom(builder, env, eqn.invars[0])
        if not eff_axes:
            builder.instrs.append(("un", out_id(), a, "copy"))
            return
        if c == B and B != 1 and 0 in eff_axes:
            # Batch-axis reduction: a mean-field coupling (jnp.mean/sum/
            # max/min over samples). Executed as a pad-lane-masked
            # cross-lane reduction; the plan is marked batch_coupled so
            # front-ends keep it unpacked/single-block (or streamed)
            # (jaxpr_bridge.FusedPlan.batch_coupled). SUM transposes as
            # a masked lane broadcast; MAX/MIN route their cotangent to
            # the extremal lanes with JAX's even tie split (the 'bmax'
            # reverse rule in plan_adjoint).
            to_scalar = (_kind(tuple(eqn.outvars[0].aval.shape), B)
                         == "scalar")
            if prim == "reduce_sum":
                builder.instrs.append(("bsum", out_id(), a, r, to_scalar))
            else:
                builder.instrs.append(("bmax", out_id(), a, r, to_scalar,
                                       prim == "reduce_min"))
            builder.batch_coupled = True
            return
        to_scalar = _kind(tuple(eqn.outvars[0].aval.shape), B) == "scalar"
        fn = {"reduce_sum": "sum", "reduce_max": "max",
              "reduce_min": "min"}[prim]
        builder.instrs.append(("reduce", out_id(), a, fn, to_scalar))
        return
    if prim == "slice":
        # Contiguous feature-axis slices (z = s[:, :D], component picks
        # like jvp_out[:, i:i+1]); in the feature-major block layout these
        # are ROW slices. Batch-axis slicing is rejected (cross-sample).
        shape = tuple(eqn.invars[0].aval.shape)
        start = tuple(int(s) for s in eqn.params["start_indices"])
        limit = tuple(int(s) for s in eqn.params["limit_indices"])
        strides = eqn.params.get("strides")
        if strides is not None and any(int(s) != 1 for s in strides):
            raise FusionError("strided slice unsupported")
        k = _kind(shape, B)
        if k == "scalar" or k == "mat":
            raise FusionError(f"slice of {shape} unsupported")
        if len(shape) >= 3:
            # Flattened rank-3: only outermost-feature-axis slices keep
            # contiguous rows; inner-axis slices stride and are rejected.
            if shape[0] == B and B != 1 and (start[0], limit[0]) != (0, B):
                raise FusionError("slice along the batch axis")
            if any((start[i], limit[i]) != (0, shape[i])
                   for i in range(2, len(shape))):
                raise FusionError(
                    f"inner-axis slice {start}:{limit} of {shape} "
                    "(flatten-to-features keeps rows contiguous only for "
                    "outermost-feature slices)")
            inner = int(np.prod(shape[2:]))
            r0, r1 = start[1] * inner, limit[1] * inner
        elif len(shape) == 1:
            if shape[0] == B and B != 1:
                raise FusionError("slice along the batch axis")
            r0, r1 = start[0], limit[0]
        elif shape[0] == B and B != 1:            # batched [B, d]
            if (start[0], limit[0]) != (0, B):
                raise FusionError("slice along the batch axis")
            r0, r1 = start[1], limit[1]
        elif shape[0] == 1:                       # [1, d] row vector
            if (start[0], limit[0]) != (0, 1):
                raise FusionError(f"slice {start}:{limit} of {shape}")
            r0, r1 = start[1], limit[1]
        else:                                     # [d, 1] column
            if (start[1], limit[1]) != (0, 1):
                raise FusionError(f"slice {start}:{limit} of {shape}")
            r0, r1 = start[0], limit[0]
        a = _atom(builder, env, eqn.invars[0])
        if a[0] == "l":
            raise FusionError("slice of a literal")
        builder.instrs.append(("slice", out_id(), a, r0, r1))
        return
    if prim == "rev":
        # jnp.flip along the FEATURE axis (lane-local row reversal in the
        # feature-major layout); batch-axis reversal is cross-sample and
        # stays unsupported.
        shape = tuple(eqn.invars[0].aval.shape)
        dims = tuple(int(d) for d in eqn.params["dimensions"])
        if len(shape) >= 3:
            raise FusionError(
                f"rev of {shape} unsupported (a rank-3 axis flip "
                "permutes flattened feature rows non-contiguously)")
        k = _kind(shape, B)
        if k == "scalar" or k == "mat":
            raise FusionError(f"rev of {shape} unsupported")
        rows = k[0]
        if len(shape) == 1:
            feat_axis = 0 if shape[0] != B or B == 1 else None
        elif shape[0] == B and B != 1:
            feat_axis = 1
        elif shape[1] == 1:
            feat_axis = 0
        else:
            feat_axis = 1
        if feat_axis is None or dims != (feat_axis,):
            raise FusionError(f"rev over dims {dims} of {shape} "
                              "(only feature-axis flips fuse)")
        a = _atom(builder, env, eqn.invars[0])
        if a[0] == "l":
            raise FusionError("rev of a literal")
        builder.instrs.append(("rev", out_id(), a, rows))
        return
    if prim == "dot_general":
        _trace_dot(builder, env, eqn, out_id)
        return
    if prim == "transpose":
        # Transposes of closed-over weight arrays (einsum-style code) fold
        # into a host-side const transform; transposing computed values
        # would reshuffle the block layout and stays unsupported.
        a = _atom(builder, env, eqn.invars[0])
        perm = tuple(eqn.params["permutation"])
        if (a[0] == "v" and a[1] in builder.const_of_val
                and perm == (1, 0)):
            src = builder.const_of_val[a[1]]
            vid = builder.add_const(jnp.transpose(builder.consts[src]))
            env[eqn.outvars[0]] = vid
            return
        raise FusionError("transpose of a computed value unsupported "
                          "(write the contraction with @ / jnp.dot)")
    raise FusionError(f"primitive {prim!r} not fusable")


def _trace_dot(builder: _PlanBuilder, env, eqn, out_id):
    B = builder.B
    (lc, rc), (lb, rb) = eqn.params["dimension_numbers"]
    if lb or rb:
        raise FusionError("batched dot_general unsupported")
    lhs, rhs = eqn.invars
    lshape = tuple(lhs.aval.shape)
    rshape = tuple(rhs.aval.shape)
    # Supported: lhs batched [B, din] (or [B] with din=1), contraction on
    # its last dim; rhs a 2-D weight const.
    if len(lshape) == 2 and lshape[0] == B and tuple(lc) == (1,):
        din = lshape[1]
    elif len(lshape) == 1 and lshape[0] == B and B == 1 and tuple(lc) == (0,):
        raise FusionError("1-D lhs dot")
    else:
        raise FusionError(
            f"dot_general lhs {lshape} contract {lc} unsupported "
            "(need batch-major [B, din] @ weights)")
    if len(rshape) != 2:
        raise FusionError(f"dot_general rhs rank {len(rshape)}")
    if tuple(rc) == (0,):
        transpose = True        # rhs [din, dout]: host stores rhs.T
        dout = rshape[1]
        if rshape[0] != din:
            raise FusionError("dot shape mismatch")
    elif tuple(rc) == (1,):
        transpose = False       # rhs [dout, din]: host stores as-is
        dout = rshape[0]
        if rshape[1] != din:
            raise FusionError("dot shape mismatch")
    else:
        raise FusionError(f"dot_general rhs contract {rc}")

    ra = _atom(builder, env, rhs)
    if ra[0] != "v" or ra[1] not in builder.const_of_val:
        raise FusionError("dot_general rhs must be a closed-over weight "
                          "array (computed weights unsupported)")
    cidx = builder.const_of_val[ra[1]]
    builder._set_const_layout(cidx, ("wT", din, dout, transpose))

    la = _atom(builder, env, lhs)
    if la[0] == "l":
        raise FusionError("literal dot lhs")
    from .pallas_kernels import _layer_uses_mxu
    mxu = _layer_uses_mxu(builder.matmul, din, dout)
    builder.instrs.append(("dot", out_id(), la[1], cidx, din, dout, mxu))


def build_plan(func: Callable, t0, y0, matmul: str = "auto",
               out_dim: int = None) -> Tuple[FusedPlan, list]:
    """Trace func(t, y) on [B, D] batch-major state into a FusedPlan.

    Returns (plan, consts) where consts are the traced closure arrays (in
    plan order; possibly tracers when called under jit). Raises FusionError
    when the dynamics fall outside the fusable subset. `out_dim` permits a
    RECTANGULAR plan (output [B, out_dim] from input [B, D]) for auxiliary
    in-kernel functions; ODE right-hand sides stay square (default).
    """
    y0 = jnp.asarray(y0) if not isinstance(y0, jax.core.Tracer) else y0
    if y0.ndim != 2:
        raise FusionError(f"y0 must be [batch, dim], got {jnp.shape(y0)}")
    B, D = y0.shape
    try:
        closed = jax.make_jaxpr(lambda tt, yy: func(tt, yy))(t0, y0)
    except FusionError:
        raise
    except Exception as e:                                 # noqa: BLE001
        raise FusionError(f"tracing failed: {e}") from e

    builder = _PlanBuilder(B, D, matmul)
    t_id = builder.new_val()
    y_id = builder.new_val()
    outs = _trace_closed_jaxpr(builder, closed, [t_id, y_id])
    if len(outs) != 1:
        raise FusionError(f"func must return one array, got {len(outs)}")
    out_aval = closed.jaxpr.outvars[0].aval
    D_out = D if out_dim is None else int(out_dim)
    if tuple(out_aval.shape) != (B, D_out):
        raise FusionError(
            f"func output shape {tuple(out_aval.shape)} != expected "
            f"{(B, D_out)}")

    used = {outs[0]}
    for ins in builder.instrs:
        if ins[0] == "dot":
            used.add(ins[2])
        else:
            for x in ins[2:]:
                if isinstance(x, tuple):
                    if len(x) == 2 and x[0] == "v":
                        used.add(x[1])
                    else:                      # concat atom tuples
                        for y in x:
                            if (isinstance(y, tuple) and len(y) == 2
                                    and y[0] == "v"):
                                used.add(y[1])
    # A const consumed BOTH as a dot_general weight (wT layout, read via
    # its const index) and elementwise (read via its val id) would leave
    # eval_plan's env unbound for the elementwise read — reject up front
    # so callers get the guaranteed FusionError fallback, not a crash.
    for ci, lay in enumerate(builder.const_layouts):
        if (lay is not None and lay[0] == "wT"
                and builder.const_ids[ci] in used):
            raise FusionError(
                "const used both as a dot_general weight and "
                "elementwise; not fusable")
    builder.finalize_default_layouts(used)
    plan = FusedPlan(
        instrs=tuple(builder.instrs),
        n_vals=builder.n_vals,
        const_layouts=tuple(builder.const_layouts),
        const_val_ids=tuple(builder.const_ids),
        t_id=t_id, y_id=y_id, out_id=outs[0], batch=B, dim=D,
        matmul=matmul, dim_out=(-1 if out_dim is None else D_out),
        batch_coupled=builder.batch_coupled,
    )
    return plan, builder.consts


# ---------------------------------------------------------------------------
# Host-side const packing
# ---------------------------------------------------------------------------

def pack_consts(plan: FusedPlan, consts: Sequence, dtype, BP: int) -> list:
    """Transform traced consts into kernel-layout arrays.

    BP: lane-padded batch (batch-layout consts pad their lane axis to it).
    """
    out = []
    for layout, c in zip(plan.const_layouts, consts):
        c = jnp.asarray(c, dtype)
        tag = layout[0]
        if tag == "wT":
            _, din, dout, transpose = layout
            w = c.T if transpose else c            # -> [dout, din]
            wp = jnp.zeros((_round_up(dout, _SUBLANE),
                            _round_up(din, _SUBLANE)), dtype)
            out.append(wp.at[:dout, :din].set(w))
        elif tag == "col":
            d = layout[1]
            out.append(c.reshape(d, 1))
        elif tag == "scalar":
            out.append(c.reshape(1, 1))
        elif tag == "bvec":
            b = c.shape[0]
            out.append(jnp.pad(c.reshape(1, b), ((0, 0), (0, BP - b))))
        elif tag == "batch":
            d = layout[1]
            # Flatten trailing feature dims first (rank-3 consts ride the
            # flatten-to-features layout), then transpose to [d, B].
            cT = c.reshape(c.shape[0], d).T
            out.append(jnp.pad(cT, ((0, 0), (0, BP - cT.shape[1]))))
        elif tag == "unused":
            out.append(jnp.zeros((1, 1), dtype))
        else:                                       # pragma: no cover
            raise FusionError(f"unknown const layout {layout}")
    return out


# ---------------------------------------------------------------------------
# Plan evaluator (shared by the in-kernel forward, the in-kernel adjoint's
# forward re-walk -- ops/plan_adjoint.py -- and host/XLA-side evaluation)
# ---------------------------------------------------------------------------


def read_const_refs(plan: FusedPlan, refs) -> list:
    """Read packed const VALUES out of VMEM refs (or plain arrays, which
    support the same indexing): scalar layouts read [0, 0], everything
    else the whole block."""
    vals = []
    for layout, ref in zip(plan.const_layouts, refs):
        vals.append(ref[0, 0] if layout[0] == "scalar" else ref[:])
    return vals


def _materialize(v, rows, cols, dtype):
    """Broadcast a value (scalar or block) to [rows, cols]."""
    if jnp.ndim(v) == 0:
        return jnp.zeros((rows, cols), dtype) + v
    r, c = v.shape
    if (r, c) == (rows, cols):
        return v
    return jnp.broadcast_to(v, (rows, cols))


def eval_plan(plan: FusedPlan, cvals: Sequence, t, y,
              dot_precision: str = "highest") -> list:
    """Interpret the plan's instructions; returns the fully-populated env
    (val id -> scalar | [rows, lanes] block). `cvals` are const VALUES in
    plan order (from `read_const_refs`); y is [D, B] feature-major with B
    possibly lane-padded past plan.batch.

    dot_precision applies to MXU 'dot' instrs only (VPU contractions are
    exact f32 regardless): 'highest' = Mosaic 3-pass f32-accurate,
    'mixed' = 2-pass bf16-weight/hi-lo-activation (deterministic ~2^-16
    dots of the bf16-weight model — adaptive-safe), 'bf16' = one pass
    (~2e-3 noise, fixed-grid serving only). Same tiers and rules as
    MLPSpec.dot_precision (ops/pallas_kernels.py)."""
    from .pallas_kernels import _mixed_dot, _pad_rows

    B = y.shape[1]
    dtype = y.dtype
    env: List[Any] = [None] * plan.n_vals
    env[plan.t_id] = t
    env[plan.y_id] = y
    # Bind non-wT consts into env by their val ids (wT consts are
    # consumed only by dot instrs, via const index).
    for cidx, vid in enumerate(plan.const_val_ids):
        layout = plan.const_layouts[cidx]
        if layout[0] not in ("wT", "unused"):
            env[vid] = cvals[cidx]

    def get(a):
        if a[0] == "l":
            return a[1]
        return env[a[1]]

    for ins in plan.instrs:
        op = ins[0]
        if op == "litv":
            env[ins[1]] = ins[2]
        elif op == "un":
            env[ins[1]] = _UN_OPS[ins[3]](get(ins[2]))
        elif op == "bin":
            env[ins[1]] = _BIN_OPS[ins[4]](get(ins[2]), get(ins[3]))
        elif op == "ipow":
            x = get(ins[2])
            n = ins[3]
            m = abs(n)
            if m == 0:
                env[ins[1]] = jnp.ones_like(x) if jnp.ndim(x) else 1.0
                continue
            acc = x
            for _ in range(m - 1):
                acc = acc * x
            env[ins[1]] = (1.0 / acc) if n < 0 else acc
        elif op == "clamp":
            lo, x, hi = get(ins[2]), get(ins[3]), get(ins[4])
            env[ins[1]] = jnp.minimum(jnp.maximum(x, lo), hi)
        elif op == "select":
            pred, c0, c1 = get(ins[2]), get(ins[3]), get(ins[4])
            env[ins[1]] = jnp.where(pred, c1, c0)
        elif op == "cast":
            v = get(ins[2])
            env[ins[1]] = (v.astype(dtype) if ins[3]
                           and jnp.ndim(v) else v)
        elif op == "bcast":
            to_k = ins[3]
            v = get(ins[2])
            if to_k == "scalar":
                env[ins[1]] = v
            else:
                rows, cols = to_k
                cols = B if cols == plan.batch and plan.batch != 1 \
                    else cols
                if (jnp.ndim(v) == 2 and cols == 1
                        and v.shape[1] > 1):
                    # lane-resolved operand broadcast to a [r, 1] layout
                    # (B == 1 squeeze results stay lane-resolved; valid
                    # because cross-sample paths are rejected at trace):
                    # keep the lane width, downstream elementwise ops
                    # broadcast against it.
                    cols = v.shape[1]
                env[ins[1]] = _materialize(v, rows, cols, dtype)
        elif op == "reshape":
            env[ins[1]] = get(ins[2])
        elif op == "concat":
            blocks = []
            for a in ins[2]:
                v = get(a)
                if jnp.ndim(v) == 0:
                    # scalar piece (e.g. jnp.reshape(t, (1,))): one row
                    v = jnp.reshape(v, (1, 1))
                blocks.append(v)
            # lane-dims must agree: broadcast [r,1] pieces to the
            # widest lane count present
            cols = max(b.shape[1] for b in blocks)
            blocks = [_materialize(b, b.shape[0], cols, dtype)
                      for b in blocks]
            env[ins[1]] = jnp.concatenate(blocks, axis=0)
        elif op == "slice":
            v = get(ins[2])
            env[ins[1]] = v[ins[3]:ins[4], :]
        elif op == "rev":
            # Feature-axis flip as row slices + concat (rows is small and
            # static; avoids relying on a Mosaic flip lowering).
            v = get(ins[2])
            rows = ins[3]
            v = _materialize(v, rows, v.shape[1] if jnp.ndim(v) else B,
                             dtype)
            env[ins[1]] = (v if rows == 1 else jnp.concatenate(
                [v[i:i + 1, :] for i in range(rows - 1, -1, -1)], axis=0))
        elif op == "reduce":
            v = get(ins[2])
            fn = {"sum": jnp.sum, "max": jnp.max,
                  "min": jnp.min}[ins[3]]
            if ins[4]:                       # -> scalar
                if jnp.ndim(v) == 2 and v.shape[1] > 1:
                    # lane-padded batched block (B == 1 plans only —
                    # larger batches reject cross-sample reduces): mask
                    # the pad lanes with the reduction's neutral element
                    # or they leak into the true lane's scalar.
                    neutral = {"sum": 0.0, "max": -jnp.inf,
                               "min": jnp.inf}[ins[3]]
                    lane2 = jax.lax.broadcasted_iota(jnp.int32, v.shape,
                                                     1)
                    v = jnp.where(lane2 < plan.batch, v, neutral)
                env[ins[1]] = fn(v)
            else:                            # feature-axis reduce
                env[ins[1]] = fn(v, axis=0, keepdims=True)
        elif op == "bsum":
            # Batch-axis sum (mean-field coupling): lanes are samples;
            # pad lanes (zero-filled single-block fill OR wrap-mode
            # replicas) are masked to the sum's neutral element so only
            # the true plan.batch samples contribute. Front-ends keep
            # batch_coupled plans unpacked and single-block, so lanes
            # here always cover the whole batch.
            v = _materialize(get(ins[2]), ins[3], B, dtype)
            lane2 = jax.lax.broadcasted_iota(jnp.int32, v.shape, 1)
            v = jnp.where(lane2 < plan.batch, v, 0.0)
            s = jnp.sum(v, axis=1, keepdims=True)        # [r, 1]
            env[ins[1]] = jnp.sum(s) if ins[4] else s
        elif op == "bmax":
            # Batch-axis max/min: pad lanes masked to the reduction's
            # neutral element (-/+inf) so only true samples compete.
            v = _materialize(get(ins[2]), ins[3], B, dtype)
            lane2 = jax.lax.broadcasted_iota(jnp.int32, v.shape, 1)
            fill = jnp.inf if ins[5] else -jnp.inf
            v = jnp.where(lane2 < plan.batch, v, fill)
            red = jnp.min if ins[5] else jnp.max
            s = red(v, axis=1, keepdims=True)            # [r, 1]
            env[ins[1]] = red(s) if ins[4] else s
        elif op == "dot":
            _, out, a_id, cidx, din, dout, mxu = ins
            h = env[a_id]                    # [din, B-ish]
            wT = cvals[cidx]                 # [doutP, dinP]
            h = _materialize(h, din, h.shape[1] if jnp.ndim(h) else B,
                             dtype)
            if mxu:
                hp = _pad_rows(h, wT.shape[1])
                if dot_precision == "mixed":
                    acc = _mixed_dot(wT, hp)
                elif dot_precision == "bf16":
                    acc = jnp.dot(wT, hp, preferred_element_type=dtype)
                else:
                    acc = jnp.dot(wT, hp,
                                  preferred_element_type=dtype,
                                  precision=jax.lax.Precision.HIGHEST)
            else:
                acc = None
                for i in range(din):
                    term = wT[:, i:i + 1] * h[i:i + 1, :]
                    acc = term if acc is None else acc + term
            env[out] = acc[:dout, :]
        else:                                 # pragma: no cover
            raise AssertionError(f"bad instr {op}")
    return env


def make_plan_f(plan: FusedPlan, wrefs, dot_precision: str = "highest"):
    """Build f(t, y[D, B]) -> [D, B] evaluating the plan against VMEM
    const refs (the `make_f` contract of _make_solve_kernel)."""

    def f(t, y):
        cvals = read_const_refs(plan, wrefs)
        env = eval_plan(plan, cvals, t, y, dot_precision=dot_precision)
        return _materialize(env[plan.out_id], plan.out_rows, y.shape[1],
                            y.dtype)

    return f


def eval_plan_xla(plan: FusedPlan, consts_packed: Sequence, t, yT):
    """Evaluate the plan OUTSIDE the kernel (plain XLA) on feature-major
    yT [D, B]: f(t, yT) -> [D, B]. Used by the fused-adjoint front-end for
    observation-time RHS values (dL/dt_i terms) and the initial-step
    heuristic, so the custom_vjp residuals need only the packed consts --
    not the original user closure."""
    cvals = read_const_refs(plan, list(consts_packed))
    env = eval_plan(plan, cvals, t, yT)
    return _materialize(env[plan.out_id], plan.out_rows, yT.shape[1],
                        yT.dtype)


# ---------------------------------------------------------------------------
# Whole-solve entry (one compiled executable per plan structure)
# ---------------------------------------------------------------------------

import functools                                           # noqa: E402


@functools.partial(
    jax.jit,
    static_argnames=("plan", "method", "safety", "ifactor", "dfactor",
                     "max_steps", "emit_dense", "interpret", "pack",
                     "n_blocks", "per_sample", "stream_out",
                     "dot_precision"))
def plan_solve(plan: FusedPlan, consts_packed, y0: Array, tau: Array, dt0,
               rtol, atol, sign, f0: Array, *, method: str = "dopri5",
               safety: float = 0.9, ifactor: float = 10.0,
               dfactor: float = 0.2, max_steps: int = 2 ** 31 - 1,
               emit_dense: int = 0, interpret: bool = False,
               pack: int = 1, n_blocks: int = 1,
               per_sample: bool = False, stream_out: bool = False,
               dot_precision: str = "highest"):
    """Whole-solve fused adaptive RK over a FusedPlan RHS: the plan is
    interpreted inside ONE Pallas kernel launch (same engine as
    pallas_kernels.mlp_solve; plan is a static arg, so equal-structure
    dynamics share one compile).

    y0/f0: [D, B] feature-major, B lane-padded; consts_packed: tuple from
    `pack_consts`. With pack=k > 1 the caller has sublane-packed y0/f0 to
    [k*D, B/k] (pallas_kernels.pack_state) and the plan RHS runs
    per-group; outputs stay in the packed layout for the caller to
    unpack. n_blocks > 1 runs lane blocks as sequential grid programs
    (per-block controller; stats come back [n_blocks, 4] — see
    whole_solve_call). Returns (out [T, D, B], stats), plus (meta [S, 3],
    coeffs [5*S, D, B]) when emit_dense=S (n_blocks > 1: meta
    [n_blocks*S, 3] with rows [i*S, (i+1)*S) per block — each block has
    its own step grid; see solvers/base.BlockDenseOutput).
    """
    from . import tableaus as _tabs
    from .pallas_kernels import (packed_make_f, perlane_solve_call,
                                 whole_solve_call)

    tab = _tabs.TABLEAUS_BY_NAME[method]
    make_f = lambda wrefs: make_plan_f(                  # noqa: E731
        plan, wrefs, dot_precision=dot_precision)
    if pack > 1:
        make_f = packed_make_f(make_f, int(pack), plan.dim)
    if per_sample:
        # Per-lane controllers (see pallas_kernels._make_perlane_kernel):
        # unpacked lanes; dt0 may be a per-lane row. The plan RHS sees a
        # LANE-RESOLVED [1, B] time row at the stage times — valid
        # because cross-sample paths are rejected at trace time, so
        # per-lane t flows through the instrs like any lane-resolved val.
        # Grid blocks compose (independent controllers); B_true is then
        # the per-block lane count (callers wrap-pad).
        if pack > 1 or emit_dense:
            raise ValueError("per_sample=True is unpacked only "
                             "(no emit_dense)")
        if n_blocks > 1 and any(
                l[0] in ("batch", "bvec") for l in plan.const_layouts):
            raise ValueError(
                "per-sample consts are not block-shardable (grid "
                "programs replicate const refs)")
        return perlane_solve_call(
            make_f, list(consts_packed), y0, tau, dt0, rtol, atol, sign,
            f0, tab=tab, safety=safety, ifactor=ifactor, dfactor=dfactor,
            max_steps=int(max_steps),
            B_true=plan.batch // int(n_blocks),
            interpret=interpret, n_blocks=int(n_blocks))
    return whole_solve_call(
        make_f, list(consts_packed),
        y0, tau, dt0, rtol, atol, sign, f0, tab=tab, safety=safety,
        ifactor=ifactor, dfactor=dfactor, max_steps=int(max_steps),
        B_true=plan.batch // (int(pack) * int(n_blocks)),
        interpret=interpret,
        emit_dense=int(emit_dense), n_blocks=int(n_blocks),
        stream_out=stream_out)
