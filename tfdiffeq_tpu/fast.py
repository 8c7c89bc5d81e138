"""Fused fast paths for known benchmark dynamics (Pallas tier).

`odeint_mlp` integrates the batched tanh-MLP neural ODE

    f(t, y) = tanh(y^3 @ W1 + b1) @ W2 + b2,      y: [B, D]

with dopri5 where the ENTIRE adaptive solve — every stage evaluation,
combine, error norm, PI-controller decision, and dense-output write — is ONE
Pallas kernel launch (`ops/pallas_kernels.dopri5_mlp_solve`): state lives in
VMEM scratch, the accept/reject loop runs in-kernel, and only the [T, B, D]
trajectory plus 4 stats scalars leave the chip. Measured on TPU v5e this
reduces the marginal cost per solver step from ~83us (generic XLA while-loop
path) to ~5.4us — the remaining per-call latency is the host dispatch.

This is the SURVEY.md §7 "fused fast path for the MLP funcs in the benchmark
configs"; the generic `odeint` stays fully general. The tier now covers:

- `solve_mlp_spec` / `MLPSpec`: GENERAL autonomous MLP dynamics (arbitrary
  depth/width, tanh/elu/relu/sigmoid/softplus/silu activations, optional
  y**p input transform), both time directions.
- `odeint_adjoint_mlp`: fully-fused TRAINING path — one whole-solve kernel
  forward, ONE kernel for the entire adjoint backward sweep
  (ops/pallas_adjoint.py), differentiable wrt weights, y0, and t.
- `solve_mlp_stepwise`: the compositional variant that plugs the fused
  *single-step* kernel into the generic adaptive engine via
  `AdaptiveConfig.step_override` (cross-validation + template for fusing
  other dynamics).
- `solve_mlp_sharded` / `solve_mlp_global_sharded`: data-parallel
  whole-solve kernels over a mesh (per-shard or psum-coupled global step
  control).
- `cnf_log_prob_fused` / `cnf_sample_fused`: FFJORD density evaluation and
  sampling for concat-t MLP flows, with the EXACT divergence computed
  in-kernel (one launch per solve); `cnf_log_prob_train` is the
  differentiable variant (fused forward kernel + generic O(1)-memory
  adjoint backward via `odeint_adjoint(forward_solver=...)`).
- `solve_conv_ode` / `solve_conv_ode_sharded`: the MNIST ODEBlock's conv
  dynamics (GN -> relu -> ConcatConv3x3, twice, -> GN) as whole-solve
  kernels — convs as masked lane-rolls + MXU dots, GroupNorm as
  reduce/spread dots (ops/pallas_conv.py); batches auto-chunk to the
  Mosaic stack budget. Inference tier (`ODEBlock(fused=True)`).

Arbitrary plain-jnp dynamics ALSO fuse, via the jaxpr->Pallas bridge
(`ops/jaxpr_bridge.py`): `odeint(..., options={'fuse': True})` traces the
user func, compiles it to a plan executed inside the whole-solve kernel
(`solve_fused` below), and `odeint_adjoint(..., options={'fuse': True})`
runs the ENTIRE backward sweep as one kernel too (`odeint_adjoint_fused`,
reverse-mode over the plan ISA in `ops/plan_adjoint.py`). PYTREE states
(tuple/dict leaves sharing a leading batch axis) ride the same path via
`tree_state_adapter` (feature-axis concat). Dynamics outside the bridge
ISA (e.g. `sort`, batch-axis max/min, rank-3 intermediates) fall back to
the generic path with a warning. The fused adjoint is NOT restricted to
autonomous dynamics: `MLPSpec(time_input=True)` concat-t MLPs
differentiate in-kernel (t-column VJP + a_t quadrature,
ops/pallas_adjoint.py), as do time-dependent bridge plans.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .ops.pallas_adjoint import mlp_adjoint_solve
from .ops import pallas_fixed as _pf
from .ops import pallas_kernels as _pk
from .ops import pallas_vcabm as _pv
from .ops.pallas_kernels import (_ACTIVATIONS, dopri5_mlp_solve,
                                 dopri5_mlp_step, mlp_f, mlp_solve,
                                 pad_mlp_weights)
from .ops import tableaus
from .ops.controller import StepController
from .ops.norms import select_initial_step
from .solvers.adaptive import AdaptiveConfig, solve_adaptive
from .solvers.base import CanonicalProblem, SolveResult, SolverStats

Array = jax.Array


@dataclasses.dataclass(frozen=True)
class MLPSpec:
    """Static topology of a fused MLP neural ODE (weights passed separately
    as [(W [din, dout], b [dout] | None), ...]).

    activation: hidden nonlinearity ('tanh', 'elu', 'relu', 'sigmoid',
    'softplus', 'silu', 'identity'); final_activation applies to the last
    layer; input_power: the state enters as y**p (the benchmark spiral uses
    p=3). Dynamics are autonomous (f(t, y) = f(y)) — both benchmark configs
    and the latent-ODE decoder are.
    """
    activation: str = "tanh"
    final_activation: str = "identity"
    input_power: int = 1
    # Feed the scalar time as one extra FIRST-layer input feature (last
    # column), for concat-t MLPs like the CNF flow field. Supported by both
    # the forward whole-solve kernel and the fused adjoint sweep (the
    # backward kernel computes the t-column VJP and a_t quadrature
    # in-kernel, ops/pallas_adjoint.py).
    time_input: bool = False
    # Per-layer contraction engine: 'vpu' (unrolled exact-f32 broadcasts,
    # right for narrow nets), 'mxu' (one systolic-array dot per layer,
    # right for wide nets), or 'auto' (MXU once a layer's weight block is
    # >= ~32x64 — see ops/pallas_kernels._layer_uses_mxu).
    matmul: str = "auto"
    # MXU-path dot precision:
    # - 'highest' (default): Mosaic 3-pass bf16 decomposition, f32-accurate.
    # - 'bf16': ONE systolic pass, ~2e-3 rel err, 3x the MXU rate (measured
    #   190 vs 62 TFLOP/s on v5e). FIXED-GRID serving only — there is no
    #   embedded error estimate for the bf16 noise to poison; on adaptive
    #   methods it inflates step counts ~5-9x (measured, BASELINE.md).
    # - 'mixed': TWO passes — weights quantized to bf16 (the standard
    #   serving-time model transform), activations split hi/lo-bf16, f32
    #   accumulation, ~2^-18 relative dots. Deterministic, so ADAPTIVE
    #   error control works: NFE parity with 'highest' at serving
    #   tolerances (rtol >= ~1e-4), ~10% inflation at rtol 1e-6, at 2/3
    #   the MXU passes — a net MXU-time win either way (measured on the
    #   wide-MLP bench; tests/test_mixed_precision.py pins the NFE
    #   economics). The model solved is the bf16-weight net (~2e-3 from
    #   the f32-weight one); `calibrate_dot_precision` picks the
    #   cheapest tier by the NFE x passes cost model.
    dot_precision: str = "highest"

    def __post_init__(self):
        for a in (self.activation, self.final_activation):
            if a not in _ACTIVATIONS:
                raise ValueError(f"unknown activation {a!r}; available: "
                                 f"{sorted(_ACTIVATIONS)}")
        if self.matmul not in ("vpu", "mxu", "auto"):
            raise ValueError(f"matmul must be 'vpu', 'mxu' or 'auto', got "
                             f"{self.matmul!r}")
        if self.dot_precision not in ("highest", "bf16", "mixed"):
            raise ValueError(f"dot_precision must be 'highest', 'bf16' or "
                             f"'mixed', got {self.dot_precision!r}")


def mlp_apply(spec: MLPSpec, weights: Sequence[Tuple[Array, Array]],
              y: Array, t=0.0) -> Array:
    """XLA reference of the fused MLP dynamics; y: [..., D] batch-major.

    Matmuls run at HIGHEST precision to match the kernel's exact-f32 VPU
    arithmetic (TPU default bf16 would perturb the error estimates).
    """
    h = y
    for _ in range(spec.input_power - 1):
        h = h * y
    if spec.time_input:
        tt = jnp.broadcast_to(jnp.asarray(t, h.dtype),
                              h.shape[:-1] + (1,))
        h = jnp.concatenate([h, tt], axis=-1)
    L = len(weights)
    for l, (W, b) in enumerate(weights):
        z = jnp.dot(h, W, precision=jax.lax.Precision.HIGHEST)
        if b is not None:
            z = z + b
        act = spec.activation if l < L - 1 else spec.final_activation
        h = _ACTIVATIONS[act](z)
    return h


def weights_from_flax_dense(variables) -> list:
    """Extract [(kernel, bias), ...] from a flax module made of nn.Dense
    layers (e.g. `models.latent_ode.LatentODEFunc`), in layer order."""
    import re
    params = variables.get("params", variables)
    # Exactly flax's auto-naming for nn.Dense ("Dense_<idx>"): a bare
    # prefix match would silently pull in e.g. nn.DenseGeneral_0 (a
    # different function) or crash on a non-indexed custom name.
    names = sorted((k for k in params if re.fullmatch(r"Dense_\d+", k)),
                   key=lambda k: int(k.rsplit("_", 1)[1]))
    if not names:
        raise ValueError(
            "no auto-named nn.Dense layers (Dense_<i>) found in the flax "
            f"params; got keys {sorted(params)}")
    return [(params[k]["kernel"], params[k].get("bias")) for k in names]


def _check_mlp_inputs(y0, t):
    """Stepwise-path validation: strictly increasing t only (the step
    kernel composes with a sign-free CanonicalProblem)."""
    y0 = jnp.asarray(y0)
    if y0.ndim != 2:
        raise ValueError(f"y0 must be [batch, dim], got {y0.shape}")
    t = jnp.asarray(t)
    if not isinstance(t, jax.core.Tracer):
        tv = np.asarray(t)
        if tv.shape[0] > 1 and not np.all(np.diff(tv) > 0):
            raise ValueError("this path requires strictly increasing t")
    return y0, t


def _auto_interpret(interpret: Optional[bool]) -> bool:
    if interpret is None:
        return jax.default_backend() not in ("tpu", "axon")
    return interpret


def solve_mlp(params: dict, y0: Array, t, *, rtol=1e-6, atol=1e-8,
              method: str = "dopri5", interpret: Optional[bool] = None,
              max_num_steps=None, first_step=None) -> SolveResult:
    """Whole-solve fused adaptive RK for the tanh-MLP neural ODE. y0: [B, D].

    `method`: 'dopri5' (default), 'bosh3', 'adaptive_heun', 'tsit5', or
    'dopri8' — the whole-solve kernel is tableau-parametrized.
    Returns a SolveResult whose ys has shape [T, B, D]. `interpret=None`
    auto-selects Pallas interpret mode off-TPU (CPU testing).
    """
    y0, t = _check_spec_inputs(y0, t)
    spec = MLPSpec(activation="tanh", final_activation="identity",
                   input_power=3)
    weights = [(params["w1"], params["b1"]), (params["w2"], params["b2"])]
    return solve_mlp_spec(spec, weights, y0, t, rtol=rtol, atol=atol,
                          method=method, interpret=interpret,
                          max_num_steps=max_num_steps,
                          first_step=first_step)


def solve_mlp_stepwise(params: dict, y0: Array, t, *, rtol=1e-6, atol=1e-8,
                       tile_b: int = 512, interpret: Optional[bool] = None,
                       max_num_steps=None, first_step=None,
                       axis_name: Optional[str] = None,
                       global_batch: Optional[int] = None) -> SolveResult:
    """Fused *per-step* kernel composed with the generic adaptive engine
    (`AdaptiveConfig.step_override`). Slower than `solve_mlp` (one kernel
    launch per step) but exercises the generic composition path.

    axis_name/global_batch: inside `shard_map`, psum the error norm across
    the named mesh axis so step-size control is GLOBALLY coupled — every
    shard takes the identical accept/reject sequence a single device would
    (see `solve_mlp_global_sharded`)."""
    y0, t = _check_mlp_inputs(y0, t)
    interpret = _auto_interpret(interpret)
    B, D = y0.shape
    dtype = y0.dtype
    flat0 = y0.T.reshape(-1)          # feature-major flat [D*B]

    def unravel(flat):
        return flat.reshape(D, B).T

    def func_flat(tt, flat):
        return mlp_f(params, flat.reshape(D, B)).reshape(-1)

    rtol_a = jnp.asarray(rtol, dtype)
    atol_a = jnp.asarray(atol, dtype)

    def step_override(tt, y_flat, f_flat, dt):
        y1, f1, ratio, ymid = dopri5_mlp_step(
            params, y_flat.reshape(D, B), f_flat.reshape(D, B),
            dt, rtol_a, atol_a, tile_b=tile_b, interpret=interpret)
        if axis_name is not None:
            # ratio = sqrt(sumsq / (D * B_local)); recover the local sum of
            # squares, all-reduce it over ICI, renormalize by the GLOBAL
            # element count (inf sumsq — non-finite step — survives psum).
            gb = int(global_batch) if global_batch else B
            sumsq = ratio * ratio * (D * B)
            sumsq = jax.lax.psum(sumsq, axis_name)
            ratio = jnp.sqrt(sumsq / (D * gb))
        return (y1.reshape(-1), f1.reshape(-1), ratio, ymid.reshape(-1), 6)

    prob = CanonicalProblem(
        func=func_flat, y0=flat0, tau=t.astype(dtype),
        sign=jnp.asarray(1.0, dtype), unravel=unravel, dtype=dtype,
        time_dtype=dtype)
    cfg = AdaptiveConfig(tableau=tableaus.DOPRI5,
                         controller=StepController(), loop="while",
                         step_override=step_override)
    res = solve_adaptive(prob, cfg, rtol, atol, first_step=first_step,
                         max_num_steps=max_num_steps)
    ys = res.ys.reshape(res.ys.shape[0], D, B).transpose(0, 2, 1)
    return SolveResult(ys, res.stats)


def odeint_mlp(params: dict, y0: Array, t, *, rtol=1e-6, atol=1e-8,
               **kwargs) -> Array:
    """`odeint`-style front-end for the fused MLP path; returns [T, B, D]."""
    return solve_mlp(params, y0, t, rtol=rtol, atol=atol, **kwargs).ys


def _check_spec_inputs(y0, t):
    y0 = jnp.asarray(y0)
    if y0.ndim != 2:
        raise ValueError(f"y0 must be [batch, dim], got {y0.shape}")
    t = jnp.asarray(t)
    if not isinstance(t, jax.core.Tracer) and t.shape[0] > 1:
        tv = np.asarray(t)
        d = np.diff(tv)
        if not (np.all(d > 0) or np.all(d < 0)):
            raise ValueError("t must be strictly monotonic (increasing or "
                             f"decreasing); got {tv}")
    return y0, t


#: VMEM budget for the fused kernels (bytes). v5e has ~16 MB/core; leave
#: headroom for weights/activations/compiler temporaries.
_VMEM_BUDGET = 12 * 2 ** 20

# Conv-ODE kernel stack model (measured, v5e Mosaic): the solver body
# keeps ~60 [C, NP] blocks live on the scoped-VMEM stack (25.2 MiB at
# C=64, NP=1664), against a ~16 MiB limit; batches are chunked to the
# largest block that fits (see fast.solve_conv_ode).
_CONV_STACK_BLOCKS = 60
_CONV_STACK_BUDGET = 14 * 2 ** 20


def _fused_vmem_bytes(T: int, D: int, B: int, n_traj_buffers: int,
                      kpack: Optional[int] = None) -> int:
    """f32 bytes the whole-solve kernel keeps live in VMEM: n_traj_buffers
    trajectory windows plus ~4 state-sized scratch rows, at the SUBLANE-
    PADDED row count the kernel actually allocates. Sublane packing stacks
    k sample-groups along the feature axis ([k*D, B/k]), then Mosaic pads
    rows to the 8-sublane tile — for D=2/k=4 that's exact (k*D = 8), but
    e.g. D=5 (k=1) allocates 8 rows, 1.6x the naive D*B estimate. Measured
    on-chip: the naive model under-sized B=131072/T=8/D=2 into a scoped-
    VMEM OOM (18.68M/16M).

    `kpack` is the effective pack factor the LAUNCH will use. None
    computes pick_pack on the RAW batch — the same gating
    prep_state_blocks applies (raw divisibility, not the lane-padded
    count, so e.g. an odd B correctly models as unpacked). Callers whose
    kernel runs unpacked regardless (dense-output buffers, hypersolvers,
    plans carrying per-sample consts) pass kpack=1; adjoint sweeps pass
    their _adjoint_pack result (extra B % (k*128) gating)."""
    from .ops.pallas_kernels import _LANE, _SUBLANE, _round_up, pick_pack
    k = pick_pack(D, B) if kpack is None else int(kpack)
    rows = _round_up(k * D, _SUBLANE)
    lanes = _round_up(max(B // k, _LANE), _LANE)
    return 4 * (n_traj_buffers * T + 4) * rows * lanes


def _grid_block_size(T: int, D: int, n_buf: int,
                     kpack: Optional[int] = None,
                     min_block: int = 1024):
    """Largest power-of-two batch block (>= min_block, default 1024 — a
    multiple of 8*LANE so any sublane pack k <= 8 stays aligned) whose
    n_buf pipelined trajectory buffers fit the VMEM budget; None when even
    a single min_block-sample block cannot fit (T x D too large). `kpack`
    as in `_fused_vmem_bytes` (block sizes from here are 8*LANE multiples,
    so raw-B pick_pack gating matches the launch's per-block gating).
    Paths that always run unpacked (dense output) may pass
    min_block=_LANE: their blocks only need lane (128) alignment."""
    b_blk = int(min_block)
    while _fused_vmem_bytes(T, D, 2 * b_blk, n_buf, kpack) <= _VMEM_BUDGET:
        b_blk *= 2
    if _fused_vmem_bytes(T, D, b_blk, n_buf, kpack) > _VMEM_BUDGET:
        return None
    return b_blk


#: [n_blocks, 4] per-program stats -> [4] (shared with the kernel
#: modules; see pallas_kernels.merge_grid_stats).
_merge_grid_stats = _pk.merge_grid_stats


def _fixed_grid_tau(tau, t, num_steps, step_size, dtype):
    """Resolve the fused fixed-grid step grid in TAU-space (mirrors
    solvers/fixed_grid.build_grid_from_options: num_steps works under
    jit, step_size needs concrete t for a static grid length; default
    grid = the requested times themselves)."""
    if num_steps is not None and step_size is not None:
        raise ValueError("pass num_steps OR step_size, not both")
    if num_steps is not None:
        n = int(num_steps)
        if n < 1:
            raise ValueError(f"num_steps must be >= 1, got {n}")
        return jnp.linspace(tau[0], tau[-1], n + 1).astype(dtype)
    if step_size is not None:
        if isinstance(t, jax.core.Tracer):
            raise ValueError(
                "step_size needs concrete (non-traced) t so the grid "
                "length is static under jit; use num_steps instead")
        t_np = np.asarray(t, np.float64)
        span = abs(float(t_np[-1] - t_np[0]))
        n = max(1, int(np.ceil(span / float(step_size) - 1e-12)))
        return jnp.linspace(tau[0], tau[-1], n + 1).astype(dtype)
    return tau


#: fixed-step Adams methods the fused tier covers (kind 'custom' in the
#: SOLVERS registry; their whole-solve kernel lives in ops/pallas_fixed).
_ADAMS_METHODS = frozenset({"explicit_adams", "fixed_adams"})


def tree_state_parts(y0):
    """Conversion pieces for adapting a PYTREE state to the fused tier's
    [B, D] layout (see `tree_state_adapter` for the design).

    Returns ``None`` when y0 is already a plain [B, D] / [D] array, else
    ``(y_bd, to_bd, from_bd, rebuild)``: to_bd maps a state pytree to the
    [B, D] concat, from_bd inverts it, rebuild maps a fused trajectory
    ``[..., B, D]`` back to the pytree with leaves ``[..., B, *rest]``.
    Non-conforming trees raise FusionError (front-ends fall back).
    """
    from .ops import jaxpr_bridge as jb

    leaves, treedef = jax.tree_util.tree_flatten(y0)
    if len(leaves) == 1 and leaves[0] is y0 and jnp.ndim(y0) in (1, 2):
        return None
    if not leaves:
        raise jb.FusionError("empty pytree state")
    if any(jnp.ndim(l) < 1 for l in leaves):
        raise jb.FusionError(
            "pytree state with scalar leaves is not fusable (the fused "
            "tier needs a shared leading batch axis)")
    B = int(np.shape(leaves[0])[0])
    if any(int(np.shape(l)[0]) != B for l in leaves):
        raise jb.FusionError(
            "pytree state leaves disagree on the leading (batch) axis; "
            "not fusable")
    shapes = [tuple(np.shape(l)) for l in leaves]
    ds = [int(np.prod(s[1:])) if len(s) > 1 else 1 for s in shapes]
    offs = np.concatenate([[0], np.cumsum(ds)]).tolist()
    dtype = jnp.result_type(*leaves)

    def to_bd(tree):
        ls = jax.tree_util.tree_leaves(tree)
        if len(ls) != len(shapes):
            raise jb.FusionError("dynamics returned a different pytree "
                                 "structure than the state")
        return jnp.concatenate(
            [jnp.reshape(l, (B, d)).astype(dtype)
             for l, d in zip(ls, ds)], axis=1)

    def from_bd(y):
        parts = [jnp.reshape(y[:, o:o + d], s)
                 for o, d, s in zip(offs, ds, shapes)]
        return jax.tree_util.tree_unflatten(treedef, parts)

    def rebuild(ys):
        lead = ys.shape[:-2]
        parts = [jnp.reshape(ys[..., o:o + d], lead + s)
                 for o, d, s in zip(offs, ds, shapes)]
        return jax.tree_util.tree_unflatten(treedef, parts)

    return to_bd(y0), to_bd, from_bd, rebuild


def tree_state_adapter(func, y0):
    """Adapt a PYTREE state to the fused tier's [B, D] layout.

    The reference supports tuple-of-tensors state (SURVEY.md §2 "Input
    checking"); the generic engine generalizes that to any pytree by
    raveling to a flat [N] vector. This adapter puts pytree states on the
    FUSED path too: leaves sharing a leading batch axis B are reshaped to
    [B, d_i] and concatenated along the feature axis into one [B, D]
    array, and the user func is wrapped so the kernel-side plan sees
    (t, y[B, D]) -> dy[B, D]. The wrapper's slices / reshapes / concat
    trace into the jaxpr and lower through the bridge's existing `slice` /
    `reshape` / `concat` ISA ops (ops/jaxpr_bridge.py) — no new kernel
    machinery. Anything non-conforming raises FusionError so front-ends
    fall back to the generic engine (fusion never changes semantics).

    Returns ``None`` when y0 is already a plain [B, D] / [D] array (caller
    uses the existing path), else ``(wrapped_func, y_bd, rebuild)`` where
    ``rebuild(ys[..., B, D])`` maps fused trajectories back to the user's
    pytree with leaves ``[..., B, *leaf_shape[1:]]``.
    """
    parts = tree_state_parts(y0)
    if parts is None:
        return None
    y_bd, to_bd, from_bd, rebuild = parts

    def wrapped(t, y):
        return to_bd(func(t, from_bd(y)))

    return wrapped, y_bd, rebuild


def solve_mlp_spec(spec: MLPSpec, weights, y0: Array, t, *, rtol=1e-6,
                   atol=1e-8, method: str = "dopri5",
                   interpret: Optional[bool] = None, max_num_steps=None,
                   first_step=None, num_steps=None, step_size=None,
                   max_order: Optional[int] = None,
                   max_iters: int = 4,
                   per_sample: bool = False) -> SolveResult:
    """Whole-solve fused RK for a GENERAL autonomous MLP neural ODE
    (arbitrary depth/width/activation via `MLPSpec` — covers the
    benchmark tanh-MLP and the latent-ODE ELU dynamics). y0: [B, D]; t may
    increase or decrease (canonicalized like the generic engine,
    solvers/base.py). Returns ys [T, B, D] + stats.

    `method` may be adaptive (dopri5/bosh3/adaptive_heun/tsit5/dopri8 —
    rtol/atol/first_step/max_num_steps apply) or FIXED-GRID
    (euler/midpoint/rk4/rk4_38, upstream `tfdiffeq/fixed_grid.py` parity
    — tolerances are ignored and the step grid defaults to t itself,
    refinable via `num_steps`/`step_size` exactly like the generic
    engine's options).
    """
    y0, t = _check_spec_inputs(y0, t)
    interpret = _auto_interpret(interpret)
    dtype = y0.dtype
    adams = method in _ADAMS_METHODS
    vcabm = method == "adams"
    fixed = method in _pf.FIXED_TABLEAUS_BY_NAME or adams
    if max_order is None:
        max_order = 12 if vcabm else 4     # generic engines' defaults
    if spec.dot_precision != "highest" and (vcabm or adams):
        raise ValueError(
            f"dot_precision={spec.dot_precision!r} is not supported on "
            "the Adams kernels (their corrector/order machinery assumes "
            "f32-accurate dots); use an RK method for reduced-precision "
            "serving ('bf16' fixed-grid, 'mixed' fixed-grid or adaptive)")
    if per_sample and (fixed or vcabm):
        raise ValueError("per_sample applies to adaptive RK methods only")

    if t.shape[0] == 1:
        z = jnp.asarray(0, jnp.int32)
        return SolveResult(y0[None], SolverStats(z, z, z, z))

    # The in-kernel trajectory buffer lives in VMEM; batches past the
    # budget run as n_blocks sequential GRID programs inside ONE launch
    # (per-block state/controller, shared weights — the conv tier's
    # recipe). Only when even a single 1024-sample block cannot fit
    # (huge T x D) does the generic engine take over.
    n_blocks, B_orig = 1, y0.shape[0]
    T_chk, D_chk = int(t.shape[0]), y0.shape[1]
    if per_sample and _fused_vmem_bytes(
            T_chk, D_chk, B_orig, 2, kpack=1) > _VMEM_BUDGET:
        # (Applies in interpret mode too: CPU tests exercise the same
        # routing the chip takes.)
        # Per-lane forward past the VMEM budget (round-4 verdict item 3):
        # per-lane controllers are independent, so lane blocks run as
        # sequential grid programs with IDENTICAL semantics. Only a huge
        # T x D (no block fits) falls back to vmap-of-generic.
        b_blk = _grid_block_size(T_chk, D_chk, 2, kpack=1)
        if b_blk is None:
            import warnings
            warnings.warn(
                "solve_mlp_spec(per_sample=True): even a single block "
                "exceeds the fused kernel's VMEM budget (T x D too "
                "large); falling back to jax.vmap of the generic engine",
                stacklevel=2)
            from .odeint import _per_sample_vmap
            opts = {}
            if max_num_steps is not None:
                opts["max_num_steps"] = int(max_num_steps)
            if first_step is not None:
                opts["first_step"] = first_step
            return _per_sample_vmap(
                lambda tt, yy: mlp_apply(spec, weights, yy, tt), y0, t,
                rtol, atol, method, opts)
        n_blocks = -(-B_orig // b_blk)
        # Wrap-pad: replicated lanes integrate independently (per-lane
        # controllers), cost extra counted NFE, and are sliced off.
        y0 = jnp.pad(y0, ((0, n_blocks * b_blk - B_orig), (0, 0)),
                     mode="wrap")
    if (not interpret and not per_sample
            and _fused_vmem_bytes(T_chk, D_chk, B_orig, 2) > _VMEM_BUDGET):
        # The output window is pipelined (double-buffered) even in
        # single-block mode, so the threshold budgets TWO trajectory
        # buffers — same model as the grid block sizing below (the
        # 1-buffer threshold let a budget-exact B=131072/T=8 config run
        # single-block and scoped-VMEM-OOM on-chip at 18.68M/16M).
        b_blk = _grid_block_size(T_chk, D_chk, 2)
        if b_blk is None:
            import warnings
            warnings.warn(
                "solve_mlp_spec: even a single 1024-sample block exceeds "
                "the fused kernel's VMEM budget (T x D too large); "
                "falling back to the generic while-loop engine",
                stacklevel=2)
            from .odeint import solve as _solve
            if vcabm:
                fb_options = {
                    "max_order": min(int(max_order), 12),
                    **({"max_num_steps": int(max_num_steps)}
                       if max_num_steps is not None else {}),
                    **({"first_step": first_step}
                       if first_step is not None else {})}
            elif fixed:
                fb_options = {
                    **({"num_steps": num_steps}
                       if num_steps is not None else {}),
                    **({"step_size": step_size}
                       if step_size is not None else {}),
                    **({"max_order": int(max_order),
                        "max_iters": int(max_iters)} if adams else {})}
            else:
                fb_options = {
                    "loop": "while",
                    **({"max_num_steps": max_num_steps}
                       if max_num_steps is not None else {}),
                    **({"first_step": first_step}
                       if first_step is not None else {})}
            return _solve(lambda tt, yy: mlp_apply(spec, weights, yy, tt),
                          y0, t,
                          rtol=rtol, atol=atol, method=method,
                          options=fb_options)
        n_blocks = -(-B_orig // b_blk)
        # Pad by REPLICATING samples (wrap mode): pad rows integrate
        # exactly like their originals, so they can never NaN-poison
        # their block's shared controller the way zero-filled fakes
        # could.
        y0 = jnp.pad(y0, ((0, n_blocks * b_blk - B_orig), (0, 0)),
                     mode="wrap")

    t = t.astype(dtype)
    sign = jnp.where(t[-1] >= t[0], 1.0, -1.0).astype(dtype)
    tau = sign * t
    yT = y0.T                                   # [D, B] feature-major
    D, B = yT.shape

    f0 = (sign * mlp_apply(spec, weights, y0, t[0]).T).astype(dtype)
    warrays, dims = pad_mlp_weights(weights, dtype)

    if vcabm:
        if first_step is None:
            def flat_g(s, yf):
                yb = yf.reshape(D, B).T
                return (sign * mlp_apply(spec, weights, yb,
                                         sign * s).T).ravel()

            dt0 = select_initial_step(flat_g, tau[0], yT.ravel(),
                                      f0.ravel(), 1,
                                      jnp.asarray(rtol, dtype),
                                      jnp.asarray(atol, dtype))
            extra_nfe = 2
        else:
            dt0 = jnp.abs(jnp.asarray(first_step, dtype))
            extra_nfe = 1
        out, stats = _pv.mlp_solve_vcabm(
            warrays, dims, yT, tau, dt0, rtol, atol, sign, f0=f0,
            activation=spec.activation,
            final_activation=spec.final_activation,
            input_power=spec.input_power, time_input=spec.time_input,
            max_order=int(max_order),
            max_steps=(int(max_num_steps) if max_num_steps is not None
                       else 2 ** 31 - 1),
            matmul=spec.matmul, interpret=interpret, n_blocks=n_blocks)
        ys = jnp.transpose(out, (0, 2, 1))[:, :B_orig]
        st = SolverStats(stats[0] + extra_nfe, stats[1], stats[2],
                         stats[3])
        return SolveResult(ys, st)

    if fixed:
        grid = _fixed_grid_tau(tau, t, num_steps, step_size, dtype)
        if adams:
            out, stats = _pf.mlp_solve_adams(
                warrays, dims, yT, tau, grid, rtol, atol, sign, f0=f0,
                activation=spec.activation,
                final_activation=spec.final_activation,
                input_power=spec.input_power, time_input=spec.time_input,
                implicit=method == "fixed_adams", max_order=int(max_order),
                max_iters=int(max_iters), matmul=spec.matmul,
                interpret=interpret, n_blocks=n_blocks)
        else:
            out, stats = _pf.mlp_solve_fixed(
                warrays, dims, yT, tau, grid, sign, f0=f0,
                activation=spec.activation,
                final_activation=spec.final_activation,
                input_power=spec.input_power, time_input=spec.time_input,
                method=method, matmul=spec.matmul, interpret=interpret,
                n_blocks=n_blocks, dot_precision=spec.dot_precision)
        ys = jnp.transpose(out, (0, 2, 1))[:, :B_orig]  # [T, B, D]
        return SolveResult(ys, SolverStats(*stats))

    order = tableaus.TABLEAUS_BY_NAME[method].order
    if per_sample and first_step is None:
        from .ops.norms import select_initial_step_per_sample

        def g_b(s, yb):
            return (sign * mlp_apply(spec, weights, yb,
                                     sign * s)).astype(dtype)

        dt0 = select_initial_step_per_sample(
            g_b, tau[0], y0, f0.T, order - 1,
            jnp.asarray(rtol, dtype), jnp.asarray(atol, dtype))
        extra_nfe = 2
    elif first_step is None:
        def flat_g(s, yf):
            yb = yf.reshape(D, B).T
            return (sign * mlp_apply(spec, weights, yb,
                                     sign * s).T).ravel()

        dt0 = select_initial_step(flat_g, tau[0], yT.ravel(), f0.ravel(),
                                  order - 1, jnp.asarray(rtol, dtype),
                                  jnp.asarray(atol, dtype))
        extra_nfe = 2
    else:
        dt0 = jnp.abs(jnp.asarray(first_step, dtype))
        extra_nfe = 1

    if per_sample:
        out, stats, lanes = mlp_solve(
            warrays, dims, yT, tau, dt0, rtol, atol, sign, f0=f0,
            activation=spec.activation,
            final_activation=spec.final_activation,
            input_power=spec.input_power, time_input=spec.time_input,
            method=method,
            max_steps=(int(max_num_steps) if max_num_steps is not None
                       else 2 ** 31 - 1),
            matmul=spec.matmul, interpret=interpret, n_blocks=n_blocks,
            dot_precision=spec.dot_precision, per_sample=True)
        ys = jnp.transpose(out, (0, 2, 1))[:, :B_orig]
        lanes = lanes[:, :B_orig]
        lane_stats = SolverStats(lanes[0] + extra_nfe, lanes[1],
                                 lanes[2], lanes[3])
        if n_blocks > 1:
            # Scalar stats re-derived from TRUE lanes (grid wrap-pad
            # lanes did real counted work; exclude it).
            st = SolverStats(jnp.sum(lane_stats.nfe),
                             jnp.sum(lane_stats.n_accepted),
                             jnp.sum(lane_stats.n_rejected),
                             jnp.max(lane_stats.status))
        else:
            st = SolverStats(stats[0] + extra_nfe * B_orig, stats[1],
                             stats[2], stats[3])
        return SolveResult(ys, st, None, None, lane_stats)

    out, stats = mlp_solve(
        warrays, dims, yT, tau, dt0, rtol, atol, sign, f0=f0,
        activation=spec.activation, final_activation=spec.final_activation,
        input_power=spec.input_power, time_input=spec.time_input,
        method=method,
        max_steps=(int(max_num_steps) if max_num_steps is not None
                   else 2 ** 31 - 1),
        matmul=spec.matmul, interpret=interpret, n_blocks=n_blocks,
        dot_precision=spec.dot_precision)
    ys = jnp.transpose(out, (0, 2, 1))[:, :B_orig]      # [T, B, D]
    st = SolverStats(stats[0] + extra_nfe, stats[1], stats[2], stats[3])
    return SolveResult(ys, st)


#: MXU systolic passes per dot for each `dot_precision` tier — the cost
#: model behind `calibrate_dot_precision`. 'highest' is Mosaic's 3-pass
#: f32 emulation; 'mixed' is 2 passes (bf16 weights x hi/lo-split
#: activations); 'bf16' is one raw pass. Measured MXU rate on v5e tracks
#: 1/passes (62 vs 190 TFLOP/s for 3 vs 1).
DOT_PASSES = {"highest": 3, "mixed": 2, "bf16": 1}


def calibrate_dot_precision(spec: MLPSpec, weights, y0: Array, t, *,
                            rtol=1e-6, atol=1e-8, method: str = "dopri5",
                            candidates=("bf16", "mixed"),
                            max_nfe_inflation: float = 0.5,
                            **solve_kw) -> MLPSpec:
    """One-time MXU-cost gate for the reduced-precision tiers (round-4
    verdict item 2): run ONE solve per candidate `dot_precision` on a
    representative (y0, t) and return `spec` rebuilt with the tier that
    minimizes estimated MXU time = NFE x `DOT_PASSES[tier]`.

    Rationale: reduced-precision noise sits under the embedded error
    estimate only down to a tolerance floor (the 'mixed' tier's hi/lo
    activation split leaves ~2^-18-relative dots), so adaptive step
    counts may inflate a few percent at tight rtol — an NFE-parity gate
    would reject a tier that is still a clear wall-clock win (e.g. +12%
    NFE at 2/3 the passes = 25% less MXU time on the wide-MLP benchmark).
    The pass-cost model charges that inflation its true price; 'bf16' on
    adaptive methods (5-9x NFE at 1/3 passes) loses automatically. A tier
    whose NFE exceeds `(1 + max_nfe_inflation) x` the 'highest' reference
    is rejected outright — cost aside, per-solve latency jitter and the
    max_num_steps budget both track NFE.

    Fixed-grid methods have no error estimate, so every tier has NFE
    parity by construction and the fewest-pass candidate wins on cost.
    Calibration is a host-side loop (one compile per tier) — do it once
    per deployment, not per solve. The 'mixed'/'bf16' tiers integrate the
    bf16-weight model (see MLPSpec); the gate is STEP-COUNT economics,
    not trajectory identity.
    """
    ref = solve_mlp_spec(dataclasses.replace(spec, dot_precision="highest"),
                         weights, y0, t, rtol=rtol, atol=atol,
                         method=method, **solve_kw)
    ref_nfe = int(ref.stats.nfe)
    best, best_cost = "highest", ref_nfe * DOT_PASSES["highest"]
    for prec in candidates:
        if prec == "highest":
            continue
        try:
            r = solve_mlp_spec(dataclasses.replace(spec, dot_precision=prec),
                               weights, y0, t, rtol=rtol, atol=atol,
                               method=method, **solve_kw)
        except ValueError:        # tier not supported for this method
            continue
        nfe = int(r.stats.nfe)
        if nfe > ref_nfe * (1.0 + max_nfe_inflation):
            continue
        cost = nfe * DOT_PASSES[prec]
        if cost < best_cost:
            best, best_cost = prec, cost
    return dataclasses.replace(spec, dot_precision=best)


def solve_fused(func, y0: Array, t, *, rtol=1e-6, atol=1e-8,
                method: str = "dopri5", interpret: Optional[bool] = None,
                max_num_steps=None, first_step=None, matmul: str = "auto",
                safety: float = 0.9, ifactor: float = 10.0,
                dfactor: float = 0.2, dense_output: bool = False,
                num_steps=None, step_size=None,
                max_order: Optional[int] = None,
                max_iters: int = 4,
                per_sample: bool = False,
                dot_precision: str = "highest") -> SolveResult:
    """Whole-solve fused adaptive RK for ARBITRARY plain-jnp dynamics via
    the jaxpr -> Pallas bridge (ops/jaxpr_bridge.py).

    func(t, y): any jnp function over batch-major y [B, D] built from the
    fusable primitive subset (elementwise ops, @/jnp.dot against
    closed-over weight arrays, broadcasts, feature-axis reductions and
    concats — which covers MLPs of any shape, the benchmark spiral written
    as plain jnp, concat-t nets, elementwise fields...). Dynamics outside
    the subset raise `ops.jaxpr_bridge.FusionError` — callers that need a
    guarantee use `odeint(..., options={'fuse': True})`, which catches it
    and falls back to the generic engine.

    y0: [B, D] (or [D]: auto-vmapped to a B=1 batch); t may increase or
    decrease. Forward-only (the in-kernel while loop is not reverse
    differentiable): for training use `odeint_adjoint(...,
    options={'fuse': True})` (fused forward + generic O(1)-memory adjoint
    backward). Returns ys [T, B, D] (or [T, D]) + on-device stats.
    """
    from .ops import jaxpr_bridge as jb
    from .ops.pallas_kernels import _LANE, _round_up

    y0 = jnp.asarray(y0)
    squeeze = False
    if y0.ndim == 1:
        # Unbatched state: vmap the user func over a singleton batch axis
        # (tracing the batched variant directly; yy[0]-style indexing would
        # leave the fusable subset).
        inner = func
        func = lambda tt, yy: jax.vmap(lambda y_: inner(tt, y_))(yy)
        y0 = y0[None]
        squeeze = True
    y0, t = _check_spec_inputs(y0, t)
    interpret = _auto_interpret(interpret)
    dtype = y0.dtype

    adams = method in _ADAMS_METHODS
    vcabm = method == "adams"
    fixed = method in _pf.FIXED_TABLEAUS_BY_NAME or adams
    if not fixed and not vcabm and method not in tableaus.TABLEAUS_BY_NAME:
        raise jb.FusionError(
            f"method {method!r} has no whole-solve kernel (available: "
            f"{sorted(tableaus.TABLEAUS_BY_NAME)} adaptive, "
            f"{sorted(_pf.FIXED_TABLEAUS_BY_NAME)} fixed-grid, "
            f"{sorted(_ADAMS_METHODS)} fixed-step Adams, 'adams' VCABM)")
    if vcabm and dense_output:
        raise jb.FusionError(
            "dense_output applies to adaptive RK methods only")
    if dot_precision not in ("highest", "bf16", "mixed"):
        raise ValueError(f"dot_precision must be 'highest', 'bf16' or "
                         f"'mixed', got {dot_precision!r}")
    if dot_precision != "highest":
        # Same tier rules as MLPSpec.dot_precision: Adams kernels need
        # f32-accurate dots; one-pass 'bf16' noise poisons the embedded
        # error estimate, so it stays fixed-grid; 2-pass deterministic
        # 'mixed' is adaptive-safe. ValueError (not FusionError): a
        # precision request must fail loudly, never silently fall back
        # to a differently-precisioned generic solve.
        if vcabm or adams:
            raise ValueError(
                f"dot_precision={dot_precision!r} is not supported on "
                "the Adams kernels; use an RK method")
        if dot_precision == "bf16" and not fixed:
            raise ValueError(
                "dot_precision='bf16' is fixed-grid serving only (its "
                "~2e-3 single-pass noise poisons the embedded error "
                "estimate); use 'mixed' for adaptive methods")
    if max_order is None:
        max_order = 12 if vcabm else 4     # generic engines' defaults
    if fixed and dense_output:
        raise jb.FusionError(
            "dense_output applies to adaptive methods only (the generic "
            "fixed-grid engine has no dense output either)")
    if per_sample:
        if fixed or vcabm:
            raise jb.FusionError(
                "per_sample applies to adaptive RK methods only (fixed "
                "grids have no controller; VCABM's order machinery is "
                "shared)")
        if dense_output:
            raise jb.FusionError(
                "per_sample + dense_output is unsupported (per-lane steps "
                "have no shared interpolant sequence)")
    if t.shape[0] == 1:
        z = jnp.asarray(0, jnp.int32)
        res = SolveResult(y0[None], SolverStats(z, z, z, z))
        return SolveResult(res.ys[:, 0], res.stats) if squeeze else res
    T_out, (B, D) = int(t.shape[0]), y0.shape
    B_orig = B
    n_blocks = 1
    if per_sample and _fused_vmem_bytes(
            T_out, D, B, 2, kpack=1) > _VMEM_BUDGET:
        # (Applies in interpret mode too: CPU tests exercise the same
        # routing the chip takes.)
        # Per-lane forward past the VMEM budget (round-4 verdict item 3):
        # per-lane controllers are independent, so lane blocks run as
        # sequential grid programs with identical semantics. Per-sample
        # consts can't block-shard (replicated refs); huge T x D can't
        # block at all — both fall back (the dispatcher preserves
        # per-sample semantics via vmap of the generic engine).
        b_blk = _grid_block_size(T_out, D, 2, kpack=1)
        if b_blk is None:
            raise jb.FusionError(
                "per_sample: even a single block exceeds the fused "
                "kernel's VMEM budget (T x D too large)")
        n_blocks = -(-B // b_blk)
        y0 = jnp.pad(y0, ((0, n_blocks * b_blk - B), (0, 0)), mode="wrap")
        B = y0.shape[0]
    # Dense output persists a per-accepted-step interpolant buffer of
    # 5 * S_dense extra state planes next to the T output rows — include
    # it in the sizing (dense kernels run unpacked, kpack=1).
    S_dense = 0
    if dense_output:
        S_dense = int(max_num_steps) if max_num_steps is not None else 1024
    T_eff = T_out + 5 * S_dense
    # Dense-output sizing applies in interpret mode too, so CPU tests
    # exercise the SAME block decisions the chip makes (the honest model:
    # sublane-padded rows, double-buffered out + interpolant windows —
    # the old 4*5*S*D*B check under-counted both and would scoped-OOM).
    B_user_pre_pad = B
    if (not per_sample and (dense_output or not interpret)
            and _fused_vmem_bytes(
                T_eff, D, B, 2, kpack=1 if dense_output else None
            ) > _VMEM_BUDGET):
        # Batches past the VMEM budget run as sequential grid blocks
        # (one launch, per-block controller — the conv tier's recipe).
        # Threshold budgets TWO trajectory buffers: the output (and
        # dense) windows are double-buffered even single-block (see
        # _fused_vmem_bytes). With dense_output each block emits its own
        # interpolant window (BlockDenseOutput).
        b_blk = _grid_block_size(T_eff, D, 2,
                                 kpack=1 if dense_output else None,
                                 min_block=_LANE if dense_output else 1024)
        if b_blk is None:
            # Deferred: batch-coupled dynamics can't grid-block anyway
            # but may STREAM (checked after the plan is built, below) —
            # raising here would route them to the generic engine on
            # chip while interpret mode (which skips this sizing) would
            # stream, i.e. CPU tests would not exercise chip routing.
            block_unfit = True
        else:
            block_unfit = False
            n_blocks = -(-B // b_blk)
            # Wrap-pad: replicated samples integrate exactly like their
            # originals (zero-filled fakes could NaN-poison their
            # block's shared controller).
            y0 = jnp.pad(y0, ((0, n_blocks * b_blk - B), (0, 0)),
                         mode="wrap")
            B = y0.shape[0]
    else:
        block_unfit = False

    plan, consts = jb.build_plan(func, jnp.asarray(t)[0].astype(dtype), y0,
                                 matmul=matmul)
    if n_blocks > 1 and any(
            l[0] in ("batch", "bvec") for l in plan.const_layouts):
        raise jb.FusionError(
            "per-sample consts are not block-shardable (grid programs "
            "replicate const refs); batch exceeds the VMEM budget")
    stream_out = False
    if plan.batch_coupled:
        if per_sample:
            raise ValueError(
                "per_sample=True with batch-coupled dynamics (a "
                "cross-sample reduction like jnp.mean(y, axis=0)) is "
                "unsupported: per-lane stepping would mix samples at "
                "different times")
        over_unpacked = _fused_vmem_bytes(
            T_out, D, B_user_pre_pad, 2, kpack=1) > _VMEM_BUDGET
        if (n_blocks > 1 or over_unpacked or block_unfit) and dense_output:
            # The streamed kernel has no dense-output mode (interpolant
            # windows live in VMEM; whole_solve_call rejects the
            # combination) — fall back cleanly instead.
            raise jb.FusionError(
                "batch-coupled dynamics past the VMEM budget stream the "
                "trajectory to HBM, which has no dense_output mode")
        if n_blocks > 1 or over_unpacked or block_unfit:
            # Round-4 verdict item 7: grid-blocking can NEVER serve a
            # bsum (per-block controllers take different step sequences,
            # and a block-local sum would integrate a different ODE).
            # Instead keep ONE controller and STREAM trajectory rows to
            # HBM (whole_solve_call stream_out): exact semantics at any
            # B whose [D, B] state still fits VMEM. Undo the wrap-pad
            # (replicated samples would contribute to the global bsum,
            # changing the mean) and rebuild the plan at the true batch.
            # The unpacked-budget check applies in interpret mode too, so
            # CPU tests exercise the same routing the chip takes.
            if fixed or vcabm:
                raise jb.FusionError(
                    "batch-coupled dynamics past the VMEM budget stream "
                    "the trajectory to HBM, which only the adaptive-RK "
                    "whole-solve kernel implements; batch exceeds the "
                    "VMEM budget for this method family")
            # Stage buffers live SUBLANE-PADDED in VMEM ([2, B] -> [8, B]
            # physically, measured 73.13 MB at D=2 B=131072 vs this
            # model's 71.3); the launch raises its scoped limit to
            # 100 MB (whole_solve_call stream path), so cap where the
            # padded model still fits with headroom.
            state_bytes = 4 * _round_up(D, 8) * B_user_pre_pad * (
                len(tableaus.TABLEAUS_BY_NAME[method].c) + 10)
            if state_bytes > 96 * 1024 * 1024:
                raise jb.FusionError(
                    "batch-coupled dynamics: even the streamed solve's "
                    "[D, B] stage state exceeds the raised scoped-VMEM "
                    "ceiling")
            if B != B_user_pre_pad:
                y0 = y0[:B_user_pre_pad]
                B = B_user_pre_pad
                plan, consts = jb.build_plan(
                    func, jnp.asarray(t)[0].astype(dtype), y0,
                    matmul=matmul)
            n_blocks = 1
            stream_out = True
    if block_unfit and not stream_out:
        # The deferred generic-path sizing failure: not batch-coupled
        # (or not streamable), so nothing can serve this T x D.
        raise jb.FusionError(
            "even a single 1024-sample block exceeds the fused "
            "kernel's VMEM budget (T x D too large)")

    t = t.astype(dtype)
    sign = jnp.where(t[-1] >= t[0], 1.0, -1.0).astype(dtype)
    tau = sign * t
    yT = y0.T                                    # [D, B] feature-major

    f0 = (sign * func(t[0], y0).T).astype(dtype)
    if fixed:
        dt0, extra_nfe = None, 0   # no controller, no initial-step probe
    elif per_sample and first_step is None:
        # Per-lane HNW initial steps: per-sample norms, ONE batched probe
        # (works for batch-coupled dynamics too — no per-sample func
        # calls; see norms.select_initial_step_per_sample).
        from .ops.norms import select_initial_step_per_sample

        def g_b(s, yb):
            return (sign * func(sign * s, yb)).astype(dtype)

        dt0 = select_initial_step_per_sample(
            g_b, tau[0], y0, f0.T,
            tableaus.TABLEAUS_BY_NAME[method].order - 1,
            jnp.asarray(rtol, dtype), jnp.asarray(atol, dtype))
        extra_nfe = 2
    elif first_step is None:
        def flat_g(s, yf):
            yb = yf.reshape(D, B).T
            return (sign * func(sign * s, yb).T).ravel()

        dt0 = select_initial_step(
            flat_g, tau[0], yT.ravel(), f0.ravel(),
            1 if vcabm else tableaus.TABLEAUS_BY_NAME[method].order - 1,
            jnp.asarray(rtol, dtype), jnp.asarray(atol, dtype))
        extra_nfe = 2
    else:
        dt0 = jnp.abs(jnp.asarray(first_step, dtype))
        extra_nfe = 1

    # Sublane packing for narrow states (see pallas_kernels.pick_pack):
    # skipped when the dense-output buffers would need unpacking too, and
    # when the plan carries per-sample ('batch'/'bvec') consts, whose
    # packed layout the per-group RHS walk doesn't slice.
    kpack = 1
    Bb = B // n_blocks
    if (not dense_output and not per_sample and not plan.batch_coupled
            and not any(
            l[0] in ("batch", "bvec") for l in plan.const_layouts)):
        kpack = _pk.pick_pack(D, Bb)
        if n_blocks > 1 and (Bb // kpack) % _LANE:
            kpack = 1              # grid blocks must stay lane-aligned
    if (not interpret and n_blocks == 1 and kpack == 1
            and not dense_output and not stream_out
            and _fused_vmem_bytes(T_out, D, B, 2, kpack=1) > _VMEM_BUDGET):
        # The initial (packed-layout) threshold passed, but per-sample
        # consts or a batch-coupled reduction force the unpacked
        # [T, D, B] layout, whose sublane padding is up to 4x the packed
        # model — over budget. Fall back (FusionError routes to the
        # generic engine at the dispatcher).
        raise jb.FusionError(
            "per-sample consts / batch-coupled reductions force the "
            "unpacked [T, D, B] layout, whose trajectory buffers exceed "
            "the fused kernel's VMEM budget")
    Lb = Bb // kpack               # per-block lane count
    Bk = n_blocks * Lb             # total lanes
    yT_k = _pk.pack_state_blocks(yT, kpack, n_blocks) if kpack > 1 else yT
    f0_k = _pk.pack_state_blocks(f0, kpack, n_blocks) if kpack > 1 else f0

    y0p, f0p = yT_k, f0_k
    if n_blocks == 1:
        BP = _round_up(max(Lb, _LANE), _LANE)
        if BP != Lb:
            y0p = jnp.pad(yT_k, ((0, 0), (0, BP - Lb)))
            f0p = jnp.pad(f0_k, ((0, 0), (0, BP - Lb)))
    else:
        BP = Lb                    # lane-aligned by construction
    packed = tuple(jb.pack_consts(plan, consts, dtype, BP))

    if vcabm:
        out, stats = _pv.plan_solve_vcabm(
            plan, packed, y0p, tau, dt0, rtol, atol, sign, f0p,
            max_order=int(max_order),
            safety=safety, ifactor=ifactor, dfactor=dfactor,
            max_steps=(int(max_num_steps) if max_num_steps is not None
                       else 2 ** 31 - 1),
            interpret=interpret, pack=kpack, n_blocks=n_blocks)
        if n_blocks > 1:
            stats = _merge_grid_stats(stats, per_block_work=True)
        if out.shape[-1] != Bk:
            out = out[:, :, :Lb]
        if kpack > 1:
            out = _pk.unpack_state_blocks(out, kpack, D, n_blocks)
        ys = jnp.transpose(out, (0, 2, 1))[:, :B_orig]
        if squeeze:
            ys = ys[:, 0]
        st = SolverStats(stats[0] + extra_nfe, stats[1], stats[2],
                         stats[3])
        return SolveResult(ys, st)

    if fixed:
        grid = _fixed_grid_tau(tau, t, num_steps, step_size, dtype)
        if adams:
            out, stats = _pf.plan_solve_adams(
                plan, packed, y0p, tau, grid, rtol, atol, sign, f0p,
                implicit=method == "fixed_adams",
                max_order=int(max_order), max_iters=int(max_iters),
                interpret=interpret, pack=kpack, n_blocks=n_blocks)
        else:
            out, stats = _pf.plan_solve_fixed(
                plan, packed, y0p, tau, grid, sign, f0p, method=method,
                interpret=interpret, pack=kpack, n_blocks=n_blocks,
                dot_precision=dot_precision)
        if n_blocks > 1:
            # Every block walks the SAME fixed grid: per-solve stats are
            # block-count-invariant (nfe/steps from block 0, status max).
            stats = _merge_grid_stats(stats, per_block_work=False)
        if out.shape[-1] != Bk:
            out = out[:, :, :Lb]
        if kpack > 1:
            out = _pk.unpack_state_blocks(out, kpack, D, n_blocks)
        ys = jnp.transpose(out, (0, 2, 1))[:, :B_orig]
        if squeeze:
            ys = ys[:, 0]
        return SolveResult(ys, SolverStats(*stats))

    if per_sample:
        out, stats, lanes = jb.plan_solve(
            plan, packed, y0p, tau, dt0, rtol, atol, sign, f0p,
            method=method, safety=safety, ifactor=ifactor,
            dfactor=dfactor,
            max_steps=(int(max_num_steps) if max_num_steps is not None
                       else 2 ** 31 - 1),
            interpret=interpret, per_sample=True, n_blocks=n_blocks,
            dot_precision=dot_precision)
        ys = jnp.transpose(out, (0, 2, 1))[:, :B_orig]
        lanes = lanes[:, :B_orig]
        if squeeze:
            ys = ys[:, 0]
            lanes = lanes[:, 0]
        lane_stats = SolverStats(lanes[0] + extra_nfe, lanes[1],
                                 lanes[2], lanes[3])
        if n_blocks > 1:
            # Scalar stats from TRUE lanes (wrap-pad lanes did real
            # counted work; exclude it).
            st = SolverStats(jnp.sum(lane_stats.nfe),
                             jnp.sum(lane_stats.n_accepted),
                             jnp.sum(lane_stats.n_rejected),
                             jnp.max(lane_stats.status))
        else:
            st = SolverStats(stats[0] + extra_nfe * B_orig, stats[1],
                             stats[2], stats[3])
        return SolveResult(ys, st, None, None, lane_stats)

    dense = None
    if dense_output:
        # Per-step interpolants persist in-kernel (round-2 verdict item
        # 10): like the bounded loop, a static step budget bounds the
        # buffer; exceeding it surfaces as MAX_STEPS_REACHED. VMEM sizing
        # happened above (T_eff includes the 5*S planes); batches past
        # the budget run as grid blocks, each emitting its own window.
        S = S_dense
        out, stats, meta, dcoef = jb.plan_solve(
            plan, packed, y0p, tau, dt0, rtol, atol, sign, f0p,
            method=method, safety=safety, ifactor=ifactor,
            dfactor=dfactor, max_steps=S, emit_dense=S,
            interpret=interpret, n_blocks=n_blocks,
            dot_precision=dot_precision)
        if n_blocks == 1:
            from .solvers.base import DenseOutput
            coeffs = dcoef[:, :, :B].reshape(S, 5, D, B)
            coeffs = jnp.transpose(coeffs, (0, 1, 3, 2)).reshape(
                S, 5, B * D)
            dense = DenseOutput(meta[:, 0], meta[:, 1], meta[:, 2],
                                coeffs, sign)
        else:
            # Per-block step grids (each block ran its own controller):
            # meta rows [g*S, (g+1)*S) and lane slice g belong to block g.
            from .solvers.base import BlockDenseOutput
            Bb = B // n_blocks
            meta3 = meta.reshape(n_blocks, S, 3)
            coeffs = dcoef.reshape(S, 5, D, n_blocks, Bb)
            coeffs = jnp.transpose(coeffs, (3, 0, 1, 4, 2)).reshape(
                n_blocks, S, 5, Bb * D)
            dense = BlockDenseOutput(meta3[:, :, 0], meta3[:, :, 1],
                                     meta3[:, :, 2], coeffs, sign,
                                     B_orig, D)
    else:
        out, stats = jb.plan_solve(
            plan, packed, y0p, tau, dt0, rtol, atol, sign, f0p,
            method=method,
            safety=safety, ifactor=ifactor, dfactor=dfactor,
            max_steps=(int(max_num_steps) if max_num_steps is not None
                       else 2 ** 31 - 1),
            interpret=interpret, pack=kpack, n_blocks=n_blocks,
            stream_out=stream_out, dot_precision=dot_precision)
    if n_blocks > 1:
        stats = _merge_grid_stats(stats, per_block_work=True)
    if out.shape[-1] != Bk:
        out = out[:, :, :Lb]       # single-block lane padding
    if kpack > 1:
        out = _pk.unpack_state_blocks(out, kpack, D, n_blocks)
    ys = jnp.transpose(out, (0, 2, 1))[:, :B_orig]      # [T, B, D]
    if squeeze:
        ys = ys[:, 0]
    st = SolverStats(stats[0] + extra_nfe, stats[1], stats[2], stats[3])
    return SolveResult(ys, st, None, dense)


#: hypersolver method name -> kind
_HYPER_METHODS = {"hyper_euler": "euler", "hyper_midpoint": "midpoint",
                  "hyper_heun": "heun"}


def solve_hyper(func, hypernet, y0: Array, t, *, method: str = "hyper_euler",
                num_steps=None, step_size=None, matmul: str = "auto",
                interpret: Optional[bool] = None) -> SolveResult:
    """Whole-solve fused hypersolver (Poli et al. 2020) for ARBITRARY
    fusable dynamics AND correction nets: both `func(t, y)` and
    `hypernet(t, y, f)` (plain jnp over [B, D] arrays) are compiled into
    ONE kernel via the jaxpr bridge — the learned-correction fixed-grid
    walk with zero launches per step. Unfusable funcs raise FusionError
    (odeint(options={'fuse': True}) catches it and falls back to the
    generic `solvers/hyper.py` engine). Inference tier: training the
    hypernet differentiates the generic fixed-grid scan.
    """
    from .ops import jaxpr_bridge as jb
    from .ops.pallas_kernels import _LANE, _round_up

    kind = _HYPER_METHODS[method]
    y0 = jnp.asarray(y0)
    squeeze = False
    if y0.ndim == 1:
        inner_f, inner_g = func, hypernet
        func = lambda tt, yy: jax.vmap(lambda y_: inner_f(tt, y_))(yy)
        hypernet = lambda tt, yy, ff: jax.vmap(
            lambda y_, f_: inner_g(tt, y_, f_))(yy, ff)
        y0 = y0[None]
        squeeze = True
    y0, t = _check_spec_inputs(y0, t)
    interpret = _auto_interpret(interpret)
    dtype = y0.dtype
    if t.shape[0] == 1:
        z = jnp.asarray(0, jnp.int32)
        res = SolveResult(y0[None], SolverStats(z, z, z, z))
        return SolveResult(res.ys[:, 0], res.stats) if squeeze else res
    T_out, (B, D) = int(t.shape[0]), y0.shape
    B_orig = B

    n_blocks = 1
    # kpack=1: the hypersolver kernel runs UNPACKED (no pick_pack in its
    # launch path below), so the sizing models the unpacked row padding.
    if not interpret and _fused_vmem_bytes(T_out, D, B, 2,
                                           kpack=1) > _VMEM_BUDGET:
        b_blk = _grid_block_size(T_out, D, 2, kpack=1)
        if b_blk is None:
            raise jb.FusionError(
                "even a single 1024-sample block exceeds the fused "
                "kernel's VMEM budget (T x D too large)")
        n_blocks = -(-B // b_blk)
        y0 = jnp.pad(y0, ((0, n_blocks * b_blk - B), (0, 0)), mode="wrap")
        B = y0.shape[0]

    t = t.astype(dtype)
    sign = jnp.where(t[-1] >= t[0], 1.0, -1.0).astype(dtype)
    tau = sign * t
    grid_is_t = num_steps is None and step_size is None
    grid = _fixed_grid_tau(tau, t, num_steps, step_size, dtype)

    plan_f, consts_f = jb.build_plan(func, t[0], y0, matmul=matmul)
    f0u = func(t[0], y0)
    plan_g, consts_g = jb.build_plan(
        lambda tt, ss: hypernet(tt, ss[:, :D], ss[:, D:]), t[0],
        jnp.concatenate([y0, f0u], axis=1), matmul=matmul, out_dim=D)
    if n_blocks > 1 and any(
            l[0] in ("batch", "bvec")
            for p in (plan_f, plan_g) for l in p.const_layouts):
        raise jb.FusionError(
            "per-sample consts are not block-shardable (grid programs "
            "replicate const refs); batch exceeds the VMEM budget")
    if n_blocks > 1 and (plan_f.batch_coupled or plan_g.batch_coupled):
        raise jb.FusionError(
            "batch-coupled dynamics are not block-shardable (block-local "
            "sums); batch exceeds the VMEM budget")

    yT = y0.T
    Bb = B // n_blocks
    BP = _round_up(max(Bb, _LANE), _LANE) if n_blocks == 1 else Bb
    y0p = (jnp.pad(yT, ((0, 0), (0, n_blocks * BP - B)))
           if n_blocks * BP != B else yT)
    packed_f = tuple(jb.pack_consts(plan_f, consts_f, dtype,
                                    n_blocks * BP))
    packed_g = tuple(jb.pack_consts(plan_g, consts_g, dtype,
                                    n_blocks * BP))

    out, stats = _pf.plan_solve_hyper(
        plan_f, plan_g, packed_f, packed_g, y0p, tau, grid, sign,
        kind=kind, grid_is_t=grid_is_t, interpret=interpret,
        n_blocks=n_blocks)
    if n_blocks > 1:
        stats = _merge_grid_stats(stats, per_block_work=False)
    if out.shape[-1] != B:
        out = out[:, :, :Bb]
    ys = jnp.transpose(out, (0, 2, 1))[:, :B_orig]
    if squeeze:
        ys = ys[:, 0]
    return SolveResult(ys, SolverStats(*stats))


def odeint_adjoint_mlp(spec: MLPSpec, weights, y0: Array, t, *, rtol=1e-6,
                       atol=1e-8, adjoint_rtol=None, adjoint_atol=None,
                       method: str = "dopri5",
                       adjoint_method: Optional[str] = None,
                       adjoint_seminorm: bool = False,
                       interpret: Optional[bool] = None,
                       max_num_steps=None, first_step=None,
                       adjoint_first_step=None, nfe_meter=None,
                       return_stats: bool = False, num_steps=None,
                       step_size=None, adjoint_num_steps=None,
                       per_sample: bool = False):
    """Fully-fused O(1)-memory training path for MLP neural ODEs.

    Forward = ONE whole-solve Pallas kernel (`mlp_solve`); backward = ONE
    Pallas kernel running the entire adjoint sweep — interval loop,
    stored-state resets, cotangent injections, adaptive stepping, MLP
    VJPs, and the parameter-gradient quadrature (`mlp_adjoint_solve`).
    The generic `odeint_adjoint` pays ~10^2 XLA kernel launches per solver
    step on this path.

    Differentiable wrt `weights`, `y0`, and `t` (time gradients follow the
    same continuous-adjoint recipe as adjoint.py; for concat-t dynamics —
    `spec.time_input=True` — the backward kernel additionally integrates
    the a_t quadrature and the first layer's t-column gradient). Returns
    the trajectory [T, B, D] (with stats when return_stats=True — forward
    stats; backward stats stream to `nfe_meter`).

    per_sample=True (round-4 verdict item 3): BOTH sweeps run per-lane
    step controllers — the forward via `mlp_solve(per_sample=True)`, the
    backward via the two-pass per-lane adjoint kernel
    (`pallas_adjoint.mlp_perlane_adjoint_solve`) — so a stiff sample
    throttles neither direction of training. Adaptive methods only; the
    backward step-control norm is always the (y, a_y) seminorm.
    """
    adjoint_rtol = rtol if adjoint_rtol is None else adjoint_rtol
    adjoint_atol = atol if adjoint_atol is None else adjoint_atol
    adjoint_method = method if adjoint_method is None else adjoint_method
    interp_flag = _auto_interpret(interpret)
    max_steps = (int(max_num_steps) if max_num_steps is not None
                 else 2 ** 31 - 1)
    fixed_bwd = adjoint_method in _pf.FIXED_TABLEAUS_BY_NAME
    if per_sample and (method in _pf.FIXED_TABLEAUS_BY_NAME or fixed_bwd):
        raise ValueError("per_sample=True training applies to adaptive "
                         "RK methods only (forward and adjoint)")
    # Fixed backward: steps PER OBSERVATION INTERVAL. Default inherits
    # the forward's num_steps (the generic adjoint's contract: bwd_options
    # copy the forward options filtered to {'num_steps'}), else 1.
    bwd_num_steps = int(adjoint_num_steps if adjoint_num_steps is not None
                        else (num_steps if num_steps is not None else 1))

    # Backward kernel holds ys + g ([T, D, B] each) in VMEM; past the
    # budget, the backward runs as sequential grid blocks (forward grids
    # via solve_mlp_spec already). Pad samples get wrap-replicated states
    # (benign dynamics) but ZERO cotangent seeds, so their adjoint stays
    # identically 0 and contributes nothing to the weight quadratures.
    # Only when even a single 1024-sample block cannot fit does the
    # generic adjoint take over.
    y0_arr = jnp.asarray(y0)
    t_arr = jnp.asarray(t)
    adj_blocks, adj_bpad = 1, 0
    # The backward sweep packs via _adjoint_pack (pick_pack with extra
    # B % (k*128) gating); the threshold budgets FOUR trajectory buffers
    # (ys AND g, each pipelined/double-buffered) — the same model as the
    # grid block sizing, so single-block configs can't silently exceed it.
    from .ops.pallas_adjoint import _adjoint_pack as _adj_pack
    adj_k = (_adj_pack("auto", y0_arr.shape[1], y0_arr.shape[0])
             if y0_arr.ndim == 2 and not per_sample else 1)
    if (per_sample and not interp_flag and t_arr.ndim >= 1
            and _fused_vmem_bytes(
                int(t_arr.shape[0]), y0_arr.shape[1], y0_arr.shape[0], 4,
                kpack=1) > _VMEM_BUDGET):
        # Per-lane lanes are unpacked and single-block (each lane IS its
        # own controller); grid-blocking the backward would need the
        # cross-block quadrature plumbing the shared kernel has — not yet
        # composed with per-lane control.
        raise ValueError(
            "odeint_adjoint_mlp(per_sample=True): the batch exceeds the "
            "per-lane adjoint kernel's VMEM budget (single-block only); "
            "reduce the batch or use per_sample=False")
    if (not per_sample
            and not interp_flag and t_arr.ndim >= 1 and _fused_vmem_bytes(
            int(t_arr.shape[0]), y0_arr.shape[1], y0_arr.shape[0], 4,
            kpack=adj_k) > _VMEM_BUDGET):
        T_chk, D_chk = int(t_arr.shape[0]), y0_arr.shape[1]
        B_chk = y0_arr.shape[0]
        # ys AND g windows are pipelined (double-buffered) per block:
        # budget four trajectory buffers.
        b_blk = _grid_block_size(T_chk, D_chk, 4)
        if b_blk is not None:
            adj_blocks = -(-B_chk // b_blk)
            adj_bpad = adj_blocks * b_blk - B_chk
    if adj_blocks == 1 and (
            not interp_flag and t_arr.ndim >= 1 and _fused_vmem_bytes(
                int(t_arr.shape[0]), y0_arr.shape[1], y0_arr.shape[0], 4,
                kpack=adj_k)
            > _VMEM_BUDGET):
        import warnings
        warnings.warn(
            "odeint_adjoint_mlp: even a single 1024-sample block exceeds "
            "the adjoint kernel's VMEM budget (T x D too large); falling "
            "back to the generic odeint_adjoint",
            stacklevel=2)
        from .adjoint import odeint_adjoint as _generic_adjoint
        fb_options = {}
        if method in _pf.FIXED_TABLEAUS_BY_NAME:
            if num_steps is not None:
                fb_options["num_steps"] = int(num_steps)
            if step_size is not None:
                fb_options["step_size"] = step_size
        else:
            if max_num_steps is not None:
                fb_options["max_num_steps"] = int(max_num_steps)
            if first_step is not None:
                fb_options["first_step"] = first_step
        if fixed_bwd:
            fb_adj_options = {"num_steps": bwd_num_steps}
        else:
            fb_adj_options = {k: v for k, v in fb_options.items()
                              if k in ("max_num_steps",)}
            if adjoint_first_step is not None:
                fb_adj_options["first_step"] = adjoint_first_step
        return _generic_adjoint(
            lambda tt, yy, w: mlp_apply(spec, w, yy), y0, t,
            params=tuple((W, b) for W, b in weights), rtol=rtol, atol=atol,
            method=method, options=fb_options or None,
            adjoint_rtol=adjoint_rtol,
            adjoint_atol=adjoint_atol, adjoint_method=adjoint_method,
            adjoint_options=fb_adj_options or None,
            adjoint_seminorm=adjoint_seminorm, nfe_meter=nfe_meter,
            return_stats=return_stats)

    from .solvers.base import SolverStats as _Stats
    from .utils.nfe import emit_bwd, emit_fwd

    weights = tuple((W, b) for W, b in weights)

    def _fwd_solve(weights_, y0_, t_):
        res = solve_mlp_spec(spec, weights_, y0_, t_, rtol=rtol, atol=atol,
                             method=method, interpret=interpret,
                             max_num_steps=max_num_steps,
                             first_step=first_step, num_steps=num_steps,
                             step_size=step_size, per_sample=per_sample)
        emit_fwd(nfe_meter, res.stats.nfe, res.stats.n_accepted)
        return res.ys, res.stats

    @jax.custom_vjp
    def _run(weights_, y0_, t_):
        return _fwd_solve(weights_, y0_, t_)

    def _vjp_fwd(weights_, y0_, t_):
        ys, stats = _fwd_solve(weights_, y0_, t_)
        return (ys, stats), (ys, weights_, t_)

    def _vjp_bwd(res, cot):
        ys, weights_, t_ = res
        g, _ = cot                      # stats cotangents: symbolic zeros
        t_ = jnp.asarray(t_)
        T = t_.shape[0]
        dtype = ys.dtype
        if T < 2:
            zero_w = jax.tree_util.tree_map(jnp.zeros_like, weights_)
            return (zero_w, g[0], jnp.zeros_like(t_))

        # d loss / d t_i = dot(f(t_i, y_i), g_i); ts_bar[0] additionally
        # carries the integrated a_t quadrature (zero for autonomous
        # dynamics), matching adjoint.py's scan recipe.
        f_obs = jax.vmap(
            lambda ti, yi: mlp_apply(spec, weights_, yi, ti))(t_, ys)
        t_bars = jnp.sum(f_obs * g, axis=(1, 2)).astype(t_.dtype)

        sign = jnp.where(t_[-1] >= t_[0], 1.0, -1.0).astype(dtype)
        tau = (sign * t_).astype(dtype)
        ysT = jnp.transpose(ys, (0, 2, 1)).astype(dtype)    # [T, D, B]
        gT = jnp.transpose(g, (0, 2, 1)).astype(dtype)

        if adjoint_first_step is not None:
            dt0 = jnp.abs(jnp.asarray(adjoint_first_step, dtype))
        else:
            # Cheap heuristic: a tenth of the last observation gap; the
            # controller converges within a few attempts either way.
            dt0 = 0.1 * jnp.abs(tau[-1] - tau[-2]).astype(dtype)

        if adj_blocks > 1:
            B_true_adj = ysT.shape[-1]
            ysT = jnp.pad(ysT, ((0, 0), (0, 0), (0, adj_bpad)),
                          mode="wrap")
            gT = jnp.pad(gT, ((0, 0), (0, 0), (0, adj_bpad)))
        warrays, dims = pad_mlp_weights(weights_, dtype)
        if per_sample:
            from .ops.pallas_adjoint import mlp_perlane_adjoint_solve
            ay0, aws, at_q, bstats, _lane = mlp_perlane_adjoint_solve(
                warrays, dims, ysT, gT, tau, dt0, adjoint_rtol,
                adjoint_atol, sign, activation=spec.activation,
                final_activation=spec.final_activation,
                input_power=spec.input_power, method=adjoint_method,
                max_steps=max_steps, matmul=spec.matmul,
                time_input=spec.time_input, interpret=interp_flag)
        elif fixed_bwd:
            ay0, aws, at_q, bstats = _pf.mlp_adjoint_solve_fixed(
                warrays, dims, ysT, gT, tau, sign,
                num_steps=bwd_num_steps, activation=spec.activation,
                final_activation=spec.final_activation,
                input_power=spec.input_power, method=adjoint_method,
                matmul=spec.matmul, time_input=spec.time_input,
                interpret=interp_flag, n_blocks=adj_blocks)
        else:
            ay0, aws, at_q, bstats = mlp_adjoint_solve(
                warrays, dims, ysT, gT, tau, dt0, adjoint_rtol,
                adjoint_atol, sign, activation=spec.activation,
                final_activation=spec.final_activation,
                input_power=spec.input_power, method=adjoint_method,
                max_steps=max_steps, seminorm=adjoint_seminorm,
                matmul=spec.matmul, time_input=spec.time_input,
                interpret=interp_flag, n_blocks=adj_blocks)
        if adj_blocks > 1:
            ay0 = ay0[:, :B_true_adj]
        emit_bwd(nfe_meter, bstats[0], bstats[1])
        ts_bar = jnp.concatenate(
            [(at_q.astype(t_.dtype) - jnp.sum(t_bars[1:]))[None],
             t_bars[1:]])

        # Surface backward-sweep failures (dt underflow / max_num_steps):
        # a Python raise cannot cross the vjp, so NaN-poison every gradient
        # (the same contract as odeint's traced-status path) — a truncated
        # sweep would otherwise return a partial adjoint plus the raw sum
        # of the never-integrated remaining cotangents.
        bad = bstats[3] != 0

        def _loud(x):
            return jnp.where(bad, jnp.asarray(jnp.nan, x.dtype), x)

        w_bar = []
        for (W, b), (dWp, dbp) in zip(weights_, aws):
            din, dout = W.shape
            dW = _loud(dWp[:dout, :din].T.astype(W.dtype))
            db = (_loud(dbp[:dout, 0].astype(b.dtype))
                  if b is not None else None)
            w_bar.append((dW, db))
        return (tuple(w_bar), _loud(ay0.T.astype(ys.dtype)),
                _loud(ts_bar.astype(t_.dtype)))

    _run.defvjp(_vjp_fwd, _vjp_bwd)
    ys, stats = _run(weights, y0, jnp.asarray(t))
    if return_stats:
        return ys, _Stats(*stats)
    return ys


def odeint_adjoint_fused(func, y0: Array, t, *, params=None, rtol=1e-6,
                         atol=1e-8, adjoint_rtol=None, adjoint_atol=None,
                         method: str = "dopri5",
                         adjoint_method: Optional[str] = None,
                         adjoint_seminorm: bool = False,
                         interpret: Optional[bool] = None,
                         max_num_steps=None, first_step=None,
                         adjoint_first_step=None, matmul: str = "auto",
                         nfe_meter=None, return_stats: bool = False,
                         num_steps=None, step_size=None,
                         adjoint_num_steps=None, per_sample: bool = False):
    """Fully-fused O(1)-memory training path for ARBITRARY fusable
    dynamics: the plan-driven counterpart of `odeint_adjoint_mlp`.

    per_sample=True (round-4 verdict item 3): per-lane step controllers
    in BOTH sweeps (`plan_solve(per_sample=True)` forward, the two-pass
    per-lane adjoint kernel `plan_adjoint.plan_perlane_adjoint_solve`
    backward). Adaptive methods only; the backward norm is always the
    (y, a_y) seminorm; batch-coupled (bsum) dynamics and batches past the
    single-block VMEM budget raise FusionError (the dispatcher then falls
    back to vmap-of-generic-adjoint per-sample semantics).

    func(t, y, params) (or func(t, y) when params is None): any plain-jnp
    dynamics in the jaxpr-bridge subset (ops/jaxpr_bridge.py). Forward =
    ONE whole-solve Pallas kernel (`plan_solve`); backward = ONE kernel
    running the entire continuous-adjoint sweep with the plan's
    reverse-mode VJP evaluated in-kernel (`ops/plan_adjoint.py`).
    Parameter gradients flow to the user's `params` PYTREE: the
    custom_vjp boundary sits at the PACKED const arrays, and JAX's own
    transpose of the host-side trace (closure arithmetic, `pack_consts`
    padding/transposes) carries the packed cotangents back to every leaf
    — weight tying, computed biases, and data constants all differentiate
    correctly.

    Dynamics outside the fusable/differentiable subset raise
    `ops.jaxpr_bridge.FusionError`; `odeint_adjoint(...,
    options={'fuse': True})` catches it and falls back (fused forward +
    generic backward, then all-generic). Differentiable wrt params, y0,
    and t. Returns the trajectory [T, B, D] ([T, D] for unbatched y0);
    with return_stats=True, (trajectory, forward SolverStats) — backward
    stats stream to `nfe_meter`.
    """
    from .ops import jaxpr_bridge as jb
    from .ops.pallas_kernels import _LANE, _round_up
    from .ops.plan_adjoint import check_plan_adjoint, plan_adjoint_solve
    from .solvers.base import SolverStats as _Stats
    from .utils.nfe import emit_bwd, emit_fwd

    if params is None:
        user_func = lambda tt, yy, pp: func(tt, yy)
        params_in = ()
    else:
        user_func = func
        params_in = params

    adjoint_rtol = rtol if adjoint_rtol is None else adjoint_rtol
    adjoint_atol = atol if adjoint_atol is None else adjoint_atol
    adjoint_method = method if adjoint_method is None else adjoint_method
    interp_flag = _auto_interpret(interpret)
    max_steps = (int(max_num_steps) if max_num_steps is not None
                 else 2 ** 31 - 1)

    fixed_fwd = method in _pf.FIXED_TABLEAUS_BY_NAME
    fixed_bwd = adjoint_method in _pf.FIXED_TABLEAUS_BY_NAME
    # Fixed backward: steps PER OBSERVATION INTERVAL (generic-adjoint
    # contract: the backward inherits the forward's num_steps, else 1).
    bwd_num_steps = int(adjoint_num_steps if adjoint_num_steps is not None
                        else (num_steps if num_steps is not None else 1))
    for m, fx in ((method, fixed_fwd), (adjoint_method, fixed_bwd)):
        if not fx and m not in tableaus.TABLEAUS_BY_NAME:
            raise jb.FusionError(
                f"method {m!r} has no whole-solve tableau (available: "
                f"{sorted(tableaus.TABLEAUS_BY_NAME)} adaptive, "
                f"{sorted(_pf.FIXED_TABLEAUS_BY_NAME)} fixed-grid)")
    if per_sample and (fixed_fwd or fixed_bwd):
        raise ValueError("per_sample=True training applies to adaptive "
                         "RK methods only (forward and adjoint)")

    y0 = jnp.asarray(y0)
    squeeze = False
    if y0.ndim == 1:
        inner = user_func
        user_func = lambda tt, yy, pp: jax.vmap(
            lambda y_: inner(tt, y_, pp))(yy)
        y0 = y0[None]
        squeeze = True
    y0c, t_arr = _check_spec_inputs(y0, t)
    dtype = y0c.dtype
    t_arr = t_arr.astype(dtype)
    T_out, (B, D) = int(t_arr.shape[0]), y0c.shape
    if T_out < 2:
        raise jb.FusionError("fused adjoint needs >= 2 observation times")

    # Backward kernel holds ys + g ([T, D, B] each) in VMEM; past the
    # budget, both kernels run as sequential grid blocks (ys/g windows
    # are pipelined per block: budget FOUR trajectory buffers). Pad
    # samples wrap-replicate (benign dynamics); their cotangent seeds are
    # the zeros that the output slice's transpose injects, so they
    # contribute nothing to the const quadratures. Only when even a
    # single 1024-sample block cannot fit does the generic adjoint take
    # over.
    n_blocks, B_user = 1, B
    # Threshold budgets FOUR buffers (ys + g, each double-buffered) at
    # the backward sweep's own pack factor (_adjoint_pack gating) — same
    # model as the grid block sizing.
    from .ops.pallas_adjoint import _adjoint_pack as _adj_pack
    _adj_k = 1 if per_sample else _adj_pack("auto", D, B)
    if (per_sample and not interp_flag
            and _fused_vmem_bytes(T_out, D, B, 4, kpack=1) > _VMEM_BUDGET):
        # Per-lane lanes are unpacked single-block in both sweeps; the
        # dispatcher falls back to vmap-of-generic per-sample semantics.
        raise jb.FusionError(
            "per_sample=True: the batch exceeds the per-lane adjoint "
            "kernel's single-block VMEM budget")
    if (not per_sample and not interp_flag
            and _fused_vmem_bytes(T_out, D, B, 4,
                                  kpack=_adj_k) > _VMEM_BUDGET):
        b_blk = _grid_block_size(T_out, D, 4)
        if b_blk is not None:
            n_blocks = -(-B // b_blk)
            y0c = jnp.pad(y0c, ((0, n_blocks * b_blk - B), (0, 0)),
                          mode="wrap")
            B = y0c.shape[0]
    def _single_block_over_budget():
        # Deferred to AFTER the plan is built: batch-coupled dynamics
        # cannot grid-block but may STREAM the trajectory through HBM
        # (stream_traj below) — falling back here would route them to
        # the generic adjoint on chip while interpret mode (which skips
        # this sizing) streams, i.e. CPU tests would not exercise the
        # chip's routing.
        return (n_blocks == 1 and not interp_flag
                and _fused_vmem_bytes(T_out, D, B, 4,
                                      kpack=_adj_k) > _VMEM_BUDGET)

    def _generic_fallback():
        import warnings
        warnings.warn(
            "odeint_adjoint_fused: even a single 1024-sample block "
            "exceeds the adjoint kernel's VMEM budget (T x D too large); "
            "falling back to the generic odeint_adjoint",
            stacklevel=2)
        from .adjoint import odeint_adjoint as _generic_adjoint
        fb_options = {}
        if fixed_fwd:
            if num_steps is not None:
                fb_options["num_steps"] = int(num_steps)
            if step_size is not None:
                fb_options["step_size"] = step_size
        else:
            if max_num_steps is not None:
                fb_options["max_num_steps"] = int(max_num_steps)
            if first_step is not None:
                fb_options["first_step"] = first_step
        if fixed_bwd:
            fb_adj = {"num_steps": bwd_num_steps}
        else:
            fb_adj = {k: v for k, v in fb_options.items()
                      if k == "max_num_steps"}
            if adjoint_first_step is not None:
                fb_adj["first_step"] = adjoint_first_step
        out = _generic_adjoint(
            lambda tt, yy, pp: user_func(tt, yy, pp), y0c, t_arr,
            params=params_in, rtol=rtol, atol=atol, method=method,
            options=fb_options or None, adjoint_rtol=adjoint_rtol,
            adjoint_atol=adjoint_atol, adjoint_method=adjoint_method,
            adjoint_options=fb_adj or None,
            adjoint_seminorm=adjoint_seminorm, nfe_meter=nfe_meter,
            return_stats=return_stats)
        if squeeze:
            if return_stats:
                return out[0][:, 0], out[1]
            return out[:, 0]
        return out

    # Build the plan with params live: under jax.grad, consts are tracers
    # of the params leaves (or functions of them), so the packed-const
    # cotangents returned below chain back through this very trace.
    plan, consts = jb.build_plan(
        lambda tt, yy: user_func(tt, yy, params_in), t_arr[0], y0c,
        matmul=matmul)
    check_plan_adjoint(plan)
    if per_sample and plan.batch_coupled:
        raise jb.FusionError(
            "per_sample=True with batch-coupled dynamics (a bsum makes "
            "lanes interdependent; per-lane time skew would change the "
            "dynamics)")
    if n_blocks > 1 and any(
            l[0] in ("batch", "bvec") for l in plan.const_layouts):
        raise jb.FusionError(
            "per-sample consts are not block-shardable (grid programs "
            "replicate const refs); batch exceeds the VMEM budget")
    stream_traj = False
    if plan.batch_coupled:
        # The unpacked-budget check applies in interpret mode too, so CPU
        # tests exercise the same routing the chip takes.
        over_unpacked = _fused_vmem_bytes(
            T_out, D, B_user, 4, kpack=1) > _VMEM_BUDGET
        if n_blocks > 1 or over_unpacked:
            if fixed_fwd or fixed_bwd:
                raise jb.FusionError(
                    "batch-coupled training past the VMEM budget streams "
                    "the trajectory through HBM, which only the "
                    "adaptive-RK kernels implement")
            # Round-4 verdict item 7 (training side): a bsum cannot be
            # grid-blocked (per-block controllers = a different ODE), so
            # keep ONE controller in both sweeps and stream the [T, D, B]
            # trajectory through HBM — forward rows DMA out
            # (plan_solve stream_out), backward ys/g rows DMA in
            # (plan_adjoint_solve stream_io). Undo the wrap-pad
            # (replicated samples would shift the global bsum).
            # Liveness model: the streamed BACKWARD sweep keeps ~69 live
            # [D, B] buffers at peak (measured 72.08 MB at D=2 B=131072:
            # ky/kay stage chains + the plan re-walk + VJP temps); its
            # launch raises the scoped limit to 100 MB, so cap B where
            # that still fits (with headroom for plan-dependent temps).
            state_bytes = 4 * D * B_user * 72
            if state_bytes > 96 * 1024 * 1024:
                raise jb.FusionError(
                    "batch-coupled training: the streamed sweep's [D, B] "
                    "stage liveness exceeds the raised scoped-VMEM "
                    "ceiling")
            if B != B_user:
                y0c = y0c[:B_user]
                B = y0c.shape[0]
                plan, consts = jb.build_plan(
                    lambda tt, yy: user_func(tt, yy, params_in),
                    t_arr[0], y0c, matmul=matmul)
            n_blocks = 1
            stream_traj = True
    if (not stream_traj) and _single_block_over_budget():
        return _generic_fallback()
    if (not interp_flag and n_blocks == 1 and _adj_k > 1
            and any(l[0] in ("batch", "bvec") for l in plan.const_layouts)
            and _fused_vmem_bytes(T_out, D, B, 4, kpack=1) > _VMEM_BUDGET):
        # The packed-layout threshold passed, but per-sample consts force
        # the backward sweep to run UNPACKED (up to 4x the modeled VMEM).
        # FusionError routes back to the generic adjoint at the dispatcher.
        raise jb.FusionError(
            "per-sample consts force the unpacked adjoint layout, whose "
            "ys+g buffers exceed the fused kernel's VMEM budget")
    BP = _round_up(max(B, _LANE), _LANE)
    packed = tuple(jb.pack_consts(plan, consts, dtype, BP))
    # Sublane-pack the FORWARD solve for narrow states (the backward
    # adjoint kernel packs on its own). Safe only without per-sample
    # consts: their packed layout is lane-width-dependent, and the
    # per-group RHS walk doesn't slice them.
    kpack = 1
    Bb_f = B // n_blocks
    if not per_sample and not plan.batch_coupled and not any(
            l[0] in ("batch", "bvec") for l in plan.const_layouts):
        kpack = _pk.pick_pack(D, Bb_f)
        if n_blocks > 1 and (Bb_f // kpack) % _LANE:
            kpack = 1
    Lb_f = Bb_f // kpack           # per-block lane count (forward)
    Bk = n_blocks * Lb_f           # total lanes (forward)
    BPk = _round_up(max(Lb_f, _LANE), _LANE) if n_blocks == 1 else Lb_f

    def _f_eval(packed_, tt, yT):
        """Plan RHS at TRUE batch lanes (pads to BP for bvec/batch consts,
        slices back)."""
        yp = jnp.pad(yT, ((0, 0), (0, BP - B))) if BP != B else yT
        return jb.eval_plan_xla(plan, packed_, tt, yp)[:, :B]

    def _fwd_solve(packed_, y0_, t_):
        sign = jnp.where(t_[-1] >= t_[0], 1.0, -1.0).astype(dtype)
        tau = sign * t_
        yT = y0_.T
        f0 = (sign * _f_eval(packed_, t_[0], yT)).astype(dtype)
        if fixed_fwd:
            dt0, extra_nfe = None, 0
        elif first_step is None:
            def flat_g(s, yf):
                yb = yf.reshape(D, B)
                return (sign * _f_eval(packed_, sign * s, yb)).ravel()

            dt0 = select_initial_step(
                flat_g, tau[0], yT.ravel(), f0.ravel(),
                tableaus.TABLEAUS_BY_NAME[method].order - 1,
                jnp.asarray(rtol, dtype), jnp.asarray(atol, dtype))
            extra_nfe = 2
        else:
            dt0 = jnp.abs(jnp.asarray(first_step, dtype))
            extra_nfe = 1
        yTk = (_pk.pack_state_blocks(yT, kpack, n_blocks)
               if kpack > 1 else yT)
        f0k = (_pk.pack_state_blocks(f0, kpack, n_blocks)
               if kpack > 1 else f0)
        pad_f = n_blocks * BPk - yTk.shape[1]
        y0p = jnp.pad(yTk, ((0, 0), (0, pad_f))) if pad_f else yTk
        f0p = jnp.pad(f0k, ((0, 0), (0, pad_f))) if pad_f else f0k
        if fixed_fwd:
            grid = _fixed_grid_tau(tau, t_, num_steps, step_size, dtype)
            out, stats = _pf.plan_solve_fixed(
                plan, packed_, y0p, tau, grid, sign, f0p, method=method,
                interpret=interp_flag, pack=kpack, n_blocks=n_blocks)
            if n_blocks > 1:
                # Same fixed grid per block: stats block-count-invariant.
                stats = _merge_grid_stats(stats, per_block_work=False)
        elif per_sample:
            out, stats, _lane = jb.plan_solve(
                plan, packed_, y0p, tau, dt0, rtol, atol, sign, f0p,
                method=method, max_steps=max_steps, interpret=interp_flag,
                per_sample=True)
        else:
            out, stats = jb.plan_solve(
                plan, packed_, y0p, tau, dt0, rtol, atol, sign, f0p,
                method=method, max_steps=max_steps, interpret=interp_flag,
                pack=kpack, n_blocks=n_blocks, stream_out=stream_traj)
            if n_blocks > 1:
                stats = _merge_grid_stats(stats, per_block_work=True)
        if out.shape[-1] != Bk:
            out = out[:, :, :Lb_f]
        if kpack > 1:
            out = _pk.unpack_state_blocks(out, kpack, D, n_blocks)
        ys = jnp.transpose(out, (0, 2, 1))                  # [T, B, D]
        st = (stats[0] + extra_nfe, stats[1], stats[2], stats[3])
        emit_fwd(nfe_meter, st[0], st[1])
        return ys, st

    @jax.custom_vjp
    def _run(packed_, y0_, t_):
        return _fwd_solve(packed_, y0_, t_)

    def _vjp_fwd(packed_, y0_, t_):
        ys, stats = _fwd_solve(packed_, y0_, t_)
        return (ys, stats), (ys, packed_, t_)

    def _vjp_bwd(res, cot):
        ys, packed_, t_ = res
        g, _ = cot                      # stats cotangents: symbolic zeros
        t_ = jnp.asarray(t_)
        T = t_.shape[0]

        # d loss / d t_i = dot(f(t_i, y_i), g_i); ts_bar[0] additionally
        # carries the integrated a_t quadrature (zero for autonomous
        # plans), matching adjoint.py's scan recipe.
        f_obs = jax.vmap(
            lambda ti, yi: _f_eval(packed_, ti, yi.T).T)(t_, ys)
        t_bars = jnp.sum(f_obs * g, axis=(1, 2)).astype(t_.dtype)

        sign = jnp.where(t_[-1] >= t_[0], 1.0, -1.0).astype(dtype)
        tau = (sign * t_).astype(dtype)
        ysT = jnp.transpose(ys, (0, 2, 1)).astype(dtype)    # [T, D, B]
        gT = jnp.transpose(g, (0, 2, 1)).astype(dtype)

        if adjoint_first_step is not None:
            dt0 = jnp.abs(jnp.asarray(adjoint_first_step, dtype))
        else:
            dt0 = 0.1 * jnp.abs(tau[-1] - tau[-2]).astype(dtype)

        if fixed_bwd:
            ay0, dconsts, at_q, bstats = _pf.plan_adjoint_solve_fixed(
                plan, packed_, ysT, gT, tau, sign,
                num_steps=bwd_num_steps, method=adjoint_method,
                interpret=interp_flag, n_blocks=n_blocks)
        else:
            ay0, dconsts, at_q, bstats = plan_adjoint_solve(
                plan, packed_, ysT, gT, tau, dt0, adjoint_rtol,
                adjoint_atol, sign, method=adjoint_method,
                max_steps=max_steps, seminorm=adjoint_seminorm,
                interpret=interp_flag, n_blocks=n_blocks,
                stream_io=stream_traj)
        emit_bwd(nfe_meter, bstats[0], bstats[1])
        ts_bar = jnp.concatenate(
            [(at_q.astype(t_.dtype) - jnp.sum(t_bars[1:]))[None],
             t_bars[1:]])

        # Backward-sweep failure (dt underflow / max_num_steps): NaN-poison
        # every gradient — a truncated sweep would otherwise return a
        # partial adjoint plus raw unintegrated cotangents.
        bad = bstats[3] != 0

        def _loud(x):
            return jnp.where(bad, jnp.asarray(jnp.nan, x.dtype), x)

        return (tuple(_loud(dc) for dc in dconsts),
                _loud(ay0.T.astype(ys.dtype)),
                _loud(ts_bar.astype(t_.dtype)))

    _run.defvjp(_vjp_fwd, _vjp_bwd)
    ys, stats = _run(packed, y0c, t_arr)
    if n_blocks > 1:
        # Slice off the wrap-pad rows; the slice's transpose seeds their
        # cotangents with exact zeros, so pad samples never contribute.
        ys = ys[:, :B_user]
    if squeeze:
        ys = ys[:, 0]
    if return_stats:
        return ys, _Stats(*stats)
    return ys


def solve_mlp_global_sharded(params: dict, y0: Array, t, mesh, *,
                             axis: str = "data", rtol=1e-6, atol=1e-8,
                             tile_b: int = 512,
                             interpret: Optional[bool] = None,
                             max_num_steps=None,
                             first_step=None) -> SolveResult:
    """GLOBALLY-COUPLED data-parallel fused solve: per-shard fused step
    kernels with the error norm all-reduced (`psum`) over ICI each attempt,
    so all shards share one step-size controller and take the SAME
    accept/reject sequence a single device would — unlike
    `solve_mlp_sharded`, whose shards control their own steps.

    Cost model: one scalar psum per attempt rides ICI latency (~µs); use
    this when cross-shard reproducibility of the step sequence matters
    more than the last bit of throughput.
    """
    from jax.sharding import PartitionSpec as P

    y0 = jnp.asarray(y0)
    n_shards = mesh.shape[axis]
    if y0.shape[0] % n_shards:
        raise ValueError(f"batch {y0.shape[0]} not divisible by mesh axis "
                         f"'{axis}' size {n_shards}")
    gb = y0.shape[0]

    # first_step must be supplied or derived from GLOBAL data; the HNW
    # heuristic inside each shard would see only local rows and disagree.
    if first_step is None:
        from .ops.norms import select_initial_step
        dtype = y0.dtype
        yT = y0.T
        f0 = mlp_f(params, yT)
        flat_f = lambda tt, yf: mlp_f(params, yf.reshape(yT.shape)).ravel()
        first_step = select_initial_step(
            flat_f, jnp.asarray(t)[0].astype(dtype), yT.ravel(), f0.ravel(),
            4, jnp.asarray(rtol, dtype), jnp.asarray(atol, dtype))

    def local_solve(y_shard):
        r = solve_mlp_stepwise(params, y_shard, t, rtol=rtol, atol=atol,
                               tile_b=tile_b, interpret=interpret,
                               max_num_steps=max_num_steps,
                               first_step=first_step, axis_name=axis,
                               global_batch=gb)
        return r.ys, jnp.stack([r.stats.nfe, r.stats.n_accepted,
                                r.stats.n_rejected, r.stats.status])

    try:
        ys, st = jax.shard_map(
            local_solve, mesh=mesh, in_specs=P(axis),
            out_specs=(P(None, axis), P(None)), check_vma=False)(y0)
    except (AttributeError, TypeError):
        from jax.experimental.shard_map import shard_map as _sm
        ys, st = _sm(local_solve, mesh=mesh, in_specs=P(axis),
                     out_specs=(P(None, axis), P(None)),
                     check_rep=False)(y0)
    stats = SolverStats(st[0], st[1], st[2], st[3])
    return SolveResult(ys, stats)


def solve_mlp_sharded(params: dict, y0: Array, t, mesh, *, axis: str = "data",
                      rtol=1e-6, atol=1e-8, method: str = "dopri5",
                      interpret: Optional[bool] = None,
                      max_num_steps=None, first_step=None) -> SolveResult:
    """Data-parallel whole-solve kernel over a device mesh.

    Each shard of the batch runs its OWN in-kernel adaptive solve
    (per-shard step-size control — the multi-chip analogue of per-sample
    vmap stepping; no per-step cross-chip collectives ride ICI, which is
    what makes the fused kernel scale linearly). For globally-coupled error
    control use the generic `odeint` under jit with a sharded batch, where
    XLA all-reduces the error norm automatically.

    Stats are aggregated across shards: nfe/accepted/rejected are summed,
    status is the max (any shard's failure surfaces).
    """
    from jax.sharding import PartitionSpec as P

    y0 = jnp.asarray(y0)
    n_shards = mesh.shape[axis]
    if y0.shape[0] % n_shards:
        raise ValueError(f"batch {y0.shape[0]} not divisible by mesh axis "
                         f"'{axis}' size {n_shards}")

    def local_solve(y_shard):
        r = solve_mlp(params, y_shard, t, rtol=rtol, atol=atol,
                      method=method, interpret=interpret,
                      max_num_steps=max_num_steps, first_step=first_step)
        return r.ys, jnp.stack([r.stats.nfe, r.stats.n_accepted,
                                r.stats.n_rejected, r.stats.status])

    # check_vma=False: the pallas_call inside carries no replication-rule
    # annotations (every shard runs an independent kernel instance).
    try:
        ys, st = jax.shard_map(
            local_solve, mesh=mesh, in_specs=P(axis),
            out_specs=(P(None, axis), P(axis)), check_vma=False)(y0)
    except (AttributeError, TypeError):
        # Older jax: only the experimental entry point exists.
        from jax.experimental.shard_map import shard_map as _sm
        ys, st = _sm(local_solve, mesh=mesh, in_specs=P(axis),
                     out_specs=(P(None, axis), P(axis)),
                     check_rep=False)(y0)
    st = st.reshape(n_shards, 4)
    stats = SolverStats(st[:, 0].sum(), st[:, 1].sum(), st[:, 2].sum(),
                        st[:, 3].max())
    return SolveResult(ys, stats)


def _shard_call(fn, mesh, in_specs, out_specs):
    """`jax.shard_map` with the pre-0.8 experimental fallback; replication
    checking off (pallas_call carries no replication-rule annotations)."""
    try:
        return jax.shard_map(fn, mesh=mesh, in_specs=in_specs,
                             out_specs=out_specs, check_vma=False)
    except (AttributeError, TypeError):
        from jax.experimental.shard_map import shard_map as _sm
        return _sm(fn, mesh=mesh, in_specs=in_specs, out_specs=out_specs,
                   check_rep=False)


def solve_fused_sharded(func, y0: Array, t, mesh, *, axis: str = "data",
                        rtol=1e-6, atol=1e-8, method: str = "dopri5",
                        interpret: Optional[bool] = None,
                        max_num_steps=None, first_step=None,
                        matmul: str = "auto", num_steps=None,
                        step_size=None, max_order: Optional[int] = None,
                        max_iters: int = 4) -> SolveResult:
    """Data-parallel PLAN-DRIVEN whole-solve kernel over a device mesh:
    the sharded counterpart of `solve_fused` — arbitrary plain-jnp
    dynamics in the jaxpr-bridge subset, one kernel per shard, per-shard
    step-size control (the multi-chip analogue of per-sample vmap
    stepping; no per-step collectives ride ICI).

    Closed-over weights are replicated by closure; per-sample ('batch' /
    'bvec' layout) constants must be pre-sharded by the caller or the
    plan's batch check fails. Stats aggregate as in `solve_mlp_sharded`:
    nfe/accepted/rejected summed, status maxed.
    """
    from jax.sharding import PartitionSpec as P

    y0 = jnp.asarray(y0)
    n_shards = mesh.shape[axis]
    if y0.ndim != 2:
        raise ValueError("solve_fused_sharded needs a batched [B, D] y0")
    if y0.shape[0] % n_shards:
        raise ValueError(f"batch {y0.shape[0]} not divisible by mesh axis "
                         f"'{axis}' size {n_shards}")

    def local_solve(y_shard):
        r = solve_fused(func, y_shard, t, rtol=rtol, atol=atol,
                        method=method, interpret=interpret,
                        max_num_steps=max_num_steps,
                        first_step=first_step, matmul=matmul,
                        num_steps=num_steps, step_size=step_size,
                        max_order=max_order, max_iters=max_iters)
        return r.ys, jnp.stack([r.stats.nfe, r.stats.n_accepted,
                                r.stats.n_rejected, r.stats.status])

    ys, st = _shard_call(local_solve, mesh, P(axis),
                         (P(None, axis), P(axis)))(y0)
    st = st.reshape(n_shards, 4)
    stats = SolverStats(st[:, 0].sum(), st[:, 1].sum(), st[:, 2].sum(),
                        st[:, 3].max())
    return SolveResult(ys, stats)


def odeint_adjoint_fused_sharded(func, y0: Array, t, mesh, *,
                                 axis: str = "data", params=None, **kw):
    """Data-parallel two-kernel TRAINING over a device mesh: shards the
    batch, replicates `params`, and runs `odeint_adjoint_fused` (plan
    forward kernel + in-kernel adjoint sweep) independently per shard.

    Differentiable wrt params, y0, and t: `jax.shard_map`'s transpose
    turns the replicated-params broadcast into a `psum` over ICI, so
    jax.grad of a global loss yields exact summed weight cotangents — the
    standard DP gradient all-reduce, generated by the sharding transform
    rather than hand-written collectives. Per-shard backward step control
    (each shard's adjoint solve is independent).

    `return_stats` / `nfe_meter` are not supported here (host streaming
    from inside shard_map is shard-local); use the unsharded front-end to
    observe NFE.
    """
    from jax.sharding import PartitionSpec as P

    if kw.get("return_stats") or kw.get("nfe_meter") is not None:
        raise ValueError("return_stats/nfe_meter are unsupported in the "
                         "sharded fused adjoint; use odeint_adjoint_fused")
    kw.pop("return_stats", None)
    kw.pop("nfe_meter", None)

    y0 = jnp.asarray(y0)
    n_shards = mesh.shape[axis]
    if y0.ndim != 2:
        raise ValueError("odeint_adjoint_fused_sharded needs a batched "
                         "[B, D] y0")
    if y0.shape[0] % n_shards:
        raise ValueError(f"batch {y0.shape[0]} not divisible by mesh axis "
                         f"'{axis}' size {n_shards}")
    t_arr = jnp.asarray(t)

    def local(y_shard, t_, p):
        return odeint_adjoint_fused(func, y_shard, t_, params=p, **kw)

    return _shard_call(local, mesh, (P(axis), P(), P()),
                       P(None, axis))(y0, t_arr, params)


# ---------------------------------------------------------------------------
# Fused continuous normalizing flows (FFJORD inference tier)
# ---------------------------------------------------------------------------

def _cnf_forward_solve(spec, weights, z0: Array, l0: Array, t, rtol, atol,
                       method: str, interpret_flag: bool, max_num_steps,
                       first_step):
    """Shared fused CNF forward: one whole-solve kernel over the augmented
    feature-major state [z (D rows); logp]. Returns (out [T, D+1, B],
    stats [4] int32, extra_nfe)."""
    from .models.cnf import augmented_dynamics

    B, D = z0.shape
    dtype = z0.dtype
    t = jnp.asarray(t, dtype)
    sign = jnp.where(t[-1] >= t[0], 1.0, -1.0).astype(dtype)
    tau = sign * t
    state0 = jnp.concatenate([z0.T, l0[None, :]], axis=0)

    # f0 + initial step via the XLA reference of the augmented dynamics.
    aug = augmented_dynamics(
        lambda tt, zb: mlp_apply(spec, weights, zb, tt), trace="exact")

    def aug_fm(tt, s):                       # feature-major [D+1, B]
        dz, dl = aug(tt, (s[:D, :].T, s[D, :]))
        return jnp.concatenate([dz.T, dl[None, :]], axis=0)

    f0 = (sign * aug_fm(t[0], state0)).astype(dtype)
    if first_step is None:
        def flat_g(s, sf):
            return (sign * aug_fm(sign * s,
                                  sf.reshape(D + 1, B))).ravel()

        dt0 = select_initial_step(flat_g, tau[0], state0.ravel(),
                                  f0.ravel(),
                                  tableaus.TABLEAUS_BY_NAME[method].order - 1,
                                  jnp.asarray(rtol, dtype),
                                  jnp.asarray(atol, dtype))
        extra_nfe = 2
    else:
        dt0 = jnp.abs(jnp.asarray(first_step, dtype))
        extra_nfe = 1

    warrays, dims = pad_mlp_weights(weights, dtype)
    out, stats = mlp_solve(
        warrays, dims, state0, tau, dt0, rtol, atol, sign, f0=f0,
        activation=spec.activation, time_input=True, rhs="cnf",
        method=method,
        max_steps=(int(max_num_steps) if max_num_steps is not None
                   else 2 ** 31 - 1),
        interpret=interpret_flag)
    return out, stats, extra_nfe


def cnf_log_prob_fused(weights, x: Array, *, t0: float = 0.0,
                       t1: float = 1.0, rtol: float = 1e-5,
                       atol: float = 1e-7, activation: str = "tanh",
                       method: str = "dopri5",
                       interpret: Optional[bool] = None,
                       max_num_steps=None, first_step=None):
    """log p(x) under a concat-t MLP flow, fully fused: the ENTIRE
    augmented solve — flow field, EXACT divergence (D in-kernel
    forward-mode passes), adaptive stepping, log-det quadrature — is ONE
    Pallas kernel launch (`ops/pallas_kernels._make_cnf_net`).

    weights: [(W, b), ...] with the FIRST layer taking D+1 inputs, time
    LAST (the `models.cnf.CNFDynamics` convention;
    `weights_from_flax_dense` extracts them). Matches
    `models.cnf.log_prob(trace='exact')` to solve tolerance.

    Inference tier (forward only): train with `models.cnf.log_prob`
    (differentiable bounded loop), serve/evaluate densities here.
    Returns (logp [B], SolverStats).
    """
    from .models.cnf import augmented_dynamics
    from .solvers.base import SolverStats as _Stats

    interpret_flag = _auto_interpret(interpret)
    x = jnp.asarray(x)
    B, D = x.shape
    dtype = x.dtype
    spec = MLPSpec(activation=activation, time_input=True)
    if weights[0][0].shape[0] != D + 1:
        raise ValueError(
            f"first-layer input dim {weights[0][0].shape[0]} != D+1 = "
            f"{D + 1} (concat-t convention, time last)")

    if (not interpret_flag
            and _fused_vmem_bytes(2, D + 1, B, 2) > _VMEM_BUDGET):
        import warnings
        warnings.warn("cnf_log_prob_fused: batch exceeds the kernel's "
                      "VMEM budget; falling back to models.cnf.log_prob",
                      stacklevel=2)
        from .models.cnf import log_prob as _generic_log_prob
        lp = _generic_log_prob(
            lambda tt, zz: mlp_apply(spec, weights, zz, tt), x,
            t0=t0, t1=t1, rtol=rtol, atol=atol, trace="exact",
            method=method, options={"loop": "while"})
        z = jnp.asarray(0, jnp.int32)
        from .solvers.base import SolverStats as _S
        return lp, _S(z, z, z, z)

    # Integrate (x, 0) BACKWARD from t1 to t0 (models/cnf.log_prob).
    t = jnp.asarray([t1, t0], dtype)
    out, stats, extra_nfe = _cnf_forward_solve(
        spec, weights, x, jnp.zeros(B, dtype), t, rtol, atol, method,
        interpret_flag, max_num_steps, first_step)
    z_base = out[-1, :D, :]                   # [D, B]
    dlog = out[-1, D, :]                      # [B]
    logp_base = (-0.5 * jnp.sum(z_base ** 2, axis=0)
                 - 0.5 * D * jnp.log(2.0 * jnp.pi).astype(dtype))
    st = _Stats(stats[0] + extra_nfe, stats[1], stats[2], stats[3])
    return logp_base - dlog, st


def cnf_sample_fused(weights, key, n: int, dim: int, *, t0: float = 0.0,
                     t1: float = 1.0, rtol: float = 1e-5, atol: float = 1e-7,
                     activation: str = "tanh", method: str = "dopri5",
                     interpret: Optional[bool] = None,
                     max_num_steps=None) -> Array:
    """Draw flow samples with the whole forward solve as one fused kernel
    (fused counterpart of `models.cnf.sample`)."""
    z = jax.random.normal(key, (n, dim))
    spec = MLPSpec(activation=activation, time_input=True)
    t = jnp.asarray([t0, t1], z.dtype)
    res = solve_mlp_spec(spec, weights, z, t, rtol=rtol, atol=atol,
                         method=method, interpret=interpret,
                         max_num_steps=max_num_steps)
    return res.ys[-1]


def solve_conv_ode(variables, x: Array, t, *, groups: int = 32,
                   rtol=1e-3, atol=1e-3, method: str = "dopri5",
                   interpret: Optional[bool] = None, max_num_steps=None,
                   first_step=None) -> SolveResult:
    """Whole-solve fused adaptive RK for the CONV ODE dynamics — the MNIST
    `ODEBlock`'s GN -> relu -> ConcatConv3x3 -> GN -> relu -> ConcatConv3x3
    -> GN field (reference `examples/odenet_mnist.py` ODEfunc,
    SURVEY.md:104) — as ONE Pallas kernel launch (ops/pallas_conv.py:
    convs = 9 masked lane-rolls + MXU dots, GroupNorm = reduce/spread
    dots; inference tier, like the fused CNF).

    variables: flax `ODEConvFunc` variables (models/odenet.py) or the
    pre-extracted {'gn': ..., 'conv': ...} dict. x: [B, H, W, C]; t may
    increase or decrease. Returns ys [T, B, H, W, C] + stats.
    """
    from .ops import conv_ode as co
    from .ops.pallas_conv import conv_solve, pack_conv_ode_inputs

    x = jnp.asarray(x)
    if x.ndim != 4:
        raise ValueError(f"x must be [B, H, W, C], got {x.shape}")
    B, H, W, C = x.shape
    spec = co.ConvODESpec(height=H, width=W, channels=C, groups=groups)
    if C % groups:
        raise ValueError(f"channels {C} not divisible by groups {groups}")
    params = (variables if isinstance(variables, dict)
              and "gn" in variables else co.conv_params_from_flax(variables))
    interp_flag = _auto_interpret(interpret)
    dtype = jnp.float32
    x = x.astype(dtype)

    t = jnp.asarray(t, dtype)
    if t.ndim != 1:
        raise ValueError("t must be 1-D")
    if not isinstance(t, jax.core.Tracer):
        tv = np.asarray(t)
        if tv.shape[0] > 1 and not (np.all(np.diff(tv) > 0)
                                    or np.all(np.diff(tv) < 0)):
            raise ValueError("t must be strictly monotonic")
    if t.shape[0] == 1:
        z = jnp.asarray(0, jnp.int32)
        return SolveResult(x[None], SolverStats(z, z, z, z))

    # Mosaic scoped-VMEM model (measured on v5e: the solver body keeps
    # ~60 [C, NP] blocks live — k-stages, conv/GN temporaries, interp
    # coeffs — 25.2 MiB at C=64, NP=1664) plus the [T, C, NP] trajectory.
    # Batches larger than the biggest fitting block are auto-chunked:
    # lax.map over fused per-block solves in ONE dispatch (independent
    # per-block step control, like solve_mlp_sharded's per-shard
    # semantics; stats summed, status = max).
    from .ops.pallas_kernels import _LANE
    T_out = int(t.shape[0])

    # Largest block whose lane-padded [C, NP] footprint fits the stack
    # budget, in closed form: round_up(b*positions, LANE) <= cap  <=>
    # b*positions <= floor(cap/LANE)*LANE (the former O(B) linear decrement
    # was Python work per trace).
    cap = _CONV_STACK_BUDGET // (4 * (_CONV_STACK_BLOCKS + T_out) * C)
    b_max = (cap // _LANE) * _LANE // spec.positions
    b_chunk = max(min(B, b_max), 0)
    if b_chunk < 1:
        import warnings
        warnings.warn(
            "solve_conv_ode: even a single-sample block exceeds the "
            "kernel's VMEM budget (huge T or C); falling back to the "
            "generic while-loop engine", stacklevel=2)
        from .odeint import solve as _solve
        return _solve(lambda tt, yy: co.conv_ode_apply(params, tt, yy,
                                                       spec),
                      x, t, rtol=rtol, atol=atol, method=method,
                      options={"loop": "while",
                               **({"max_num_steps": max_num_steps}
                                  if max_num_steps is not None else {}),
                               **({"first_step": first_step}
                                  if first_step is not None else {})})
    # Batches beyond the per-block budget run as n_blocks sequential GRID
    # programs inside ONE kernel launch (per-block state/controller, shared
    # weights) — `conv_solve(n_blocks=...)`; replaces the round-2 lax.map
    # over separate launches whose per-dispatch overhead made `--fused`
    # training lose at B=128.
    n_blocks = -(-B // b_chunk)
    b_blk = b_chunk
    pad_b = n_blocks * b_blk - B
    xp = jnp.pad(x, ((0, pad_b), (0, 0), (0, 0), (0, 0)))
    order = tableaus.TABLEAUS_BY_NAME[method].order

    sign = jnp.where(t[-1] >= t[0], 1.0, -1.0).astype(dtype)
    tau = sign * t
    ref_f = co.make_conv_ode_f(params, b_blk, spec, dtype)
    N_blk = b_blk * spec.positions
    xb = xp.reshape(n_blocks, b_blk, H, W, C)
    xf_b = jax.vmap(lambda xi: co.to_feature_major(xi, spec))(xb)
    f0_b = jax.vmap(lambda xi: (sign * ref_f(t[0], xi)).astype(dtype))(xf_b)

    if first_step is None:
        # Per-block HNW initial step (each grid program keeps independent
        # step control, matching the former per-launch behavior).
        def blk_dt0(xfi, f0i):
            def flat_g(s, yflat):
                y = yflat.reshape(C, N_blk)
                return (sign * ref_f(sign * s, y)).ravel().astype(dtype)

            return select_initial_step(flat_g, tau[0], xfi.ravel(),
                                       f0i.ravel(), order - 1,
                                       jnp.asarray(rtol, dtype),
                                       jnp.asarray(atol, dtype))

        dt0 = jax.vmap(blk_dt0)(xf_b, f0_b)             # [n_blocks]
        extra_nfe = 2
    else:
        dt0 = jnp.abs(jnp.asarray(first_step, dtype))
        extra_nfe = 1

    warrays, NP = pack_conv_ode_inputs(params, b_blk, spec, dtype)
    padded = jnp.pad(xf_b, ((0, 0), (0, 0), (0, NP - N_blk)))
    y0p = jnp.concatenate(list(padded), axis=1)        # [C, nb*NP]
    f0p = jnp.concatenate(
        list(jnp.pad(f0_b, ((0, 0), (0, 0), (0, NP - N_blk)))), axis=1)

    out, stats = conv_solve(
        warrays, spec, y0p, tau, dt0, rtol, atol, sign, f0p,
        method=method,
        max_steps=(int(max_num_steps) if max_num_steps is not None
                   else 2 ** 31 - 1),
        n_blocks=n_blocks, interpret=interp_flag)
    if n_blocks > 1:
        out_b = out.reshape(T_out, C, n_blocks, NP).transpose(2, 0, 1, 3)
        ys_b = jax.vmap(jax.vmap(
            lambda o: co.from_feature_major(o[:, :N_blk], b_blk, spec)))(
                out_b)                                  # [nb, T, b, H, W, C]
        ys = jnp.moveaxis(ys_b, 0, 1).reshape(
            T_out, n_blocks * b_blk, H, W, C)[:, :B]
        st = SolverStats(jnp.sum(stats[:, 0]) + extra_nfe,
                         jnp.sum(stats[:, 1]), jnp.sum(stats[:, 2]),
                         jnp.max(stats[:, 3]))
    else:
        ys = jax.vmap(
            lambda o: co.from_feature_major(o[:, :N_blk], b_blk, spec))(out)
        st = SolverStats(stats[0] + extra_nfe, stats[1], stats[2],
                         stats[3])
    return SolveResult(ys, st)


def solve_conv_ode_sharded(variables, x: Array, t, mesh, *,
                           axis: str = "data", groups: int = 32,
                           rtol=1e-3, atol=1e-3, method: str = "dopri5",
                           interpret: Optional[bool] = None,
                           max_num_steps=None,
                           first_step=None) -> SolveResult:
    """Data-parallel fused conv-ODE solve over a device mesh: each batch
    shard runs its own `solve_conv_ode` (per-shard step control, auto
    block-chunking inside the shard, zero per-step collectives — same
    contract as `solve_mlp_sharded`). Stats: nfe/accepted/rejected summed,
    status = max."""
    from jax.sharding import PartitionSpec as P

    x = jnp.asarray(x)
    if x.ndim != 4:
        raise ValueError(f"x must be [B, H, W, C], got {x.shape}")
    n_shards = mesh.shape[axis]
    if x.shape[0] % n_shards:
        raise ValueError(f"batch {x.shape[0]} not divisible by mesh axis "
                         f"'{axis}' size {n_shards}")
    from .ops import conv_ode as co
    params = (variables if isinstance(variables, dict)
              and "gn" in variables else co.conv_params_from_flax(variables))

    def local_solve(x_shard):
        r = solve_conv_ode(params, x_shard, t, groups=groups, rtol=rtol,
                           atol=atol, method=method, interpret=interpret,
                           max_num_steps=max_num_steps,
                           first_step=first_step)
        return r.ys, jnp.stack([r.stats.nfe, r.stats.n_accepted,
                                r.stats.n_rejected, r.stats.status])

    try:
        ys, st = jax.shard_map(
            local_solve, mesh=mesh, in_specs=P(axis),
            out_specs=(P(None, axis), P(axis)), check_vma=False)(x)
    except (AttributeError, TypeError):
        from jax.experimental.shard_map import shard_map as _sm
        ys, st = _sm(local_solve, mesh=mesh, in_specs=P(axis),
                     out_specs=(P(None, axis), P(axis)),
                     check_rep=False)(x)
    st = st.reshape(n_shards, 4)
    stats = SolverStats(st[:, 0].sum(), st[:, 1].sum(), st[:, 2].sum(),
                        st[:, 3].max())
    return SolveResult(ys, stats)


def cnf_log_prob_train(weights, x: Array, *, t0: float = 0.0,
                       t1: float = 1.0, rtol: float = 1e-5,
                       atol: float = 1e-7, activation: str = "tanh",
                       method: str = "dopri5",
                       adjoint_rtol=None, adjoint_atol=None,
                       adjoint_seminorm: bool = False,
                       interpret: Optional[bool] = None,
                       max_num_steps=None, first_step=None,
                       nfe_meter=None) -> Array:
    """O(1)-memory DIFFERENTIABLE FFJORD density: the forward augmented
    solve (flow + exact in-kernel divergence + log-det quadrature) runs as
    ONE Pallas kernel via `odeint_adjoint`'s forward_solver hook; the
    backward pass is the generic continuous-adjoint sweep with exact-trace
    VJPs. Gradients flow to `weights` and `x`.

    Same weight convention as `cnf_log_prob_fused` (concat-t MLP, time
    last). Use `cnf_log_prob_fused` for pure inference (cheaper: no
    custom_vjp machinery), `models.cnf.log_prob` for the all-generic
    differentiable bounded loop.
    """
    from .adjoint import odeint_adjoint
    from .models.cnf import augmented_dynamics

    x = jnp.asarray(x)
    B, D = x.shape
    dtype = x.dtype
    spec = MLPSpec(activation=activation, time_input=True)
    if weights[0][0].shape[0] != D + 1:
        raise ValueError(
            f"first-layer input dim {weights[0][0].shape[0]} != D+1 = "
            f"{D + 1} (concat-t convention, time last)")
    weights = tuple((W, b) for W, b in weights)
    interpret_flag = _auto_interpret(interpret)
    t = jnp.asarray([t1, t0], dtype)

    def f_aug(tt, state, w):
        aug = augmented_dynamics(
            lambda a, zz: mlp_apply(spec, w, zz, a), trace="exact")
        return aug(tt, state)

    adjoint_rtol_ = rtol if adjoint_rtol is None else adjoint_rtol
    adjoint_atol_ = atol if adjoint_atol is None else adjoint_atol
    max_steps = (int(max_num_steps) if max_num_steps is not None
                 else 2 ** 31 - 1)

    # Big batches fall back to the generic engine for BOTH directions
    # (the forward/backward kernels hold [T, D+1, B] trajectories in
    # VMEM).
    if (not interpret_flag
            and _fused_vmem_bytes(2, D + 1, B, 2) > _VMEM_BUDGET):
        import warnings
        warnings.warn(
            "cnf_log_prob_train: batch exceeds the fused kernels' VMEM "
            "budget; running the generic engine", stacklevel=2)
        fwd_opts = {
            **({"max_num_steps": int(max_num_steps)}
               if max_num_steps is not None else {}),
            **({"first_step": first_step}
               if first_step is not None else {})} or None
        adj_opts = ({"max_num_steps": int(max_num_steps)}
                    if max_num_steps is not None else None)
        state0 = (x, jnp.zeros(B, dtype))
        zs, dlogs = odeint_adjoint(
            f_aug, state0, t, params=weights, rtol=rtol, atol=atol,
            method=method, options=fwd_opts, adjoint_rtol=adjoint_rtol,
            adjoint_atol=adjoint_atol, adjoint_options=adj_opts,
            adjoint_seminorm=adjoint_seminorm, nfe_meter=nfe_meter)
        z_base, dlog = zs[-1], dlogs[-1]
        logp_base = (-0.5 * jnp.sum(z_base ** 2, axis=-1)
                     - 0.5 * D * jnp.log(2.0 * jnp.pi).astype(dtype))
        return logp_base - dlog

    # Mosaic-stack model for the CNF ADJOINT kernel (measured v5e: ~50
    # live [H, B] blocks at depth-3/width-32 -> 25.5 MiB at B=4096 vs the
    # 16 MiB limit): chunk the batch so each two-kernel call fits. Loss
    # terms are per-sample, so chunked log-probs concatenate exactly and
    # gradients are additive.
    from .ops.pallas_kernels import _LANE, _round_up as _ru
    h_maxP = max([_ru(D + 1, 8)] + [_ru(W.shape[1], 8) for W, _ in weights])
    _CNF_STACK_BLOCKS = 56
    b_max = ((_CONV_STACK_BUDGET // (4 * _CNF_STACK_BLOCKS * h_maxP))
             // _LANE) * _LANE
    if not interpret_flag and B > b_max >= _LANE:
        parts = []
        for s0 in range(0, B, b_max):
            parts.append(cnf_log_prob_train(
                weights, x[s0:s0 + b_max], t0=t0, t1=t1, rtol=rtol,
                atol=atol, activation=activation, method=method,
                adjoint_rtol=adjoint_rtol, adjoint_atol=adjoint_atol,
                adjoint_seminorm=adjoint_seminorm, interpret=interpret,
                max_num_steps=max_num_steps, first_step=first_step,
                nfe_meter=nfe_meter))
        return jnp.concatenate(parts)

    # TWO-KERNEL path: forward = one whole-solve kernel over the augmented
    # state (flow + exact in-kernel divergence); backward = ONE kernel
    # running the entire adjoint sweep of the augmented system, including
    # the divergence's second-order VJP (ops/pallas_adjoint
    # _make_cnf_aug_eval). Round-2 verdict item 4's CNF criterion.
    from .ops.pallas_adjoint import mlp_adjoint_solve
    from .utils.nfe import emit_bwd, emit_fwd

    def _fwd_solve(weights_, x_):
        out, stats, extra = _cnf_forward_solve(
            spec, weights_, x_, jnp.zeros(B, dtype), t, rtol, atol,
            method, interpret_flag, max_num_steps, first_step)
        emit_fwd(nfe_meter, stats[0] + extra, stats[1])
        return out                                 # [T, D+1, B]

    @jax.custom_vjp
    def _run(weights_, x_):
        return _fwd_solve(weights_, x_)

    def _vjp_fwd(weights_, x_):
        out = _fwd_solve(weights_, x_)
        return out, (out, weights_)

    def _vjp_bwd(res, g):
        out, weights_ = res                        # [T, D+1, B] each
        sign = jnp.asarray(-1.0, dtype)            # t = [t1, t0] decreasing
        tau = (sign * t).astype(dtype)
        dt0 = 0.1 * jnp.abs(tau[-1] - tau[-2]).astype(dtype)
        warrays, dims = pad_mlp_weights(weights_, dtype)
        ay0, aws, _at_q, bstats = mlp_adjoint_solve(
            warrays, dims, out.astype(dtype), g.astype(dtype), tau, dt0,
            adjoint_rtol_, adjoint_atol_, sign, activation=spec.activation,
            method=method, max_steps=max_steps, seminorm=adjoint_seminorm,
            rhs="cnf", interpret=interpret_flag)
        emit_bwd(nfe_meter, bstats[0], bstats[1])

        bad = bstats[3] != 0                       # NaN-poison on failure

        def _loud(v):
            return jnp.where(bad, jnp.asarray(jnp.nan, v.dtype), v)

        w_bar = []
        for (W, b), (dWp, dbp) in zip(weights_, aws):
            din, dout = W.shape
            dW = _loud(dWp[:dout, :din].T.astype(W.dtype))
            db = (_loud(dbp[:dout, 0].astype(b.dtype))
                  if b is not None else None)
            w_bar.append((dW, db))
        # ay0 = dL/d state(t1): rows [dL/dx; dL/dl0] — l0 is the constant
        # zero initializer, not an input.
        return tuple(w_bar), _loud(ay0[:D, :].T.astype(x.dtype))

    _run.defvjp(_vjp_fwd, _vjp_bwd)
    out = _run(weights, x)
    z_base = out[-1, :D, :].T                      # [B, D]
    dlog = out[-1, D, :]
    logp_base = (-0.5 * jnp.sum(z_base ** 2, axis=-1)
                 - 0.5 * D * jnp.log(2.0 * jnp.pi).astype(dtype))
    return logp_base - dlog


def cnf_log_prob_auto(flow, params, x: Array, *, t0: float = 0.0,
                      t1: float = 1.0, rtol: float = 1e-5,
                      atol: float = 1e-7, method: str = "dopri5",
                      trace: str = "exact", n_probes: int = 1,
                      key=None,
                      adjoint_rtol=None, adjoint_atol=None,
                      adjoint_seminorm: bool = False,
                      interpret: Optional[bool] = None,
                      max_num_steps=None, first_step=None,
                      matmul: str = "auto", nfe_meter=None) -> Array:
    """FFJORD log-density for an ARBITRARY plain-jnp flow, two kernels.

    flow(t, z [B, D], params) -> dz [B, D]: any dynamics in the
    jaxpr->Pallas bridge subset (ops/jaxpr_bridge.py) — NOT restricted to
    the concat-t MLP family of `cnf_log_prob_fused`. The augmented system
    (flow field + EXACT divergence via D forward-mode basis probes,
    `models.cnf.augmented_dynamics_fusable`) traces into ONE plan;
    density evaluation runs as one whole-solve kernel and the backward
    pass as one plan-adjoint sweep (`odeint_adjoint_fused`) whose
    reverse-mode walk over the traced jvp instructions provides the
    divergence's second-order VJP automatically. Differentiable wrt
    `params` (any pytree the flow closes over explicitly) and `x`.

    trace='hutchinson' (requires key=) swaps the exact divergence for
    the Rademacher estimator e^T (J e) over `n_probes` in-plan probes —
    n_probes jvp passes instead of D, the FFJORD recipe for
    high-dimensional flows; probes are fixed per call (fresh noise per
    training batch comes from passing a fresh key — the plan structure
    stays cached).

    Flows outside the fusable subset fall back to
    `models.cnf.log_prob(trace='exact')` (generic differentiable bounded
    loop) with a warning — identical semantics, slower. Matches
    `models.cnf.log_prob` to solve tolerance.
    """
    from .models.cnf import augmented_dynamics_fusable
    from .ops import jaxpr_bridge as jb

    x = jnp.asarray(x)
    B, D = x.shape
    dtype = x.dtype
    aug = augmented_dynamics_fusable(flow, D, trace=trace,
                                     n_probes=n_probes, key=key, batch=B)
    s0 = jnp.concatenate([x, jnp.zeros((B, 1), dtype)], axis=1)
    t = jnp.asarray([t1, t0], dtype)               # backward: data -> base

    try:
        traj = odeint_adjoint_fused(
            aug, s0, t, params=params, rtol=rtol, atol=atol,
            adjoint_rtol=adjoint_rtol, adjoint_atol=adjoint_atol,
            method=method, adjoint_seminorm=adjoint_seminorm,
            interpret=interpret, max_num_steps=max_num_steps,
            first_step=first_step, matmul=matmul, nfe_meter=nfe_meter)
        final = traj[-1]                           # [B, D+1]
        z_base, dlog = final[:, :D], final[:, D]
    except jb.FusionError as e:
        import warnings
        warnings.warn(
            f"cnf_log_prob_auto: flow not fusable ({e}); falling back to "
            "the generic models.cnf.log_prob", stacklevel=2)
        from .models.cnf import log_prob as _generic_log_prob
        return _generic_log_prob(
            lambda tt, zz: flow(tt, zz, params), x, t0=t0, t1=t1,
            rtol=rtol, atol=atol, trace=trace, n_probes=n_probes,
            key=key, method=method)

    logp_base = (-0.5 * jnp.sum(z_base ** 2, axis=-1)
                 - 0.5 * D * jnp.log(2.0 * jnp.pi).astype(dtype))
    return logp_base - dlog


def cnf_sample_auto(flow, params, key, n: int, dim: int, *,
                    t0: float = 0.0, t1: float = 1.0, rtol: float = 1e-5,
                    atol: float = 1e-7, method: str = "dopri5",
                    interpret: Optional[bool] = None,
                    max_num_steps=None, matmul: str = "auto") -> Array:
    """Draw samples from an ARBITRARY plain-jnp flow with the forward
    solve as one auto-fused kernel (plan-driven counterpart of
    `cnf_sample_fused`); flows outside the fusable subset fall back to
    the generic `models.cnf.sample`."""
    from .ops import jaxpr_bridge as jb

    z = jax.random.normal(key, (n, dim))
    t = jnp.asarray([t0, t1], z.dtype)
    try:
        res = solve_fused(lambda tt, zz: flow(tt, zz, params), z, t,
                          rtol=rtol, atol=atol, method=method,
                          interpret=interpret,
                          max_num_steps=max_num_steps, matmul=matmul)
        return res.ys[-1]
    except jb.FusionError:
        from .models.cnf import sample as _generic_sample
        return _generic_sample(lambda tt, zz: flow(tt, zz, params), key,
                               n, dim, t0=t0, t1=t1, rtol=rtol, atol=atol,
                               method=method)
