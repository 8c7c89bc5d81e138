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
configs"; the generic `odeint` stays fully general. Also exported:
`solve_mlp_stepwise`, the compositional variant that plugs the fused
*single-step* kernel into the generic adaptive engine via
`AdaptiveConfig.step_override` (used for cross-validation and as the
template for fusing other dynamics).

Limitations (by design): autonomous MLP dynamics only, increasing `t`,
forward solves (use the generic path or `odeint_adjoint` for training).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from .ops.pallas_kernels import dopri5_mlp_solve, dopri5_mlp_step, mlp_f
from .ops import tableaus
from .ops.controller import StepController
from .ops.norms import select_initial_step
from .solvers.adaptive import AdaptiveConfig, solve_adaptive
from .solvers.base import CanonicalProblem, SolveResult, SolverStats

Array = jax.Array


def _check_mlp_inputs(y0, t):
    y0 = jnp.asarray(y0)
    if y0.ndim != 2:
        raise ValueError(f"y0 must be [batch, dim], got {y0.shape}")
    t = jnp.asarray(t)
    if not isinstance(t, jax.core.Tracer):
        tv = np.asarray(t)
        if tv.shape[0] > 1 and not np.all(np.diff(tv) > 0):
            raise ValueError("odeint_mlp requires strictly increasing t")
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
    y0, t = _check_mlp_inputs(y0, t)
    interpret = _auto_interpret(interpret)
    dtype = y0.dtype
    yT = y0.T                                  # [D, B] feature-major

    if t.shape[0] == 1:
        # Single requested time: a valid no-op solve (matches the generic
        # engine; the kernel would misread t_end == t_start as invalid).
        z = jnp.asarray(0, jnp.int32)
        return SolveResult(y0[None], SolverStats(z, z, z, z))

    from .ops.tableaus import (ADAPTIVE_HEUN, BOSH3, DOPRI5, DOPRI8, TSIT5)
    order = {"dopri5": DOPRI5, "bosh3": BOSH3,
             "adaptive_heun": ADAPTIVE_HEUN, "tsit5": TSIT5,
             "dopri8": DOPRI8}[method].order

    f0 = mlp_f(params, yT)
    if first_step is None:
        flat_f = lambda tt, yf: mlp_f(params, yf.reshape(yT.shape)).ravel()
        dt0 = select_initial_step(flat_f, t[0].astype(dtype), yT.ravel(),
                                  f0.ravel(), order - 1,
                                  jnp.asarray(rtol, dtype),
                                  jnp.asarray(atol, dtype))
        extra_nfe = 2            # f0 + the HNW probe evaluation
    else:
        dt0 = jnp.abs(jnp.asarray(first_step, dtype))
        extra_nfe = 1            # f0 only

    out, stats = dopri5_mlp_solve(
        params, yT, t.astype(dtype), dt0, rtol, atol, f0=f0, method=method,
        max_steps=(int(max_num_steps) if max_num_steps is not None
                   else 2 ** 31 - 1),
        interpret=interpret)
    ys = jnp.transpose(out, (0, 2, 1))         # [T, B, D]
    st = SolverStats(stats[0] + extra_nfe, stats[1], stats[2], stats[3])
    return SolveResult(ys, st)


def solve_mlp_stepwise(params: dict, y0: Array, t, *, rtol=1e-6, atol=1e-8,
                       tile_b: int = 512, interpret: Optional[bool] = None,
                       max_num_steps=None, first_step=None) -> SolveResult:
    """Fused *per-step* kernel composed with the generic adaptive engine
    (`AdaptiveConfig.step_override`). Slower than `solve_mlp` (one kernel
    launch per step) but exercises the generic composition path."""
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
