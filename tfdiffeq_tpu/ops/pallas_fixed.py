"""Fixed-grid whole-solve Pallas kernels: euler/midpoint/rk4/rk4_38 as ONE
kernel launch.

The adaptive whole-solve engine (`pallas_kernels._make_solve_kernel`) pays
for an error estimate, a step controller and an accept/reject branch on
every attempt. Fixed-grid methods (upstream `tfdiffeq/fixed_grid.py`,
SURVEY.md §2/§3.2) need none of that: the step sequence is known at trace
time, so the in-kernel loop is a plain `fori_loop` over grid intervals —
deterministic cost, no rejected work, no controller scalars. This is the
serving tier: rk4 at a fixed step budget runs each step at the raw price
of its 4 stage evaluations plus the chained end derivative.

Semantics mirror `solvers/fixed_grid.solve_fixed_grid` exactly:
- grid defaults to the requested times `tau` themselves (the reference's
  default `grid_constructor`); an explicit grid (from `step_size` /
  `num_steps` / `grid_constructor`) may be finer, and outputs are then
  cubic-Hermite-interpolated onto `tau` from the step endpoints using the
  node derivatives the walk already computed.
- the end derivative f1 = f(t1, y1) is chained into the next step's first
  stage, so a step costs exactly `tableau.stages` evaluations
  (NFE = 1 + stages * (G - 1), upstream parity).
- state accumulation across steps is Kahan-compensated, matching both the
  generic fixed-grid scan and the adaptive whole-solve kernel.

Layout contracts (feature-major [D, B], lane-padded batch, sublane
packing, sequential-grid batch blocks) are shared with
`pallas_kernels.whole_solve_call`.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .pallas_kernels import (solver_pallas_call,  # noqa: F401
                             _LANE, _round_up, merge_grid_stats,
                             pack_state_blocks, packed_make_f, pick_pack,
                             prep_state_blocks, rep_spec,
                             unpack_state_blocks)
from . import tableaus as _tabs

Array = jax.Array

#: fixed-grid method name -> tableau (the fused fixed tier's registry;
#: the adaptive registry is tableaus.TABLEAUS_BY_NAME).
FIXED_TABLEAUS_BY_NAME = {
    "euler": _tabs.EULER,
    "midpoint": _tabs.MIDPOINT,
    "rk4": _tabs.RK4,
    "rk4_38": _tabs.RK4_38,
}


def _fixed_stage_walk(tab, f, y0, f0, t0, dt):
    """Stage evaluations and the solution combine for one fixed step
    (no embedded error estimate). Returns delta with y1 = y0 + delta."""
    k = [f0]
    for i in range(1, tab.stages):
        yi = y0
        for aij, kj in zip(tab.a[i - 1], k):
            if aij != 0.0:
                yi = yi + (dt * aij) * kj
        k.append(f(t0 + tab.c[i] * dt, yi))
    delta = None
    for b, kj in zip(tab.b_sol, k):
        if b != 0.0:
            delta = (dt * b) * kj if delta is None else delta + (dt * b) * kj
    return delta


def _hermite_drain(out_ref, tau_ref, T: int, oi, t0, t1, y0, y1, df0, df1,
                   last):
    """Cubic-Hermite output drain over (t0, t1]: write every requested
    time via the output cursor (O(outputs) dynamic row writes total);
    `last` flushes roundoff-stranded tail times on the final interval.
    df0/df1 are the dt-scaled endpoint derivatives; returns the advanced
    cursor. Shared by the fixed-RK, Adams, and hypersolver kernels."""
    dt = t1 - t0
    cb = 2.0 * (y0 - y1) + df0 + df1
    cc = 3.0 * (y1 - y0) - 2.0 * df0 - df1

    def wcond(o):
        within = tau_ref[0, jnp.minimum(o, T - 1)] <= t1
        return (o < T) & (within | last)

    def wbody(o):
        tj = tau_ref[0, o]
        x = (tj - t0) / dt
        val = ((cb * x + cc) * x + df0) * x + y0
        out_ref[pl.ds(o, 1)] = jnp.where(tj == t1, y1, val)[None]
        return o + 1

    return jax.lax.while_loop(wcond, wbody, oi)



def _make_fixed_solve_kernel(tab, G: int, T: int, make_f, n_wrefs: int,
                             per_block_io: bool = False):
    """Whole-solve fixed-grid kernel. Ref layout:

    inputs:  grid [1,G] SMEM, tau [1,T] SMEM, sign [1,1], valid [1,1],
             y0 [D,B] VMEM, f0 [D,B] VMEM, *wrefs
    outputs: out [T,D,B] VMEM, stats [n_blocks,4] SMEM
    scratch: y_s, f_s, comp_s [D,B] VMEM

    grid/tau are CANONICAL (increasing) times; the runtime sign scalar
    maps them back to user time inside the RHS (tau = sign * t, as in
    solvers/base.py canonicalize), so one compiled kernel serves both
    directions.
    """
    evals = tab.stages

    def kernel(*refs):
        (grid_ref, tau_ref, sign_ref, valid_ref, y0_ref, f0_ref) = refs[:6]
        wrefs = refs[6:6 + n_wrefs]
        out_ref, stats_ref, y_s, f_s, comp_s = refs[6 + n_wrefs:]
        pid = pl.program_id(0) if per_block_io else 0
        sign = sign_ref[0, 0]

        out_ref[:] = jnp.zeros_like(out_ref)
        out_ref[0] = y0_ref[:]
        y_s[:] = y0_ref[:]
        f_s[:] = f0_ref[:]
        comp_s[:] = jnp.zeros_like(comp_s)

        raw_f = make_f(wrefs)

        def f(s, y):
            # Canonical dynamics: g(tau, y) = sign * f(sign * tau, y).
            return sign * raw_f(sign * s, y)

        def body(i, oi):
            t0 = grid_ref[0, i]
            t1 = grid_ref[0, i + 1]
            dt = t1 - t0
            y0 = y_s[:]
            f0 = f_s[:]
            delta = _fixed_stage_walk(tab, f, y0, f0, t0, dt)

            # Kahan-compensated accumulation (matches the generic scan).
            comp = comp_s[:]
            adj = delta - comp
            y1 = y0 + adj
            comp_s[:] = (y1 - y0) - adj
            y_s[:] = y1

            # Chained end derivative: next step's first stage AND the
            # Hermite end slope (upstream NFE parity: stages evals/step).
            f1 = f(t1, y1)
            f_s[:] = f1

            return _hermite_drain(out_ref, tau_ref, T, oi, t0, t1, y0,
                                  y1, dt * f0, dt * f1, i == (G - 2))

        # Invalid (non-monotonic) traced times: status 3, output zero
        # beyond row 0 — same contract as the adaptive kernel.
        ok = valid_ref[0, 0] != 0

        @pl.when(ok)
        def _():
            jax.lax.fori_loop(1, G, lambda i, o: body(i - 1, o),
                              jnp.int32(1))

        stats_ref[pid, 0] = jnp.where(ok, jnp.int32(1 + evals * (G - 1)),
                                      jnp.int32(0))
        stats_ref[pid, 1] = jnp.where(ok, jnp.int32(G - 1), jnp.int32(0))
        stats_ref[pid, 2] = jnp.int32(0)
        stats_ref[pid, 3] = jnp.where(ok, jnp.int32(0), jnp.int32(3))

    return kernel


def fixed_solve_call(make_f, aux_arrays, y0: Array, tau: Array, grid: Array,
                     sign, f0, *, tab, interpret: bool, n_blocks: int = 1):
    """Shared pallas_call plumbing for fixed-grid whole-solve kernels.

    y0/f0: [D, B] feature-major with B already lane-padded; grid/tau:
    increasing canonical times with grid[0] == tau[0], grid[-1] == tau[-1].
    n_blocks > 1 runs lane blocks as sequential grid programs (the
    adaptive tier's recipe — per-block state/scratch, replicated weights);
    fixed steps make per-block control trivial (identical step sequence),
    the grid mode exists purely to bound the per-program VMEM trajectory
    buffer. Returns (out [T, D, B], stats [4] or [n_blocks, 4] int32).
    """
    D, B = y0.shape
    T = int(tau.shape[0])
    G = int(grid.shape[0])
    dtype = y0.dtype

    if B % n_blocks:
        raise ValueError(f"lane count {B} not divisible by n_blocks "
                         f"{n_blocks}")
    NB = B // n_blocks
    kernel = _make_fixed_solve_kernel(tab, G, T, make_f, len(aux_arrays),
                                      per_block_io=n_blocks > 1)

    smem_t = pl.BlockSpec(memory_space=pltpu.SMEM)
    vmem = pl.BlockSpec(memory_space=pltpu.VMEM)

    tau = tau.astype(dtype)
    grid = grid.astype(dtype)
    valid_t = jnp.all(jnp.diff(tau) > 0) if T > 1 else jnp.asarray(True)
    valid_g = jnp.all(jnp.diff(grid) > 0) if G > 1 else jnp.asarray(True)
    valid = (valid_t & valid_g).astype(jnp.int32)
    scalar_ins = (grid.reshape(1, G), tau.reshape(1, T),
                  jnp.reshape(jnp.asarray(sign, dtype), (1, 1)),
                  jnp.reshape(valid, (1, 1)))
    scratch = [pltpu.VMEM((D, NB), dtype)] * 3

    if n_blocks == 1:
        out, stats = solver_pallas_call(
            kernel,
            in_specs=[smem_t] * 4 + [vmem] * (2 + len(aux_arrays)),
            out_specs=[vmem, smem_t],
            out_shape=[jax.ShapeDtypeStruct((T, D, B), dtype),
                       jax.ShapeDtypeStruct((1, 4), jnp.int32)],
            scratch_shapes=scratch,
            interpret=interpret,
        )(*scalar_ins, y0, f0, *aux_arrays)
        return out, stats[0]

    state_spec = pl.BlockSpec((D, NB), lambda i: (0, i),
                              memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((T, D, NB), lambda i: (0, 0, i),
                            memory_space=pltpu.VMEM)
    out, stats = solver_pallas_call(
        kernel,
        grid=(n_blocks,),
        in_specs=([smem_t] * 4 + [state_spec, state_spec]
                  + [rep_spec(np.shape(w)) for w in aux_arrays]),
        out_specs=[out_spec, smem_t],
        out_shape=[jax.ShapeDtypeStruct((T, D, B), dtype),
                   jax.ShapeDtypeStruct((n_blocks, 4), jnp.int32)],
        scratch_shapes=scratch,
        interpret=interpret,
    )(*scalar_ins, y0, f0, *aux_arrays)
    return out, stats


@functools.partial(
    jax.jit,
    static_argnames=("dims", "activation", "final_activation", "input_power",
                     "time_input", "rhs", "method", "matmul", "interpret",
                     "pack", "n_blocks", "dot_precision"))
def mlp_solve_fixed(warrays, dims, y0: Array, tau: Array, grid: Array, sign,
                    *, f0: Array = None, activation: str = "tanh",
                    final_activation: str = "identity", input_power: int = 1,
                    time_input: bool = False, rhs: str = "mlp",
                    method: str = "rk4", matmul: str = "vpu",
                    interpret: bool = False, pack: str | int = "auto",
                    n_blocks: int = 1, dot_precision: str = "highest"):
    """Whole-solve fused FIXED-GRID RK for a general MLP ODE, one kernel.

    Mirror of `pallas_kernels.mlp_solve` for the fixed-grid family
    (upstream `tfdiffeq/fixed_grid.py` capability, SURVEY.md §2): grid is
    the canonical step grid (defaults to tau at the front-end), method in
    FIXED_TABLEAUS_BY_NAME. No controller scalars, no rejected work —
    deterministic cost 1 + stages*(G-1) NFE. Returns (out [T, D, B],
    stats [4]: nfe / steps / 0 / status).
    """
    from .pallas_kernels import _make_cnf_net, _make_net, padded_mlp_f

    tab = FIXED_TABLEAUS_BY_NAME[method]
    D, B = y0.shape
    dtype = y0.dtype
    warrays = [jnp.asarray(w, dtype) for w in warrays]
    sign = jnp.asarray(sign, dtype)
    if f0 is None:
        if rhs != "mlp":
            raise ValueError(f"rhs={rhs!r} needs an explicit f0 (the XLA "
                             "reference only covers the plain MLP)")
        f0 = sign * padded_mlp_f(warrays, dims, y0, activation,
                                 final_activation, input_power,
                                 t=sign * grid[0], time_input=time_input)

    y0, f0, k, Lb = prep_state_blocks(y0, f0, D, pack, n_blocks)
    B_true = Lb

    if rhs == "mlp":
        def make_f(wrefs):
            return _make_net(wrefs, dims, activation, final_activation,
                             input_power, time_input, matmul,
                             dot_precision)
    elif rhs == "cnf":
        def make_f(wrefs):
            return _make_cnf_net(wrefs, dims, activation, time_input)
    else:
        raise ValueError(f"unknown rhs {rhs!r} (expected 'mlp' or 'cnf')")
    if k > 1:
        make_f = packed_make_f(make_f, k, D)

    out, stats = fixed_solve_call(
        make_f, warrays, y0, tau, grid, sign, f0, tab=tab,
        interpret=interpret, n_blocks=n_blocks)
    if n_blocks > 1:
        stats = merge_grid_stats(stats, per_block_work=False)
    if out.shape[-1] != n_blocks * Lb:
        out = out[:, :, :Lb]       # single-block lane padding
    if k > 1:
        out = unpack_state_blocks(out, k, D, n_blocks)
    return out, stats


#: hypersolver kinds: (base-step power p+1, func evals per step)
_HYPER_KINDS = {"euler": (2, 1), "midpoint": (3, 2), "heun": (3, 2)}


def _make_hyper_solve_kernel(kind: str, G: int, T: int, make_f, make_g,
                             n_f: int, n_g: int, grid_is_t: bool,
                             per_block_io: bool = False):
    """Whole-solve hypersolver kernel (Poli et al. 2020): per grid step,
    base explicit update of order p plus the learned correction

        y1 = y + dt*base(t, y) + (sign*dt)^(p+1) * g(t_user, y, f_user)

    with BOTH the dynamics f and the correction net g interpreted as
    fused plans in-kernel (`make_f` square, `make_g` rectangular over the
    stacked [y; f] rows). Mirrors `solvers/hyper._hyper_step` +
    `solve_fixed_grid`'s step_fn path exactly, including NFE accounting
    (g evaluations are not func evaluations) and the
    output-interpolation-from-node-derivatives convention — the Hermite
    drain runs one step DELAYED so each interval's end derivative is the
    next step's (free) start derivative; the final interval pays the same
    single f_end evaluation the generic path does.

    Ref layout:
      SMEM in : grid [1,G], tau [1,T], sign [1,1], valid [1,1]
      VMEM in : y0 [D,B], *f-consts (n_f), *g-consts (n_g)
      outputs : out [T,D,B], stats [n_blocks,4] (SMEM)
      scratch : y_s, yp_s, fp_s (all [D,B])
    """
    power, evals = _HYPER_KINDS[kind]

    def kernel(*refs):
        (grid_ref, tau_ref, sign_ref, valid_ref, y0_ref) = refs[:5]
        frefs = refs[5:5 + n_f]
        grefs = refs[5 + n_f:5 + n_f + n_g]
        out_ref, stats_ref, y_s, yp_s, fp_s, oi_s = refs[5 + n_f + n_g:]
        pid = pl.program_id(0) if per_block_io else 0
        sign = sign_ref[0, 0]

        out_ref[:] = jnp.zeros_like(out_ref)
        out_ref[0] = y0_ref[:]
        y_s[:] = y0_ref[:]
        yp_s[:] = y0_ref[:]
        fp_s[:] = jnp.zeros_like(fp_s)
        oi_s[0, 0] = jnp.int32(1)

        raw_f = make_f(frefs)
        raw_g = make_g(grefs)

        def f(s, y):
            return sign * raw_f(sign * s, y)

        def drain(t0, t1, y0, y1, f0u, f1u, last):
            """Hermite output drain from user-space node derivatives
            (the generic hermite_interp_at convention); cursor lives in
            SMEM scratch."""
            dt = t1 - t0
            oi_s[0, 0] = _hermite_drain(
                out_ref, tau_ref, T, oi_s[0, 0], t0, t1, y0, y1,
                dt * (sign * f0u), dt * (sign * f1u), last)

        def body(i, carry):
            t0 = grid_ref[0, i]
            t1 = grid_ref[0, i + 1]
            dt = t1 - t0
            y = y_s[:]
            f0 = f(t0, y)                     # tau-space
            f0u = sign * f0                   # user-space derivative

            if not grid_is_t:
                # Delayed drain of the PREVIOUS interval, whose end
                # derivative is this step's start derivative.
                @pl.when(i > 0)
                def _():
                    drain(grid_ref[0, jnp.maximum(i - 1, 0)], t0,
                          yp_s[:], y, sign * fp_s[:], f0u,
                          jnp.asarray(False))
                yp_s[:] = y
                fp_s[:] = f0                  # stored tau-space

            if kind == "euler":
                base = f0
            elif kind == "midpoint":
                base = f(t0 + 0.5 * dt, y + (0.5 * dt) * f0)
            else:                             # heun
                k2 = f(t1, y + dt * f0)
                base = 0.5 * (f0 + k2)

            # Correction in USER space: g(t_user, [y; f_user]).
            s_stack = jnp.concatenate([y, f0u], axis=0)
            corr = raw_g(sign * t0, s_stack)
            sdt = sign * dt
            sdt_p = sdt * sdt
            for _ in range(power - 2):
                sdt_p = sdt_p * sdt
            y1 = y + dt * base + sdt_p * corr
            y_s[:] = y1

            if grid_is_t:
                out_ref[pl.ds(i + 1, 1)] = y1[None]
            return carry

        ok = valid_ref[0, 0] != 0
        nfe = jnp.int32(evals * (G - 1))

        @pl.when(ok)
        def _():
            jax.lax.fori_loop(0, G - 1, body, jnp.int32(0))
            if not grid_is_t:
                # Final interval: pay one f_end evaluation (generic
                # parity) and flush every remaining requested time.
                t0 = grid_ref[0, G - 2]
                t1 = grid_ref[0, G - 1]
                y1 = y_s[:]
                f_end = f(t1, y1)
                drain(t0, t1, yp_s[:], y1, sign * fp_s[:],
                      sign * f_end, jnp.asarray(True))

        if not grid_is_t:
            nfe = nfe + 1
        stats_ref[pid, 0] = jnp.where(ok, nfe, jnp.int32(0))
        stats_ref[pid, 1] = jnp.where(ok, jnp.int32(G - 1), jnp.int32(0))
        stats_ref[pid, 2] = jnp.int32(0)
        stats_ref[pid, 3] = jnp.where(ok, jnp.int32(0), jnp.int32(3))

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=("plan_f", "plan_g", "kind", "grid_is_t", "interpret",
                     "n_blocks"))
def plan_solve_hyper(plan_f, plan_g, consts_f, consts_g, y0: Array,
                     tau: Array, grid: Array, sign, *, kind: str,
                     grid_is_t: bool, interpret: bool = False,
                     n_blocks: int = 1):
    """Whole-solve fused hypersolver over two FusedPlans: `plan_f` (the
    dynamics, square) and `plan_g` (the correction net over stacked
    [y; f] rows, rectangular via build_plan(out_dim=D)). y0 [D, B]
    lane-padded feature-major; consts pre-packed. Returns
    (out [T, D, B], stats)."""
    from .jaxpr_bridge import make_plan_f

    D, B = y0.shape
    T = int(tau.shape[0])
    G = int(grid.shape[0])
    dtype = y0.dtype

    if B % n_blocks:
        raise ValueError(f"lane count {B} not divisible by n_blocks "
                         f"{n_blocks}")
    NB = B // n_blocks
    make_f = lambda wrefs: make_plan_f(plan_f, wrefs)    # noqa: E731
    make_g = lambda wrefs: make_plan_f(plan_g, wrefs)    # noqa: E731
    kernel = _make_hyper_solve_kernel(kind, G, T, make_f, make_g,
                                      len(consts_f), len(consts_g),
                                      bool(grid_is_t),
                                      per_block_io=n_blocks > 1)

    smem_t = pl.BlockSpec(memory_space=pltpu.SMEM)
    vmem = pl.BlockSpec(memory_space=pltpu.VMEM)

    tau = tau.astype(dtype)
    grid = grid.astype(dtype)
    valid_t = jnp.all(jnp.diff(tau) > 0) if T > 1 else jnp.asarray(True)
    valid_g = jnp.all(jnp.diff(grid) > 0) if G > 1 else jnp.asarray(True)
    valid = (valid_t & valid_g).astype(jnp.int32)
    scalar_ins = (grid.reshape(1, G), tau.reshape(1, T),
                  jnp.reshape(jnp.asarray(sign, dtype), (1, 1)),
                  jnp.reshape(valid, (1, 1)))
    aux = list(consts_f) + list(consts_g)
    scratch = [pltpu.VMEM((D, NB), dtype)] * 3 + [
        pltpu.SMEM((1, 1), jnp.int32)]

    if n_blocks == 1:
        out, stats = solver_pallas_call(
            kernel,
            in_specs=[smem_t] * 4 + [vmem] * (1 + len(aux)),
            out_specs=[vmem, smem_t],
            out_shape=[jax.ShapeDtypeStruct((T, D, B), dtype),
                       jax.ShapeDtypeStruct((1, 4), jnp.int32)],
            scratch_shapes=scratch,
            interpret=interpret,
        )(*scalar_ins, y0, *aux)
        return out, stats[0]

    state_spec = pl.BlockSpec((D, NB), lambda i: (0, i),
                              memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((T, D, NB), lambda i: (0, 0, i),
                            memory_space=pltpu.VMEM)
    out, stats = solver_pallas_call(
        kernel,
        grid=(n_blocks,),
        in_specs=([smem_t] * 4 + [state_spec]
                  + [rep_spec(np.shape(w)) for w in aux]),
        out_specs=[out_spec, smem_t],
        out_shape=[jax.ShapeDtypeStruct((T, D, B), dtype),
                   jax.ShapeDtypeStruct((n_blocks, 4), jnp.int32)],
        scratch_shapes=scratch,
        interpret=interpret,
    )(*scalar_ins, y0, *aux)
    return out, stats


def _make_adams_solve_kernel(G: int, T: int, make_f, n_wrefs: int,
                             max_order: int, max_iters: int, implicit: bool,
                             B_true: int, per_block_io: bool = False):
    """Whole-solve fixed-step Adams kernel (AB predictor, optional AM
    corrector with unrolled functional iteration) — the fused counterpart
    of `solvers/fixed_adams.solve_fixed_adams`, one launch.

    Ref layout:
      SMEM in : grid [1,G], tau [1,T], ab [MO,MO], am [MO,MO],
                rtol [1,1], atol [1,1], sign [1,1], valid [1,1]
      VMEM in : y0 [D,B], f0 [D,B], *wrefs
      outputs : out [T,D,B], stats [n_blocks,4] (SMEM)
      scratch : y_s [D,B], hist_s [MO, D, B] (hist slab j =
                f_{current-j}), comp_s [D,B]

    Startup mirrors the generic engine: the first max_order-1 steps run
    RK4 (O(h^5) local) instead of the reference's order ramp; history then
    carries exactly the evaluations the generic scan would hold. The
    corrector runs max_iters unrolled iterations with a convergence mask
    (converged states stop updating), NFE counts every evaluation
    performed — identical to the generic engine's accounting.
    """
    MO = int(max_order)
    rk4 = FIXED_TABLEAUS_BY_NAME["rk4"]
    bootstrap = MO - 1

    def kernel(*refs):
        (grid_ref, tau_ref, ab_ref, am_ref, rtol_ref, atol_ref,
         sign_ref, valid_ref, y0_ref, f0_ref) = refs[:10]
        wrefs = refs[10:10 + n_wrefs]
        out_ref, stats_ref, y_s, hist_s, comp_s = refs[10 + n_wrefs:]
        pid = pl.program_id(0) if per_block_io else 0
        sign = sign_ref[0, 0]
        rtol = rtol_ref[0, 0]
        atol = atol_ref[0, 0]
        D = y_s.shape[0]

        out_ref[:] = jnp.zeros_like(out_ref)
        out_ref[0] = y0_ref[:]
        y_s[:] = y0_ref[:]
        hist_s[:] = jnp.zeros_like(hist_s)
        hist_s[0] = f0_ref[:]
        comp_s[:] = jnp.zeros_like(comp_s)

        raw_f = make_f(wrefs)

        def f(s, y):
            return sign * raw_f(sign * s, y)

        lane = jax.lax.broadcasted_iota(jnp.int32, (D, y_s.shape[1]), 1)
        valid = lane < B_true

        def body(i, carry):
            oi, nfe = carry
            t0 = grid_ref[0, i]
            t1 = grid_ref[0, i + 1]
            dt = t1 - t0
            y0 = y_s[:]
            f_head = hist_s[0]
            n = i                      # steps completed so far

            def adams_step():
                k_eff = jnp.minimum(n + 1, MO)
                # Predictor: y + dt * sum_j beta_j f_{n-j} (masked past
                # the usable history length).
                acc = None
                for j in range(MO):
                    beta = jnp.where(j < k_eff, ab_ref[k_eff - 1, j], 0.0)
                    term = beta * hist_s[j]
                    acc = term if acc is None else acc + term
                y_pred = y0 + dt * acc
                if not implicit:
                    # Reference convention: f1 = f(t1, y_pred), 1 eval.
                    return (y_pred, f(t1, y_pred), dt * acc,
                            jnp.int32(1))
                hist_part = None
                for j in range(MO - 1):
                    gam = jnp.where(j + 1 < k_eff,
                                    am_ref[k_eff - 1, j + 1], 0.0)
                    term = gam * hist_s[j]
                    hist_part = term if hist_part is None \
                        else hist_part + term
                g0 = am_ref[k_eff - 1, 0]
                y_cur = y_pred
                done = jnp.asarray(False)
                for _ in range(max_iters):
                    f_new = f(t1, y_cur)
                    y_next = y0 + dt * (hist_part + g0 * f_new)
                    scale = atol + rtol * jnp.maximum(jnp.abs(y_cur),
                                                      jnp.abs(y_next))
                    esc = jnp.where(valid, (y_next - y_cur) / scale, 0.0)
                    delta = jnp.sqrt(jnp.sum(esc * esc)
                                     / float(D * B_true))
                    y_cur = jnp.where(done, y_cur, y_next)
                    done = done | (delta <= 1.0)
                f1 = f(t1, y_cur)
                return (y_cur, f1, y_cur - y0,
                        jnp.int32(max_iters + 1))

            def rk4_step():
                delta = _fixed_stage_walk(rk4, f, y0, f_head, t0, dt)
                y1 = y0 + delta
                return y1, f(t1, y1), delta, jnp.int32(4)

            if bootstrap > 0:
                y1, f1, delta, n_evals = jax.lax.cond(
                    n < bootstrap, rk4_step, adams_step)
            else:
                y1, f1, delta, n_evals = adams_step()

            # Kahan-compensated accumulation on the exact increment.
            comp = comp_s[:]
            adj = delta - comp
            y_new = jnp.where(valid, y0 + adj, 0.0)
            comp_s[:] = jnp.where(valid, (y_new - y0) - adj, 0.0)
            y_s[:] = y_new

            # Shift history: row-block j becomes f_{new - j}.
            hist_s[pl.ds(1, MO - 1)] = hist_s[pl.ds(0, MO - 1)]
            hist_s[0] = f1

            oi = _hermite_drain(out_ref, tau_ref, T, oi, t0, t1, y0,
                                y_new, dt * f_head, dt * f1, i == (G - 2))
            return oi, nfe + n_evals

        ok = valid_ref[0, 0] != 0

        def run():
            _, nfe = jax.lax.fori_loop(0, G - 1, body,
                                       (jnp.int32(1), jnp.int32(1)))
            return nfe

        nfe = jax.lax.cond(ok, run, lambda: jnp.int32(0))
        stats_ref[pid, 0] = nfe
        stats_ref[pid, 1] = jnp.where(ok, jnp.int32(G - 1), jnp.int32(0))
        stats_ref[pid, 2] = jnp.int32(0)
        stats_ref[pid, 3] = jnp.where(ok, jnp.int32(0), jnp.int32(3))

    return kernel


def adams_solve_call(make_f, aux_arrays, y0: Array, tau: Array, grid: Array,
                     rtol, atol, sign, f0, *, max_order: int,
                     max_iters: int, implicit: bool, B_true: int,
                     interpret: bool, n_blocks: int = 1):
    """pallas_call plumbing for the fixed-Adams whole-solve kernel (same
    layout contracts as `fixed_solve_call`). B_true: per-block TRUE lane
    count — pad lanes are masked out of the corrector's convergence norm
    and pinned to 0 through the Kahan update."""
    from ..solvers.fixed_adams import BASHFORTH_TABLE, MOULTON_TABLE

    D, B = y0.shape
    T = int(tau.shape[0])
    G = int(grid.shape[0])
    dtype = y0.dtype
    MO = int(max_order)

    if B % n_blocks:
        raise ValueError(f"lane count {B} not divisible by n_blocks "
                         f"{n_blocks}")
    NB = B // n_blocks
    kernel = _make_adams_solve_kernel(G, T, make_f, len(aux_arrays), MO,
                                      int(max_iters), implicit, B_true,
                                      per_block_io=n_blocks > 1)

    smem_t = pl.BlockSpec(memory_space=pltpu.SMEM)
    vmem = pl.BlockSpec(memory_space=pltpu.VMEM)

    tau = tau.astype(dtype)
    grid = grid.astype(dtype)
    valid_t = jnp.all(jnp.diff(tau) > 0) if T > 1 else jnp.asarray(True)
    valid_g = jnp.all(jnp.diff(grid) > 0) if G > 1 else jnp.asarray(True)
    valid = (valid_t & valid_g).astype(jnp.int32)
    ab = jnp.asarray(BASHFORTH_TABLE[:MO, :MO], dtype)
    am = jnp.asarray(MOULTON_TABLE[:MO, :MO], dtype)
    scalar_ins = (grid.reshape(1, G), tau.reshape(1, T), ab, am,
                  jnp.reshape(jnp.asarray(rtol, dtype), (1, 1)),
                  jnp.reshape(jnp.asarray(atol, dtype), (1, 1)),
                  jnp.reshape(jnp.asarray(sign, dtype), (1, 1)),
                  jnp.reshape(valid, (1, 1)))
    scratch = [pltpu.VMEM((D, NB), dtype),
               pltpu.VMEM((MO, D, NB), dtype),
               pltpu.VMEM((D, NB), dtype)]

    if n_blocks == 1:
        out, stats = solver_pallas_call(
            kernel,
            in_specs=[smem_t] * 8 + [vmem] * (2 + len(aux_arrays)),
            out_specs=[vmem, smem_t],
            out_shape=[jax.ShapeDtypeStruct((T, D, B), dtype),
                       jax.ShapeDtypeStruct((1, 4), jnp.int32)],
            scratch_shapes=scratch,
            interpret=interpret,
        )(*scalar_ins, y0, f0, *aux_arrays)
        return out, stats[0]

    state_spec = pl.BlockSpec((D, NB), lambda i: (0, i),
                              memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((T, D, NB), lambda i: (0, 0, i),
                            memory_space=pltpu.VMEM)
    out, stats = solver_pallas_call(
        kernel,
        grid=(n_blocks,),
        in_specs=([smem_t] * 8 + [state_spec, state_spec]
                  + [rep_spec(np.shape(w)) for w in aux_arrays]),
        out_specs=[out_spec, smem_t],
        out_shape=[jax.ShapeDtypeStruct((T, D, B), dtype),
                   jax.ShapeDtypeStruct((n_blocks, 4), jnp.int32)],
        scratch_shapes=scratch,
        interpret=interpret,
    )(*scalar_ins, y0, f0, *aux_arrays)
    return out, stats


def _make_fixed_adjoint_kernel(tab, T: int, n_sub: int, B_true: int,
                               aug_factory, n_in: int, n_acc: int,
                               time_input: bool = False,
                               per_block_io: bool = False):
    """Fixed-grid backward sweep kernel: per observation interval, n_sub
    equal steps of the chosen fixed tableau on the augmented system — no
    controller, no error estimate, all steps accepted (the fused
    counterpart of the generic fixed-grid adjoint's
    `adjoint_options={'num_steps': n}` per-interval walk, adjoint.py).

    Ref layout (inputs, outputs, scratch):
      SMEM in : sigma [1,T], sign_f [1,1]
      VMEM in : ys [T,D,B], g [T,D,B], const refs (n_in)
      out     : ay0 [D,B], n_acc parameter-cotangent accumulators,
                stats [n_blocks,4] (SMEM), at [1,n_blocks] (SMEM)
      scratch : y, ay, comp_y, comp_ay (all [D,B])
    """
    stages = tab.stages

    def kernel(*refs):
        (sigma_ref, sf_ref) = refs[:2]
        ys_ref, g_ref = refs[2:4]
        wrefs = refs[4:4 + n_in]
        ay0_ref = refs[4 + n_in]
        awrefs = refs[5 + n_in: 5 + n_in + n_acc]
        stats_ref = refs[5 + n_in + n_acc]
        at_ref = refs[6 + n_in + n_acc]
        y_s, ay_s, cy_s, cay_s = refs[7 + n_in + n_acc:]
        pid = pl.program_id(0) if per_block_io else 0
        sf = sf_ref[0, 0]

        aug_eval = aug_factory(wrefs)

        def rhs_fn(s, y, ay):
            # user time t = sign * tau = -sign * sigma
            f, v_y, dparams, v_t = aug_eval(-sf * s, y, ay)
            ky = -sf * f
            kay = sf * v_y
            kws = [sf * blk for blk in dparams]
            if time_input:
                lane = jax.lax.broadcasted_iota(jnp.int32, v_t.shape, 1)
                kat = sf * jnp.sum(jnp.where(lane < B_true, v_t, 0.0))
            else:
                kat = jnp.zeros((), y.dtype)
            return ky, kay, kws, kat

        if per_block_io:
            # Grid mode: parameter-cotangent accumulators are revisited
            # output windows shared by the sequential grid programs —
            # zero once, every block adds in.
            @pl.when(pid == 0)
            def _():
                for r in awrefs:
                    r[:] = jnp.zeros_like(r)
        else:
            for r in awrefs:
                r[:] = jnp.zeros_like(r)
        ay_s[:] = jnp.zeros_like(ay_s)

        lane = jax.lax.broadcasted_iota(
            jnp.int32, (ys_ref.shape[1], ys_ref.shape[2]), 1)
        valid = lane < B_true

        def interval_body(ii, at):
            i = T - 1 - ii
            # Reset y to the stored forward state; inject the cotangent.
            y_s[:] = ys_ref[pl.ds(i, 1)][0]
            ay_s[:] = ay_s[:] + g_ref[pl.ds(i, 1)][0]
            cy_s[:] = jnp.zeros_like(cy_s)
            cay_s[:] = jnp.zeros_like(cay_s)
            s_start = sigma_ref[0, i]
            s_end = sigma_ref[0, i - 1]
            h = (s_end - s_start) / float(n_sub)

            def step(j, at):
                s = s_start + h * jnp.asarray(j, h.dtype)
                y0 = y_s[:]
                ay0 = ay_s[:]

                ky, kay, kws, kat = [], [], [], []
                for st in range(stages):
                    yi, ayi = y0, ay0
                    if st > 0:
                        for aij, (kyj, kayj) in zip(tab.a[st - 1],
                                                    zip(ky, kay)):
                            if aij != 0.0:
                                yi = yi + (h * aij) * kyj
                                ayi = ayi + (h * aij) * kayj
                    k1, k2, k3, k4 = rhs_fn(s + tab.c[st] * h, yi, ayi)
                    ky.append(k1)
                    kay.append(k2)
                    kws.append(k3)
                    kat.append(k4)

                def comb(ks):
                    acc = None
                    for cjj, kj in zip(tab.b_sol, ks):
                        if cjj != 0.0:
                            term = (h * cjj) * kj
                            acc = term if acc is None else acc + term
                    return acc

                d_y = comb(ky)
                d_ay = comb(kay)
                at = at + comb(kat)

                # Kahan for y and a_y; pad lanes pinned to exactly 0 (a
                # divergent pad state reaching Inf would turn the 0*Inf in
                # the weight-quadrature lane reductions into NaN).
                adj_y = d_y - cy_s[:]
                y_new = jnp.where(valid, y0 + adj_y, 0.0)
                cy_s[:] = jnp.where(valid, (y_new - y0) - adj_y, 0.0)
                y_s[:] = y_new
                adj_ay = d_ay - cay_s[:]
                ay_new = jnp.where(valid, ay0 + adj_ay, 0.0)
                cay_s[:] = jnp.where(valid, (ay_new - ay0) - adj_ay, 0.0)
                ay_s[:] = ay_new
                for j2 in range(n_acc):
                    awrefs[j2][:] = awrefs[j2][:] + comb(
                        [k[j2] for k in kws])
                return at

            return jax.lax.fori_loop(0, n_sub, step, at)

        at = jax.lax.fori_loop(0, T - 1, interval_body,
                               jnp.zeros((), ys_ref.dtype))

        ay0_ref[:] = ay_s[:] + g_ref[pl.ds(0, 1)][0]
        at_ref[0, pid] = at
        stats_ref[pid, 0] = jnp.int32(stages * n_sub * (T - 1))
        stats_ref[pid, 1] = jnp.int32(n_sub * (T - 1))
        stats_ref[pid, 2] = jnp.int32(0)
        stats_ref[pid, 3] = jnp.int32(0)

    return kernel


def _fixed_adjoint_call(aug_factory, const_arrays, out_shape_tail, ys, g,
                        tau, sign, *, tab, n_sub, B_true, time_input,
                        interpret, n_blocks):
    """Shared pallas_call plumbing for the fixed backward sweep.

    ys/g: [T, D, B] already packed/lane-padded; out_shape_tail: the
    parameter-cotangent accumulator ShapeDtypeStructs (n_acc of them).
    Returns (ay0 [D, B], accs list, at, stats) with grid-mode stats/at
    already merged (fixed sweeps are block-count-invariant)."""
    T, D, B = ys.shape
    dtype = ys.dtype
    NB = B // n_blocks
    n_in = len(const_arrays)
    n_acc = len(out_shape_tail)
    kernel = _make_fixed_adjoint_kernel(tab, T, int(n_sub), B_true,
                                        aug_factory, n_in, n_acc,
                                        time_input=time_input,
                                        per_block_io=n_blocks > 1)

    smem_t = pl.BlockSpec(memory_space=pltpu.SMEM)
    vmem = pl.BlockSpec(memory_space=pltpu.VMEM)

    sigma = (-tau).astype(dtype)          # backward sweeps integrate up
    scalar_ins = (sigma.reshape(1, T),
                  jnp.reshape(jnp.asarray(sign, dtype), (1, 1)))
    out_shape = ([jax.ShapeDtypeStruct((D, B), dtype)]
                 + list(out_shape_tail)
                 + [jax.ShapeDtypeStruct((n_blocks, 4), jnp.int32),
                    jax.ShapeDtypeStruct((1, n_blocks), dtype)])
    scratch = [pltpu.VMEM((D, NB), dtype)] * 4

    if n_blocks == 1:
        in_specs = [smem_t] * 2 + [vmem] * (2 + n_in)
        out_specs = [vmem] * (1 + n_acc) + [smem_t, smem_t]
        grid_kw = {}
    else:
        traj_spec = pl.BlockSpec((T, D, NB), lambda i: (0, 0, i),
                                 memory_space=pltpu.VMEM)
        ay0_spec = pl.BlockSpec((D, NB), lambda i: (0, i),
                                memory_space=pltpu.VMEM)
        in_specs = ([smem_t] * 2 + [traj_spec, traj_spec]
                    + [rep_spec(np.shape(c)) for c in const_arrays])
        out_specs = ([ay0_spec]
                     + [rep_spec(s.shape) for s in out_shape_tail]
                     + [smem_t, smem_t])
        grid_kw = {"grid": (n_blocks,)}

    res = solver_pallas_call(
        kernel,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=scratch,
        interpret=interpret,
        **grid_kw,
    )(*scalar_ins, ys, g, *const_arrays)

    ay0 = res[0]
    accs = list(res[1:1 + n_acc])
    st = res[1 + n_acc]
    at_row = res[2 + n_acc]
    if n_blocks == 1:
        return ay0, accs, at_row[0, 0], st[0]
    # Fixed sweeps take identical step sequences per block: stats are
    # block-count-invariant (block 0); the batch-summed a_t quadrature
    # sums across blocks.
    stats = jnp.concatenate([st[0, :3], st[:, 3].max(keepdims=True)])
    return ay0, accs, jnp.sum(at_row), stats


@functools.partial(
    jax.jit,
    static_argnames=("dims", "activation", "final_activation", "input_power",
                     "method", "num_steps", "matmul", "time_input", "rhs",
                     "interpret", "pack", "n_blocks"))
def mlp_adjoint_solve_fixed(warrays, dims, ys: Array, g: Array, tau: Array,
                            sign, *, num_steps: int = 1,
                            activation: str = "tanh",
                            final_activation: str = "identity",
                            input_power: int = 1, method: str = "rk4",
                            matmul: str = "vpu", time_input: bool = False,
                            rhs: str = "mlp", interpret: bool = False,
                            pack: str | int = "auto", n_blocks: int = 1):
    """Fixed-grid fused adjoint backward sweep, one kernel launch (the
    fixed-method counterpart of `pallas_adjoint.mlp_adjoint_solve`):
    num_steps fixed steps per observation interval, deterministic cost.
    Returns (ay0 [D, B], aw_list of padded (dW, db), at, stats)."""
    from .pallas_adjoint import (_adjoint_pack, _make_aug_eval,
                                 _make_cnf_aug_eval, pack_traj_blocks,
                                 packed_aug_factory)

    tab = FIXED_TABLEAUS_BY_NAME[method]
    T, D, B = ys.shape
    dtype = ys.dtype
    warrays = [jnp.asarray(w, dtype) for w in warrays]
    L = len(dims)
    if rhs == "cnf":
        time_input = True          # concat-t flow; a_t quadrature applies

    D_state = D
    if B % n_blocks:
        raise ValueError(f"batch {B} not divisible by n_blocks {n_blocks}")
    Bb = B // n_blocks
    if n_blocks > 1 and Bb % _LANE:
        raise ValueError(f"grid block lanes {Bb} not a multiple of "
                         f"{_LANE} (pad the batch first)")
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

    if rhs == "cnf":
        def aug_factory(wrefs):
            return _make_cnf_aug_eval(wrefs, dims, activation)
    else:
        def aug_factory(wrefs):
            return _make_aug_eval(wrefs, dims, activation,
                                  final_activation, input_power,
                                  matmul, time_input)
    if kpk > 1:
        aug_factory = packed_aug_factory(aug_factory, kpk, D_state)

    out_tail = []
    for l in range(L):
        out_tail.append(
            jax.ShapeDtypeStruct(warrays[2 * l].shape, dtype))
        out_tail.append(
            jax.ShapeDtypeStruct(warrays[2 * l + 1].shape, dtype))

    ay0, accs, at, stats = _fixed_adjoint_call(
        aug_factory, warrays, out_tail, ys, g, tau, sign, tab=tab,
        n_sub=int(num_steps), B_true=B_true, time_input=time_input,
        interpret=interpret, n_blocks=n_blocks)
    aws = [(accs[2 * l], accs[2 * l + 1]) for l in range(L)]
    if n_blocks == 1 and B != B_true:
        ay0 = ay0[:, :B_true]
    if kpk > 1:
        ay0 = unpack_state_blocks(ay0, kpk, D_state, n_blocks)
    return ay0, aws, at, stats


@functools.partial(
    jax.jit,
    static_argnames=("plan", "method", "num_steps", "interpret", "pack",
                     "n_blocks"))
def plan_adjoint_solve_fixed(plan, consts_packed, ys: Array, g: Array,
                             tau: Array, sign, *, num_steps: int = 1,
                             method: str = "rk4", interpret: bool = False,
                             pack: str | int = "auto", n_blocks: int = 1):
    """Fixed-grid fused adjoint backward sweep for a jaxpr-bridge plan
    (the fixed-method counterpart of `plan_adjoint.plan_adjoint_solve`).
    Returns (ay0 [D, B], dconsts list, at, stats)."""
    from .pallas_adjoint import (_adjoint_pack, pack_traj_blocks,
                                 packed_aug_factory)
    from .plan_adjoint import make_plan_aug_eval, plan_uses_t

    tab = FIXED_TABLEAUS_BY_NAME[method]
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

    kpk = 1
    if not any(l[0] in ("batch", "bvec") for l in plan.const_layouts):
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
    time_input = plan_uses_t(plan)

    def aug_factory(wrefs):
        return make_plan_aug_eval(plan, wrefs)
    if kpk > 1:
        aug_factory = packed_aug_factory(aug_factory, kpk, plan.dim)

    out_tail = [jax.ShapeDtypeStruct(c.shape, dtype)
                for c in consts_packed]
    ay0, dconsts, at, stats = _fixed_adjoint_call(
        aug_factory, list(consts_packed), out_tail, ys, g, tau, sign,
        tab=tab, n_sub=int(num_steps), B_true=B_true,
        time_input=time_input, interpret=interpret, n_blocks=n_blocks)
    if n_blocks == 1 and B != B_true:
        ay0 = ay0[:, :B_true]
    if kpk > 1:
        ay0 = unpack_state_blocks(ay0, kpk, plan.dim, n_blocks)
    return ay0, dconsts, at, stats


@functools.partial(
    jax.jit,
    static_argnames=("dims", "activation", "final_activation", "input_power",
                     "time_input", "implicit", "max_order", "max_iters",
                     "matmul", "interpret", "pack", "n_blocks"))
def mlp_solve_adams(warrays, dims, y0: Array, tau: Array, grid: Array,
                    rtol, atol, sign, *, f0: Array = None,
                    activation: str = "tanh",
                    final_activation: str = "identity",
                    input_power: int = 1, time_input: bool = False,
                    implicit: bool = True, max_order: int = 4,
                    max_iters: int = 4, matmul: str = "vpu",
                    interpret: bool = False, pack: str | int = "auto",
                    n_blocks: int = 1):
    """Whole-solve fused fixed-step Adams (AB / ABM) for a general MLP
    ODE: predictor + unrolled corrector + RK4 bootstrap + history shifts
    all in ONE kernel. Mirror of `solvers/fixed_adams.solve_fixed_adams`
    semantics ('explicit_adams' = implicit=False, 'fixed_adams' =
    implicit=True; rtol/atol drive the corrector's convergence mask).
    Returns (out [T, D, B], stats [4])."""
    from .pallas_kernels import _make_net, padded_mlp_f

    D, B = y0.shape
    dtype = y0.dtype
    warrays = [jnp.asarray(w, dtype) for w in warrays]
    sign = jnp.asarray(sign, dtype)
    if f0 is None:
        f0 = sign * padded_mlp_f(warrays, dims, y0, activation,
                                 final_activation, input_power,
                                 t=sign * grid[0], time_input=time_input)

    y0, f0, k, Lb = prep_state_blocks(y0, f0, D, pack, n_blocks)
    B_true = Lb

    def make_f(wrefs):
        return _make_net(wrefs, dims, activation, final_activation,
                         input_power, time_input, matmul)
    if k > 1:
        make_f = packed_make_f(make_f, k, D)

    out, stats = adams_solve_call(
        make_f, warrays, y0, tau, grid, rtol, atol, sign, f0,
        max_order=int(max_order), max_iters=int(max_iters),
        implicit=bool(implicit), B_true=B_true, interpret=interpret,
        n_blocks=n_blocks)
    if n_blocks > 1:
        stats = merge_grid_stats(stats, per_block_work=False)
    if out.shape[-1] != n_blocks * Lb:
        out = out[:, :, :Lb]
    if k > 1:
        out = unpack_state_blocks(out, k, D, n_blocks)
    return out, stats


@functools.partial(
    jax.jit,
    static_argnames=("plan", "implicit", "max_order", "max_iters",
                     "interpret", "pack", "n_blocks"))
def plan_solve_adams(plan, consts_packed, y0: Array, tau: Array,
                     grid: Array, rtol, atol, sign, f0: Array, *,
                     implicit: bool = True, max_order: int = 4,
                     max_iters: int = 4, interpret: bool = False,
                     pack: int = 1, n_blocks: int = 1):
    """Whole-solve fused fixed-step Adams over a FusedPlan RHS (the
    jaxpr-bridge counterpart of `mlp_solve_adams`)."""
    from .jaxpr_bridge import make_plan_f

    make_f = lambda wrefs: make_plan_f(plan, wrefs)      # noqa: E731
    if pack > 1:
        make_f = packed_make_f(make_f, int(pack), plan.dim)
    return adams_solve_call(
        make_f, list(consts_packed), y0, tau, grid, rtol, atol, sign, f0,
        max_order=int(max_order), max_iters=int(max_iters),
        implicit=bool(implicit),
        B_true=plan.batch // (int(pack) * int(n_blocks)),
        interpret=interpret, n_blocks=int(n_blocks))


@functools.partial(
    jax.jit,
    static_argnames=("plan", "method", "interpret", "pack", "n_blocks",
                     "dot_precision"))
def plan_solve_fixed(plan, consts_packed, y0: Array, tau: Array, grid: Array,
                     sign, f0: Array, *, method: str = "rk4",
                     interpret: bool = False, pack: int = 1,
                     n_blocks: int = 1, dot_precision: str = "highest"):
    """Whole-solve fused fixed-grid RK over a FusedPlan RHS (the
    jaxpr-bridge counterpart of `mlp_solve_fixed`; same layout contracts
    as `jaxpr_bridge.plan_solve`)."""
    from .jaxpr_bridge import make_plan_f

    tab = FIXED_TABLEAUS_BY_NAME[method]
    make_f = lambda wrefs: make_plan_f(                  # noqa: E731
        plan, wrefs, dot_precision=dot_precision)
    if pack > 1:
        make_f = packed_make_f(make_f, int(pack), plan.dim)
    return fixed_solve_call(
        make_f, list(consts_packed), y0, tau, grid, sign, f0, tab=tab,
        interpret=interpret, n_blocks=int(n_blocks))
