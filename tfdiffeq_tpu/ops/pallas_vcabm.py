"""VCABM whole-solve Pallas kernel: the variable-coefficient,
variable-order Adams–Bashforth–Moulton method ('adams') as ONE launch.

The hardest solver in the registry (SURVEY.md §7 hard-part 2). The generic
engine (`solvers/adams.py`) already reformulated the reference's
deque-mutating host loop as masked fixed-size buffers inside one
`lax.while_loop`; this kernel moves those buffers into VMEM scratch and
the whole Shampine–Gordon machinery in-kernel:

- phi / explicit-phi / predictor-implicit-phi divided-difference stacks as
  [MAX_ORDER+2, D, B] scratch with LEADING-axis dynamic reads
  (`pl.ds(idx, 1)`) for the order-indexed terms (Mosaic-friendly: the
  sublane/lane tile is never sliced dynamically);
- the g / beta / c recurrences unrolled at trace time over the static
  MAX_ORDER bound into scalar ops with `where` masking per dynamic order
  (the c "vector" is a Python list of traced scalars — no 1-D vector ops
  for Mosaic to choke on);
- prev_t history in SMEM scratch; gamma* as an SMEM table;
- order adaptation from error ratios at orders k-1 / k / k+1, the
  keep-dt-on-order-raise rule, the 4-step/order-3 startup ramp, and the
  accept-landing-on-final_t output convention — all bit-matching the
  generic engine's logic (same masked formulas, same controller).

Step-for-step parity with `solvers/adams.solve_vcabm` is tested over the
same accept-sequence battery the generic engine passes
(tests/test_fixed_fused.py::test_vcabm_kernel_*).
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

Array = jax.Array

MAX_ORDER = 12
_K = MAX_ORDER + 2          # phi slots: indices 0 .. order+1 used


def _make_vcabm_kernel(T: int, max_order: int, safety: float,
                       ifactor: float, dfactor: float, max_steps: int,
                       B_true: int, make_f, n_wrefs: int,
                       per_block_io: bool = False):
    """Ref layout:
      SMEM in : tau [1,T], dt0 [1,n_blocks], gstar [1,max_order+3], rtol, atol,
                dtmin, sign, valid (all [1,1])
      VMEM in : y0 [D,B], f0 [D,B], *wrefs
      outputs : out [T,D,B] (VMEM), stats [n_blocks,4] (SMEM)
      scratch : y_s [D,B], phi_s/ephi_s/phip_s [(max_order+2)*D, B],
                prevt_s SMEM [1, max_order+2]
    """
    MO = int(max_order)
    # Unroll bounds + phi-row counts are tied to the STATIC max_order:
    # rows j >= MO+2 are masked to zero at MO=12 and simply don't exist
    # at lower caps — a max_order=5 kernel does 7-row phi machinery
    # instead of 14 (exact, since those rows were always zero).
    K = MO + 2                  # phi slots: indices 0 .. order+1 used

    def kernel(*refs):
        (tau_ref, dt0_ref, gstar_ref, rtol_ref, atol_ref, dtmin_ref,
         sign_ref, valid_ref, y0_ref, f0_ref) = refs[:10]
        wrefs = refs[10:10 + n_wrefs]
        out_ref, stats_ref = refs[10 + n_wrefs:12 + n_wrefs]
        y_s, phi_s, ephi_s, phip_s, prevt_s = refs[12 + n_wrefs:]
        pid = pl.program_id(0) if per_block_io else 0

        sign = sign_ref[0, 0]
        rtol = rtol_ref[0, 0]
        atol = atol_ref[0, 0]
        dt_min = dtmin_ref[0, 0]
        D = y_s.shape[0]
        denom = float(D * B_true)

        out_ref[:] = jnp.zeros_like(out_ref)
        out_ref[0] = y0_ref[:]
        y_s[:] = y0_ref[:]
        phi_s[:] = jnp.zeros_like(phi_s)
        phi_s[0] = f0_ref[:]
        ephi_s[:] = jnp.zeros_like(ephi_s)
        phip_s[:] = jnp.zeros_like(phip_s)
        t0 = tau_ref[0, 0]
        # Sentinel times (t0 - 1 - slot): masked safe-divides never see 0/0.
        for j in range(K):
            prevt_s[0, j] = t0 - float(j) if j else t0

        raw_f = make_f(wrefs)

        def f(s, y):
            return sign * raw_f(sign * s, y)

        lane = jax.lax.broadcasted_iota(jnp.int32, (D, y_s.shape[1]), 1)
        valid = lane < B_true

        def masked_norm(v):
            esc = jnp.where(valid, v, 0.0)
            return jnp.sqrt(jnp.sum(esc * esc) / denom)

        def safe_div(num, den):
            return num / jnp.where(den == 0, jnp.ones_like(den), den)

        def read_blk(ref, idx):
            return ref[pl.ds(idx, 1)][0]

        def pick(scalars, idx):
            """Dynamic select from a trace-time list of scalars."""
            acc = scalars[0] * 0.0
            for j, s in enumerate(scalars):
                acc = jnp.where(idx == j, s, acc)
            return acc

        def cond(c):
            next_t, order, oi, nacc, nrej, nfe, status = c
            return (oi < T) & (status == 0)

        def body(c):
            next_t_c, order, oi, nacc, nrej, nfe, status = c
            y = y_s[:]
            final_t = tau_ref[0, jnp.minimum(oi, T - 1)]
            next_t = jnp.minimum(next_t_c, final_t)
            curr_t = prevt_s[0, 0]
            dt = next_t - curr_t

            # ---- g / beta / explicit phi (unrolled scalar recurrences,
            # solvers/adams._g_and_explicit_phi) ----
            cvec = [1.0 / float(i) for i in range(1, K + 2)]
            cvec = [jnp.asarray(x, next_t.dtype) + 0.0 * next_t
                    for x in cvec]
            g = [jnp.asarray(1.0, next_t.dtype) + 0.0 * next_t]
            beta = jnp.asarray(1.0, next_t.dtype) + 0.0 * next_t
            ephi_s[0] = phi_s[0]
            for j in range(1, MO + 1):
                factor = safe_div(dt, next_t - prevt_s[0, j - 1])
                active_c = j <= order
                cvec = [jnp.where(
                    active_c,
                    cvec[i] - (cvec[i + 1] if i + 1 < len(cvec)
                               else cvec[i]) * factor,
                    cvec[i]) for i in range(len(cvec))]
                g.append(jnp.where(active_c, cvec[0],
                                   jnp.asarray(0.0, next_t.dtype)))
                beta_new = beta * safe_div(next_t - prevt_s[0, j - 1],
                                           curr_t - prevt_s[0, j])
                active_b = j < order
                beta = jnp.where(active_b, beta_new, beta)
                ephi_s[j] = jnp.where(
                    active_b, read_blk(phi_s, j) * beta,
                    jnp.zeros((D, y.shape[1]), y.dtype))
            # g entries beyond MO are never selected (order <= MO).
            g = g + [jnp.asarray(0.0, next_t.dtype)] * (K - len(g))

            # ---- explicit predictor over max(1, order-1) terms ----
            n_pred = jnp.maximum(order - 1, 1)
            acc = None
            for j in range(MO):
                w = jnp.where(j < n_pred, g[j], 0.0)
                term = w * read_blk(ephi_s, j)
                acc = term if acc is None else acc + term
            p_next = y + dt * acc

            # ---- implicit correction ----
            f_pred = f(next_t, p_next)
            # phip[j] = f_pred - sum_{i<j} ephi[i], masked j < order+1
            run = jnp.zeros_like(p_next)
            for j in range(K):
                blk = jnp.where(j < order + 1, f_pred - run,
                                jnp.zeros_like(f_pred))
                phip_s[j] = blk
                if j < K - 1:
                    run = run + read_blk(ephi_s, j)
            om1 = jnp.maximum(order - 1, 0)
            cidx = jnp.maximum(order - 1, 1)
            y_next = p_next + dt * pick(g, cidx) * read_blk(phip_s, cidx)

            # ---- error at order k ----
            tol_scale = atol + rtol * jnp.maximum(jnp.abs(y),
                                                  jnp.abs(y_next))
            err_k_vec = dt * (pick(g, order) - pick(g, om1)) \
                * read_blk(phip_s, order)
            error_k = masked_norm(err_k_vec / tol_scale)
            finite = (jnp.isfinite(error_k)
                      & jnp.all(jnp.isfinite(jnp.where(valid, y_next,
                                                       0.0))))
            accept = (error_k <= 1.0) & finite
            big = jnp.asarray(2.0, error_k.dtype) ** 20
            error_ctrl = jnp.where(finite, error_k, big)

            def optimal_dt(dt_, ratio, k_ord, accepted):
                tiny = jnp.asarray(1e-38, dt_.dtype)
                r = jnp.maximum(ratio, tiny)
                k = jnp.maximum(k_ord.astype(dt_.dtype), 1.0)
                fac = safety * jnp.exp((-1.0 / k) * jnp.log(r))
                lo, hi = (1.0, ifactor) if accepted else (dfactor, 1.0)
                fac = jnp.where(ratio <= 0.0, ifactor,
                                jnp.clip(fac, lo, hi))
                return dt_ * fac

            # ---- accepted path: f_next, full implicit phi, order
            # adaptation (runs only on accept) ----
            def accepted_path():
                f_next = f(next_t, y_next)
                om2 = jnp.maximum(order - 2, 0)
                om3 = jnp.maximum(order - 3, 0)

                def ratio_of(vec):
                    return masked_norm(vec / tol_scale)

                error_km1 = ratio_of(dt * (pick(g, om1) - pick(g, om2))
                                     * read_blk(phip_s, om1))
                error_km2 = ratio_of(dt * (pick(g, om2) - pick(g, om3))
                                     * read_blk(phip_s, om2))
                # implicit_phi[order] (mask order+2 keeps rows < order+2,
                # so row `order` is live): f_next - sum_{i<order} ephi[i].
                run2 = jnp.zeros_like(f_next)
                phi_ord = jnp.zeros_like(f_next)
                for j in range(K - 1):
                    phi_ord = jnp.where(j == order, f_next - run2,
                                        phi_ord)
                    run2 = run2 + read_blk(ephi_s, j)
                error_kp1 = ratio_of(dt * gstar_ref[0, order] * phi_ord)

                startup = (nacc + 1 <= 4) | (order < 3)
                next_order_startup = jnp.minimum(
                    jnp.minimum(order + 1, 3), MO)
                dec = jnp.minimum(error_km1, error_km2) < error_k
                inc = ((~dec) & (order < jnp.minimum(MO, nacc + 1))
                       & (error_kp1 < error_k))
                next_order = jnp.where(dec, order - 1,
                                       jnp.where(inc, order + 1, order))
                next_order = jnp.where(startup, next_order_startup,
                                       next_order)
                next_order = jnp.clip(next_order, 1, MO)
                dt_acc = jnp.where(
                    next_order > order, dt,
                    optimal_dt(dt, error_ctrl, order + 1, True))
                return f_next, next_order, dt_acc

            f_next, next_order, dt_acc = jax.lax.cond(
                accept, accepted_path,
                lambda: (jnp.zeros_like(y), order, dt))
            dt_rej = optimal_dt(dt, error_ctrl, order, False)

            # ---- commit state on accept ----
            @pl.when(accept)
            def _():
                y_s[:] = jnp.where(valid, y_next, 0.0)
                # implicit phi at order+2: f_next - running sums (row 0 =
                # f_next). Read ephi BEFORE overwriting phi rows.
                run3 = jnp.zeros_like(f_next)
                blks = []
                for j in range(K):
                    blks.append(jnp.where(j < order + 2, f_next - run3,
                                          jnp.zeros_like(f_next)))
                    if j < K - 1:
                        run3 = run3 + read_blk(ephi_s, j)
                for j in range(K):
                    phi_s[j] = blks[j]
                # prev_t shift: [next_t, prev_t[:-1]]
                olds = [prevt_s[0, j] for j in range(K - 1)]
                prevt_s[0, 0] = next_t
                for j in range(K - 1):
                    prevt_s[0, j + 1] = olds[j]

            # ---- output write: accepted step landing on final_t ----
            hit = accept & (next_t >= final_t)

            @pl.when(hit)
            def _():
                out_ref[pl.ds(jnp.minimum(oi, T - 1), 1)] = \
                    jnp.where(valid, y_next, 0.0)[None]

            oi_new = oi + hit.astype(jnp.int32)
            n_att = nacc + nrej + 1
            status = jnp.where(
                (~accept) & (dt_rej < dt_min) & (status == 0),
                jnp.int32(2), status)
            status = jnp.where(
                (n_att >= max_steps) & (oi_new < T) & (status == 0),
                jnp.int32(1), status)
            next_t_new = jnp.where(accept, next_t + dt_acc,
                                   curr_t + dt_rej)
            return (next_t_new, jnp.where(accept, next_order, order),
                    oi_new, nacc + accept.astype(jnp.int32),
                    nrej + (~accept).astype(jnp.int32),
                    nfe + jnp.where(accept, jnp.int32(2), jnp.int32(1)),
                    status)

        status0 = jnp.where(valid_ref[0, 0] != 0, jnp.int32(0),
                            jnp.int32(3))
        init = (t0 + dt0_ref[0, pid], jnp.int32(1), jnp.int32(1),
                jnp.int32(0), jnp.int32(0), jnp.int32(0), status0)
        (_, _, _, nacc, nrej, nfe, status) = jax.lax.while_loop(
            cond, body, init)
        stats_ref[pid, 0] = nfe
        stats_ref[pid, 1] = nacc
        stats_ref[pid, 2] = nrej
        stats_ref[pid, 3] = status

    return kernel


def vcabm_solve_call(make_f, aux_arrays, y0: Array, tau: Array, dt0, rtol,
                     atol, sign, f0, *, max_order: int, safety: float,
                     ifactor: float, dfactor: float, max_steps: int,
                     B_true: int, interpret: bool, n_blocks: int = 1):
    """pallas_call plumbing for the VCABM whole-solve kernel (layout
    contracts as `pallas_kernels.whole_solve_call`)."""
    from ..solvers.adams import GAMMA_STAR

    D, B = y0.shape
    T = int(tau.shape[0])
    dtype = y0.dtype

    if B % n_blocks:
        raise ValueError(f"lane count {B} not divisible by n_blocks "
                         f"{n_blocks}")
    NB = B // n_blocks
    K = int(max_order) + 2
    kernel = _make_vcabm_kernel(T, int(max_order), float(safety),
                                float(ifactor), float(dfactor),
                                int(max_steps), B_true, make_f,
                                len(aux_arrays),
                                per_block_io=n_blocks > 1)

    smem_t = pl.BlockSpec(memory_space=pltpu.SMEM)
    vmem = pl.BlockSpec(memory_space=pltpu.VMEM)

    tau = tau.astype(dtype)
    dt_min = (4.0 * jnp.finfo(dtype).eps
              * jnp.maximum(jnp.maximum(jnp.abs(tau[0]), jnp.abs(tau[-1])),
                            1.0)).astype(dtype)
    valid = (jnp.all(jnp.diff(tau) > 0) if T > 1
             else jnp.asarray(True)).astype(jnp.int32)
    # Clamp to dt_min: dt0 == 0 (e.g. first_step that underflows f32)
    # would be accepted forever without progress (the generic engine
    # clamps identically, solvers/adams.py).
    dt0 = jnp.maximum(jnp.abs(jnp.asarray(dt0, dtype)), dt_min)
    dt0 = jnp.broadcast_to(dt0.reshape(-1),
                           (n_blocks,)).reshape(1, n_blocks)
    gstar = jnp.asarray(GAMMA_STAR[:K + 1], dtype).reshape(1, K + 1)
    scalar_ins = (tau.reshape(1, T), dt0, gstar,
                  jnp.reshape(jnp.asarray(rtol, dtype), (1, 1)),
                  jnp.reshape(jnp.asarray(atol, dtype), (1, 1)),
                  jnp.reshape(dt_min, (1, 1)),
                  jnp.reshape(jnp.asarray(sign, dtype), (1, 1)),
                  jnp.reshape(valid, (1, 1)))
    scratch = [pltpu.VMEM((D, NB), dtype),
               pltpu.VMEM((K, D, NB), dtype),
               pltpu.VMEM((K, D, NB), dtype),
               pltpu.VMEM((K, D, NB), dtype),
               pltpu.SMEM((1, K), dtype)]

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


@functools.partial(
    jax.jit,
    static_argnames=("dims", "activation", "final_activation", "input_power",
                     "time_input", "max_order", "safety", "ifactor",
                     "dfactor", "max_steps", "matmul", "interpret", "pack",
                     "n_blocks"))
def mlp_solve_vcabm(warrays, dims, y0: Array, tau: Array, dt0, rtol, atol,
                    sign, *, f0: Array = None, activation: str = "tanh",
                    final_activation: str = "identity",
                    input_power: int = 1, time_input: bool = False,
                    max_order: int = MAX_ORDER, safety: float = 0.9,
                    ifactor: float = 10.0, dfactor: float = 0.2,
                    max_steps: int = 2 ** 31 - 1, matmul: str = "vpu",
                    interpret: bool = False, pack: str | int = "auto",
                    n_blocks: int = 1):
    """Whole-solve fused VCABM for a general MLP ODE (mirror of
    `pallas_kernels.mlp_solve` for method 'adams'). Returns
    (out [T, D, B], stats [4])."""
    from .pallas_kernels import _make_net, padded_mlp_f

    D, B = y0.shape
    dtype = y0.dtype
    warrays = [jnp.asarray(w, dtype) for w in warrays]
    sign = jnp.asarray(sign, dtype)
    if f0 is None:
        f0 = sign * padded_mlp_f(warrays, dims, y0, activation,
                                 final_activation, input_power,
                                 t=sign * tau[0], time_input=time_input)

    y0, f0, k, Lb = prep_state_blocks(y0, f0, D, pack, n_blocks)
    B_true = Lb

    def make_f(wrefs):
        return _make_net(wrefs, dims, activation, final_activation,
                         input_power, time_input, matmul)
    if k > 1:
        make_f = packed_make_f(make_f, k, D)

    out, stats = vcabm_solve_call(
        make_f, warrays, y0, tau, dt0, rtol, atol, sign, f0,
        max_order=int(max_order), safety=safety, ifactor=ifactor,
        dfactor=dfactor, max_steps=int(max_steps), B_true=B_true,
        interpret=interpret, n_blocks=n_blocks)
    if n_blocks > 1:
        stats = merge_grid_stats(stats, per_block_work=True)
    if out.shape[-1] != n_blocks * Lb:
        out = out[:, :, :Lb]
    if k > 1:
        out = unpack_state_blocks(out, k, D, n_blocks)
    return out, stats


@functools.partial(
    jax.jit,
    static_argnames=("plan", "max_order", "safety", "ifactor", "dfactor",
                     "max_steps", "interpret", "pack", "n_blocks"))
def plan_solve_vcabm(plan, consts_packed, y0: Array, tau: Array, dt0, rtol,
                     atol, sign, f0: Array, *, max_order: int = MAX_ORDER,
                     safety: float = 0.9, ifactor: float = 10.0,
                     dfactor: float = 0.2, max_steps: int = 2 ** 31 - 1,
                     interpret: bool = False, pack: int = 1,
                     n_blocks: int = 1):
    """Whole-solve fused VCABM over a FusedPlan RHS."""
    from .jaxpr_bridge import make_plan_f

    make_f = lambda wrefs: make_plan_f(plan, wrefs)      # noqa: E731
    if pack > 1:
        make_f = packed_make_f(make_f, int(pack), plan.dim)
    return vcabm_solve_call(
        make_f, list(consts_packed), y0, tau, dt0, rtol, atol, sign, f0,
        max_order=int(max_order), safety=safety, ifactor=ifactor,
        dfactor=dfactor, max_steps=int(max_steps),
        B_true=plan.batch // (int(pack) * int(n_blocks)),
        interpret=interpret, n_blocks=int(n_blocks))
