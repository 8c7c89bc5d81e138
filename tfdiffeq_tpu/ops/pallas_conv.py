"""Whole-solve fused adaptive RK for the conv-ODE dynamics (the MNIST
`ODEBlock`'s GN -> relu -> ConcatConv3x3 -> GN -> relu -> ConcatConv3x3 ->
GN field; reference `examples/odenet_mnist.py` `ODEfunc`, SURVEY.md:104).

One Pallas kernel launch runs the complete integration: the 3x3 convs are
9 masked lane-rolls contracted on the MXU per application, GroupNorm is
four reduce/spread dots against a lane->sample indicator, and the
adaptive loop/controller/dense-output machinery is the shared
`_make_solve_kernel` engine (pallas_kernels.py). The generic path pays
~10^2 XLA kernel launches per solver step for this dynamics.

Feature-major state layout: [C, B*H*W] (lane n = b*HW + i*W + j), padded
to a lane multiple; pad lanes are pinned to zero at every RHS entry so
the GroupNorm reduction dots never see 0 * Inf. Math shared with the XLA
reference in `ops/conv_ode.py` — the kernel passes `pltpu.roll` where the
reference uses `jnp.roll`.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import conv_ode as co
from .pallas_kernels import (solver_pallas_call,  # noqa: F401
                             _LANE, _make_solve_kernel, _round_up,
                             rep_spec)

Array = jax.Array


def _make_conv_f(wrefs, spec: co.ConvODESpec, use_pltpu_roll: bool = True):
    """Build f(t, x): [C, NP] -> [C, NP] from the 39 VMEM refs (see
    `conv_solve` for the layout)."""
    def f(t, x):
        conv0 = [wrefs[i][:] for i in range(9)]
        b0, tm0 = wrefs[9][:], wrefs[10][:]
        conv1 = [wrefs[11 + i][:] for i in range(9)]
        b1, tm1 = wrefs[20][:], wrefs[21][:]
        gn = [(wrefs[22 + 2 * i][:], wrefs[23 + 2 * i][:])
              for i in range(3)]
        masks = {off: wrefs[28 + k][:]
                 for k, off in enumerate(co.OFFSETS)}
        R = wrefs[37][:]
        G = wrefs[38][:]

        if use_pltpu_roll:
            def roll_fn(v, s):
                # pltpu.roll's shift convention matches jnp.roll (shift
                # toward higher indices); conv3x3 passes negative shifts.
                return pltpu.roll(v, s % v.shape[1], axis=1)
        else:
            def roll_fn(v, s):
                return jnp.roll(v, s, axis=1)

        # Pin pad lanes to zero: they would otherwise integrate the conv
        # biases and, if they ever diverged, poison the GroupNorm
        # reduction dots with 0 * Inf. The (0,0) mask is 1 on every true
        # lane and 0 on padding.
        h = x * masks[(0, 0)]
        h = co.group_norm(h, gn[0][0], gn[0][1], R, G, spec)
        h = jnp.maximum(h, 0.0)
        h = co.conv3x3(h, conv0, b0, tm0, t, masks, spec, roll_fn)
        h = co.group_norm(h, gn[1][0], gn[1][1], R, G, spec)
        h = jnp.maximum(h, 0.0)
        h = co.conv3x3(h, conv1, b1, tm1, t, masks, spec, roll_fn)
        return co.group_norm(h, gn[2][0], gn[2][1], R, G, spec)

    return f


def pack_conv_ode_inputs(params: dict, B: int, spec: co.ConvODESpec,
                         dtype=jnp.float32):
    """Build the 39 kernel weight arrays (lane dims padded to NP)."""
    N = B * spec.positions
    NP = _round_up(N, _LANE)

    def padN(a):
        return (a if a.shape[-1] == NP
                else jnp.pad(a, ((0, 0), (0, NP - a.shape[-1]))))

    arrays = []
    for kernel, bias in params["conv"]:
        kernel = jnp.asarray(kernel, dtype)
        arrays += co.pack_conv_weights(kernel, spec, dtype)
        arrays.append(jnp.asarray(bias, dtype)[:, None])
        arrays.append(padN(co.t_channel_map(kernel, B, spec, dtype)))
    # reorder: conv0 slices, b0, tm0, conv1 slices, b1, tm1 is already the
    # loop order above.
    for s, b in params["gn"]:
        arrays.append(jnp.asarray(s, dtype)[:, None])
        arrays.append(jnp.asarray(b, dtype)[:, None])
    masks = co.lane_masks(B, spec, dtype)
    for off in co.OFFSETS:
        arrays.append(padN(masks[off]))
    R = co.reduce_matrix(B, spec, dtype)                       # [N, B]
    arrays.append(jnp.pad(R, ((0, NP - N), (0, 0))))
    arrays.append(co.group_matrix(spec, dtype))
    return arrays, NP


@functools.partial(
    jax.jit,
    static_argnames=("spec", "method", "safety", "ifactor", "dfactor",
                     "max_steps", "n_blocks", "interpret"))
def conv_solve(warrays, spec: co.ConvODESpec, y0: Array, tau: Array,
               dt0: Array, rtol, atol, sign, f0: Array, *,
               method: str = "dopri5", safety: float = 0.9,
               ifactor: float = 10.0, dfactor: float = 0.2,
               max_steps: int = 2 ** 31 - 1, n_blocks: int = 1,
               interpret: bool = False):
    """y0/f0: [C, n_blocks * NPb] feature-major (lane-padded per block);
    tau [T] increasing canonical times, sign as in solvers/base.py.

    n_blocks > 1 runs one whole-solve per batch block as SEQUENTIAL GRID
    PROGRAMS sharing a single kernel launch (weights replicated per
    program via index maps; each program owns its own [C, NPb] state
    slice, scratch, and step controller) — replacing the former
    `lax.map` over separate launches, whose per-dispatch overhead
    dominated training-batch wall-clock (round-2 verdict item 5).

    Returns (out [T, C, n_blocks * NPb], stats [n_blocks, 4] int32 —
    per-block nfe/accepted/rejected/status).
    """
    from . import tableaus as _tabs
    tab = _tabs.TABLEAUS_BY_NAME[method]
    C, NP_total = y0.shape
    if NP_total % n_blocks:
        raise ValueError(f"lane count {NP_total} not divisible by "
                         f"n_blocks {n_blocks}")
    NP = NP_total // n_blocks
    T = int(tau.shape[0])
    dtype = y0.dtype
    # True lane count per block, statically: R is [NP, B].
    B = warrays[37].shape[1]
    N_true = B * spec.positions

    dt_min = (4.0 * jnp.finfo(dtype).eps
              * jnp.maximum(jnp.maximum(jnp.abs(tau[0]), jnp.abs(tau[-1])),
                            1.0)).astype(dtype)

    # Interpret mode (CPU) uses jnp.roll — pltpu.roll is the Mosaic
    # primitive; the math is identical.
    def make_f(wrefs):
        return _make_conv_f(wrefs, spec, use_pltpu_roll=not interpret)

    kernel = _make_solve_kernel(tab, T, safety, ifactor, dfactor,
                                int(max_steps), float(C * N_true), N_true,
                                make_f, len(warrays),
                                per_block_io=n_blocks > 1)

    smem_t = pl.BlockSpec(memory_space=pltpu.SMEM)
    vmem = pl.BlockSpec(memory_space=pltpu.VMEM)

    # dt0: per-block row [1, n_blocks] (each grid program reads its own
    # initial step at program_id) or a scalar broadcast — clamped to
    # dt_min (dt0 == 0 would be accepted forever without progress).
    dt0 = jnp.maximum(jnp.abs(jnp.asarray(dt0, dtype)), dt_min)
    dt0 = jnp.broadcast_to(dt0.reshape(-1),
                           (n_blocks,)).reshape(1, n_blocks)

    tau = tau.astype(dtype)
    valid = (jnp.all(jnp.diff(tau) > 0) if T > 1
             else jnp.asarray(True)).astype(jnp.int32)
    scalar_ins = (tau.reshape(1, T), dt0,
                  jnp.reshape(jnp.asarray(rtol, dtype), (1, 1)),
                  jnp.reshape(jnp.asarray(atol, dtype), (1, 1)),
                  jnp.reshape(dt_min, (1, 1)),
                  jnp.reshape(jnp.asarray(sign, dtype), (1, 1)),
                  jnp.reshape(valid, (1, 1)))
    scratch = [pltpu.VMEM((C, NP), dtype)] * 3

    if n_blocks == 1:
        # No grid: whole-array refs, zero pipelining machinery (the grid
        # variant measured 5x slower + 5x compile at a single block).
        out, stats = solver_pallas_call(
            kernel,
            in_specs=[smem_t] * 7 + [vmem] * (2 + len(warrays)),
            out_specs=[vmem, smem_t],
            out_shape=[jax.ShapeDtypeStruct((T, C, NP), dtype),
                       jax.ShapeDtypeStruct((1, 4), jnp.int32)],
            scratch_shapes=scratch,
            interpret=interpret,
        )(*scalar_ins, y0, f0, *warrays)
        return out, stats[0]

    # Sequential grid over blocks, one launch: block-sliced state/output,
    # replicated weights; per-block dt0/stats ride FULL SMEM arrays with
    # program_id indexing (Mosaic requires SMEM blocks to equal the array
    # dims). Scratch is reused program-to-program (TPU grids run
    # sequentially).
    state_spec = pl.BlockSpec((C, NP), lambda i: (0, i),
                              memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((T, C, NP), lambda i: (0, 0, i),
                            memory_space=pltpu.VMEM)
    out, stats = solver_pallas_call(
        kernel,
        grid=(n_blocks,),
        in_specs=([smem_t] * 7
                  + [state_spec, state_spec]
                  + [rep_spec(w.shape) for w in warrays]),
        out_specs=[out_spec, smem_t],
        out_shape=[jax.ShapeDtypeStruct((T, C, NP_total), dtype),
                   jax.ShapeDtypeStruct((n_blocks, 4), jnp.int32)],
        scratch_shapes=scratch,
        interpret=interpret,
    )(*scalar_ins, y0, f0, *warrays)
    return out, stats
