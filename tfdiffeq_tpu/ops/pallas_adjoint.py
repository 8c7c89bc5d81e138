"""Fused continuous-adjoint backward sweep for MLP neural ODEs.

One Pallas kernel runs the ENTIRE adjoint backward pass of
`odeint_adjoint` (SURVEY.md §3.3) for autonomous MLP dynamics: the loop
over observation intervals, the stored-forward-state resets, the cotangent
injections, every adaptive RK step on the augmented system, the in-stage
MLP forward+VJP, the tolerance-scaled error norm over (y, a_y, a_params),
the step controller, and the parameter-gradient quadrature — with all
state in VMEM. Only (dL/dy0, dL/dparams, 4 stats ints) leave the chip.

This is the training-path counterpart of `pallas_kernels.mlp_solve`
(forward): together they make `fast.odeint_adjoint_mlp` a two-kernel
training step, vs ~10^2 XLA kernel launches per solver step on the
generic path (each launch costs ~5us through this testbed's tunnel).

Augmented dynamics (tau = sign*t increasing canonical time, sigma = -tau
so every backward interval integrates FORWARD in sigma; g = sign*f):

    dy/dsigma   = -sign * f(y)
    da_y/dsigma = +sign * (df/dy)^T a_y
    da_w/dsigma = +sign * (df/dw)^T a_y        (pure quadrature)

The MLP VJP is hand-built from the same outer-product/sublane-reduction
primitives as the forward net (exact f32 on the VPU, no MXU bf16 passes);
activation derivatives come from `_ACTIVATION_GRADS`.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .pallas_kernels import (solver_pallas_call,  # noqa: F401
                             _ACTIVATION_GRAD2, _ACTIVATION_GRADS,
                             rep_spec,
                             _ACTIVATIONS, _LANE, _controller_factor,
                             _input_transform, _layer_uses_mxu, _pad_rows,
                             _round_up, pick_pack, unpack_state,
                             unpack_state_blocks)

Array = jax.Array


def _adjoint_pack(pack, D: int, B: int) -> int:
    """Group count for the backward sweep's sublane packing. Unlike the
    forward, the adjoint is gated on B being a multiple of k*LANE: the
    kernel's lane masks (`lane < B_true`) and the weight-quadrature lane
    reductions are then vacuously exact with NO pad lanes to pin, and the
    per-group aug walk needs no group-aware masking."""
    if pack != "auto":
        return int(pack)
    k = pick_pack(D, B)
    while k > 1 and B % (k * _LANE) != 0:
        k //= 2
    return k


def pack_traj(x: Array, k: int) -> Array:
    """[T, D, B] -> [T, k*D, B/k] (pack_state over the trailing axes)."""
    T, D, B = x.shape
    return x.reshape(T, D, k, B // k).swapaxes(1, 2).reshape(
        T, k * D, B // k)


def pack_traj_blocks(x: Array, k: int, n_blocks: int) -> Array:
    """[T, D, B] -> [T, k*D, n_blocks*(B/n/k)]: pack_state_blocks over the
    trailing axes (lane-contiguous grid blocks, each packed on its own)."""
    T, D, B = x.shape
    Bb = B // n_blocks
    Lb = Bb // k
    xs = x.reshape(T, D, n_blocks, k, Lb)
    xs = jnp.transpose(xs, (0, 3, 1, 2, 4))      # [T, k, D, n, Lb]
    return xs.reshape(T, k * D, n_blocks * Lb)


def packed_aug_factory(base_factory, k: int, D: int):
    """Lift an aug_eval factory to the packed [k*D, B/k] layout: f/v_y/v_t
    evaluate per sample-group on row slices; the parameter-cotangent
    blocks (layout-shaped, lane-free) SUM over groups."""
    def factory(wrefs):
        base = base_factory(wrefs)

        def aug_eval(t, y, ay):
            fs, vys, vts = [], [], []
            dps = None
            for gi in range(k):
                sl = slice(gi * D, (gi + 1) * D)
                f, v_y, dparams, v_t = base(t, y[sl, :], ay[sl, :])
                fs.append(f)
                vys.append(v_y)
                vts.append(v_t)
                dps = (list(dparams) if dps is None
                       else [a + b for a, b in zip(dps, dparams)])
            return (jnp.concatenate(fs, axis=0),
                    jnp.concatenate(vys, axis=0), dps,
                    jnp.concatenate(vts, axis=0))

        return aug_eval

    return factory


def _make_aug_eval(wrefs, dims, activation: str, final_activation: str,
                   input_power: int, matmul: str = "vpu",
                   time_input: bool = False, parts: str = "all"):
    """Build F(t, y, a_y) -> (f, v_y, [dW0, db0, dW1, db1, ...], v_t).

    `parts` trims the evaluator for the per-lane adjoint's two-pass
    structure (acceptance must be decided BEFORE the lane-reduced weight
    quadrature may accumulate, so the trial chain and the quadrature run
    as separate passes): 'dyn' -> (f, v_y) only, skipping every dW/db
    outer product; 'quad' -> (flat_dparams, v_t) only (the dh chain still
    runs — it feeds the deeper layers' cotangents). Both are linear in
    a_y, so the caller folds per-lane quadrature weights into a_y.

    f = MLP([y; t]) with y [D, B] feature-major; v_y = (df/dy)^T a_y
    [D, B]; dW [doutP, dinP] (wT layout), db [doutP, 1] are batch-summed
    parameter cotangents; v_t [1, B] = a_y . df/dt per sample (zeros when
    autonomous). With `time_input`, the first layer's din = D + 1 with the
    scalar time as the LAST input feature (the `_make_net` convention), so
    the t-row of the layer-0 input cotangent IS a_y . df/dt — no extra
    forward-mode pass. Per layer (`_layer_uses_mxu`), contractions run
    either unrolled over TRUE feature dims on the VPU, or as
    systolic-array dots (forward, the dW outer-product reduction, and the
    dh back-contraction each map to one `dot_general`).
    """
    L = len(dims)
    acts = [activation] * (L - 1) + [final_activation]

    def aug_eval(t, y, a_y):
        B = y.shape[1]
        dtype = y.dtype
        # ---- forward, keeping layer inputs and pre-activations ----
        h = _input_transform(y, input_power)
        if time_input:
            # Full layer-0 input including the t row: the VJP then yields
            # dW's t-column and v_t with no special cases.
            h = jnp.concatenate(
                [h[:dims[0][0] - 1, :], h[:1, :] * 0.0 + t], axis=0)
        hs = [h]          # layer INPUTS (h_0 ... h_{L-1})
        zs = []           # pre-activations
        for l, (din, dout) in enumerate(dims):
            wT = wrefs[2 * l]
            b = wrefs[2 * l + 1]
            if _layer_uses_mxu(matmul, din, dout):
                hp = (h if h.shape[0] == wT.shape[1]
                      else _pad_rows(h[:din, :], wT.shape[1]))
                # HIGHEST: the default single-pass bf16 dot (~2e-3 rel)
                # would swamp the embedded error estimate (see _make_net).
                acc = jnp.dot(wT[:, :], hp, preferred_element_type=dtype,
                              precision=jax.lax.Precision.HIGHEST)
            else:
                acc = None
                for i in range(din):
                    term = wT[:, i:i + 1] * h[i:i + 1, :]
                    acc = term if acc is None else acc + term
            z = acc + b[:]
            zs.append(z)
            h = _ACTIVATIONS[acts[l]](z)
            hs.append(h)
        D_out = dims[-1][1]
        f = h[:D_out, :]

        # ---- backward (cotangent a_y on f) ----
        dparams = [None] * L
        # dz has TRUE rows [dout, B] at every layer.
        dz = a_y * _ACTIVATION_GRADS[acts[-1]](zs[-1][:D_out, :],
                                               hs[-1][:D_out, :])
        for l in range(L - 1, -1, -1):
            din, dout = dims[l]
            wT = wrefs[2 * l]
            doutP, dinP = wT.shape
            use_mxu = _layer_uses_mxu(matmul, din, dout)
            # Pad dz rows to doutP for full-height elementwise ops.
            if doutP != dout:
                dz_p = jnp.concatenate(
                    [dz, jnp.zeros((doutP - dout, B), dtype)], axis=0)
            else:
                dz_p = dz
            h_in = hs[l]
            if parts != "dyn":
                if use_mxu:
                    # dW[o, i] = sum_b dz[o, b] h_in[i, b]: one NT matmul.
                    h_in_p = _pad_rows(h_in[:din, :], dinP)
                    dW = jax.lax.dot_general(
                        dz_p, h_in_p, (((1,), (1,)), ((), ())),
                        preferred_element_type=dtype,
                        precision=jax.lax.Precision.HIGHEST)  # [doutP,dinP]
                else:
                    # Lane reduction per input feature; padded columns
                    # stay 0.
                    cols = [jnp.sum(h_in[i:i + 1, :] * dz_p, axis=1,
                                    keepdims=True) for i in range(din)]
                    if dinP != din:
                        cols.append(jnp.zeros((doutP, dinP - din), dtype))
                    dW = jnp.concatenate(cols, axis=1)       # [doutP,dinP]
                db = jnp.sum(dz_p, axis=1, keepdims=True)    # [doutP, 1]
                dparams[l] = (dW, db)
            # dh_in[i, :] = sum_o w[i, o] dz[o, :].
            if use_mxu:
                dh = jax.lax.dot_general(
                    wT[:, :], dz_p, (((0,), (0,)), ((), ())),
                    preferred_element_type=dtype,
                    precision=jax.lax.Precision.HIGHEST)[:din, :]  # [din, B]
            else:
                rows = [jnp.sum(wT[:, i:i + 1] * dz_p, axis=0,
                                keepdims=True) for i in range(din)]
                dh = jnp.concatenate(rows, axis=0)           # [din, B]
            if l > 0:
                din_prev, dout_prev = dims[l - 1]
                dz = dh * _ACTIVATION_GRADS[acts[l - 1]](
                    zs[l - 1][:dout_prev, :], hs[l][:dout_prev, :])
            else:
                if time_input:
                    n_state = dims[0][0] - 1
                    v_t = dh[n_state:n_state + 1, :]      # a_y . df/dt
                    dh = dh[:n_state, :]
                else:
                    v_t = dh[:1, :] * 0.0
                if input_power == 1:
                    v_y = dh
                else:
                    # d(y**p)/dy = p * y**(p-1)
                    yp = _input_transform(y, input_power - 1)
                    v_y = dh * (float(input_power) * yp)
        if parts == "dyn":
            return f, v_y
        flat = [blk for pair in dparams for blk in pair]
        if parts == "quad":
            return flat, v_t
        return f, v_y, flat, v_t

    return aug_eval


def _make_cnf_aug_eval(wrefs, dims, activation: str):
    """Augmented-CNF eval for the fused adjoint: F(t, y, a) with
    y = [z (D rows); logp] and a = [a_z; a_logp].

    Returns (F = [f; -div], v_y = (dF/dy)^T a (logp row zero),
    [(dW, db), ...], v_t = a . dF/dt) for the concat-t flow MLP
    f(t, z) whose EXACT divergence is part of the dynamics
    (pallas_kernels._make_cnf_net is the forward counterpart). The
    divergence VJP is second-order: forward-over-reverse through the D
    in-kernel JVP passes, with act'' from _ACTIVATION_GRAD2 — everything
    unrolled over TRUE feature dims on the VPU (CNF state dims are small).

    Parity contract: matches jax.vjp of models.cnf.augmented_dynamics
    (trace='exact') to f32 roundoff (tests/test_fused_adjoint.py).
    """
    L = len(dims)
    D = dims[-1][1]
    act = _ACTIVATIONS[activation]
    actg = _ACTIVATION_GRADS[activation]
    actg2 = _ACTIVATION_GRAD2[activation]

    def matvec(wT, x, din):
        """W x: unrolled VPU contraction; x [din, B] -> [doutP, B]."""
        acc = None
        for i in range(din):
            term = wT[:, i:i + 1] * x[i:i + 1, :]
            acc = term if acc is None else acc + term
        return acc

    def matvec_T(wT, x, din, dout):
        """W^T x: sublane reductions; x [>=dout, B] -> [din, B]."""
        rows = [jnp.sum(wT[:dout, i:i + 1] * x[:dout, :], axis=0,
                        keepdims=True) for i in range(din)]
        return jnp.concatenate(rows, axis=0)

    def outer_acc(v, h, din, dout, doutP, dinP, dtype):
        """dW[o, i] += sum_b v[o, b] h[i, b] in padded [doutP, dinP]."""
        cols = [jnp.sum(h[i:i + 1, :] * v, axis=1, keepdims=True)
                for i in range(din)]
        if dinP != din:
            cols.append(jnp.zeros((doutP, dinP - din), dtype))
        return jnp.concatenate(cols, axis=1)

    def aug_eval(t, y, a_y):
        dtype = y.dtype
        B = y.shape[1]
        z = y[:D, :]
        a_z = a_y[:D, :]
        a_l = a_y[D:D + 1, :]                      # [1, B]
        one = (y[:1, :] * 0.0) + 1.0

        # ---- primal forward, storing layer inputs / pre-activations ----
        h = jnp.concatenate([z, one * t], axis=0)  # [D+1, B]
        hs = [h]
        zs, gs, g2s = [], [], []
        for l, (din, dout) in enumerate(dims):
            zpre = matvec(wrefs[2 * l], h, din) + wrefs[2 * l + 1][:]
            zs.append(zpre)
            if l < L - 1:
                a_full = act(zpre)
                gs.append(actg(zpre, a_full))
                g2s.append(actg2(zpre, a_full, gs[-1]))
                h = a_full
            else:
                gs.append(None)
                g2s.append(None)
                h = zpre
            hs.append(h)
        f = h[:D, :]

        # ---- divergence via D JVP passes (store u, v per layer) ----
        us, vs = [], []                            # us[i][l], vs[i][l]
        div = None
        for i0 in range(D):
            u_l, v_l = [], []
            u = None
            for l, (din, dout) in enumerate(dims):
                if l == 0:
                    v = wrefs[0][:, i0:i0 + 1] * one
                else:
                    v = matvec(wrefs[2 * l], u, din)
                u = gs[l] * v if l < L - 1 else v
                v_l.append(v)
                u_l.append(u)
            us.append(u_l)
            vs.append(v_l)
            d_i = u[i0:i0 + 1, :]
            div = d_i if div is None else div + d_i
        F = jnp.concatenate([f, -div], axis=0)

        # ---- part A: plain f-VJP with cotangent a_z ----
        dW_A, db_A = [None] * L, [None] * L
        dz = a_z                                    # final layer linear
        v_z_A = v_t_A = None
        for l in range(L - 1, -1, -1):
            din, dout = dims[l]
            wT = wrefs[2 * l]
            doutP, dinP = wT.shape
            dz_p = (dz if dz.shape[0] == doutP else jnp.concatenate(
                [dz, jnp.zeros((doutP - dz.shape[0], B), dtype)], axis=0))
            dW_A[l] = outer_acc(dz_p, hs[l], din, dout, doutP, dinP, dtype)
            db_A[l] = jnp.sum(dz_p, axis=1, keepdims=True)
            dh = matvec_T(wT, dz_p, din, dout)
            if l > 0:
                dz = gs[l - 1][:dims[l - 1][1], :] * dh
            else:
                v_z_A = dh[:D, :]
                v_t_A = dh[D:D + 1, :]

        # ---- part B: divergence VJP with cotangent a_l (scalar/sample).
        # Direct path: reverse through each JVP chain, accumulating
        # per-layer pre-activation cotangents (the z-dependence of actg
        # factors) and direct dW terms; then inject the accumulated
        # zbar through the primal net.
        dW_B = [jnp.zeros_like(wrefs[2 * l][:]) for l in range(L)]
        zbar = [None] * L                          # cotangent on zs[l]
        for i0 in range(D):
            # ubar at the last layer: a_l on component i0 only.
            ub = None
            for l in range(L - 1, -1, -1):
                din, dout = dims[l]
                wT = wrefs[2 * l]
                doutP, dinP = wT.shape
                if l == L - 1:
                    # a_l injected on row i0 only (iota mask: Mosaic
                    # rejects zero-sized concat pieces at i0 = 0/top).
                    rmask = jax.lax.broadcasted_iota(
                        jnp.int32, (doutP, B), 0) == i0
                    vb = jnp.where(rmask, a_l, 0.0)
                else:
                    ub_p = (ub if ub.shape[0] == doutP
                            else jnp.concatenate(
                                [ub, jnp.zeros((doutP - ub.shape[0], B),
                                               dtype)], axis=0))
                    vb = gs[l] * ub_p
                    zb = (g2s[l] * vs[i0][l] * ub_p)[:dout, :]
                    zbar[l] = zb if zbar[l] is None else zbar[l] + zb
                # direct dW: vb x u_{l-1} (u_{-1} = e_{i0}).
                if l == 0:
                    col = jnp.sum(vb, axis=1, keepdims=True)   # [doutP, 1]
                    cmask = jax.lax.broadcasted_iota(
                        jnp.int32, dW_B[0].shape, 1) == i0
                    dW_B[0] = dW_B[0] + jnp.where(cmask, col, 0.0)
                else:
                    dW_B[l] = dW_B[l] + outer_acc(
                        vb, us[i0][l - 1], din, dout, doutP, dinP, dtype)
                    ub = matvec_T(wT, vb, din, dout)

        # Inject accumulated zbar through the primal backward.
        db_B = [jnp.zeros_like(wrefs[2 * l + 1][:]) for l in range(L)]
        v_z_B = jnp.zeros((D, B), dtype)
        v_t_B = jnp.zeros((1, B), dtype)
        delta = None
        for l in range(L - 1, -1, -1):
            din, dout = dims[l]
            wT = wrefs[2 * l]
            doutP, dinP = wT.shape
            inj = zbar[l]
            if delta is None:
                delta = inj
            elif inj is not None:
                delta = delta + inj
            if delta is None:
                continue
            d_p = (delta if delta.shape[0] == doutP else jnp.concatenate(
                [delta, jnp.zeros((doutP - delta.shape[0], B), dtype)],
                axis=0))
            dW_B[l] = dW_B[l] + outer_acc(d_p, hs[l], din, dout, doutP,
                                          dinP, dtype)
            db_B[l] = db_B[l] + jnp.sum(d_p, axis=1, keepdims=True)
            dh = matvec_T(wT, d_p, din, dout)
            if l > 0:
                delta = gs[l - 1][:dims[l - 1][1], :] * dh
            else:
                v_z_B = v_z_B + dh[:D, :]
                v_t_B = v_t_B + dh[D:D + 1, :]

        # Combine: dynamics carry -div, so part B enters negated.
        v_y = jnp.concatenate(
            [v_z_A - v_z_B, jnp.zeros((1, B), dtype)], axis=0)
        v_t = v_t_A - v_t_B
        flat = []
        for l in range(L):
            flat.append(dW_A[l] - dW_B[l])
            flat.append(db_A[l] - db_B[l])
        return F, v_y, flat, v_t

    return aug_eval


def _make_adjoint_kernel(tab, T: int, safety: float, ifactor: float,
                         dfactor: float, max_steps: int, denom: float,
                         B_true: int, aug_factory, n_in: int, n_acc: int,
                         seminorm: bool, time_input: bool = False,
                         per_block_io: bool = False,
                         stream_io: bool = False):
    """Kernel: the full backward sweep. Ref layout (inputs then outputs then
    scratch):

      SMEM in : sigma [1,T], dt0, rtol, atol, dtmin, sign_f
      VMEM in : ys [T,D,B], g [T,D,B], const refs (n_in of them)
      out     : ay0 [D,B], n_acc parameter-cotangent accumulators (shapes
                chosen by the caller; e.g. per-layer (aw [doutP,dinP],
                ab [doutP,1]) for MLPs, one block per packed const for
                plan dynamics), stats [1,4] (SMEM), at [1,1] (SMEM;
                integrated a_t quadrature — 0 for autonomous dynamics)
      scratch : y, ay, comp_y, comp_ay (all [D,B])

    `aug_factory(wrefs)` builds aug_eval(t, y, a_y) ->
    (f, v_y, flat_dparams[n_acc], v_t) — the augmented-dynamics evaluator
    (MLP VJP, CNF second-order VJP, or a jaxpr-bridge plan VJP).

    stream_io (round-4 verdict item 7): ys and g stay in HBM
    (memory_space ANY) and one [1, D, B] row of each DMAs into VMEM
    staging buffers per observation interval — for batch-coupled (bsum)
    dynamics whose ys+g trajectory buffers exceed the VMEM budget but
    whose [D, B] state fits (grid blocks cannot serve a bsum: per-block
    controllers would integrate a different ODE). O(T) synchronous row
    copies per sweep.
    """
    stages = tab.stages

    def kernel(*refs):
        (sigma_ref, dt0_ref, rtol_ref, atol_ref, dtmin_ref, sf_ref) = refs[:6]
        ys_ref, g_ref = refs[6:8]
        wrefs = refs[8:8 + n_in]
        ay0_ref = refs[8 + n_in]
        awrefs = refs[9 + n_in: 9 + n_in + n_acc]
        stats_ref = refs[9 + n_in + n_acc]
        at_ref = refs[10 + n_in + n_acc]
        if stream_io:
            (y_s, ay_s, cy_s, cay_s, ysrow_s, grow_s,
             dma_sem) = refs[11 + n_in + n_acc:]
        else:
            y_s, ay_s, cy_s, cay_s = refs[11 + n_in + n_acc:]
        pid = pl.program_id(0) if per_block_io else 0

        def load_rows(i):
            """Return (ys[i], g[i]) as [D, B] values."""
            if stream_io:
                cp = pltpu.make_async_copy(
                    ys_ref.at[pl.ds(i, 1)], ysrow_s, dma_sem)
                cp.start()
                cp.wait()
                cp = pltpu.make_async_copy(
                    g_ref.at[pl.ds(i, 1)], grow_s, dma_sem)
                cp.start()
                cp.wait()
                return ysrow_s[0], grow_s[0]
            return ys_ref[pl.ds(i, 1)][0], g_ref[pl.ds(i, 1)][0]

        rtol = rtol_ref[0, 0]
        atol = atol_ref[0, 0]
        dt_min = dtmin_ref[0, 0]
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
            # Grid mode: the parameter-cotangent accumulators are
            # revisited output windows shared by every sequential grid
            # program (the standard Pallas reduction idiom) — zero them
            # once, then every block's quadrature adds in.
            @pl.when(pid == 0)
            def _():
                for r in awrefs:
                    r[:] = jnp.zeros_like(r)
        else:
            for r in awrefs:
                r[:] = jnp.zeros_like(r)
        ay_s[:] = jnp.zeros_like(ay_s)

        def interval_body(ii, carry):
            dt, at, nfe, nacc, nrej, status = carry
            i = T - 1 - ii
            # Reset y to the stored forward state; inject the cotangent.
            ys_i, g_i = load_rows(i)
            y_s[:] = ys_i
            ay_s[:] = ay_s[:] + g_i
            cy_s[:] = jnp.zeros_like(cy_s)
            cay_s[:] = jnp.zeros_like(cay_s)
            s_start = sigma_ref[0, i]
            s_end = sigma_ref[0, i - 1]

            def cond(c):
                s, dt, at, nfe, nacc, nrej, status = c
                return (s < s_end) & (status == 0)

            def body(c):
                s, dt, at, nfe, nacc, nrej, status = c
                rem = s_end - s
                dt_eff = jnp.minimum(dt, rem)
                is_last = dt >= rem
                s1 = jnp.where(is_last, s_end, s + dt_eff)
                dth = s1 - s

                y0 = y_s[:]
                ay0 = ay_s[:]

                # ---- RK stages on the augmented state ----
                ky, kay, kws, kat = [], [], [], []
                for st in range(stages):
                    if st == 0:
                        yi, ayi = y0, ay0
                    else:
                        yi, ayi = y0, ay0
                        for aij, (kyj, kayj) in zip(tab.a[st - 1],
                                                    zip(ky, kay)):
                            if aij != 0.0:
                                yi = yi + (dth * aij) * kyj
                                ayi = ayi + (dth * aij) * kayj
                    k1, k2, k3, k4 = rhs_fn(s + tab.c[st] * dth, yi, ayi)
                    ky.append(k1)
                    kay.append(k2)
                    kws.append(k3)
                    kat.append(k4)

                def comb(coeffs, ks):
                    acc = None
                    for cjj, kj in zip(coeffs, ks):
                        if cjj != 0.0:
                            term = (dth * cjj) * kj
                            acc = term if acc is None else acc + term
                    return acc

                d_y = comb(tab.b_sol, ky)
                d_ay = comb(tab.b_sol, kay)
                e_y = comb(tab.b_err, ky)
                e_ay = comb(tab.b_err, kay)
                d_at = comb(tab.b_sol, kat)
                e_at = comb(tab.b_err, kat)
                at1 = at + d_at

                d_ws, e_ws = [], []
                for j in range(n_acc):
                    d_ws.append(comb(tab.b_sol, [k[j] for k in kws]))
                    e_ws.append(comb(tab.b_err, [k[j] for k in kws]))

                y1 = y0 + d_y
                ay1 = ay0 + d_ay

                # ---- error norm over the full augmented state ----
                lane = jax.lax.broadcasted_iota(jnp.int32, y0.shape, 1)
                valid = lane < B_true

                def esc_sq(e, v0, v1, mask=None):
                    scale = atol + rtol * jnp.maximum(jnp.abs(v0),
                                                      jnp.abs(v1))
                    esc = e / scale
                    if mask is not None:
                        esc = jnp.where(mask, esc, 0.0)
                    return jnp.sum(esc * esc)

                ss = esc_sq(e_y, y0, y1, valid) + esc_sq(e_ay, ay0, ay1,
                                                         valid)
                fin_chk = (jnp.all(jnp.isfinite(jnp.where(valid, y1, 0.0)))
                           & jnp.all(jnp.isfinite(jnp.where(valid, ay1,
                                                            0.0))))
                if not seminorm:
                    for j in range(n_acc):
                        aw0 = awrefs[j][:]
                        ss = ss + esc_sq(e_ws[j], aw0, aw0 + d_ws[j])
                    if time_input:
                        sc_at = atol + rtol * jnp.maximum(jnp.abs(at),
                                                          jnp.abs(at1))
                        ss = ss + (e_at / sc_at) ** 2
                ratio = jnp.sqrt(ss / denom)
                finite = jnp.isfinite(ss) & fin_chk
                accept = (ratio <= 1.0) & finite

                fac = _controller_factor(ratio, finite, accept, safety,
                                         ifactor, dfactor, tab.order)
                dt_next = dth * fac

                # Kahan-compensated accumulation for y and a_y. Pad lanes
                # are pinned to exactly 0: without the mask they would
                # integrate dy/dsigma = -sign*f(y) from y=0 (f(0) != 0 with
                # biases) and a divergent pad state reaching Inf would turn
                # the 0*Inf in the weight-quadrature lane reductions into
                # NaN that contaminates true gradients.
                adj_y = d_y - cy_s[:]
                y_new = jnp.where(valid, y0 + adj_y, 0.0)
                adj_ay = d_ay - cay_s[:]
                ay_new = jnp.where(valid, ay0 + adj_ay, 0.0)

                @pl.when(accept)
                def _():
                    cy_s[:] = jnp.where(valid, (y_new - y0) - adj_y, 0.0)
                    y_s[:] = y_new
                    cay_s[:] = jnp.where(valid, (ay_new - ay0) - adj_ay, 0.0)
                    ay_s[:] = ay_new
                    for j in range(n_acc):
                        awrefs[j][:] = awrefs[j][:] + d_ws[j]

                n_att = nacc + nrej + 1
                status = jnp.where(
                    (~accept) & (dt_next < dt_min) & (status == 0),
                    jnp.int32(2), status)
                status = jnp.where(
                    (n_att >= max_steps) & (s1 < s_end) & (status == 0),
                    jnp.int32(1), status)
                return (jnp.where(accept, s1, s), dt_next,
                        jnp.where(accept, at1, at), nfe + stages,
                        nacc + accept.astype(jnp.int32),
                        nrej + (~accept).astype(jnp.int32), status)

            init = (s_start, dt, at, nfe, nacc, nrej, status)
            s, dt, at, nfe, nacc, nrej, status = jax.lax.while_loop(
                cond, body, init)
            return dt, at, nfe, nacc, nrej, status

        status0 = jnp.int32(0)
        carry0 = (dt0_ref[0, pid], jnp.zeros((), ys_ref.dtype),
                  jnp.int32(0), jnp.int32(0), jnp.int32(0), status0)
        dt, at, nfe, nacc, nrej, status = jax.lax.fori_loop(
            0, T - 1, interval_body, carry0)

        _, g_0 = load_rows(0)
        ay0_ref[:] = ay_s[:] + g_0
        at_ref[0, pid] = at
        stats_ref[pid, 0] = nfe
        stats_ref[pid, 1] = nacc
        stats_ref[pid, 2] = nrej
        stats_ref[pid, 3] = status

    return kernel


def _make_perlane_adjoint_kernel(tab, T: int, safety: float, ifactor: float,
                                 dfactor: float, max_steps: int, D: int,
                                 B_true: int, dyn_factory, quad_factory,
                                 n_in: int, n_acc: int,
                                 time_input: bool = False):
    """PER-LANE adjoint backward sweep (round-4 verdict item 3): every
    batch lane steps the augmented system (y, a_y) with its OWN
    controller state, so one stiff sample no longer throttles the whole
    batch's backward pass — per-sample stepping for TRAINING, the
    capability `jax.vmap(generic adjoint)` provides at dispatch-bound
    speed, here in one kernel.

    Structure: the OUTER loop over observation intervals stays globally
    synchronized (cotangent injections and stored-forward-state resets
    happen at fixed observation times — the same sync points the
    vmap-of-generic semantics has), while the INNER while steps lanes
    independently until every lane reaches the interval end.

    The parameter-cotangent quadrature is lane-REDUCED (a_w is shared by
    all lanes), so it cannot ride the per-lane trial step: acceptance must
    be decided first. Hence the TWO-PASS step:

      pass 1 ('dyn'):  the RK trial chain on (y, a_y) only — per-lane
        seminorm error over the 2D features, per-lane accept/controller
        (seminorm is forced: a lane-shared quadrature error cannot drive
        per-lane step control; it is also the recommended adjoint norm,
        Kidger et al. 2020).
      pass 2 ('quad'): for each stage, the parameter/time cotangent
        contributions with the per-lane quadrature weight row
        w = accept * dth * b_sol[stage] FOLDED INTO a_y — every cotangent
        is columnwise-linear in a_y (the VJP chain is per-lane until its
        terminal lane reductions), so quad_eval(t, y_st, a_st * w) returns
        the exactly-weighted, lane-summed increments. Stage states are
        rebuilt from the pass-1 k values; the pass is skipped when no lane
        accepted.

    dyn_factory(wrefs) -> (t, y, ay) -> (f, v_y);
    quad_factory(wrefs) -> (t, y, ay) -> (flat_dparams[n_acc], v_t [1,B]).
    Stage times are per-lane [1, B] rows (both factories broadcast row-t).

    Ref layout: SMEM in sigma [1,T], rtol, atol, dtmin, sign; VMEM in
    ys [T,D,B], g [T,D,B], dt0_row [1,B], wrefs (n_in); outs ay0 [D,B],
    n_acc accumulators, stats [1,4] (SMEM; nfe/acc/rej summed over real
    lanes, status max), at [1,1] (SMEM), lane_ref [4,B] int32; scratch
    y/ay/cy/cay [D,B], at_s [1,B], sdt_s [2,B], li_s [4,B] int32."""
    stages = tab.stages

    def kernel(*refs):
        (sigma_ref, rtol_ref, atol_ref, dtmin_ref, sf_ref) = refs[:5]
        ys_ref, g_ref, dt0_ref = refs[5:8]
        wrefs = refs[8:8 + n_in]
        ay0_ref = refs[8 + n_in]
        awrefs = refs[9 + n_in: 9 + n_in + n_acc]
        stats_ref = refs[9 + n_in + n_acc]
        at_ref = refs[10 + n_in + n_acc]
        lane_ref = refs[11 + n_in + n_acc]
        (y_s, ay_s, cy_s, cay_s, at_s, sdt_s, li_s) = \
            refs[12 + n_in + n_acc:]

        rtol = rtol_ref[0, 0]
        atol = atol_ref[0, 0]
        dt_min = dtmin_ref[0, 0]
        sf = sf_ref[0, 0]
        B = y_s.shape[1]

        dyn_eval = dyn_factory(wrefs)
        quad_eval = quad_factory(wrefs)

        lane = jax.lax.broadcasted_iota(jnp.int32, (1, B), 1)
        is_real = lane < B_true

        for r in awrefs:
            r[:] = jnp.zeros_like(r)
        ay_s[:] = jnp.zeros_like(ay_s)
        at_s[:] = jnp.zeros_like(at_s)
        sdt_s[1:2, :] = dt0_ref[:]
        zi = jnp.zeros((1, B), jnp.int32)
        li_s[0:1, :] = zi
        li_s[1:2, :] = zi
        li_s[2:3, :] = zi
        li_s[3:4, :] = zi

        def interval_body(ii, _):
            i = T - 1 - ii
            y_s[:] = ys_ref[pl.ds(i, 1)][0]
            ay_s[:] = ay_s[:] + g_ref[pl.ds(i, 1)][0]
            cy_s[:] = jnp.zeros_like(cy_s)
            cay_s[:] = jnp.zeros_like(cay_s)
            s_start = sigma_ref[0, i]
            s_end = sigma_ref[0, i - 1]
            # Pad lanes (and already-failed lanes) start AT the interval
            # end: never active.
            sdt_s[0:1, :] = jnp.where(is_real, s_start, s_end)

            def cond(alive):
                return alive

            def body(_):
                s = sdt_s[0:1, :]
                dt = sdt_s[1:2, :]
                status_l = li_s[3:4, :]
                active = (s < s_end) & (status_l == 0)
                rem = s_end - s
                dt_eff = jnp.minimum(dt, rem)
                is_last = dt >= rem
                s1 = jnp.where(is_last, s_end, s + dt_eff)
                # Inactive lanes use a dummy dth=1 so stage math stays
                # finite; their updates are masked below.
                dth = jnp.where(active, s1 - s, jnp.ones_like(s))

                y0 = y_s[:]
                ay0 = ay_s[:]

                # ---- pass 1: per-lane RK trial chain on (y, a_y) ----
                ky, kay = [], []
                for st in range(stages):
                    yi, ayi = y0, ay0
                    if st > 0:
                        for aij, (kyj, kayj) in zip(tab.a[st - 1],
                                                    zip(ky, kay)):
                            if aij != 0.0:
                                yi = yi + (dth * aij) * kyj
                                ayi = ayi + (dth * aij) * kayj
                    t_st = s + tab.c[st] * dth          # [1, B] row
                    f, v_y = dyn_eval(-sf * t_st, yi, ayi)
                    ky.append(-sf * f)
                    kay.append(sf * v_y)

                def comb(coeffs, ks):
                    acc = None
                    for cjj, kj in zip(coeffs, ks):
                        if cjj != 0.0:
                            term = (dth * cjj) * kj
                            acc = term if acc is None else acc + term
                    return acc

                d_y = comb(tab.b_sol, ky)
                d_ay = comb(tab.b_sol, kay)
                e_y = comb(tab.b_err, ky)
                e_ay = comb(tab.b_err, kay)
                y1 = y0 + d_y
                ay1 = ay0 + d_ay

                # ---- per-lane seminorm over the 2D features ----
                def esc_sq(e, v0, v1):
                    scale = atol + rtol * jnp.maximum(jnp.abs(v0),
                                                      jnp.abs(v1))
                    esc = e / scale
                    return jnp.sum(esc * esc, axis=0, keepdims=True)

                ss = esc_sq(e_y, y0, y1) + esc_sq(e_ay, ay0, ay1)  # [1,B]
                ratio = jnp.sqrt(ss / float(2 * D))
                finite = (jnp.isfinite(ss)
                          & jnp.all(jnp.isfinite(y1), axis=0,
                                    keepdims=True)
                          & jnp.all(jnp.isfinite(ay1), axis=0,
                                    keepdims=True))
                acc_raw = (ratio <= 1.0) & finite
                accept = acc_raw & active

                fac = _controller_factor(ratio, finite, acc_raw, safety,
                                         ifactor, dfactor, tab.order)
                dt_next = jnp.where(active, dth * fac, dt)

                # ---- pass 2: lane-weighted parameter quadrature ----
                acc_f = accept.astype(y0.dtype)

                @pl.when(jnp.any(accept))
                def _():
                    for st in range(stages):
                        if tab.b_sol[st] == 0.0:
                            continue
                        yi, ayi = y0, ay0
                        if st > 0:
                            for aij, (kyj, kayj) in zip(tab.a[st - 1],
                                                        zip(ky, kay)):
                                if aij != 0.0:
                                    yi = yi + (dth * aij) * kyj
                                    ayi = ayi + (dth * aij) * kayj
                        wq = acc_f * dth * tab.b_sol[st]     # [1, B]
                        t_st = s + tab.c[st] * dth
                        flat, v_t = quad_eval(-sf * t_st, yi, ayi * wq)
                        for j in range(n_acc):
                            awrefs[j][:] = awrefs[j][:] + sf * flat[j]
                        if time_input:
                            at_s[:] = at_s[:] + sf * v_t

                # ---- per-lane masked state update (Kahan) ----
                comp = cy_s[:]
                adj = d_y - comp
                y_new = y0 + adj
                cy_s[:] = jnp.where(accept, (y_new - y0) - adj, comp)
                y_s[:] = jnp.where(accept, y_new, y0)
                compa = cay_s[:]
                adja = d_ay - compa
                ay_new = ay0 + adja
                cay_s[:] = jnp.where(accept, (ay_new - ay0) - adja, compa)
                ay_s[:] = jnp.where(accept, ay_new, ay0)
                s_new = jnp.where(accept, s1, s)

                nfe_l = li_s[0:1, :] + stages * active.astype(jnp.int32)
                acc_l = li_s[1:2, :] + accept.astype(jnp.int32)
                rej_l = li_s[2:3, :] + (active & ~accept).astype(jnp.int32)
                att = acc_l + rej_l
                status_l = jnp.where(
                    active & ~acc_raw & (dt_next < dt_min)
                    & (status_l == 0), jnp.int32(2), status_l)
                status_l = jnp.where(
                    (att >= max_steps) & (s_new < s_end) & (status_l == 0),
                    jnp.int32(1), status_l)
                sdt_s[0:1, :] = s_new
                sdt_s[1:2, :] = dt_next
                li_s[0:1, :] = nfe_l
                li_s[1:2, :] = acc_l
                li_s[2:3, :] = rej_l
                li_s[3:4, :] = status_l
                return jnp.any((s_new < s_end) & (status_l == 0))

            jax.lax.while_loop(cond, body, B_true > 0)
            return 0

        jax.lax.fori_loop(0, T - 1, interval_body, 0)

        ay0_ref[:] = ay_s[:] + g_ref[pl.ds(0, 1)][0]
        at_ref[0, 0] = jnp.sum(jnp.where(is_real, at_s[:], 0.0))
        zi = jnp.zeros((1, B), jnp.int32)
        stats_ref[0, 0] = jnp.sum(jnp.where(is_real, li_s[0:1, :], zi))
        stats_ref[0, 1] = jnp.sum(jnp.where(is_real, li_s[1:2, :], zi))
        stats_ref[0, 2] = jnp.sum(jnp.where(is_real, li_s[2:3, :], zi))
        stats_ref[0, 3] = jnp.max(jnp.where(is_real, li_s[3:4, :], zi))
        lane_ref[:] = li_s[0:4, :]

    return kernel


def perlane_adjoint_call(dyn_factory, quad_factory, aux_arrays, acc_shapes,
                         ys: Array, g: Array, tau: Array, dt0_row, rtol,
                         atol, sign, *, tab, safety: float, ifactor: float,
                         dfactor: float, max_steps: int, B_true: int,
                         time_input: bool, interpret: bool):
    """Launch plumbing for the per-lane adjoint kernel (single block,
    unpacked lanes — each lane IS its own controller; the callers force
    pack=1 and reject n_blocks>1 like the per-lane forward).

    acc_shapes: shapes of the n_acc parameter-cotangent accumulators.
    dt0_row: per-lane initial backward steps (sigma space), broadcastable
    to [1, B]. Returns (ay0 [D, B], accs, at scalar, stats [4] int32,
    lane_stats [4, B])."""
    T, D, B = ys.shape
    dtype = ys.dtype

    dt_min = (4.0 * jnp.finfo(dtype).eps
              * jnp.maximum(jnp.maximum(jnp.abs(tau[0]), jnp.abs(tau[-1])),
                            1.0)).astype(dtype)
    sigma = (-tau).astype(dtype)
    dt0_row = jnp.maximum(jnp.abs(jnp.asarray(dt0_row, dtype)),
                          dt_min).reshape(1, -1)
    if dt0_row.shape[1] not in (1, B):
        dt0_row = jnp.pad(dt0_row, ((0, 0), (0, B - dt0_row.shape[1])),
                          constant_values=dt_min)
    dt0_row = jnp.broadcast_to(dt0_row, (1, B)).astype(dtype)

    n_in = len(aux_arrays)
    n_acc = len(acc_shapes)
    kernel = _make_perlane_adjoint_kernel(
        tab, T, safety, ifactor, dfactor, int(max_steps), D, B_true,
        dyn_factory, quad_factory, n_in, n_acc, time_input)

    smem_t = pl.BlockSpec(memory_space=pltpu.SMEM)
    vmem = pl.BlockSpec(memory_space=pltpu.VMEM)
    out_shape = ([jax.ShapeDtypeStruct((D, B), dtype)]
                 + [jax.ShapeDtypeStruct(s, dtype) for s in acc_shapes]
                 + [jax.ShapeDtypeStruct((1, 4), jnp.int32),
                    jax.ShapeDtypeStruct((1, 1), dtype),
                    jax.ShapeDtypeStruct((4, B), jnp.int32)])
    scratch = ([pltpu.VMEM((D, B), dtype)] * 4
               + [pltpu.VMEM((1, B), dtype), pltpu.VMEM((2, B), dtype),
                  pltpu.VMEM((4, B), jnp.int32)])

    res = solver_pallas_call(
        kernel,
        in_specs=[smem_t] * 5 + [vmem] * (3 + n_in),
        out_specs=[vmem] * (1 + n_acc) + [smem_t, smem_t, vmem],
        out_shape=out_shape,
        scratch_shapes=scratch,
        interpret=interpret,
    )(sigma.reshape(1, T),
      jnp.reshape(jnp.asarray(rtol, dtype), (1, 1)),
      jnp.reshape(jnp.asarray(atol, dtype), (1, 1)),
      jnp.reshape(dt_min, (1, 1)),
      jnp.reshape(jnp.asarray(sign, dtype), (1, 1)),
      ys, g, dt0_row, *aux_arrays)

    ay0 = res[0]
    accs = list(res[1:1 + n_acc])
    stats = res[1 + n_acc][0]
    at = res[2 + n_acc][0, 0]
    lane_stats = res[3 + n_acc]
    return ay0, accs, at, stats, lane_stats


@functools.partial(
    jax.jit,
    static_argnames=("dims", "activation", "final_activation", "input_power",
                     "method", "safety", "ifactor", "dfactor", "max_steps",
                     "matmul", "time_input", "interpret"))
def mlp_perlane_adjoint_solve(warrays, dims, ys: Array, g: Array,
                              tau: Array, dt0_row, rtol, atol, sign, *,
                              activation: str = "tanh",
                              final_activation: str = "identity",
                              input_power: int = 1, method: str = "dopri5",
                              safety: float = 0.9, ifactor: float = 10.0,
                              dfactor: float = 0.2,
                              max_steps: int = 2 ** 31 - 1,
                              matmul: str = "vpu",
                              time_input: bool = False,
                              interpret: bool = False):
    """Per-lane fused adjoint backward sweep for MLP neural ODEs, one
    kernel launch (round-4 verdict item 3) — `mlp_adjoint_solve` with a
    per-sample step controller (`_make_perlane_adjoint_kernel`): stiff
    samples step at their own pace through the backward sweep too.

    Same contract as `mlp_adjoint_solve` with the per-lane deltas:
    dt0_row may carry PER-LANE initial backward steps ([B] or scalar);
    the step-control norm is ALWAYS the (y, a_y) seminorm (a lane-shared
    parameter quadrature cannot drive per-lane control); lanes stay
    unpacked and single-block (each lane IS its own controller). Returns
    (ay0 [D, B], aw_list, at, stats [4], lane_stats [4, B])."""
    from . import tableaus as _tabs
    tab = _tabs.TABLEAUS_BY_NAME[method]
    T, D, B_in = ys.shape
    dtype = ys.dtype
    warrays = [jnp.asarray(w, dtype) for w in warrays]
    L = len(dims)

    # Lane-pad with zero cotangent seeds: pad adjoints stay identically 0.
    B = _round_up(max(B_in, _LANE), _LANE)
    if B != B_in:
        ys = jnp.pad(ys, ((0, 0), (0, 0), (0, B - B_in)))
        g = jnp.pad(g, ((0, 0), (0, 0), (0, B - B_in)))

    def dyn_factory(wrefs):
        return _make_aug_eval(wrefs, dims, activation, final_activation,
                              input_power, matmul, time_input, parts="dyn")

    def quad_factory(wrefs):
        return _make_aug_eval(wrefs, dims, activation, final_activation,
                              input_power, matmul, time_input,
                              parts="quad")

    acc_shapes = [w.shape for w in warrays]
    ay0, accs, at, stats, lane_stats = perlane_adjoint_call(
        dyn_factory, quad_factory, warrays, acc_shapes, ys, g, tau,
        dt0_row, rtol, atol, sign, tab=tab, safety=safety,
        ifactor=ifactor, dfactor=dfactor, max_steps=int(max_steps),
        B_true=B_in, time_input=time_input, interpret=interpret)
    if B != B_in:
        ay0 = ay0[:, :B_in]
        lane_stats = lane_stats[:, :B_in]
    aws = [(accs[2 * l], accs[2 * l + 1]) for l in range(L)]
    return ay0, aws, at, stats, lane_stats


@functools.partial(
    jax.jit,
    static_argnames=("dims", "activation", "final_activation", "input_power",
                     "method", "safety", "ifactor", "dfactor", "max_steps",
                     "seminorm", "matmul", "time_input", "rhs", "interpret",
                     "pack", "n_blocks"))
def mlp_adjoint_solve(warrays, dims, ys: Array, g: Array, tau: Array,
                      dt0: Array, rtol, atol, sign, *,
                      activation: str = "tanh",
                      final_activation: str = "identity",
                      input_power: int = 1, method: str = "dopri5",
                      safety: float = 0.9, ifactor: float = 10.0,
                      dfactor: float = 0.2, max_steps: int = 2 ** 31 - 1,
                      seminorm: bool = False, matmul: str = "vpu",
                      time_input: bool = False, rhs: str = "mlp",
                      interpret: bool = False, pack: str | int = "auto",
                      n_blocks: int = 1):
    """Fused adjoint backward sweep, one kernel launch.

    warrays/dims: padded weights (`pad_mlp_weights`). ys, g: [T, D, B]
    feature-major forward trajectory and output cotangents at the
    observation times tau ([T], increasing canonical; sign as in
    `mlp_solve`). dt0: initial backward step (in sigma = -tau space).
    seminorm: exclude the parameter/time quadratures from step-size
    control (Kidger et al. 2020). time_input: concat-t dynamics — the
    first layer's din = D + 1 with the scalar time LAST; the sweep then
    also integrates the a_t quadrature (da_t/dsigma = sign * a_y . df/dt,
    batch-summed).

    rhs='cnf': the backward sweep of the AUGMENTED FFJORD system — ys/g
    rows are [z (D-1); logp], dims describe the concat-t flow MLP, and
    the divergence's second-order VJP runs in-kernel
    (`_make_cnf_aug_eval`).

    Returns (ay0 [D, B] = dL/dy0 in canonical layout, aw_list of padded
    (dW [doutP, dinP], db [doutP, 1]) cotangents, at scalar (the
    integrated time quadrature; 0 for autonomous), stats [4] int32).
    """
    from . import tableaus as _tabs
    tab = _tabs.TABLEAUS_BY_NAME[method]
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

    sigma = (-tau).astype(dtype)          # backward sweeps integrate up
    dt_min = (4.0 * jnp.finfo(dtype).eps
              * jnp.maximum(jnp.maximum(jnp.abs(tau[0]), jnp.abs(tau[-1])),
                            1.0)).astype(dtype)
    # Clamp: dt0 == 0 would be accepted forever without progress.
    dt0 = jnp.maximum(jnp.abs(jnp.asarray(dt0, dtype)), dt_min)

    # RMS denominator = the number of elements actually in the error sum:
    # seminorm excludes the parameter quadratures from step control
    # (matches the generic adjoint's rms_norm(x_flat[:2N])).
    n_params = sum(din * dout + dout for din, dout in dims)
    denom = (float(2 * D * B_true) if seminorm
             else float(2 * D * B_true + n_params
                        + (1 if time_input else 0)))

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

    kernel = _make_adjoint_kernel(tab, T, safety, ifactor, dfactor,
                                  int(max_steps), denom, B_true,
                                  aug_factory, 2 * L, 2 * L,
                                  seminorm, time_input,
                                  per_block_io=n_blocks > 1)

    smem_t = pl.BlockSpec(memory_space=pltpu.SMEM)
    vmem = pl.BlockSpec(memory_space=pltpu.VMEM)
    NB = B // n_blocks

    out_shape = [jax.ShapeDtypeStruct((D, B), dtype)]
    for l in range(L):
        out_shape.append(
            jax.ShapeDtypeStruct(warrays[2 * l].shape, dtype))
        out_shape.append(
            jax.ShapeDtypeStruct(warrays[2 * l + 1].shape, dtype))
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

    if n_blocks == 1:
        in_specs = [smem_t] * 6 + [vmem] * (2 + 2 * L)
        out_specs = [vmem] * (1 + 2 * L) + [smem_t, smem_t]
        grid_kw = {}
    else:
        # Sequential grid over lane blocks: block-sliced ys/g/ay0,
        # replicated weights, and REVISITED parameter-cotangent windows
        # that accumulate across programs (zeroed at program 0).
        traj_spec = pl.BlockSpec((T, D, NB), lambda i: (0, 0, i),
                                 memory_space=pltpu.VMEM)
        ay0_spec = pl.BlockSpec((D, NB), lambda i: (0, i),
                                memory_space=pltpu.VMEM)
        in_specs = ([smem_t] * 6 + [traj_spec, traj_spec]
                    + [rep_spec(w.shape) for w in warrays])
        out_specs = ([ay0_spec]
                     + [rep_spec(w.shape) for w in warrays]
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
    )(*scalar_ins, ys, g, *warrays)

    ay0 = res[0]
    aws = [(res[1 + 2 * l], res[2 + 2 * l]) for l in range(L)]
    st = res[1 + 2 * L]
    at_row = res[2 + 2 * L]
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
        ay0 = unpack_state_blocks(ay0, kpk, D_state, n_blocks)
    return ay0, aws, at, stats
