"""Pallas TPU kernels: fully-fused dopri5 for MLP neural-ODE dynamics.

The north-star fast path (SURVEY.md §7 "Pallas tier", BASELINE.json): for the
benchmark's tanh-MLP dynamics

    f(t, y) = tanh(y^3 @ W1 + b1) @ W2 + b2        y: [B, D]

two fusion levels are provided:

1. `dopri5_mlp_step` — ONE kernel per solver step: all 7 stage evaluations,
   the solution / error-weight combines, the tolerance-scaled error RMS
   (reduced in-kernel to a scalar), and the 4th-order dense-output midpoint.
2. `dopri5_mlp_solve` — ONE kernel per SOLVE: the entire adaptive
   integration (accept/reject loop, I-controller, dense-output writes) runs
   in-kernel with state in VMEM scratch. Measured on TPU v5e the marginal
   cost is ~5.4 us/step vs ~83 us/step for the generic XLA while-loop path
   (the testbed additionally has ~26 ms fixed latency per device dispatch —
   see bench.py).

Design notes (per /opt/skills/guides/pallas_guide.md):
- State is kept feature-major ``[D, B]`` so the batch axis lies along VPU
  lanes (128); with D ~ 2, batch-major would waste 126/128 lanes on every
  elementwise op.
- The tiny contractions (D -> H and H -> D, D ~ 2, H ~ 50) are expressed as
  outer-product broadcasts ([H,1] * [1,TB]) plus sublane reductions — no
  in-kernel transposes, all VPU (at K = 2 the MXU would run almost empty).
  The hidden dim is padded to a sublane tile once, outside the loop (zero
  rows are exact no-ops through tanh since tanh(0) = 0). NOTE: zero-padded
  *batch* lanes are NOT no-ops when biases are nonzero (f(0) != 0), so the
  step kernel masks them out of the error reduction by static true-B.
- All dopri5 coefficients are trace-time constants; scalar powf does not
  lower in Mosaic (use exp/log); SMEM outputs use the sequential-grid
  single-accumulator pattern.
- f32 throughout (TPU native); state accumulation across accepted steps is
  Kahan-compensated, matching the generic solver.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .tableaus import DOPRI5

Array = jax.Array

_LANE = 128
_SUBLANE = 8

#: Raised per-kernel scoped-VMEM limit for every solver pallas_call.
#: The Mosaic default (16 MB) is a compiler budget, not the hardware
#: ceiling; XLA's memory-space-assignment pass can't see a kernel's
#: scoped window usage and sometimes promotes the kernel's own HBM
#: output into VMEM on top of it (measured on-chip: a B=131072/T=8
#: grid solve OOMed at 17.18M/16M with the full 8.39M trajectory
#: promoted alongside its double-buffered block windows; the same
#: program compiles and runs with the limit raised). Our own block
#: sizing still targets fast.py's 12 MB budget — this is headroom for
#: XLA's blind promotions, not license for bigger blocks.
_VMEM_LIMIT_BYTES = 64 * 2 ** 20


def solver_pallas_call(kernel, *, interpret: bool, **kw):
    """pl.pallas_call with the raised scoped-VMEM limit in compiled mode
    (interpret mode takes no TPU compiler params). All solver kernel
    families route their launches through this. A caller-supplied
    CompilerParams (e.g. dimension_semantics) is MERGED, not dropped:
    the raised limit applies unless the caller set its own."""
    if not interpret:
        cp = kw.get("compiler_params")
        if cp is None:
            kw["compiler_params"] = pltpu.CompilerParams(
                vmem_limit_bytes=_VMEM_LIMIT_BYTES)
        elif getattr(cp, "vmem_limit_bytes", None) is None:
            kw["compiler_params"] = dataclasses.replace(
                cp, vmem_limit_bytes=_VMEM_LIMIT_BYTES)
    return pl.pallas_call(kernel, interpret=interpret, **kw)


_DEFAULT_TILE_B = 512


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def rep_spec(shape):
    """BlockSpec replicating a full VMEM operand to every sequential-grid
    program (weights / plan consts in multi-block whole-solve kernels) —
    the shared piece of the grid-mode plumbing every kernel family uses."""
    return pl.BlockSpec(shape, lambda i: tuple(0 for _ in shape),
                        memory_space=pltpu.VMEM)


def prep_state_blocks(y0, f0, D: int, pack, n_blocks: int):
    """Shared whole-solve state prologue: sublane packing + grid-block
    lane alignment + single-block lane padding, identical across every
    kernel family. Returns (y0, f0, k, Lb) with Lb the per-block TRUE
    lane count (== B_true for the kernel's masks)."""
    B = y0.shape[1]
    if B % n_blocks:
        raise ValueError(f"batch {B} not divisible by n_blocks {n_blocks}")
    Bb = B // n_blocks
    k = pick_pack(D, Bb) if pack == "auto" else int(pack)
    if n_blocks > 1 and (Bb // k) % _LANE:
        k = 1                      # grid blocks must stay lane-aligned
    if k > 1:
        y0 = pack_state_blocks(y0, k, n_blocks)
        f0 = pack_state_blocks(f0, k, n_blocks)
    Lb = Bb // k                   # per-block lane count
    if n_blocks == 1:
        # Pad ANY batch up to a full VPU lane multiple (Mosaic needs
        # lane-aligned vectors); padded lanes are masked out of the error
        # norm in-kernel.
        BP = _round_up(max(Lb, _LANE), _LANE)
        if BP != Lb:
            y0 = jnp.pad(y0, ((0, 0), (0, BP - Lb)))
            f0 = jnp.pad(f0, ((0, 0), (0, BP - Lb)))
    elif Lb % _LANE:
        raise ValueError(f"grid block lanes {Lb} not a multiple of "
                         f"{_LANE} (pad the batch first)")
    return y0, f0, k, Lb


def merge_grid_stats(stats, per_block_work: bool):
    """[n_blocks, 4] per-program stats -> [4]: nfe/acc/rej summed when
    each block does its own (adaptive) stepping, block-0 when every block
    walks the same fixed sequence; status is always the max."""
    if per_block_work:
        return jnp.concatenate(
            [jnp.sum(stats[:, :3], axis=0), stats[:, 3:4].max(axis=0)])
    return jnp.concatenate([stats[0, :3], stats[:, 3].max(keepdims=True)])


# ---------------------------------------------------------------------------
# Shared in-kernel pieces
# ---------------------------------------------------------------------------

# In-kernel activations. Only ops that lower in Mosaic (exp/log/max/mul);
# all are exact no-ops on zero-padded rows EXCEPT sigmoid/softplus, whose
# nonzero pad-row outputs are still harmless: the next layer's weight rows
# for padded inputs are zero-padded, so garbage never reaches true outputs.
_ACTIVATIONS = {
    "identity": lambda x: x,
    "linear": lambda x: x,
    "tanh": jnp.tanh,
    "relu": lambda x: jnp.maximum(x, 0.0),
    "elu": lambda x: jnp.where(x > 0.0,
                               x, jnp.exp(jnp.minimum(x, 0.0)) - 1.0),
    "sigmoid": lambda x: 1.0 / (1.0 + jnp.exp(-x)),
    "softplus": lambda x: (jnp.maximum(x, 0.0)
                           + jnp.log1p(jnp.exp(-jnp.abs(x)))),
    "silu": lambda x: x / (1.0 + jnp.exp(-x)),
    "swish": lambda x: x / (1.0 + jnp.exp(-x)),
}

# Second derivatives act''(z) via (z, a = act(z), g = act'(z)) — needed by
# the CNF adjoint's divergence VJP (d/dz of act'(z) factors).
_ACTIVATION_GRAD2 = {
    "identity": lambda z, a, g: jnp.zeros_like(z),
    "linear": lambda z, a, g: jnp.zeros_like(z),
    "tanh": lambda z, a, g: -2.0 * a * g,              # -2 tanh sech^2
    "relu": lambda z, a, g: jnp.zeros_like(z),
    "elu": lambda z, a, g: jnp.where(z > 0.0, 0.0, a + 1.0),
    "sigmoid": lambda z, a, g: g * (1.0 - 2.0 * a),
    "softplus": lambda z, a, g: (lambda s: s * (1.0 - s))(
        1.0 / (1.0 + jnp.exp(-z))),
    "silu": lambda z, a, g: (lambda s: s * (1.0 - s) * (2.0 + z
                                                        * (1.0 - 2.0 * s)))(
        1.0 / (1.0 + jnp.exp(-z))),
    "swish": lambda z, a, g: (lambda s: s * (1.0 - s) * (2.0 + z
                                                         * (1.0 - 2.0 * s)))(
        1.0 / (1.0 + jnp.exp(-z))),
}

# Derivatives act'(z) expressed via z (and act(z) where cheaper).
_ACTIVATION_GRADS = {
    "identity": lambda z, a: jnp.ones_like(z),
    "linear": lambda z, a: jnp.ones_like(z),
    "tanh": lambda z, a: 1.0 - a * a,
    "relu": lambda z, a: jnp.where(z > 0.0, 1.0, 0.0),
    "elu": lambda z, a: jnp.where(z > 0.0, 1.0, a + 1.0),
    "sigmoid": lambda z, a: a * (1.0 - a),
    "softplus": lambda z, a: 1.0 / (1.0 + jnp.exp(-z)),
    "silu": lambda z, a: (lambda s: s * (1.0 + z * (1.0 - s)))(
        1.0 / (1.0 + jnp.exp(-z))),
    "swish": lambda z, a: (lambda s: s * (1.0 + z * (1.0 - s)))(
        1.0 / (1.0 + jnp.exp(-z))),
}


def pad_mlp_weights(weights, dtype):
    """Pad an MLP weight list for feature-major VMEM kernels.

    weights: sequence of (W [din, dout], b [dout] | None). Returns
    (arrays, dims) where arrays is the flat list [wT_0, b_0, wT_1, b_1, ...]
    with wT [doutP, dinP] (transposed so column i is input-feature i's
    outgoing weights — no in-kernel transposes) and b [doutP, 1], both
    zero-padded to sublane multiples; dims is the static ((din, dout), ...).
    """
    arrays, dims = [], []
    for W, b in weights:
        din, dout = W.shape
        dinP = _round_up(din, _SUBLANE)
        doutP = _round_up(dout, _SUBLANE)
        wT = jnp.zeros((doutP, dinP), dtype).at[:dout, :din].set(
            jnp.asarray(W, dtype).T)
        bb = jnp.zeros((doutP, 1), dtype)
        if b is not None:
            bb = bb.at[:dout, 0].set(jnp.asarray(b, dtype))
        arrays += [wT, bb]
        dims.append((din, dout))
    return arrays, tuple(dims)


def _input_transform(y, power: int):
    h = y
    for _ in range(power - 1):
        h = h * y
    return h


def _layer_uses_mxu(matmul: str, din: int, dout: int) -> bool:
    """Static per-layer engine choice. 'vpu' = unrolled outer-product
    broadcasts (exact f32, zero work on padded rows — right for narrow
    nets); 'mxu' = one systolic-array dot per layer (right for wide nets,
    where an unrolled VPU contraction is O(din) sequential [dout, B] ops
    AND O(din) generated instructions). 'auto' switches a layer to the MXU
    once the weight block is big enough to fill the array usefully."""
    if matmul == "vpu":
        return False
    if matmul == "mxu":
        return True
    if matmul == "auto":
        return min(din, dout) >= 32 and din * dout >= 2048
    raise ValueError(f"matmul must be 'vpu', 'mxu' or 'auto', got "
                     f"{matmul!r}")


def _pad_rows(h, rows_p: int):
    """Zero-pad a [rows, B] block up to [rows_p, B] for an MXU dot (the
    matching weight COLUMNS are zero-padded, so pad rows contribute 0)."""
    rows = h.shape[0]
    if rows == rows_p:
        return h
    return jnp.concatenate(
        [h, jnp.zeros((rows_p - rows, h.shape[1]), h.dtype)], axis=0)


# ---------------------------------------------------------------------------
# Sublane packing: narrow-state whole-solve kernels waste the VPU.
#
# A [D, B] feature-major block with D < 8 occupies D of the 8 sublanes of
# every 8x128 VPU tile, so each of the (many) elementwise solver passes
# (stage combines, error scale, interpolation fit, Kahan updates, output
# drain) runs at D/8 utilization. Because samples are independent, k groups
# of B/k samples can be stacked along the FEATURE axis instead: state
# becomes [k*D, B/k] (one sublane tile when k*D <= 8), cutting the tile
# count of every elementwise pass by ~k. The error norm is unchanged (same
# element multiset, denom = (kD)*(B/k) = D*B) and the RHS evaluates
# per-group on row slices, so the dynamics see ordinary [D, B/k] blocks.
# Accept/reject sequences can differ from the unpacked kernel only by the
# f32 reduction order of the error sum (last-ulp noise).
# ---------------------------------------------------------------------------

def pick_pack(D: int, B: int) -> int:
    """Largest k in {8, 4, 2} with k*D <= 8 sublanes, B divisible by k and
    groups still spanning a full lane tile (B/k >= 128); 1 = no packing."""
    for k in (8, 4, 2):
        if k * D <= _SUBLANE and B % k == 0 and B // k >= _LANE:
            return k
    return 1


def pack_state(x, k: int):
    """[D, B] -> [k*D, B/k]: group g's rows g*D:(g+1)*D hold the samples
    in lanes g*(B/k):(g+1)*(B/k) of the original block."""
    D, B = x.shape
    return x.reshape(D, k, B // k).swapaxes(0, 1).reshape(k * D, B // k)


def unpack_state(x, k: int, D: int):
    """Inverse of pack_state over the last two axes ([..., k*D, B/k] ->
    [..., D, B]); call only after slicing off any lane padding."""
    lead = x.shape[:-2]
    Bk = x.shape[-1]
    x = x.reshape(*lead, k, D, Bk)
    x = jnp.moveaxis(x, -3, -2)
    return x.reshape(*lead, D, k * Bk)


def pack_state_blocks(x, k: int, n_blocks: int):
    """[D, B] -> [k*D, n_blocks * (B/n/k)]: lane-contiguous blocks, each
    sublane-packed independently (grid programs own one block each).

    Derivation: input lane = i*Bb + g*Lb + j (block i, sample-group g,
    position j); output (row g*D + d, lane i*Lb + j)."""
    D, B = x.shape
    Bb = B // n_blocks
    Lb = Bb // k
    xs = x.reshape(D, n_blocks, k, Lb)
    xs = jnp.transpose(xs, (2, 0, 1, 3))         # [k, D, n_blocks, Lb]
    return xs.reshape(k * D, n_blocks * Lb)


def unpack_state_blocks(x, k: int, D: int, n_blocks: int):
    """Inverse of pack_state_blocks over the trailing two axes."""
    lead = x.shape[:-2]
    L = x.shape[-1]
    Lb = L // n_blocks
    xb = x.reshape(*lead, k, D, n_blocks, Lb)
    xb = jnp.moveaxis(xb, -4, -2)                # [..., D, n_blocks, k, Lb]
    return xb.reshape(*lead, D, n_blocks * k * Lb)


def packed_make_f(make_f, k: int, D: int):
    """Lift a [D, B]-block RHS builder to the packed [k*D, B/k] layout:
    the built f maps each group's row slice through the base dynamics."""
    def make(wrefs):
        base = make_f(wrefs)

        def f(t, y):
            return jnp.concatenate(
                [base(t, y[g * D:(g + 1) * D, :]) for g in range(k)],
                axis=0)

        return f

    return make


#: In-kernel dot precision names -> lax.Precision for the MXU path.
#: 'highest' = Mosaic's 3-pass bf16 decomposition (f32-accurate, the
#: default — bf16 noise inflates adaptive step counts ~5-9x);
#: 'bf16' = one systolic pass (~2e-3 rel err, 3x the MXU rate —
#: measured 190 vs 62 TFLOP/s on v5e). bf16 is for FIXED-GRID serving,
#: where there is no embedded error estimate to poison.
#: 'mixed' = TWO systolic passes: the WEIGHTS are quantized to bf16 once
#: (the standard serving-time model transform) and the activations are
#: split hi/lo-bf16 so y @ W_bf16 is computed to ~2^-16 relative accuracy
#: (f32 MXU accumulation; the dropped activation residual is the only
#: error term, ~2^-18 relative). The dynamics stays DETERMINISTIC — it
#: is the bf16-weight model integrated to ~2^-18 dots — so, unlike
#: 'bf16', adaptive error control keeps working: NFE parity with
#: 'highest' at serving tolerances, ~10% inflation at rtol 1e-6, at 2/3
#: the passes (tests/test_mixed_precision.py pins the economics). The
#: gap to the f32-weight model is the weight-quantization error (~2e-3
#: relative), same ballpark as the 'bf16' serving tier but with full
#: adaptive step control.
_DOT_PRECISIONS = {"highest": jax.lax.Precision.HIGHEST, "bf16": None,
                   "mixed": "mixed"}


def _mixed_dot(wT, hp):
    """wT @ hp with bf16-quantized weights and hi/lo-split activations:
    two single-pass bf16 dots with f32 accumulation (~2^-16 relative
    error vs the exact bf16-weight product; one-third less MXU time than
    Mosaic's 3-pass HIGHEST decomposition)."""
    f32 = hp.dtype
    w16 = wT.astype(jnp.bfloat16)
    h_hi = hp.astype(jnp.bfloat16)
    h_lo = (hp - h_hi.astype(f32)).astype(jnp.bfloat16)
    return (jnp.dot(w16, h_hi, preferred_element_type=f32)
            + jnp.dot(w16, h_lo, preferred_element_type=f32))


def _make_net(wrefs, dims, activation: str, final_activation: str,
              input_power: int, time_input: bool = False,
              matmul: str = "vpu", dot_precision: str = "highest"):
    """Build f(t, y): [D, B] -> [D_out, B] from padded VMEM weight refs.

    General L-layer MLP: z_l = W_l^T h_{l-1} + b_l, h_l = act(z_l), with
    `final_activation` on the last layer and y**input_power on the input.
    `time_input=True` feeds the scalar time as one extra first-layer input
    feature (concat-t MLPs, e.g. CNF flow fields): the first layer's din
    must then be D + 1 with the t column LAST.

    Contractions run per-layer on either engine (`_layer_uses_mxu`):
    - VPU: outer-product broadcasts over TRUE input features plus sublane
      reads — exact f32, zero work on padded rows (their weights are
      skipped entirely).
    - MXU: one `jnp.dot(wT, h)` per layer (f32 accumulate). Zero-padded
      weight columns null out any pad-row garbage in h, so results match
      the VPU path to f32 roundoff.
    """
    acts = ([_ACTIVATIONS[activation]] * (len(dims) - 1)
            + [_ACTIVATIONS[final_activation]])
    prec = _DOT_PRECISIONS[dot_precision]

    def f(t, y):
        h = _input_transform(y, input_power)
        for l, (din, dout) in enumerate(dims):
            wT = wrefs[2 * l]
            b = wrefs[2 * l + 1]
            n_state = din - 1 if (time_input and l == 0) else din
            if _layer_uses_mxu(matmul, din, dout):
                if time_input and l == 0:
                    hp = jnp.concatenate(
                        [h[:n_state, :], h[:1, :] * 0.0 + t], axis=0)
                    hp = _pad_rows(hp, wT.shape[1])
                elif h.shape[0] == wT.shape[1]:
                    # Already padded height; pad rows (even a nonzero
                    # act(0)) hit zero-padded weight COLUMNS -> contribute 0.
                    hp = h
                else:
                    hp = _pad_rows(h[:n_state, :], wT.shape[1])
                # Default HIGHEST: Mosaic lowers it as a 3-pass bf16
                # decomposition (f32-accurate; measured 62-65 TFLOP/s on
                # v5e vs 190 for one bf16 pass). Mosaic's DEFAULT dot is
                # that single bf16 pass (~2e-3 rel err) — noise above the
                # embedded error estimate that inflates adaptive NFE ~5x,
                # so 'bf16' is opt-in for fixed-grid serving only and
                # 'mixed' (two passes, bf16 weights + split activations,
                # deterministic ~2^-16 dots) is the adaptive-safe tier.
                if prec == "mixed":
                    acc = _mixed_dot(wT[:, :], hp)
                else:
                    acc = jnp.dot(wT[:, :], hp,
                                  preferred_element_type=hp.dtype,
                                  precision=prec)
            else:
                acc = None
                for i in range(n_state):
                    term = wT[:, i:i + 1] * h[i:i + 1, :]     # [doutP, B]
                    acc = term if acc is None else acc + term
                if time_input and l == 0:
                    acc = acc + wT[:, n_state:n_state + 1] * t
            h = acts[l](acc + b[:])
        dout = dims[-1][1]
        return h[:dout, :]

    return f


def _make_cnf_net(wrefs, dims, activation: str, time_input: bool):
    """Build the CNF augmented RHS from padded VMEM weight refs:

        f_aug(t, s): s = [z (D rows); logp (1 row)] -> [dz; -div f]

    dz = MLP(t, z) (final layer linear); the divergence is EXACT via D
    in-kernel forward-mode passes reusing the stored pre-activations —
    the Pallas counterpart of models/cnf.augmented_dynamics(trace='exact').
    """
    D = dims[-1][1]
    L = len(dims)
    act = _ACTIVATIONS[activation]
    actg = _ACTIVATION_GRADS[activation]

    def f(t, s):
        z = s[:D, :]
        one = (s[:1, :] * 0.0) + 1.0              # [1, B] ones
        # ---- forward, storing pre-activations ----
        h = z
        zs = []
        for l, (din, dout) in enumerate(dims):
            wT = wrefs[2 * l]
            b = wrefs[2 * l + 1]
            n_state = din - 1 if (time_input and l == 0) else din
            acc = None
            for i in range(n_state):
                term = wT[:, i:i + 1] * h[i:i + 1, :]
                acc = term if acc is None else acc + term
            if time_input and l == 0:
                acc = acc + wT[:, n_state:n_state + 1] * t
            zpre = acc + b[:]
            zs.append(zpre)
            h = act(zpre) if l < L - 1 else zpre   # final layer linear
        dz = h[:D, :]

        # ---- exact divergence: D forward-mode (JVP) passes ----
        div = None
        for i0 in range(D):
            # du0 = e_{i0} over the state inputs (dt-direction is 0).
            du = wrefs[0][:, i0:i0 + 1] * one      # [dout0P, B]
            if L > 1:
                du = actg(zs[0], act(zs[0])) * du
            for l in range(1, L):
                din, dout = dims[l]
                wT = wrefs[2 * l]
                v = None
                for i in range(din):
                    term = wT[:, i:i + 1] * du[i:i + 1, :]
                    v = term if v is None else v + term
                du = v if l == L - 1 else actg(zs[l], act(zs[l])) * v
            d_i = du[i0:i0 + 1, :]                 # (J e_i)_i  [1, B]
            div = d_i if div is None else div + d_i

        return jnp.concatenate([dz, -div], axis=0)  # [D+1, B]

    return f


def _make_mlp(w1_ref, b1_ref, w2_ref, b2):
    """Build f(y): [D, TB] -> [D, TB] from VMEM weight refs.

    w1: [HP, D] (column per input feature), b1: [HP, 1], w2: [HP, D]
    (column per output feature), b2: [D, 1]. HP = hidden padded to sublanes.
    """

    def f(y):
        D = y.shape[0]
        y3 = y * y * y
        acc = None
        for i in range(D):
            term = w1_ref[:, i : i + 1] * y3[i : i + 1, :]   # [HP, TB]
            acc = term if acc is None else acc + term
        h = jnp.tanh(acc + b1_ref[:])                        # [HP, TB]
        rows = [jnp.sum(w2_ref[:, i : i + 1] * h, axis=0, keepdims=True)
                for i in range(D)]                           # D x [1, TB]
        return jnp.concatenate(rows, axis=0) + b2            # [D, TB]

    return f


def _rk_stages(tab, f, y0, f0, dt, t0=0.0):
    """Evaluate all stages and the solution/error/midpoint combines.

    f(t, y): stage times t0 + c_i*dt are threaded through (autonomous RHS
    simply ignore them). Returns (k, delta, err, y_mid) with y1 = y0 +
    delta (y_mid is None for tableaus without 4th-order dense-output
    weights); coefficients are trace-time constants so XLA folds them into
    the fused arithmetic.
    """
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

    err = None
    for e, kj in zip(tab.b_err, k):
        if e != 0.0:
            err = (dt * e) * kj if err is None else err + (dt * e) * kj

    y_mid = None
    if tab.c_mid is not None:
        y_mid = y0
        for cm, kj in zip(tab.c_mid, k):
            if cm != 0.0:
                y_mid = y_mid + (dt * cm) * kj
    return k, delta, err, y_mid


def _interp_coeffs(y0, y1, y_mid, df0, df1):
    """Dense-output coefficients in the scaled variable x = (t-t0)/dt:
    4th-order through the midpoint when available, else cubic Hermite
    (matching ops/rk.py interp_fit_*). Returns (ca, cb, cc); the full
    polynomial is (((ca x + cb) x + cc) x + df0) x + y0."""
    r1 = y1 - y0 - df0
    r2 = df1 - df0
    if y_mid is not None:
        r3 = 16.0 * (y_mid - y0) - 8.0 * df0
        ca = r3 + 2.0 * r2 - 8.0 * r1
        cb = r2 - 2.0 * r1 - 2.0 * ca
        cc = r1 - ca - cb
    else:
        ca = jnp.zeros_like(y0)
        cb = 2.0 * (y0 - y1) + df0 + df1
        cc = 3.0 * (y1 - y0) - 2.0 * df0 - df1
    return ca, cb, cc


def _controller_factor(ratio, finite, accept, safety, ifactor, dfactor,
                       order=5):
    """Reference `_optimal_step_size` semantics, branch-free scalars.

    r ** (-1/order) via exp/log — scalar powf does not lower in Mosaic."""
    tiny = jnp.asarray(1e-38, ratio.dtype)
    r = jnp.maximum(jnp.where(finite, ratio, 2.0 ** 20), tiny)
    fac = safety * jnp.exp((-1.0 / float(order)) * jnp.log(r))
    fac = jnp.where(ratio <= 0.0, ifactor, fac)
    lo = jnp.where(accept, 1.0, dfactor)
    hi = jnp.where(accept, ifactor, 1.0)
    return jnp.clip(fac, lo, hi)


def _pad_params(params: dict, D: int, dtype):
    H = params["w1"].shape[1]
    HP = _round_up(H, _SUBLANE)
    w1 = jnp.zeros((HP, D), dtype).at[:H, :].set(
        params["w1"].astype(dtype).T)
    b1 = jnp.zeros((HP, 1), dtype).at[:H, 0].set(params["b1"].astype(dtype))
    w2 = jnp.zeros((HP, D), dtype).at[:H, :].set(params["w2"].astype(dtype))
    b2 = params["b2"].astype(dtype).reshape(D, 1)
    return w1, b1, w2, b2, HP


def mlp_f(params: dict, y: Array) -> Array:
    """Reference MLP dynamics in [D, B] layout (XLA, for init/testing)."""
    h = jnp.tanh(jnp.einsum("ib,ij->jb", y * y * y, params["w1"])
                 + params["b1"][:, None])
    return jnp.einsum("jb,ji->ib", h, params["w2"]) + params["b2"][:, None]


# ---------------------------------------------------------------------------
# Single-step kernel (one launch per solver step; composes with the generic
# adaptive engine via AdaptiveConfig.step_override)
# ---------------------------------------------------------------------------

def _make_step_kernel(B: int, tile_b: int):
    """B (true batch) is static so padded lanes can be masked out of the
    error reduction."""

    def kernel(dt_ref, rtol_ref, atol_ref,
               y_ref, f0_ref, w1_ref, b1_ref, w2_ref, b2_ref,
               y1_ref, f1_ref, ymid_ref, sumsq_ref):
        dt = dt_ref[0, 0]
        rtol = rtol_ref[0, 0]
        atol = atol_ref[0, 0]
        y0 = y_ref[:]
        f_auto = _make_mlp(w1_ref, b1_ref, w2_ref, b2_ref[:])
        f = lambda t, y: f_auto(y)

        k, delta, err, y_mid = _rk_stages(DOPRI5, f, y0, f0_ref[:], dt)
        y1 = y0 + delta

        scale = atol + rtol * jnp.maximum(jnp.abs(y0), jnp.abs(y1))
        esc = err / scale
        # Mask batch-padding lanes out of the reduction/finiteness check.
        gidx = (pl.program_id(0) * tile_b
                + jax.lax.broadcasted_iota(jnp.int32, esc.shape, 1))
        valid = gidx < B
        esc = jnp.where(valid, esc, 0.0)
        y1_chk = jnp.where(valid, y1, 0.0)
        y1_ref[:] = y1
        f1_ref[:] = k[-1]        # FSAL
        ymid_ref[:] = y_mid
        # Per-tile error reduction fused into the kernel (the caller sums G
        # scalars instead of reducing [D, B] every loop iteration).
        # Non-finiteness is folded in as +inf so one scalar carries both the
        # controller ratio and the divergence flag.
        ss = jnp.sum(esc * esc)
        finite = jnp.isfinite(ss) & jnp.all(jnp.isfinite(y1_chk))
        ss = jnp.where(finite, ss, jnp.asarray(jnp.inf, ss.dtype))
        # TPU grids run sequentially: all tiles share one (1,1) SMEM
        # accumulator — initialize on the first program, add on the rest.
        i = pl.program_id(0)

        @pl.when(i == 0)
        def _():
            sumsq_ref[0, 0] = ss

        @pl.when(i > 0)
        def _():
            sumsq_ref[0, 0] = sumsq_ref[0, 0] + ss

    return kernel


@functools.partial(jax.jit, static_argnames=("tile_b", "interpret"))
def dopri5_mlp_step(params: dict, y: Array, f0: Array, dt: Array,
                    rtol: Array, atol: Array, *, tile_b: int = _DEFAULT_TILE_B,
                    interpret: bool = False
                    ) -> Tuple[Array, Array, Array, Array]:
    """Fused dopri5 step for tanh-MLP dynamics.

    params: {'w1': [D, H], 'b1': [H], 'w2': [H, D], 'b2': [D]}.
    y, f0: [D, B] feature-major state and cached derivative.
    Returns (y1, f1, err_ratio, y_mid): y-like outputs are [D, B]; err_ratio
    is the scalar RMS of err/(atol + rtol*max(|y0|,|y1|)), +inf when the
    step produced non-finite values (accept iff <= 1).
    """
    D, B = y.shape
    dtype = y.dtype
    w1, b1, w2, b2, HP = _pad_params(params, D, dtype)

    tile_b = _round_up(tile_b, _LANE)   # lane-align user-chosen tiles
    BP = _round_up(B, tile_b)
    if BP != B:
        y = jnp.pad(y, ((0, 0), (0, BP - B)))
        f0 = jnp.pad(f0, ((0, 0), (0, BP - B)))
    grid = (BP // tile_b,)

    scalars = (jnp.reshape(dt.astype(dtype), (1, 1)),
               jnp.reshape(jnp.asarray(rtol, dtype), (1, 1)),
               jnp.reshape(jnp.asarray(atol, dtype), (1, 1)))

    tile_spec = pl.BlockSpec((D, tile_b), lambda i: (0, i),
                             memory_space=pltpu.VMEM)

    smem = pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM)

    out_shape = [jax.ShapeDtypeStruct((D, BP), dtype)] * 3 + [
        jax.ShapeDtypeStruct((1, 1), dtype)]
    ss_spec = pl.BlockSpec((1, 1), lambda i: (0, 0),
                           memory_space=pltpu.SMEM)
    y1, f1, ymid, sumsq = solver_pallas_call(
        _make_step_kernel(B, tile_b),
        grid=grid,
        in_specs=[smem, smem, smem,
                  tile_spec, tile_spec,
                  rep_spec((HP, D)), rep_spec((HP, 1)), rep_spec((HP, D)),
                  rep_spec((D, 1))],
        out_specs=[tile_spec] * 3 + [ss_spec],
        out_shape=out_shape,
        interpret=interpret,
    )(*scalars, y, f0, w1, b1, w2, b2)

    if BP != B:
        y1, f1, ymid = (a[:, :B] for a in (y1, f1, ymid))
    # RMS over the D*B real elements (padded lanes were masked in-kernel).
    ratio = jnp.sqrt(jnp.sum(sumsq) / (D * B))
    return y1, f1, ratio, ymid


# ---------------------------------------------------------------------------
# Whole-solve kernel: the ENTIRE adaptive dopri5 integration in ONE launch.
# State lives in VMEM scratch; the accept/reject/controller/dense-output
# logic runs on scalars; only [T, D, B] + 4 stats ints leave the chip.
# ---------------------------------------------------------------------------

def _make_solve_kernel(tab, T: int, safety: float, ifactor: float,
                       dfactor: float, max_steps: int, denom: float,
                       B_true: int, make_f, n_wrefs: int,
                       per_block_io: bool = False, emit_dense: int = 0,
                       stream_out: bool = False):
    """Whole-solve kernel, dynamics-generic: `make_f(wrefs)` builds the
    in-kernel RHS from `n_wrefs` VMEM weight refs. A runtime sign scalar
    (SMEM) multiplies the RHS so one compiled kernel serves both time
    directions (tau = sign * t, as in solvers/base.py canonicalize).

    per_block_io: multi-block sequential-grid mode (pallas_conv) — dt0 is
    a [1, n_blocks] SMEM row read at program_id, and stats write to row
    program_id of an [n_blocks, 4] SMEM output (Mosaic rejects sub-(8,128)
    SMEM *blocks*, so per-block scalars ride full arrays + explicit
    indexing instead of index maps).

    stream_out (round-4 verdict item 7): the [T, D, B] trajectory stays
    in HBM (memory_space ANY) and each drain row DMAs out of a [1, D, B]
    VMEM staging buffer — for BATCH-COUPLED (bsum) dynamics whose batch
    exceeds the trajectory VMEM budget but whose [D, B] state still fits.
    Grid-blocking cannot serve those (per-block controllers take
    different step sequences, so a block-local bsum would integrate a
    different ODE); one controller + streamed output preserves the exact
    semantics at any B with O(T) synchronous row copies."""
    evals = tab.evals_per_step

    def kernel(*refs):
        (tau_ref, dt0_ref, rtol_ref, atol_ref, dtmin_ref,
         sign_ref, valid_ref, y0_ref, f0_ref) = refs[:9]
        wrefs = refs[9:9 + n_wrefs]
        if emit_dense:
            (out_ref, stats_ref, meta_ref, dcoef_ref,
             y_s, f_s, comp_s) = refs[9 + n_wrefs:]
            # t1s initialized to +inf: unused tail rows then never win a
            # searchsorted query within [t0, t_end] (DenseOutput.eval).
            meta_ref[:] = jnp.full_like(meta_ref, jnp.inf)
        elif stream_out:
            (out_ref, stats_ref, y_s, f_s, comp_s, row_s,
             dma_sem) = refs[9 + n_wrefs:]
        else:
            out_ref, stats_ref, y_s, f_s, comp_s = refs[9 + n_wrefs:]
        pid = pl.program_id(0) if per_block_io else 0
        rtol = rtol_ref[0, 0]
        atol = atol_ref[0, 0]
        dt_min = dtmin_ref[0, 0]
        t_end = tau_ref[0, T - 1]
        t_start = tau_ref[0, 0]
        sign = sign_ref[0, 0]

        def write_row(o, val2d):
            """Emit one [D, B] output row at index o (dynamic)."""
            if stream_out:
                row_s[:] = val2d[None]
                cp = pltpu.make_async_copy(
                    row_s, out_ref.at[pl.ds(o, 1)], dma_sem)
                cp.start()
                cp.wait()
            else:
                out_ref[pl.ds(o, 1)] = val2d[None]

        # Deterministic output on early exit: zero-fill, then y0 row.
        if stream_out:
            jax.lax.fori_loop(
                1, T, lambda o, _: (write_row(o, jnp.zeros_like(y_s)), 0)[1],
                0)
        else:
            out_ref[:] = jnp.zeros_like(out_ref)
        write_row(0, y0_ref[:])
        y_s[:] = y0_ref[:]
        f_s[:] = f0_ref[:]
        comp_s[:] = jnp.zeros_like(comp_s)

        raw_f = make_f(wrefs)

        def f(s, y):
            # Canonical dynamics: g(tau, y) = sign * f(sign * tau, y).
            return sign * raw_f(sign * s, y)

        def cond(c):
            t, dt, oi, si, nfe, nacc, nrej, status = c
            return (t < t_end) & (status == 0)

        def body(c):
            t, dt, oi, si, nfe, nacc, nrej, status = c
            rem = t_end - t
            dt_eff = jnp.minimum(dt, rem)
            is_last = dt >= rem
            t1 = jnp.where(is_last, t_end, t + dt_eff)
            dth = t1 - t

            y0 = y_s[:]
            k, delta, err, y_mid = _rk_stages(tab, f, y0, f_s[:], dth,
                                              t0=t)
            y1 = y0 + delta

            scale = atol + rtol * jnp.maximum(jnp.abs(y0), jnp.abs(y1))
            esc = err / scale
            # Mask batch-padding lanes (small batches are padded to a full
            # lane tile; pad states are zero but f(0) != 0 with biases).
            lane = jax.lax.broadcasted_iota(jnp.int32, esc.shape, 1)
            valid = lane < B_true
            esc = jnp.where(valid, esc, 0.0)
            ss = jnp.sum(esc * esc)
            ratio = jnp.sqrt(ss / denom)
            finite = jnp.isfinite(ss) & jnp.all(
                jnp.isfinite(jnp.where(valid, y1, 0.0)))
            accept = (ratio <= 1.0) & finite

            fac = _controller_factor(ratio, finite, accept, safety,
                                     ifactor, dfactor, tab.order)
            # Rescale the CLAMPED attempted step (matches the generic
            # engine): scaling the unclamped proposal near t_end re-attempts
            # the same effective step while the oversized proposal decays,
            # inflating rejections and delaying DT_UNDERFLOW.
            dt_next = dth * fac

            # Derivative at the step end: FSAL tableaus get it for free;
            # others pay one extra evaluation (counted below).
            f1 = k[-1] if tab.fsal else f(t1, y1)

            # Dense output over [t, t1], exact at t1 (4th-order through the
            # midpoint when the tableau provides one, else cubic Hermite).
            df0 = dth * k[0]
            df1 = dth * f1
            ca, cb, cc = _interp_coeffs(y0, y1, y_mid, df0, df1)

            # Kahan-compensated state accumulation (matches the generic
            # solver; removes the sqrt(n_steps)-ulp f32 random walk).
            comp = comp_s[:]
            adj = delta - comp
            y_new = y0 + adj

            @pl.when(accept)
            def _():
                comp_s[:] = (y_new - y0) - adj
                y_s[:] = y_new
                f_s[:] = f1

            if emit_dense:
                # Persist this step's interpolant (cursor si): metadata row
                # [t0, t1, dt] and the 5 coefficient planes (the generic
                # interp_evaluate convention (((a x + b) x + c) x + df0) x
                # + y0), for post-hoc DenseOutput / interpolated adjoint.
                @pl.when(accept & (si < emit_dense))
                def _():
                    z = jnp.zeros((1, 1), out_ref.dtype)
                    meta_ref[pl.ds(si, 1), :] = jnp.concatenate(
                        [z + t, z + t1, z + dth], axis=1)
                    ca_ = ca if ca is not None else jnp.zeros_like(y0)
                    dcoef_ref[pl.ds(5 * si, 5)] = jnp.concatenate(
                        [ca_[None], cb[None], cc[None], df0[None],
                         y0[None]], axis=0)

            # Drain every requested time inside (t, t1] via an output
            # cursor: O(outputs) dynamic row writes total, instead of T
            # predicated writes per attempt (which would scale kernel size
            # and latency linearly in T).
            def wcond(o):
                return (o < T) & jnp.where(
                    accept, tau_ref[0, jnp.minimum(o, T - 1)] <= t1, False)

            def wbody(o):
                tj = tau_ref[0, o]
                x = (tj - t) / dth
                val = (((ca * x + cb) * x + cc) * x + df0) * x + y0
                write_row(o, jnp.where(tj == t1, y_new, val))
                return o + 1

            oi_new = jax.lax.while_loop(wcond, wbody, oi)

            n_att = nacc + nrej + 1
            status = jnp.where(
                (~accept) & (dt_next < dt_min) & (status == 0),
                jnp.int32(2), status)
            status = jnp.where(
                (n_att >= max_steps) & (t1 < t_end) & (status == 0),
                jnp.int32(1), status)
            # evals_per_step counts the unconditional f1 for non-FSAL
            # tableaus (same convention as the generic runge_kutta_step).
            si_new = jnp.where(accept & (si < jnp.int32(max(emit_dense, 1))),
                               si + 1, si) if emit_dense else si
            return (jnp.where(accept, t1, t), dt_next, oi_new, si_new,
                    nfe + evals, nacc + accept.astype(jnp.int32),
                    nrej + (~accept).astype(jnp.int32), status)

        # Invalid (non-monotonic) times: report status 3, leave out
        # zero-filled beyond row 0 (traced t bypasses the eager validation
        # in fast.py, so this is the only guard under jit). valid_ref
        # carries the caller's full tau-monotonicity check.
        status0 = jnp.where((t_end > t_start) & (valid_ref[0, 0] != 0),
                            jnp.int32(0), jnp.int32(3))
        init = (t_start, dt0_ref[0, pid], jnp.int32(1), jnp.int32(0),
                jnp.int32(0), jnp.int32(0), jnp.int32(0), status0)
        t, dt, oi, si, nfe, nacc, nrej, status = jax.lax.while_loop(
            cond, body, init)
        stats_ref[pid, 0] = nfe
        stats_ref[pid, 1] = nacc
        stats_ref[pid, 2] = nrej
        stats_ref[pid, 3] = status

    return kernel


def _make_perlane_kernel(tab, T: int, safety: float, ifactor: float,
                         dfactor: float, max_steps: int, D: int,
                         B_true: int, make_f, n_wrefs: int,
                         per_block_io: bool = False):
    """PER-LANE adaptive whole-solve kernel: every batch lane (sample)
    carries its own controller state — t, dt, accept/reject decision, NFE
    count, and status — as [1, B] rows, so one stiff sample no longer
    throttles the whole block's step size (the capability `jax.vmap(solve)`
    provides at ~16 us/step on the generic engine, here at kernel speed).

    The torchode-style design, TPU-native: stage evaluations remain fully
    vectorized over all lanes every iteration (lanes that are done or
    rejected do wasted-but-free vector work); the error norm reduces over
    the FEATURE axis only (per-sample RMS, matching the generic norm on a
    single sample); accepts/state updates are per-lane masked `where`s.
    Output drain: a global cursor `oi` tracks the first row not yet
    completed by ALL lanes; each iteration scans rows from `oi` while
    tau[o] <= max accepted t1, writing each lane's interpolant under the
    mask (tau[o] in that lane's accepted (t, t1]]) — every lane writes
    each row exactly once, when its step interval first covers it.

    Controller state lives in VMEM scratch rows (tdt_s f32 [2, B]:
    t / dt; li_s int32 [4, B]: nfe / accepted / rejected / status), so the
    while carry stays scalar (cursor + alive flag). Termination: a lane
    goes inactive at t >= t_end or nonzero status (per-lane DT_UNDERFLOW /
    MAX_STEPS on its own attempt count); the loop ends when no lane is
    active. Outputs: out [T, D, B], stats [1, 4] (nfe/acc/rej SUMMED over
    real lanes — vmap-of-generic semantics — status = max), lane_stats
    int32 [4, B] per-lane rows."""
    evals = tab.evals_per_step

    def kernel(*refs):
        (tau_ref, rtol_ref, atol_ref, dtmin_ref, sign_ref,
         valid_ref, y0_ref, f0_ref, dt0_ref) = refs[:9]
        wrefs = refs[9:9 + n_wrefs]
        (out_ref, stats_ref, lane_ref,
         y_s, f_s, comp_s, tdt_s, li_s) = refs[9 + n_wrefs:]
        pid = pl.program_id(0) if per_block_io else 0
        rtol = rtol_ref[0, 0]
        atol = atol_ref[0, 0]
        dt_min = dtmin_ref[0, 0]
        t_end = tau_ref[0, T - 1]
        t_start = tau_ref[0, 0]
        sign = sign_ref[0, 0]
        B = out_ref.shape[2]

        out_ref[:] = jnp.zeros_like(out_ref)
        out_ref[0] = y0_ref[:]
        y_s[:] = y0_ref[:]
        f_s[:] = f0_ref[:]
        comp_s[:] = jnp.zeros_like(comp_s)

        lane = jax.lax.broadcasted_iota(jnp.int32, (1, B), 1)
        is_real = lane < B_true
        ok = (t_end > t_start) & (valid_ref[0, 0] != 0)
        # Pad lanes start AT t_end (never active, nfe 0); real lanes carry
        # status 3 (INVALID_TIMES) when the caller's tau check failed.
        tdt_s[0:1, :] = jnp.where(is_real, t_start, t_end)
        tdt_s[1:2, :] = dt0_ref[:]
        zi = jnp.zeros((1, B), jnp.int32)
        li_s[0:1, :] = zi
        li_s[1:2, :] = zi
        li_s[2:3, :] = zi
        li_s[3:4, :] = jnp.where(ok | ~is_real, zi, zi + 3)

        raw_f = make_f(wrefs)

        def f(s, y):
            return sign * raw_f(sign * s, y)

        def cond(c):
            return c[1]

        def body(c):
            oi, _ = c
            t = tdt_s[0:1, :]
            dt = tdt_s[1:2, :]
            status_l = li_s[3:4, :]
            active = (t < t_end) & (status_l == 0)
            rem = t_end - t
            dt_eff = jnp.minimum(dt, rem)
            is_last = dt >= rem
            t1 = jnp.where(is_last, t_end, t + dt_eff)
            # Inactive lanes step with a dummy dt=1 so the stage math and
            # the drain's (tj - t)/dth stay finite; their updates are
            # masked out below.
            dth = jnp.where(active, t1 - t, jnp.ones_like(t))

            y0 = y_s[:]
            k, delta, err, y_mid = _rk_stages(tab, f, y0, f_s[:], dth,
                                              t0=t)
            y1 = y0 + delta

            scale = atol + rtol * jnp.maximum(jnp.abs(y0), jnp.abs(y1))
            esc = err / scale
            ss = jnp.sum(esc * esc, axis=0, keepdims=True)     # [1, B]
            ratio = jnp.sqrt(ss / float(D))
            finite = (jnp.isfinite(ss)
                      & jnp.all(jnp.isfinite(y1), axis=0, keepdims=True))
            acc_raw = (ratio <= 1.0) & finite
            accept = acc_raw & active

            fac = _controller_factor(ratio, finite, acc_raw, safety,
                                     ifactor, dfactor, tab.order)
            dt_next = jnp.where(active, dth * fac, dt)

            f1 = k[-1] if tab.fsal else f(t1, y1)
            df0 = dth * k[0]
            df1 = dth * f1
            ca, cb, cc = _interp_coeffs(y0, y1, y_mid, df0, df1)

            comp = comp_s[:]
            adj = delta - comp
            y_new = y0 + adj
            comp_s[:] = jnp.where(accept, (y_new - y0) - adj, comp)
            y_s[:] = jnp.where(accept, y_new, y0)
            f_s[:] = jnp.where(accept, f1, f_s[:])
            t_new = jnp.where(accept, t1, t)

            # Drain: rows from the global cursor while some accepted lane
            # reached them; each lane writes under its own interval mask.
            t1_acc = jnp.where(accept, t1, -jnp.inf)
            tmax = jnp.max(t1_acc)

            def wcond(o):
                return (o < T) & (tau_ref[0, jnp.minimum(o, T - 1)]
                                  <= tmax)

            def wbody(o):
                tj = tau_ref[0, o]
                m = accept & (tj > t) & (tj <= t1)
                x = (tj - t) / dth
                val = (((ca * x + cb) * x + cc) * x + df0) * x + y0
                val = jnp.where(tj == t1, y_new, val)
                cur = out_ref[pl.ds(o, 1)]
                out_ref[pl.ds(o, 1)] = jnp.where(m, val, cur[0])[None]
                return o + 1

            jax.lax.while_loop(wcond, wbody, oi)
            # Advance the cursor past rows now completed by EVERY lane.
            t_min = jnp.min(t_new)

            def acond(o):
                return (o < T) & (tau_ref[0, jnp.minimum(o, T - 1)]
                                  <= t_min)

            oi_new = jax.lax.while_loop(acond, lambda o: o + 1, oi)

            nfe_l = li_s[0:1, :] + evals * active.astype(jnp.int32)
            acc_l = li_s[1:2, :] + accept.astype(jnp.int32)
            rej_l = li_s[2:3, :] + (active & ~accept).astype(jnp.int32)
            att = acc_l + rej_l
            status_l = jnp.where(
                active & ~acc_raw & (dt_next < dt_min) & (status_l == 0),
                jnp.int32(2), status_l)
            status_l = jnp.where(
                (att >= max_steps) & (t_new < t_end) & (status_l == 0),
                jnp.int32(1), status_l)
            tdt_s[0:1, :] = t_new
            tdt_s[1:2, :] = dt_next
            li_s[0:1, :] = nfe_l
            li_s[1:2, :] = acc_l
            li_s[2:3, :] = rej_l
            li_s[3:4, :] = status_l
            alive = jnp.any((t_new < t_end) & (status_l == 0))
            return (oi_new, alive)

        jax.lax.while_loop(cond, body, (jnp.int32(1), ok & (B_true > 0)))

        zi = jnp.zeros((1, B), jnp.int32)
        stats_ref[pid, 0] = jnp.sum(jnp.where(is_real, li_s[0:1, :], zi))
        stats_ref[pid, 1] = jnp.sum(jnp.where(is_real, li_s[1:2, :], zi))
        stats_ref[pid, 2] = jnp.sum(jnp.where(is_real, li_s[2:3, :], zi))
        stats_ref[pid, 3] = jnp.max(jnp.where(is_real, li_s[3:4, :], zi))
        lane_ref[:] = li_s[0:4, :]

    return kernel


def perlane_solve_call(make_f, aux_arrays, y0: Array, tau: Array, dt0_row,
                       rtol, atol, sign, f0, *, tab, safety: float,
                       ifactor: float, dfactor: float, max_steps: int,
                       B_true: int, interpret: bool, n_blocks: int = 1):
    """Launch plumbing for the per-lane whole-solve kernel.

    dt0_row: per-lane initial steps, any shape broadcastable to [1, B]
    (e.g. a vmapped `select_initial_step` per sample). Returns
    (out [T, D, B], stats [4] int32 with nfe/acc/rej SUMMED over lanes,
    lane_stats int32 [4, B]: per-lane nfe/accepted/rejected/status).

    n_blocks > 1 (round-4 verdict item 3: per-lane forward past the VMEM
    budget): lane blocks run as SEQUENTIAL GRID PROGRAMS — per-lane
    controllers are independent, so blocking changes nothing semantically
    (unlike the shared-controller kernel, where each block gets its own
    controller). The caller wrap-pads the batch to n_blocks equal
    lane-aligned slices; B_true is then the per-block lane count and
    stats come back [n_blocks, 4] for the caller to merge."""
    D, B = y0.shape
    T = int(tau.shape[0])
    dtype = y0.dtype

    dt_min = (4.0 * jnp.finfo(dtype).eps
              * jnp.maximum(jnp.maximum(jnp.abs(tau[0]), jnp.abs(tau[-1])),
                            1.0)).astype(dtype)
    tau = tau.astype(dtype)
    valid = (jnp.all(jnp.diff(tau) > 0) if T > 1
             else jnp.asarray(True)).astype(jnp.int32)
    dt0_row = jnp.maximum(jnp.abs(jnp.asarray(dt0_row, dtype)),
                          dt_min).reshape(1, -1)
    if dt0_row.shape[1] not in (1, B):
        # Caller passed TRUE-batch per-lane steps; lane-pad with dt_min
        # (pad lanes start at t_end and never step anyway).
        dt0_row = jnp.pad(dt0_row, ((0, 0), (0, B - dt0_row.shape[1])),
                          constant_values=dt_min)
    dt0_row = jnp.broadcast_to(dt0_row, (1, B))

    if B % n_blocks:
        raise ValueError(f"lane count {B} not divisible by n_blocks "
                         f"{n_blocks}")
    NB = B // n_blocks
    kernel = _make_perlane_kernel(tab, T, safety, ifactor, dfactor,
                                  int(max_steps), D, B_true, make_f,
                                  len(aux_arrays),
                                  per_block_io=n_blocks > 1)
    smem_t = pl.BlockSpec(memory_space=pltpu.SMEM)
    vmem = pl.BlockSpec(memory_space=pltpu.VMEM)
    scalar_ins = (tau.reshape(1, T),
                  jnp.reshape(jnp.asarray(rtol, dtype), (1, 1)),
                  jnp.reshape(jnp.asarray(atol, dtype), (1, 1)),
                  jnp.reshape(dt_min, (1, 1)),
                  jnp.reshape(jnp.asarray(sign, dtype), (1, 1)),
                  jnp.reshape(valid, (1, 1)))
    scratch = ([pltpu.VMEM((D, NB), dtype)] * 3
               + [pltpu.VMEM((2, NB), dtype),
                  pltpu.VMEM((4, NB), jnp.int32)])
    if n_blocks == 1:
        out, stats, lane_stats = solver_pallas_call(
            kernel,
            in_specs=[smem_t] * 6 + [vmem] * (3 + len(aux_arrays)),
            out_specs=[vmem, smem_t, vmem],
            out_shape=[jax.ShapeDtypeStruct((T, D, B), dtype),
                       jax.ShapeDtypeStruct((1, 4), jnp.int32),
                       jax.ShapeDtypeStruct((4, B), jnp.int32)],
            scratch_shapes=scratch,
            interpret=interpret,
        )(*scalar_ins, y0, f0, dt0_row, *aux_arrays)
        return out, stats[0], lane_stats

    state_spec = pl.BlockSpec((D, NB), lambda i: (0, i),
                              memory_space=pltpu.VMEM)
    row_spec = pl.BlockSpec((1, NB), lambda i: (0, i),
                            memory_space=pltpu.VMEM)
    out, stats, lane_stats = solver_pallas_call(
        kernel,
        grid=(n_blocks,),
        in_specs=([smem_t] * 6 + [state_spec, state_spec, row_spec]
                  + [rep_spec(np.shape(w)) for w in aux_arrays]),
        out_specs=[pl.BlockSpec((T, D, NB), lambda i: (0, 0, i),
                                memory_space=pltpu.VMEM), smem_t,
                   pl.BlockSpec((4, NB), lambda i: (0, i),
                                memory_space=pltpu.VMEM)],
        out_shape=[jax.ShapeDtypeStruct((T, D, B), dtype),
                   jax.ShapeDtypeStruct((n_blocks, 4), jnp.int32),
                   jax.ShapeDtypeStruct((4, B), jnp.int32)],
        scratch_shapes=scratch,
        interpret=interpret,
    )(*scalar_ins, y0, f0, dt0_row, *aux_arrays)
    stats = jnp.concatenate(
        [jnp.sum(stats[:, :3], axis=0), stats[:, 3:4].max(axis=0)])
    return out, stats, lane_stats


def padded_mlp_f(warrays, dims, y: Array, activation: str,
                 final_activation: str, input_power: int,
                 t=None, time_input: bool = False) -> Array:
    """XLA reference of the in-kernel general MLP (padded weights, [D, B]
    feature-major) — used for f0/initial-step selection and testing."""
    acts = ([_ACTIVATIONS[activation]] * (len(dims) - 1)
            + [_ACTIVATIONS[final_activation]])
    h = _input_transform(y, input_power)
    for l, (din, dout) in enumerate(dims):
        wT = warrays[2 * l]
        b = warrays[2 * l + 1]
        if time_input and l == 0:
            tt = jnp.broadcast_to(jnp.asarray(t, h.dtype),
                                  (1, h.shape[1]))
            h = jnp.concatenate([h[:din - 1, :], tt], axis=0)
        z = jnp.einsum("oi,ib->ob", wT[:, :din], h[:din, :],
                       precision=jax.lax.Precision.HIGHEST) + b
        h = acts[l](z)
    return h[:dims[-1][1], :]


@functools.partial(
    jax.jit,
    static_argnames=("dims", "activation", "final_activation", "input_power",
                     "time_input", "rhs", "method", "safety", "ifactor",
                     "dfactor", "max_steps", "matmul", "interpret", "pack",
                     "n_blocks", "dot_precision", "per_sample"))
def mlp_solve(warrays, dims, y0: Array, tau: Array, dt0: Array, rtol, atol,
              sign, *, f0: Array = None, activation: str = "tanh",
              final_activation: str = "identity", input_power: int = 1,
              time_input: bool = False, rhs: str = "mlp",
              method: str = "dopri5", safety: float = 0.9,
              ifactor: float = 10.0, dfactor: float = 0.2,
              max_steps: int = 2 ** 31 - 1, matmul: str = "vpu",
              interpret: bool = False, pack: str | int = "auto",
              n_blocks: int = 1, dot_precision: str = "highest",
              per_sample: bool = False):
    """Whole-solve fused adaptive RK for a GENERAL autonomous MLP ODE, one
    kernel launch: every stage evaluation, combine, error norm, controller
    decision and dense-output write runs in-kernel.

    warrays/dims: padded weights from `pad_mlp_weights` (arbitrary depth,
    any activation in `_ACTIVATIONS`, optional y**input_power input
    transform — covers both the benchmark tanh-MLP and the latent-ODE ELU
    dynamics). `method` selects the tableau ('dopri5', 'bosh3',
    'adaptive_heun', 'tsit5', 'dopri8'); non-FSAL tableaus pay one extra
    evaluation per accepted step for the dense-output end derivative.

    y0: [D, B] feature-major; tau: [T] INCREASING canonical times; sign:
    runtime scalar, +1/-1 with tau = sign * t (reverse time = sign -1, as
    in solvers/base.py); f0: optional precomputed signed derivative at
    (tau[0], y0). pack: 'auto' (default) engages sublane packing for
    narrow states (see pick_pack); an int pins the group count (1 = off).
    n_blocks > 1 (batch must divide, per-block lanes must stay
    lane-aligned) runs lane blocks as sequential grid programs — one
    launch, per-block controller; stats are then nfe/acc/rej summed with
    status = max.
    Returns (out [T, D, B], stats [4] int32: nfe/accepted/rejected/status).
    Status: 0 OK, 1 MAX_STEPS_REACHED, 2 DT_UNDERFLOW, 3 INVALID_TIMES.
    """
    from . import tableaus as _tabs
    tab = _tabs.TABLEAUS_BY_NAME[method]
    D, B = y0.shape
    T = int(tau.shape[0])
    dtype = y0.dtype
    warrays = [jnp.asarray(w, dtype) for w in warrays]
    sign = jnp.asarray(sign, dtype)
    if f0 is None:
        if rhs != "mlp":
            raise ValueError(f"rhs={rhs!r} needs an explicit f0 (the XLA "
                             "reference only covers the plain MLP)")
        f0 = sign * padded_mlp_f(warrays, dims, y0, activation,
                                 final_activation, input_power,
                                 t=sign * tau[0], time_input=time_input)

    if per_sample:
        # Per-lane controllers need unpacked per-sample lanes (packing
        # would merge k samples per controller). Grid blocks compose
        # freely — per-lane controllers are independent, so sequential
        # lane-block programs change nothing semantically (round-4
        # verdict item 3: per-lane forward past the VMEM budget).
        pack = 1
    y0, f0, k, Lb = prep_state_blocks(y0, f0, D, pack, n_blocks)
    B_true = Lb

    if rhs == "mlp":
        def make_f(wrefs):
            return _make_net(wrefs, dims, activation, final_activation,
                             input_power, time_input, matmul,
                             dot_precision)
    elif rhs == "cnf":
        # y0 rows = [z (D_flow); logp]; dims describe the flow MLP.
        def make_f(wrefs):
            return _make_cnf_net(wrefs, dims, activation, time_input)
    else:
        raise ValueError(f"unknown rhs {rhs!r} (expected 'mlp' or 'cnf')")
    if k > 1:
        make_f = packed_make_f(make_f, k, D)

    if per_sample:
        return perlane_solve_call(
            make_f, warrays, y0, tau, dt0, rtol, atol, sign, f0, tab=tab,
            safety=safety, ifactor=ifactor, dfactor=dfactor,
            max_steps=int(max_steps), B_true=B_true, interpret=interpret,
            n_blocks=n_blocks)

    out, stats = whole_solve_call(
        make_f, warrays, y0, tau, dt0, rtol, atol, sign, f0, tab=tab,
        safety=safety, ifactor=ifactor, dfactor=dfactor,
        max_steps=int(max_steps), B_true=B_true, interpret=interpret,
        n_blocks=n_blocks)
    if n_blocks > 1:
        stats = merge_grid_stats(stats, per_block_work=True)
    if out.shape[-1] != n_blocks * Lb:
        out = out[:, :, :Lb]       # single-block lane padding
    if k > 1:
        out = unpack_state_blocks(out, k, D, n_blocks)
    return out, stats


def whole_solve_call(make_f, aux_arrays, y0: Array, tau: Array, dt0, rtol,
                     atol, sign, f0, *, tab, safety: float, ifactor: float,
                     dfactor: float, max_steps: int, B_true: int,
                     interpret: bool, emit_dense: int = 0,
                     n_blocks: int = 1, stream_out: bool = False):
    """Shared pallas_call plumbing for whole-solve kernels.

    y0/f0: [D, B] feature-major with B already lane-padded; aux_arrays:
    VMEM operand arrays handed to `make_f` as refs (weights / plan consts).
    Returns (out [T, D, B], stats [4] int32); with `emit_dense=S` (> 0,
    and max_steps <= S so the cursor cannot overflow) additionally the
    per-accepted-step interpolants (meta [S, 3] = (t0, t1, dt) rows with
    +inf t1 tail, coeffs [5*S, D, B]).

    n_blocks > 1: y0/f0 lanes hold n_blocks equal slices and each slice
    runs as a SEQUENTIAL GRID PROGRAM in the same launch — its own [D,
    B/n] state, scratch, and step controller, weights replicated via
    index maps (the conv tier's recipe, ops/pallas_conv.py; bounds the
    per-program VMEM trajectory buffer for batches past the budget).
    B_true is then the per-block true lane count and stats come back
    [n_blocks, 4]. With emit_dense, every block writes its OWN interpolant
    window: meta comes back [n_blocks*S, 3] (rows [i*S, (i+1)*S) belong to
    block i) and coeffs [5*S, D, B] lane-sliced per block.
    """
    D, B = y0.shape
    T = int(tau.shape[0])
    dtype = y0.dtype

    # Span-scaled minimum step (matches the generic _default_dt_min).
    dt_min = (4.0 * jnp.finfo(dtype).eps
              * jnp.maximum(jnp.maximum(jnp.abs(tau[0]), jnp.abs(tau[-1])),
                            1.0)).astype(dtype)

    if emit_dense and int(max_steps) > int(emit_dense):
        raise ValueError("emit_dense buffer smaller than max_steps "
                         "(accepted steps could overflow it)")
    if B % n_blocks:
        raise ValueError(f"lane count {B} not divisible by n_blocks "
                         f"{n_blocks}")
    NB = B // n_blocks
    if stream_out and (n_blocks > 1 or emit_dense):
        raise ValueError("stream_out is single-block, no-dense-output "
                         "only (one controller streaming rows to HBM)")
    kernel = _make_solve_kernel(tab, T, safety, ifactor, dfactor,
                                int(max_steps), float(D * B_true), B_true,
                                make_f, len(aux_arrays),
                                per_block_io=n_blocks > 1,
                                emit_dense=int(emit_dense),
                                stream_out=stream_out)

    smem_t = pl.BlockSpec(memory_space=pltpu.SMEM)
    vmem = pl.BlockSpec(memory_space=pltpu.VMEM)

    tau = tau.astype(dtype)
    valid = (jnp.all(jnp.diff(tau) > 0) if T > 1
             else jnp.asarray(True)).astype(jnp.int32)
    # dt0: per-block row (each grid program reads column program_id) or a
    # broadcast scalar — clamped to dt_min (dt0 == 0 would be accepted
    # forever without progress; the generic engine clamps identically).
    dt0 = jnp.maximum(jnp.abs(jnp.asarray(dt0, dtype)), dt_min)
    dt0 = jnp.broadcast_to(dt0.reshape(-1),
                           (n_blocks,)).reshape(1, n_blocks)
    scalar_ins = (tau.reshape(1, T), dt0,
                  jnp.reshape(jnp.asarray(rtol, dtype), (1, 1)),
                  jnp.reshape(jnp.asarray(atol, dtype), (1, 1)),
                  jnp.reshape(dt_min, (1, 1)),
                  jnp.reshape(jnp.asarray(sign, dtype), (1, 1)),
                  jnp.reshape(valid, (1, 1)))
    scratch = [pltpu.VMEM((D, NB), dtype)] * 3

    if n_blocks == 1:
        out_shape = [jax.ShapeDtypeStruct((T, D, B), dtype),
                     jax.ShapeDtypeStruct((1, 4), jnp.int32)]
        out_specs = [vmem, smem_t]
        stream_kw = {}
        if stream_out:
            # Trajectory lives in HBM; the kernel DMAs one [1, D, B]
            # staging row per drain write.
            out_specs[0] = pl.BlockSpec(memory_space=pl.ANY)
            scratch = scratch + [pltpu.VMEM((1, D, B), dtype),
                                 pltpu.SemaphoreType.DMA]
            state_mb = (4 * _round_up(D, _SUBLANE) * B
                        * (tab.evals_per_step + 10)) // 2 ** 20
            if not interpret and state_mb > 56:
                # Streamed solves run at the FULL batch: the stage
                # chain's [D, B] buffers live SUBLANE-PADDED (D=2 -> 8
                # rows, 4x), measured 73.13 MB at D=2 B=131072 — past
                # the 64 MB default scoped limit but under the v5e
                # 128 MB VMEM. Raise the budget for THOSE launches only
                # (the front-end guard caps B with the padded model;
                # same recipe as plan_adjoint's streamed sweep). Smaller
                # streamed batches keep the default limit — Mosaic's
                # allocation search near a raised ceiling has been
                # observed to blow up compile time.
                stream_kw["compiler_params"] = pltpu.CompilerParams(
                    vmem_limit_bytes=100 * 1024 * 1024)
        if emit_dense:
            S = int(emit_dense)
            out_shape += [jax.ShapeDtypeStruct((S, 3), dtype),
                          jax.ShapeDtypeStruct((5 * S, D, B), dtype)]
            out_specs += [vmem, vmem]
        res = solver_pallas_call(
            kernel,
            in_specs=[smem_t] * 7 + [vmem] * (2 + len(aux_arrays)),
            out_specs=out_specs,
            out_shape=out_shape,
            scratch_shapes=scratch,
            interpret=interpret,
            **stream_kw,
        )(*scalar_ins, y0, f0, *aux_arrays)
        if emit_dense:
            out, stats, meta, dcoef = res
            return out, stats[0], meta, dcoef
        out, stats = res
        return out, stats[0]

    # Sequential grid over lane blocks (one launch; scratch reused
    # program-to-program since TPU grids run sequentially).
    state_spec = pl.BlockSpec((D, NB), lambda i: (0, i),
                              memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((T, D, NB), lambda i: (0, 0, i),
                            memory_space=pltpu.VMEM)
    out_shape = [jax.ShapeDtypeStruct((T, D, B), dtype),
                 jax.ShapeDtypeStruct((n_blocks, 4), jnp.int32)]
    out_specs = [out_spec, smem_t]
    if emit_dense:
        # Per-block dense windows: every grid program persists its OWN
        # accepted-step interpolant sequence — meta rows [i*S, (i+1)*S)
        # and the lane slice of the coefficient planes (each block has
        # its own controller, hence its own step grid; consumers evaluate
        # per block — solvers/base.BlockDenseOutput).
        S = int(emit_dense)
        out_shape += [jax.ShapeDtypeStruct((n_blocks * S, 3), dtype),
                      jax.ShapeDtypeStruct((5 * S, D, B), dtype)]
        out_specs += [pl.BlockSpec((S, 3), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
                      pl.BlockSpec((5 * S, D, NB), lambda i: (0, 0, i),
                                   memory_space=pltpu.VMEM)]
    res = solver_pallas_call(
        kernel,
        grid=(n_blocks,),
        in_specs=([smem_t] * 7 + [state_spec, state_spec]
                  + [rep_spec(np.shape(w)) for w in aux_arrays]),
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=scratch,
        interpret=interpret,
    )(*scalar_ins, y0, f0, *aux_arrays)
    if emit_dense:
        out, stats, meta, dcoef = res
        return out, stats, meta, dcoef
    out, stats = res
    return out, stats


def dopri5_mlp_solve(params: dict, y0: Array, tau: Array, dt0: Array,
                     rtol, atol, *, f0: Array = None,
                     method: str = "dopri5", safety: float = 0.9,
                     ifactor: float = 10.0, dfactor: float = 0.2,
                     max_steps: int = 2 ** 31 - 1,
                     interpret: bool = False):
    """Back-compat wrapper: the benchmark tanh-MLP (f = tanh(y^3 W1 + b1)
    W2 + b2) through the general `mlp_solve` kernel."""
    dtype = y0.dtype
    warrays, dims = pad_mlp_weights(
        [(params["w1"], params["b1"]), (params["w2"], params["b2"])], dtype)
    return mlp_solve(warrays, dims, y0, tau, dt0, rtol, atol,
                     jnp.asarray(1.0, dtype), f0=f0, activation="tanh",
                     final_activation="identity", input_power=3,
                     method=method, safety=safety, ifactor=ifactor,
                     dfactor=dfactor, max_steps=max_steps,
                     interpret=interpret)
