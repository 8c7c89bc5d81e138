"""Feature-major conv-ODE dynamics math shared by the fused Pallas kernel
and its XLA reference (reference capability: `ODEfunc` in upstream
`examples/odenet_mnist.py`, SURVEY.md:104 — GN -> relu -> ConcatConv3x3 ->
GN -> relu -> ConcatConv3x3 -> GN over a [B, H, W, C] feature map).

TPU-first formulation: the state lives as ONE [C, B*H*W] f32 block
(channel-major; lane n = b*(H*W) + i*W + j), and every op maps to either
a systolic-array dot or an elementwise VPU op:

- 3x3 SAME conv  = 9 shifted copies (lane roll by 7*di + dj, boundary
  lanes masked) each contracted with a [C_out, C_in] weight slice on the
  MXU; the concat-t channel's contribution is t * TM, with TM the
  position-dependent sum of valid t-channel taps (precomputed: it is the
  conv of the all-ones image).
- GroupNorm      = two reduce dots against a [N, B] lane->sample
  indicator R (sum and sum-of-squares), a [G, C] group-combine dot,
  and a spread dot back over R — per-sample/per-group mean and variance
  without any reshape.

`conv_ode_apply` is the XLA reference (jnp.roll; identical math);
`ops/pallas_conv.py` runs the same functions inside one kernel with
`pltpu.roll`. Weight extraction from the flax `ODEConvFunc` module lives
here too (`conv_params_from_flax`).
"""

from __future__ import annotations

import dataclasses
from typing import Sequence

import jax
import jax.numpy as jnp

Array = jax.Array

# 3x3 neighborhood offsets (di, dj), cross-correlation convention (what
# nn.Conv computes): out[i, j] += W[di+1, dj+1] . in[i+di, j+dj].
OFFSETS = tuple((di, dj) for di in (-1, 0, 1) for dj in (-1, 0, 1))


@dataclasses.dataclass(frozen=True)
class ConvODESpec:
    """Static topology of the fused conv ODE block."""
    height: int = 7
    width: int = 7
    channels: int = 64
    groups: int = 32
    eps: float = 1e-6       # flax nn.GroupNorm default

    @property
    def positions(self) -> int:
        return self.height * self.width


def conv_params_from_flax(variables) -> dict:
    """Extract the fused-kernel param dict from a flax `ODEConvFunc`
    (models/odenet.py): three GroupNorms and two ConcatConv2d(3x3).

    Returns {'gn': [(scale [C], bias [C])]*3,
             'conv': [(kernel [3,3,C+1,Cout], bias [Cout])]*2}.
    """
    p = variables.get("params", variables)
    gn = [(p[f"GroupNorm_{i}"]["scale"], p[f"GroupNorm_{i}"]["bias"])
          for i in range(3)]
    conv = [(p[f"ConcatConv2d_{i}"]["Conv_0"]["kernel"],
             p[f"ConcatConv2d_{i}"]["Conv_0"]["bias"]) for i in range(2)]
    return {"gn": gn, "conv": conv}


def to_feature_major(x: Array, spec: ConvODESpec) -> Array:
    """[B, H, W, C] -> [C, B*H*W] (lane n = b*HW + i*W + j)."""
    B = x.shape[0]
    return jnp.transpose(x, (3, 0, 1, 2)).reshape(
        spec.channels, B * spec.positions)


def from_feature_major(xf: Array, B: int, spec: ConvODESpec) -> Array:
    return jnp.transpose(
        xf.reshape(spec.channels, B, spec.height, spec.width), (1, 2, 3, 0))


def lane_masks(B: int, spec: ConvODESpec, dtype=jnp.float32):
    """Per-offset validity masks [1, B*HW]: mask[(di,dj)][n] = 1 iff the
    (i+di, j+dj) source of lane n lies inside the H x W block (this also
    zeroes lanes whose roll crossed a sample boundary)."""
    H, W, P = spec.height, spec.width, spec.positions
    n = jnp.arange(B * P)
    i = (n % P) // W
    j = n % W
    out = {}
    for di, dj in OFFSETS:
        ok = ((i + di >= 0) & (i + di < H) & (j + dj >= 0) & (j + dj < W))
        out[(di, dj)] = ok.astype(dtype)[None, :]
    return out

def reduce_matrix(B: int, spec: ConvODESpec, dtype=jnp.float32) -> Array:
    """R [N, B]: R[n, b] = 1 iff lane n belongs to sample b. One dot with
    R sums a [C, N] block over positions per sample; a dot_general against
    R's lane axis spreads a per-sample [C, B] value back to [C, N]."""
    N = B * spec.positions
    lane_sample = jnp.arange(N) // spec.positions
    return (lane_sample[:, None] == jnp.arange(B)[None, :]).astype(dtype)


def group_matrix(spec: ConvODESpec, dtype=jnp.float32) -> Array:
    """G [groups, C]: G[g, c] = 1 iff channel c is in group g (contiguous
    blocks, flax convention)."""
    gs = spec.channels // spec.groups
    cg = jnp.arange(spec.channels) // gs
    return (jnp.arange(spec.groups)[:, None] == cg[None, :]).astype(dtype)


def t_channel_map(kernel: Array, B: int, spec: ConvODESpec,
                  dtype=jnp.float32) -> Array:
    """TM [C_out, B*HW]: the concat-t channel contributes t * TM, where
    TM[:, n] = sum of the t-channel taps whose source position is valid
    at n — i.e. the SAME-padded conv of the all-ones image by the
    t-channel slice of the kernel."""
    ones = jnp.ones((1, spec.height, spec.width, 1), dtype)
    tker = kernel[:, :, -1:, :].astype(dtype)          # [3, 3, 1, C_out]
    tm = jax.lax.conv_general_dilated(
        ones, tker, (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        precision=jax.lax.Precision.HIGHEST)[0]        # [H, W, C_out]
    tm = jnp.transpose(tm, (2, 0, 1)).reshape(spec.channels, spec.positions)
    return jnp.tile(tm, (1, B))


def pack_conv_weights(kernel: Array, spec: ConvODESpec, dtype=jnp.float32):
    """kernel [3, 3, C+1, C_out] -> list of 9 [C_out, C_in] slices in
    OFFSETS order (t channel handled separately via `t_channel_map`)."""
    C = spec.channels
    return [jnp.transpose(kernel[di + 1, dj + 1, :C, :], (1, 0)).astype(dtype)
            for di, dj in OFFSETS]


def conv3x3(x: Array, wslices: Sequence[Array], bias: Array, tm: Array, t,
            masks, spec: ConvODESpec, roll_fn) -> Array:
    """SAME 3x3 conv on the feature-major block: 9 masked lane-rolls, each
    contracted on the MXU, plus bias ([C, 1]) and the t-channel term."""
    W = spec.width
    acc = None
    for (di, dj), wk in zip(OFFSETS, wslices):
        shift = di * W + dj
        shifted = roll_fn(x, -shift) if shift else x
        shifted = shifted * masks[(di, dj)]
        term = jnp.dot(wk, shifted, preferred_element_type=x.dtype,
                       precision=jax.lax.Precision.HIGHEST)
        acc = term if acc is None else acc + term
    return acc + bias + tm * t


def group_norm(x: Array, scale: Array, gbias: Array, R: Array, G: Array,
               spec: ConvODESpec) -> Array:
    """Per-sample, per-group mean/variance normalization of [C, N]
    (scale/gbias are [C, 1])."""
    hi = jax.lax.Precision.HIGHEST
    cnt = (spec.channels // spec.groups) * spec.positions
    s1 = jnp.dot(x, R, preferred_element_type=x.dtype,
                 precision=hi)                                    # [C, B]
    s2 = jnp.dot(x * x, R, preferred_element_type=x.dtype,
                 precision=hi)                                    # [C, B]
    gsum = jnp.dot(G, s1, preferred_element_type=x.dtype,
                   precision=hi)                                  # [G, B]
    gsq = jnp.dot(G, s2, preferred_element_type=x.dtype,
                  precision=hi)                                   # [G, B]
    mean = gsum / cnt
    # Clamp like flax's _compute_stats: f32 cancellation in E[x^2]-mean^2
    # can go negative beyond eps for near-constant large-magnitude groups
    # (measured -0.0039 at |x|~173), and rsqrt(negative) = NaN.
    var = jnp.maximum(gsq / cnt - mean * mean, 0.0)
    inv = jax.lax.rsqrt(var + spec.eps)
    # Spread per-group stats to channels (contract G's group axis), then
    # to lanes (contract R's sample axis) — no transposes materialized.
    mean_c = jax.lax.dot_general(
        G, mean, (((0,), (0,)), ((), ())),
        preferred_element_type=x.dtype, precision=hi)             # [C, B]
    inv_c = jax.lax.dot_general(
        G, inv, (((0,), (0,)), ((), ())),
        preferred_element_type=x.dtype, precision=hi)             # [C, B]
    mean_n = jax.lax.dot_general(
        mean_c, R, (((1,), (1,)), ((), ())),
        preferred_element_type=x.dtype, precision=hi)             # [C, N]
    inv_n = jax.lax.dot_general(
        inv_c, R, (((1,), (1,)), ((), ())),
        preferred_element_type=x.dtype, precision=hi)
    return (x - mean_n) * inv_n * scale + gbias


def make_conv_ode_f(params: dict, B: int, spec: ConvODESpec,
                    dtype=jnp.float32, roll_fn=None):
    """Build f(t, x_fm): [C, N] -> [C, N] — the full GN/relu/conv chain on
    the feature-major block. With the default roll_fn (jnp.roll) this is
    the XLA reference; the Pallas kernel passes pltpu.roll."""
    if roll_fn is None:
        roll_fn = lambda x, s: jnp.roll(x, s, axis=1)
    masks = lane_masks(B, spec, dtype)
    R = reduce_matrix(B, spec, dtype)
    G = group_matrix(spec, dtype)
    gn = [(jnp.asarray(s, dtype)[:, None], jnp.asarray(b, dtype)[:, None])
          for s, b in params["gn"]]
    convs = []
    for kernel, bias in params["conv"]:
        convs.append((pack_conv_weights(jnp.asarray(kernel, dtype), spec,
                                        dtype),
                      jnp.asarray(bias, dtype)[:, None],
                      t_channel_map(jnp.asarray(kernel, dtype), B, spec,
                                    dtype)))

    def f(t, x):
        h = group_norm(x, gn[0][0], gn[0][1], R, G, spec)
        h = jnp.maximum(h, 0.0)
        h = conv3x3(h, convs[0][0], convs[0][1], convs[0][2], t, masks,
                    spec, roll_fn)
        h = group_norm(h, gn[1][0], gn[1][1], R, G, spec)
        h = jnp.maximum(h, 0.0)
        h = conv3x3(h, convs[1][0], convs[1][1], convs[1][2], t, masks,
                    spec, roll_fn)
        return group_norm(h, gn[2][0], gn[2][1], R, G, spec)

    return f


def conv_ode_apply(params: dict, t, x: Array, spec: ConvODESpec) -> Array:
    """XLA reference of the fused dynamics on NHWC input (for tests and
    f0/initial-step selection): matches `ODEConvFunc.apply` to f32
    roundoff."""
    B = x.shape[0]
    xf = to_feature_major(jnp.asarray(x, jnp.float32), spec)
    f = make_conv_ode_f(params, B, spec)
    return from_feature_major(f(t, xf), B, spec)
