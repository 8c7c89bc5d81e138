"""ODE-Net MNIST classifier building blocks.

Capability parity with upstream `examples/odenet_mnist.py` (SURVEY.md §2):
`ConcatConv2d` (conv over channels with a concatenated time channel),
GroupNorm-normalized conv `ODEfunc`, `ODEBlock` integrating over [0, 1] at
tol=1e-3 with optional adjoint backprop, the conv downsampling stem, the FC
head, and a ResNet baseline variant (`--network odenet|resnet`).

TPU-native notes: NHWC layout (TPU conv-friendly), flax.linen modules, the
ODE solve is an on-device loop; NFE is returned as a carried scalar from the
solve stats and exposed via flax's `sow` diagnostics (works under jit),
replacing the reference's Python-side `ODEfunc.nfe` counter attribute.
"""

from __future__ import annotations

from typing import Any, Callable

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..odeint import solve
from ..adjoint import odeint_adjoint

Array = jax.Array


class ConcatConv2d(nn.Module):
    """Conv2D on [x, t·1] channel concatenation (reference `ConcatConv2d`).

    Runs at HIGHEST precision: these convs are the ODE dynamics feeding
    dopri5's error estimate; TPU's default bf16 conv noise would inflate
    adaptive step counts (see models/latent_ode.py, bench.py)."""
    features: int
    kernel: int = 3
    stride: int = 1

    @nn.compact
    def __call__(self, t, x):
        tt = jnp.broadcast_to(jnp.asarray(t, x.dtype),
                              x.shape[:-1] + (1,))
        xt = jnp.concatenate([x, tt], axis=-1)
        return nn.Conv(self.features, (self.kernel, self.kernel),
                       strides=(self.stride, self.stride), padding="SAME",
                       precision=jax.lax.Precision.HIGHEST)(xt)


class ODEConvFunc(nn.Module):
    """Conv dynamics with GroupNorm (reference `ODEfunc`)."""
    features: int = 64
    groups: int = 32

    @nn.compact
    def __call__(self, t, x):
        h = nn.GroupNorm(num_groups=min(self.groups, self.features))(x)
        h = nn.relu(h)
        h = ConcatConv2d(self.features)(t, h)
        h = nn.GroupNorm(num_groups=min(self.groups, self.features))(h)
        h = nn.relu(h)
        h = ConcatConv2d(self.features)(t, h)
        return nn.GroupNorm(num_groups=min(self.groups, self.features))(h)


class ODEBlock(nn.Module):
    """Integrate a conv dynamics over [0, 1] (reference `ODEBlock`).

    `adjoint=True` uses the O(1)-memory adjoint; otherwise direct backprop
    through the bounded on-device loop. Forward NFE lands in the
    'diagnostics' collection (use `.apply(..., mutable=['diagnostics'])` to
    read it); pass an `NFEMeter` (utils/nfe.py) as `nfe_meter` to also
    stream backward NFE to the host (reference parity: `odenet_mnist.py`
    logs f-NFE and b-NFE per step, SURVEY.md §2).
    """
    features: int = 64
    tol: float = 1e-3
    adjoint: bool = False
    method: str = "dopri5"
    nfe_meter: Any = None
    # Fused Pallas conv-ODE fast path (fast.solve_conv_ode; batches
    # auto-chunked to the VMEM budget). Alone it is forward-only
    # (inference); combined with adjoint=True the kernel runs the forward
    # and the generic O(1)-memory adjoint supplies gradients (training).
    fused: bool = False

    @nn.compact
    def __call__(self, x):
        func_mod = ODEConvFunc(features=self.features)
        t = jnp.asarray([0.0, 1.0], x.dtype)

        if self.is_initializing():
            # One dynamics call materializes every parameter; skip the
            # throwaway 256-step solve that shape inference doesn't need
            # (ys[-1] has x's shape) — saves minutes of init compile.
            _ = func_mod(jnp.asarray(0.0, x.dtype), x)
            self.sow("diagnostics", "nfe", jnp.asarray(0, jnp.int32))
            return x

        params = func_mod.variables

        if self.fused and not self.adjoint:
            from ..fast import solve_conv_ode
            # groups must match ODEConvFunc's effective num_groups; the
            # step budget matches the direct path's max_steps below.
            res = solve_conv_ode(params, x, t, rtol=self.tol,
                                 atol=self.tol, method=self.method,
                                 groups=min(32, self.features),
                                 max_num_steps=256)
            self.sow("diagnostics", "nfe", res.stats.nfe)
            return res.ys[-1]

        if self.adjoint:
            def f(tt, yy, p):
                return func_mod.apply(p, tt, yy)

            fwd = None
            if self.fused:
                # Fused forward + generic O(1)-memory backward: the
                # custom_vjp never differentiates the forward, so the
                # kernel trajectory simply replaces the internal solve.
                from ..fast import solve_conv_ode

                def fwd(y0_, t_, p_):
                    r = solve_conv_ode(p_, y0_, t_, rtol=self.tol,
                                       atol=self.tol, method=self.method,
                                       groups=min(32, self.features),
                                       max_num_steps=256)
                    return r.ys, r.stats

            ys, st = odeint_adjoint(f, x, t, params=params, rtol=self.tol,
                                    atol=self.tol, method=self.method,
                                    return_stats=True,
                                    nfe_meter=self.nfe_meter,
                                    forward_solver=fwd)
            self.sow("diagnostics", "nfe", st.nfe)
            return ys[-1]

        def f(tt, yy):
            return func_mod.apply(params, tt, yy)

        res = solve(f, x, t, rtol=self.tol, atol=self.tol,
                    method=self.method,
                    options={"max_steps": 256, "chunk_size": 16})
        self.sow("diagnostics", "nfe", res.stats.nfe)
        return res.ys[-1]


class ResBlock(nn.Module):
    """Plain residual block (reference `--network resnet` baseline)."""
    features: int = 64

    @nn.compact
    def __call__(self, x):
        h = nn.GroupNorm(num_groups=min(32, self.features))(x)
        h = nn.relu(h)
        h = nn.Conv(self.features, (3, 3), padding="SAME")(h)
        h = nn.GroupNorm(num_groups=min(32, self.features))(h)
        h = nn.relu(h)
        h = nn.Conv(self.features, (3, 3), padding="SAME")(h)
        return x + h


class ODENetMNIST(nn.Module):
    """Full MNIST classifier (reference `odenet_mnist.py`):
    conv stem (downsample 28->7) -> feature block -> GN/relu/pool -> FC."""
    features: int = 64
    network: str = "odenet"        # 'odenet' | 'resnet'
    adjoint: bool = False
    tol: float = 1e-3
    n_res_blocks: int = 6
    nfe_meter: Any = None          # NFEMeter for adjoint f/b-NFE logging
    fused: bool = False            # fused Pallas ODE block (inference,
                                   # or training when adjoint=True)

    @nn.compact
    def __call__(self, x):
        # x: [B, 28, 28, 1]
        h = nn.Conv(self.features, (3, 3), padding="SAME")(x)
        h = nn.GroupNorm(num_groups=32)(h)
        h = nn.relu(h)
        h = nn.Conv(self.features, (4, 4), strides=(2, 2), padding="SAME")(h)
        h = nn.GroupNorm(num_groups=32)(h)
        h = nn.relu(h)
        h = nn.Conv(self.features, (4, 4), strides=(2, 2), padding="SAME")(h)

        if self.network == "odenet":
            h = ODEBlock(features=self.features, tol=self.tol,
                         adjoint=self.adjoint,
                         nfe_meter=self.nfe_meter,
                         fused=self.fused)(h)
        else:
            for _ in range(self.n_res_blocks):
                h = ResBlock(features=self.features)(h)

        h = nn.GroupNorm(num_groups=32)(h)
        h = nn.relu(h)
        h = jnp.mean(h, axis=(1, 2))      # global average pool
        return nn.Dense(10)(h)
