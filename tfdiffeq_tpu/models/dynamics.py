"""Dynamics networks for the spiral neural-ODE demo.

Capability parity with upstream `examples/ode_demo.py` (SURVEY.md §2, §3.4):
the ground-truth `Lambda` dynamics dy/dt = y^3 A with the spiral matrix
A = [[-0.1, 2], [-2, -0.1]], and the trainable `ODEFunc` MLP
(2 -> 50 tanh -> 2) applied to y^3.

JAX-native: flax.linen modules; parameters are explicit pytrees passed to
`odeint` (closure) or `odeint_adjoint(params=...)`.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

SPIRAL_A = jnp.asarray([[-0.1, 2.0], [-2.0, -0.1]])


def spiral_dynamics(t, y):
    """Ground-truth spiral: dy/dt = y^3 A (reference `Lambda`)."""
    return (y ** 3) @ SPIRAL_A


class ODEFunc(nn.Module):
    """Trainable dynamics MLP (reference `ODEFunc`): net(y**3)."""
    hidden: int = 50
    out_dim: int = 2
    cube_input: bool = True

    @nn.compact
    def __call__(self, t, y):
        x = y ** 3 if self.cube_input else y
        x = nn.Dense(self.hidden,
                     kernel_init=nn.initializers.normal(0.1),
                     bias_init=nn.initializers.zeros)(x)
        x = jnp.tanh(x)
        x = nn.Dense(self.out_dim,
                     kernel_init=nn.initializers.normal(0.1),
                     bias_init=nn.initializers.zeros)(x)
        return x


def make_ode_func(hidden: int = 50, out_dim: int = 2, cube_input: bool = True,
                  seed: int = 0):
    """Convenience constructor: returns (func, params) with
    func(t, y, params) -> dy, ready for odeint/odeint_adjoint."""
    module = ODEFunc(hidden=hidden, out_dim=out_dim, cube_input=cube_input)
    params = module.init(jax.random.PRNGKey(seed), 0.0, jnp.ones((1, out_dim)))

    def func(t, y, p):
        return module.apply(p, t, y)

    return func, params
