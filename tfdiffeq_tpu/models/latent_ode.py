"""Latent ODE model components.

Capability parity with upstream `examples/latent_ode.py` (SURVEY.md §2,
§3.5): `RecognitionRNN` (backward-in-time encoder producing q(z0)),
`LatentODEFunc` (ELU MLP latent dynamics), `Decoder`, and the ELBO pieces
(`log_normal_pdf`, `normal_kl`). Default sizes match the reference
(latent 4, dynamics hidden 20, rnn hidden 25, obs 2, decoder hidden 20).

TPU-native notes: the recognition RNN runs as a `lax.scan` over reversed
time; the whole training step (encode -> sample -> odeint decode -> ELBO)
jits into one XLA program, with the dopri5 solve as an on-device loop.
"""

from __future__ import annotations

from typing import Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

Array = jax.Array


class LatentODEFunc(nn.Module):
    """Latent dynamics MLP (reference `LatentODEfunc`).

    Matmuls run at HIGHEST precision: the dynamics feed dopri5's embedded
    error estimate, and TPU's default-bf16 matmul noise (~1e-3 relative)
    otherwise inflates the adaptive step count ~9x (see bench.py)."""
    latent_dim: int = 4
    hidden: int = 20

    @nn.compact
    def __call__(self, t, z):
        hi = jax.lax.Precision.HIGHEST
        x = nn.Dense(self.hidden, precision=hi)(z)
        x = nn.elu(x)
        x = nn.Dense(self.hidden, precision=hi)(x)
        x = nn.elu(x)
        return nn.Dense(self.latent_dim, precision=hi)(x)


class RecognitionRNN(nn.Module):
    """Plain RNN encoder run backward over observations
    (reference `RecognitionRNN`): h' = tanh(W [x, h]); outputs q(z0)."""
    latent_dim: int = 4
    obs_dim: int = 2
    hidden: int = 25

    @nn.compact
    def __call__(self, xs: Array) -> Tuple[Array, Array]:
        """xs: [B, T, obs_dim] -> (qz0_mean, qz0_logvar), each [B, latent]."""
        B = xs.shape[0]
        # Explicit cell parameters (a flax submodule cannot be first called
        # inside a `lax.scan` body — variable creation in the scan trace
        # leaks tracers at init).
        # Explicit f32 param dtype (matching flax Dense's param_dtype
        # default): the bare initializer default is f64 under x64.
        w_i2h = self.param(
            "i2h_kernel", nn.initializers.lecun_normal(),
            (self.obs_dim + self.hidden, self.hidden), jnp.float32)
        b_i2h = self.param("i2h_bias", nn.initializers.zeros,
                           (self.hidden,), jnp.float32)
        h2o = nn.Dense(2 * self.latent_dim, name="h2o")

        def cell(h, x):
            combined = jnp.concatenate([x, h], axis=-1)
            h = jnp.tanh(combined @ w_i2h + b_i2h)
            return h, None

        h0 = jnp.zeros((B, self.hidden), xs.dtype)
        xs_rev = jnp.flip(xs, axis=1)                     # encode backward
        h_final, _ = jax.lax.scan(cell, h0, jnp.swapaxes(xs_rev, 0, 1))
        out = h2o(h_final)
        qz0_mean, qz0_logvar = jnp.split(out, 2, axis=-1)
        return qz0_mean, qz0_logvar


class Decoder(nn.Module):
    """Latent -> observation decoder MLP (reference `Decoder`)."""
    obs_dim: int = 2
    hidden: int = 20

    @nn.compact
    def __call__(self, z: Array) -> Array:
        x = nn.Dense(self.hidden)(z)
        x = nn.relu(x)
        return nn.Dense(self.obs_dim)(x)


def log_normal_pdf(x: Array, mean: Array, logvar: Array) -> Array:
    """Elementwise log N(x; mean, exp(logvar)) (reference `log_normal_pdf`)."""
    const = jnp.log(2.0 * jnp.pi)
    return -0.5 * (const + logvar + (x - mean) ** 2 / jnp.exp(logvar))


def normal_kl(mu1: Array, lv1: Array, mu2: Array, lv2: Array) -> Array:
    """Elementwise KL(N(mu1, exp(lv1)) || N(mu2, exp(lv2)))
    (reference `normal_kl`)."""
    v1 = jnp.exp(lv1)
    v2 = jnp.exp(lv2)
    return 0.5 * (lv2 - lv1 + (v1 + (mu1 - mu2) ** 2) / v2 - 1.0)
