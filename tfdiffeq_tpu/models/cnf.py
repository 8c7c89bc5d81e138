"""Continuous normalizing flows (Chen et al. 2018 §4 / FFJORD).

Capability extension beyond the reference's example set (SURVEY.md §2 lists
spiral / latent-ODE / ODE-Net MNIST): density modeling with an ODE flow

    dz/dt = f_theta(t, z),    d log p(z(t))/dt = -tr(df/dz)

solved as ONE augmented on-device solve. The trace is exact via `jacfwd`
(cheap for low-dimensional flows: D extra forward-mode passes) or estimated
with Hutchinson probes (`trace='hutchinson'`) for high dimensions.

Everything is jit/grad-compatible: training maximizes log-likelihood by
integrating data points backward to the base distribution through
`odeint` (differentiable bounded loop) or `odeint_adjoint`.
"""

from __future__ import annotations

from typing import Callable, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

Array = jax.Array


class CNFDynamics(nn.Module):
    """Time-conditioned MLP flow field f(t, z) (tanh, concat-time)."""
    dim: int = 2
    hidden: int = 64
    depth: int = 3

    @nn.compact
    def __call__(self, t, z):
        hi = jax.lax.Precision.HIGHEST
        tt = jnp.broadcast_to(jnp.asarray(t, z.dtype), z.shape[:-1] + (1,))
        h = jnp.concatenate([z, tt], axis=-1)
        for _ in range(self.depth - 1):
            h = jnp.tanh(nn.Dense(self.hidden, precision=hi)(h))
        return nn.Dense(self.dim, precision=hi)(h)


def augmented_dynamics(f: Callable, *, trace: str = "exact",
                       n_probes: int = 1,
                       key: Optional[Array] = None) -> Callable:
    """Lift f(t, z[B, D]) -> dz into ((z, logp) -> (dz, -tr df/dz)).

    trace='exact' uses forward-mode Jacobian diagonals (D jvp passes —
    right for small D); 'hutchinson' uses Rademacher probes (needs `key`).
    """

    def aug(t, state):
        z, _ = state

        if trace == "exact":
            def f_single(zi):
                return f(t, zi[None, :])[0]

            def div_single(zi):
                jac = jax.jacfwd(f_single)(zi)
                return jnp.trace(jac)

            dz = f(t, z)
            div = jax.vmap(div_single)(z)
        elif trace == "hutchinson":
            if key is None:
                raise ValueError("trace='hutchinson' requires key=")
            dz, vjp_fn = jax.vjp(lambda zz: f(t, zz), z)
            div = jnp.zeros(z.shape[0], z.dtype)
            for i in range(n_probes):
                eps = jax.random.rademacher(
                    jax.random.fold_in(key, i), z.shape,
                    dtype=z.dtype)
                (vjp_eps,) = vjp_fn(eps)
                div = div + jnp.sum(vjp_eps * eps, axis=-1)
            div = div / n_probes
        else:  # pragma: no cover
            raise ValueError(trace)
        return dz, -div

    return aug


def augmented_dynamics_fusable(f: Callable, dim: int, *,
                               trace: str = "exact", n_probes: int = 1,
                               key: Optional[Array] = None,
                               batch: Optional[int] = None) -> Callable:
    """Lift f(t, z[B, D], params) -> dz into a FUSABLE augmented system
    aug(t, s[B, D+1], params) -> [dz; -div].

    trace='exact': the divergence is built from D forward-mode basis
    probes (`jax.jvp`), with the basis rows hoisted to Python-time numpy
    constants and the state split done with contiguous slices — every
    primitive this emits is in the jaxpr->Pallas bridge subset
    (ops/jaxpr_bridge.py), so the WHOLE augmented dynamics (flow field +
    exact divergence) traces into one plan. `fast.cnf_log_prob_auto`
    then runs density evaluation as ONE whole-solve kernel and training
    as TWO kernels (the plan's reverse-mode walk differentiates the
    traced jvp instructions, giving the second-order VJP automatically).

    trace='hutchinson': the Rademacher estimator e^T (J e) averaged over
    `n_probes` probes (requires `key` and `batch`) — n_probes jvp passes
    instead of D, the FFJORD recipe for high-dimensional flows. Probes
    are drawn HERE, once per aug-builder call, and held fixed for the
    whole solve (the FFJORD convention: resampling inside the integrand
    would make the ODE non-smooth). They enter the plan as per-sample
    batch constants, so a fresh builder per training batch gives fresh
    noise with the SAME cached plan structure. Matches
    `augmented_dynamics(trace='hutchinson')`'s draw (`fold_in(key, i)`)
    probe-for-probe.

    Unlike `augmented_dynamics` this takes/returns flat [B, D+1] arrays
    (kernel state layout) rather than a (z, logp) tuple, and f takes an
    explicit params pytree.
    """
    import numpy as np

    if trace == "exact":
        basis = [np.eye(dim, dtype=np.float32)[i] for i in range(dim)]

        def aug(t, s, params):
            z = s[:, :dim]
            dz = f(t, z, params)
            div = None
            for i in range(dim):
                e = jnp.broadcast_to(
                    jnp.asarray(basis[i], z.dtype)[None, :], z.shape)
                _, jv = jax.jvp(lambda zz: f(t, zz, params), (z,), (e,))
                col = jv[:, i:i + 1]
                div = col if div is None else div + col
            return jnp.concatenate([dz, -div], axis=1)

        return aug

    if trace != "hutchinson":  # pragma: no cover
        raise ValueError(trace)
    if key is None or batch is None:
        raise ValueError("trace='hutchinson' requires key= and batch=")
    probes = [jax.random.rademacher(jax.random.fold_in(key, i),
                                    (batch, dim), dtype=jnp.float32)
              for i in range(n_probes)]

    def aug_h(t, s, params):
        z = s[:, :dim]
        dz = f(t, z, params)
        div = None
        for e in probes:
            e = e.astype(z.dtype)
            _, jv = jax.jvp(lambda zz: f(t, zz, params), (z,), (e,))
            term = jnp.sum(jv * e, axis=1, keepdims=True)   # e^T J e
            div = term if div is None else div + term
        return jnp.concatenate([dz, div * (-1.0 / n_probes)], axis=1)

    return aug_h


def log_prob(f: Callable, x: Array, *, t0: float = 0.0, t1: float = 1.0,
             rtol: float = 1e-5, atol: float = 1e-7,
             trace: str = "exact", n_probes: int = 1,
             key: Optional[Array] = None, method: str = "dopri5",
             options: Optional[dict] = None) -> Array:
    """log p(x) under the flow z(t1) ~ x, z(t0) ~ N(0, I).

    Integrates (x, 0) BACKWARD from t1 to t0 through the augmented system;
    log p(x) = log N(z(t0)) + accumulated log-det. Differentiable w.r.t.
    the flow parameters closed over by `f` (bounded loop by default).
    """
    from ..odeint import odeint

    aug = augmented_dynamics(f, trace=trace, n_probes=n_probes, key=key)
    B, D = x.shape
    t = jnp.asarray([t1, t0], x.dtype)
    z0 = (x, jnp.zeros(B, x.dtype))
    zs, dlogs = odeint(aug, z0, t, rtol=rtol, atol=atol, method=method,
                       options=options)
    z_base, dlog = zs[-1], dlogs[-1]
    logp_base = -0.5 * jnp.sum(z_base ** 2, axis=-1) \
        - 0.5 * D * jnp.log(2.0 * jnp.pi)
    # Backward integration of dl/dt = -tr from (t1, 0) down to t0 yields
    # l(t0) = +int_{t0}^{t1} tr dt, so log p(x) = log p0(z(t0)) - l(t0)
    # (verified against the analytic linear flow in tests).
    return logp_base - dlog


def sample(f: Callable, key: Array, n: int, dim: int, *,
           t0: float = 0.0, t1: float = 1.0, rtol: float = 1e-5,
           atol: float = 1e-7, method: str = "dopri5",
           options: Optional[dict] = None) -> Array:
    """Draw samples by integrating base noise forward through the flow."""
    from ..odeint import odeint

    z = jax.random.normal(key, (n, dim))
    t = jnp.asarray([t0, t1], z.dtype)
    zs = odeint(f, z, t, rtol=rtol, atol=atol, method=method,
                options=options)
    return zs[-1]
