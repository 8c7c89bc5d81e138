"""CNF model tests (capability extension; models/cnf.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tfdiffeq_tpu.models.cnf import (CNFDynamics, augmented_dynamics,
                                     log_prob, sample)


def test_log_prob_matches_analytic_linear_flow():
    # f(z) = a z: log p(x) = log N(x e^{-aT}) - D a T.
    a, T, D = 0.3, 1.0, 2
    f = lambda t, z: a * z
    x = jnp.asarray(np.random.RandomState(0).randn(5, D))
    z0 = np.asarray(x) * np.exp(-a * T)
    exact = (-0.5 * np.sum(z0 ** 2, -1) - 0.5 * D * np.log(2 * np.pi)
             - D * a * T)
    for trace, kw in [("exact", {}),
                      ("hutchinson",
                       {"n_probes": 64, "key": jax.random.PRNGKey(0)})]:
        lp = log_prob(f, x, t0=0.0, t1=T, rtol=1e-10, atol=1e-12,
                      trace=trace,
                      options={"max_steps": 128, "chunk_size": 16}, **kw)
        np.testing.assert_allclose(np.asarray(lp), exact, rtol=1e-8)


def test_cnf_trains_by_likelihood():
    model = CNFDynamics(dim=2, hidden=16, depth=2)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros(()),
                        jnp.zeros((1, 2)))
    rng = np.random.RandomState(0)
    # Target: a shifted gaussian — a few steps must reduce NLL.
    x = jnp.asarray(rng.randn(128, 2) * 0.4 + np.array([1.5, -0.5]),
                    jnp.float64)

    def nll(p):
        f = lambda t, z: model.apply(p, t, z)
        return -jnp.mean(log_prob(f, x, rtol=1e-5, atol=1e-7,
                                  options={"max_steps": 128,
                                           "chunk_size": 16}))

    l0 = float(nll(params))
    step = jax.jit(lambda p: jax.tree_util.tree_map(
        lambda a, g: a - 0.05 * g, p, jax.grad(nll)(p)))
    for _ in range(30):
        params = step(params)
    l1 = float(nll(params))
    assert l1 < l0 - 0.3, (l0, l1)


def test_sample_roundtrip_density():
    # Identity-ish flow: samples from base stay ~standard normal.
    f = lambda t, z: jnp.zeros_like(z)
    xs = sample(f, jax.random.PRNGKey(0), 2000, 2,
                options={"max_steps": 64, "chunk_size": 16})
    assert abs(float(xs.mean())) < 0.1
    assert abs(float(xs.std()) - 1.0) < 0.1


def test_hutchinson_requires_key():
    f = lambda t, z: z
    aug = augmented_dynamics(f, trace="hutchinson")
    with pytest.raises(ValueError, match="key"):
        aug(0.0, (jnp.ones((2, 2)), jnp.zeros(2)))
