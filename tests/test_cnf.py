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


# ---------------------------------------------------------------------------
# Auto-fused CNF for ARBITRARY flows (fast.cnf_log_prob_auto): the augmented
# system (flow + exact divergence via traced jvp basis probes) becomes ONE
# plan; density = one whole-solve kernel, training = two kernels with the
# second-order VJP coming from the plan's reverse-mode walk (round-3 slice
# instruction). Interpret mode on CPU; same code path compiles on TPU.
# ---------------------------------------------------------------------------

_AUTO_FLOWS = {
    # name: (flow(t, z, params) in the fusable subset, params, D)
    "concat_t_mlp": (
        lambda t, z, p: jnp.tanh(
            jnp.concatenate(
                [z, jnp.broadcast_to(jnp.reshape(t, (1, 1)).astype(z.dtype),
                                     (z.shape[0], 1))], axis=1)
            @ p["W1"] + p["b1"]) @ p["W2"] + p["b2"],
        {"W1": jnp.asarray(np.random.RandomState(0).randn(3, 16) * 0.4,
                           jnp.float32),
         "b1": jnp.zeros(16, jnp.float32),
         "W2": jnp.asarray(np.random.RandomState(1).randn(16, 2) * 0.4,
                           jnp.float32),
         "b2": jnp.zeros(2, jnp.float32)},
        2),
    "trig_gated": (
        lambda t, z, p: jnp.sin(z @ p[0])
        / (1.0 + jnp.exp(-(z * p[1]))) - 0.1 * z * jnp.cos(t),
        (jnp.asarray(np.random.RandomState(2).randn(3, 3) * 0.3,
                     jnp.float32),
         jnp.asarray(np.random.RandomState(3).randn(3) * 0.2, jnp.float32)),
        3),
    "autonomous_poly": (
        lambda t, z, p: (z ** 3) @ p - 0.5 * z,
        jnp.asarray([[-0.1, 0.8], [-0.8, -0.1]], jnp.float32),
        2),
}


@pytest.mark.parametrize("name", sorted(_AUTO_FLOWS))
def test_cnf_auto_matches_generic(name):
    import warnings

    from tfdiffeq_tpu.fast import cnf_log_prob_auto

    flow, params, D = _AUTO_FLOWS[name]
    x = jnp.asarray(np.random.RandomState(7).randn(8, D) * 0.7, jnp.float32)
    with warnings.catch_warnings():
        warnings.simplefilter("error")         # no silent fallback
        lp = cnf_log_prob_auto(flow, params, x, rtol=1e-5, atol=1e-7,
                               interpret=True)
    lp_ref = log_prob(lambda tt, zz: flow(tt, zz, params), x,
                      rtol=1e-5, atol=1e-7, trace="exact")
    np.testing.assert_allclose(np.asarray(lp), np.asarray(lp_ref),
                               rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("name", sorted(_AUTO_FLOWS))
def test_cnf_auto_gradient_parity(name):
    from tfdiffeq_tpu.fast import cnf_log_prob_auto

    flow, params, D = _AUTO_FLOWS[name]
    x = jnp.asarray(np.random.RandomState(8).randn(6, D) * 0.6, jnp.float32)

    # rtol 1e-7: continuous adjoint vs direct backprop are different
    # integrals of the same system — their difference scales with the
    # solve tolerance (measured 3.5e-3 at rtol 1e-5, 2e-5 at 1e-7 on the
    # stiff cubic flow).
    ga = jax.grad(
        lambda p, xx: jnp.sum(cnf_log_prob_auto(
            flow, p, xx, rtol=1e-7, atol=1e-9, interpret=True)),
        argnums=(0, 1))(params, x)
    gg = jax.grad(
        lambda p, xx: jnp.sum(log_prob(
            lambda tt, zz: flow(tt, zz, p), xx, rtol=1e-7, atol=1e-9,
            trace="exact")), argnums=(0, 1))(params, x)
    for la, lb in zip(jax.tree_util.tree_leaves(ga),
                      jax.tree_util.tree_leaves(gg)):
        d = float(jnp.max(jnp.abs(la - lb.astype(la.dtype))))
        m = float(jnp.max(jnp.abs(lb))) + 1e-12
        assert d / m < 1e-3, (name, d, m)


def test_cnf_auto_fallback_on_unfusable_flow():
    import warnings

    from tfdiffeq_tpu.fast import cnf_log_prob_auto

    def bad_flow(t, z, p):                     # `sort` is outside the subset
        return jnp.sort(z, axis=1) * p

    x = jnp.asarray(np.random.RandomState(9).randn(5, 2) * 0.5, jnp.float32)
    with warnings.catch_warnings(record=True) as wlist:
        warnings.simplefilter("always")
        lp = cnf_log_prob_auto(bad_flow, jnp.float32(0.3), x,
                               rtol=1e-5, atol=1e-7, interpret=True)
    assert any("not fusable" in str(w.message) for w in wlist)
    lp_ref = log_prob(lambda tt, zz: bad_flow(tt, zz, jnp.float32(0.3)), x,
                      rtol=1e-5, atol=1e-7, trace="exact")
    np.testing.assert_allclose(np.asarray(lp), np.asarray(lp_ref),
                               rtol=1e-6, atol=1e-6)


def test_cnf_auto_hutchinson_matches_generic():
    """trace='hutchinson' draws the SAME probes as the generic path
    (fold_in(key, i) Rademacher), so auto-vs-generic parity is tight —
    the two paths compute the same estimator through different
    integrator implementations."""
    import warnings

    from tfdiffeq_tpu.fast import cnf_log_prob_auto

    flow, params, D = _AUTO_FLOWS["concat_t_mlp"]
    x = jnp.asarray(np.random.RandomState(11).randn(8, D) * 0.7, jnp.float32)
    key = jax.random.PRNGKey(3)
    with warnings.catch_warnings():
        warnings.simplefilter("error")         # no silent fallback
        lp = cnf_log_prob_auto(flow, params, x, rtol=1e-5, atol=1e-7,
                               trace="hutchinson", n_probes=4, key=key,
                               interpret=True)
    lp_ref = log_prob(lambda tt, zz: flow(tt, zz, params), x,
                      rtol=1e-5, atol=1e-7, trace="hutchinson",
                      n_probes=4, key=key)
    np.testing.assert_allclose(np.asarray(lp), np.asarray(lp_ref),
                               rtol=2e-5, atol=2e-5)

    # Gradient parity through the plan-adjoint sweep (second-order VJP of
    # the e^T(Je) probes) vs direct backprop through the generic loop.
    ga = jax.grad(
        lambda p: jnp.sum(cnf_log_prob_auto(
            flow, p, x, rtol=1e-7, atol=1e-9, trace="hutchinson",
            n_probes=4, key=key, interpret=True)))(params)
    gg = jax.grad(
        lambda p: jnp.sum(log_prob(
            lambda tt, zz: flow(tt, zz, p), x, rtol=1e-7, atol=1e-9,
            trace="hutchinson", n_probes=4, key=key)))(params)
    for la, lb in zip(jax.tree_util.tree_leaves(ga),
                      jax.tree_util.tree_leaves(gg)):
        d = float(jnp.max(jnp.abs(la - lb.astype(la.dtype))))
        m = float(jnp.max(jnp.abs(lb))) + 1e-12
        assert d / m < 1e-3, (d, m)


def test_cnf_sample_auto_runs():
    from tfdiffeq_tpu.fast import cnf_sample_auto

    flow, params, D = _AUTO_FLOWS["autonomous_poly"]
    s = cnf_sample_auto(flow, params, jax.random.PRNGKey(0), 16, D,
                        interpret=True)
    assert s.shape == (16, D)
    assert bool(jnp.all(jnp.isfinite(s)))
