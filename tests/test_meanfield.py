"""Batch-coupled (mean-field) dynamics through the jaxpr->Pallas bridge.

Round-4 verdict item 4: dynamics with cross-sample reductions — mean-field
couplings dy_i/dt = f(y_i) + g(mean_j y_j), interacting-particle energy
terms — previously fell outside the bridge ISA and paid the full generic
while-loop penalty. The `bsum` instruction (jaxpr_bridge: a pad-lane-masked
cross-lane sum) fuses them; these tests pin forward/NFE/gradient parity
against the generic engine, plus the safety vetoes (packing, grid blocks,
per-lane stepping, max/min fallback).
"""

import warnings

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tfdiffeq_tpu import odeint_adjoint, solve

B, D = 12, 3
RNG = np.random.RandomState(0)
W = jnp.asarray(RNG.randn(D, D) * 0.3, jnp.float32)
Y0 = jnp.asarray(RNG.randn(B, D), jnp.float32)
T = jnp.linspace(0.0, 2.0, 7, dtype=jnp.float32)


def meanfield(tt, yy):
    m = jnp.mean(yy, axis=0)                    # batch-axis reduce
    return jnp.tanh(yy @ W) - 0.5 * (yy - m)


def scalar_coupled(tt, yy):
    e = jnp.mean(yy ** 2)                       # to-scalar batch reduce
    return jnp.tanh(yy @ W) - 0.1 * e * yy


@pytest.mark.parametrize("dyn", [meanfield, scalar_coupled],
                         ids=["mean_vec", "energy_scalar"])
def test_meanfield_forward_parity(dyn):
    with warnings.catch_warnings():
        warnings.simplefilter("error")          # a fallback warning = FAIL
        rf = solve(dyn, Y0, T, rtol=1e-6, atol=1e-8,
                   options={"fuse": True})
    rg = solve(dyn, Y0, T, rtol=1e-6, atol=1e-8,
               options={"loop": "while"})
    assert int(rf.stats.status) == 0
    assert int(rf.stats.nfe) == int(rg.stats.nfe)
    np.testing.assert_allclose(np.asarray(rf.ys), np.asarray(rg.ys),
                               atol=5e-6)


@pytest.mark.parametrize("method,opts,tol", [
    ("rk4", {"num_steps": 32}, 5e-6),
    # VCABM's fused parity contract is "trajectories at tolerance", not
    # bit-matched step sequences (BASELINE.md: controller powf-vs-exp/log
    # ulp cascade) — compare at the solve tolerance scale.
    ("adams", {}, 1e-4),
    ("fixed_adams", {"num_steps": 32}, 5e-6),
], ids=["rk4", "vcabm", "fixed_adams"])
def test_meanfield_other_method_families(method, opts, tol):
    with warnings.catch_warnings():
        warnings.simplefilter("error")
        rf = solve(meanfield, Y0, T, rtol=1e-6, atol=1e-8, method=method,
                   options={"fuse": True, **opts})
    rg = solve(meanfield, Y0, T, rtol=1e-6, atol=1e-8, method=method,
               options=opts or None)
    assert int(rf.stats.status) == 0
    np.testing.assert_allclose(np.asarray(rf.ys), np.asarray(rg.ys),
                               atol=tol)


def test_meanfield_fused_adjoint_parity():
    params = {"W": W}

    def dyn_p(tt, yy, pp):
        m = jnp.mean(yy, axis=0)
        return jnp.tanh(yy @ pp["W"]) - 0.5 * (yy - m)

    tgt = jnp.asarray(RNG.randn(T.shape[0], B, D), jnp.float32)

    def loss(pp, y0_, fuse):
        with warnings.catch_warnings():
            if fuse:
                warnings.simplefilter("error")
            ys = odeint_adjoint(dyn_p, y0_, T, params=pp, rtol=1e-6,
                                atol=1e-8,
                                options={"fuse": True} if fuse else None)
        return jnp.mean((ys - tgt) ** 2)

    gf = jax.grad(loss, argnums=(0, 1))(params, Y0, True)
    gg = jax.grad(loss, argnums=(0, 1))(params, Y0, False)
    for a, b in [(gf[0]["W"], gg[0]["W"]), (gf[1], gg[1])]:
        rel = float(jnp.max(jnp.abs(a - b))) / float(jnp.max(jnp.abs(b)))
        assert rel < 1e-4, rel


def test_meanfield_matches_oracle_mean_dynamics():
    """Semantic pin (not just fused-vs-generic): the mean of the coupled
    linear system dy_i/dt = -(y_i - mean y) obeys d mean/dt = 0."""
    def dyn(tt, yy):
        return -(yy - jnp.mean(yy, axis=0))

    with warnings.catch_warnings():
        warnings.simplefilter("error")
        r = solve(dyn, Y0, T, rtol=1e-8, atol=1e-10,
                  options={"fuse": True})
    m0 = np.asarray(jnp.mean(Y0, axis=0))
    mT = np.asarray(jnp.mean(r.ys[-1], axis=0))
    np.testing.assert_allclose(mT, m0, atol=1e-5)
    # and every sample relaxes toward the (conserved) mean
    spread0 = float(jnp.max(jnp.abs(Y0 - m0)))
    spreadT = float(jnp.max(jnp.abs(r.ys[-1] - mT)))
    assert spreadT < 0.2 * spread0


def test_per_sample_with_coupling_raises():
    with pytest.raises(ValueError, match="batch-coupled"):
        solve(meanfield, Y0, T, rtol=1e-6, atol=1e-8,
              options={"fuse": True, "per_sample": True})


def test_batch_max_fuses_with_parity():
    """Round 5: batch-axis max/min FUSE as lane-masked extrema ('bmax'),
    previously a fallback. A max-coupled field is only C^0 — the GENERIC
    engine alone amplifies a 1e-7 perturbation to 7.4e-5 and shifts NFE
    56->92 (measured) — so the parity contract is the nonsmooth-field
    envelope, not bit-equality (cf. the smooth bsum tests above, which
    pin exact NFE). A pure-max field (no amplifying dot) IS step-exact:
    asserted second."""
    def mx(tt, yy):
        return (jnp.tanh(yy @ W) - 0.1 * jnp.max(yy, axis=0)
                + 0.05 * jnp.min(yy, axis=0))

    with warnings.catch_warnings():
        warnings.simplefilter("error")          # fallback = FAIL now
        rf = solve(mx, Y0, T, rtol=1e-6, atol=1e-8,
                   options={"fuse": True})
    assert int(rf.stats.status) == 0
    rg = solve(mx, Y0, T, rtol=1e-6, atol=1e-8,
               options={"loop": "while"})
    np.testing.assert_allclose(np.asarray(rf.ys), np.asarray(rg.ys),
                               atol=2e-4)
    assert int(rf.stats.nfe) <= 2 * int(rg.stats.nfe)

    def pure(tt, yy):
        return (-0.5 * yy - 0.1 * jnp.max(yy, axis=0)
                + 0.05 * jnp.min(yy, axis=0))

    with warnings.catch_warnings():
        warnings.simplefilter("error")
        rf = solve(pure, Y0, T, rtol=1e-6, atol=1e-8,
                   options={"fuse": True})
    rg = solve(pure, Y0, T, rtol=1e-6, atol=1e-8,
               options={"loop": "while"})
    np.testing.assert_allclose(np.asarray(rf.ys), np.asarray(rg.ys),
                               atol=5e-6)
    assert int(rf.stats.nfe) == int(rg.stats.nfe)


def test_batch_max_trains_with_parity():
    """bmax adjoint: the extremal-lane cotangent routing (even tie
    split) must match the generic adjoint's gradients, including the
    to-scalar variant (jnp.max over the whole batch).

    Two regimes: with the extremal lanes SEPARATED (argmax constant
    along the trajectory, field smooth there) gradients must match to
    ~1e-7 — this pins the routing rule exactly. With lanes free to
    cross, both engines step a C^0 field at different sequences, so
    only the nonsmooth envelope (~1e-3 rel, cf. the forward test's
    measured 7e-5-per-1e-7-seed amplification) is asserted."""
    def dyn(tt, yy, ww):
        return (jnp.tanh(yy @ ww) - 0.02 * jnp.max(yy, axis=0)
                - 0.01 * (yy - jnp.min(yy)))

    def loss(w, y, fuse):
        with warnings.catch_warnings():
            if fuse:
                warnings.simplefilter("error")
            ys = odeint_adjoint(dyn, y, T, params=w, rtol=1e-6, atol=1e-8,
                                options={"fuse": True} if fuse else None)
        return jnp.sum(ys ** 2)

    y_sep = Y0.at[0].add(8.0).at[1].add(-8.0)   # constant argmax/argmin
    gf = jax.grad(loss, argnums=(0, 1))(W, y_sep, True)
    gg = jax.grad(loss, argnums=(0, 1))(W, y_sep, False)
    for a, b in zip(jax.tree_util.tree_leaves(gf),
                    jax.tree_util.tree_leaves(gg)):
        d = float(jnp.max(jnp.abs(a - b)))
        m = float(jnp.max(jnp.abs(b))) + 1e-12
        assert d / m < 1e-5, (d, m)

    gf = jax.grad(loss, argnums=(0, 1))(W, Y0, True)
    gg = jax.grad(loss, argnums=(0, 1))(W, Y0, False)
    for a, b in zip(jax.tree_util.tree_leaves(gf),
                    jax.tree_util.tree_leaves(gg)):
        d = float(jnp.max(jnp.abs(a - b)))
        m = float(jnp.max(jnp.abs(b))) + 1e-12
        assert d / m < 1e-3, (d, m)


def test_meanfield_past_vmem_budget_streams(monkeypatch):
    """Round-4 verdict item 7: a bsum cannot be grid-blocked (per-block
    controllers would integrate a different ODE), so batches past the
    VMEM budget keep ONE controller and stream the trajectory through
    HBM. Forced here by shrinking the budget; the streamed solve must be
    BIT-identical to the in-VMEM fused solve and generic-parity."""
    import tfdiffeq_tpu.fast as fast

    with warnings.catch_warnings():
        warnings.simplefilter("error")
        r_ref = solve(meanfield, Y0, T, rtol=1e-6, atol=1e-8,
                      options={"fuse": True})
    monkeypatch.setattr(fast, "_VMEM_BUDGET", 10_000)
    with warnings.catch_warnings():
        warnings.simplefilter("error")          # no fallback allowed
        r_st = solve(meanfield, Y0, T, rtol=1e-6, atol=1e-8,
                     options={"fuse": True})
    np.testing.assert_array_equal(np.asarray(r_st.ys),
                                  np.asarray(r_ref.ys))
    assert int(r_st.stats.nfe) == int(r_ref.stats.nfe)


def test_meanfield_training_past_vmem_budget_streams(monkeypatch):
    """Training side of item 7: forward rows stream OUT, backward ys/g
    rows stream IN; gradients bit-match the in-VMEM two-kernel path."""
    import tfdiffeq_tpu.fast as fast

    def mf(tt, y, w):
        return jnp.tanh(y @ w) - 0.5 * (y - jnp.mean(y, axis=0))

    def loss(w, y):
        with warnings.catch_warnings():
            warnings.simplefilter("error")
            ys = odeint_adjoint(mf, y, T, params=w, rtol=1e-6, atol=1e-8,
                                options={"fuse": True})
        return jnp.sum(ys ** 2)

    g_ref = jax.grad(loss, argnums=(0, 1))(W, Y0)
    monkeypatch.setattr(fast, "_VMEM_BUDGET", 10_000)
    g_st = jax.grad(loss, argnums=(0, 1))(W, Y0)
    for a, b in zip(jax.tree_util.tree_leaves(g_st),
                    jax.tree_util.tree_leaves(g_ref)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
