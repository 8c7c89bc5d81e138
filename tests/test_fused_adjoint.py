"""Fused general-MLP forward solve + one-kernel adjoint backward sweep
(fast.solve_mlp_spec / fast.odeint_adjoint_mlp; ops/pallas_adjoint.py).

Runs in Pallas interpret mode on CPU; the same code path compiles under
Mosaic on TPU (driven separately — see BASELINE.md for measured numbers).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tfdiffeq_tpu import odeint_adjoint, solve
from tfdiffeq_tpu.fast import (MLPSpec, mlp_apply, odeint_adjoint_mlp,
                               solve_mlp_spec, weights_from_flax_dense)


def _weights(seed=0, dims=(4, 20, 20, 4), scale=0.3, bias=True):
    rng = np.random.RandomState(seed)
    out = []
    for a, b in zip(dims[:-1], dims[1:]):
        W = jnp.asarray(rng.randn(a, b) * scale / np.sqrt(a), jnp.float32)
        bb = (jnp.asarray(rng.randn(b) * 0.05, jnp.float32) if bias
              else None)
        out.append((W, bb))
    return out


@pytest.mark.parametrize("activation", ["elu", "tanh", "relu", "softplus"])
def test_spec_forward_matches_generic(activation):
    weights = _weights()
    spec = MLPSpec(activation=activation)
    y0 = jnp.asarray(np.random.RandomState(1).randn(16, 4), jnp.float32)
    t = jnp.linspace(0.0, 2.0, 8, dtype=jnp.float32)

    res = solve_mlp_spec(spec, weights, y0, t, rtol=1e-6, atol=1e-8,
                         interpret=True)
    ref = solve(lambda tt, yy: mlp_apply(spec, weights, yy), y0, t,
                rtol=1e-6, atol=1e-8, method="dopri5",
                options={"loop": "while"})
    assert int(res.stats.status) == 0
    # Different summation orders => different accept sequences; parity is
    # tolerance-level, not bitwise.
    np.testing.assert_allclose(np.asarray(res.ys), np.asarray(ref.ys),
                               atol=5e-4, rtol=1e-3)


def test_spec_forward_reverse_time():
    weights = _weights(seed=2)
    spec = MLPSpec(activation="elu")
    y0 = jnp.asarray(np.random.RandomState(3).randn(8, 4), jnp.float32)
    t = jnp.linspace(1.5, 0.0, 6, dtype=jnp.float32)     # decreasing

    res = solve_mlp_spec(spec, weights, y0, t, interpret=True)
    ref = solve(lambda tt, yy: mlp_apply(spec, weights, yy), y0, t,
                rtol=1e-6, atol=1e-8, method="dopri5",
                options={"loop": "while"})
    np.testing.assert_allclose(np.asarray(res.ys), np.asarray(ref.ys),
                               atol=5e-4, rtol=1e-3)


def test_spec_input_power_matches_benchmark_mlp():
    """input_power=3 + tanh reproduces the benchmark spiral dynamics."""
    rng = np.random.RandomState(0)
    params = {"w1": jnp.asarray(rng.randn(2, 50) * 0.1, jnp.float32),
              "b1": jnp.zeros((50,), jnp.float32),
              "w2": jnp.asarray(rng.randn(50, 2) * 0.1, jnp.float32),
              "b2": jnp.zeros((2,), jnp.float32)}
    spec = MLPSpec(activation="tanh", input_power=3)
    weights = [(params["w1"], params["b1"]), (params["w2"], params["b2"])]
    y = jnp.asarray(rng.randn(32, 2), jnp.float32)
    want = jnp.tanh((y ** 3) @ params["w1"] + params["b1"]) @ params["w2"]
    np.testing.assert_allclose(np.asarray(mlp_apply(spec, weights, y)),
                               np.asarray(want), atol=1e-6)


@pytest.mark.slow
def test_fused_adjoint_matches_generic_gradients():
    """The one-kernel adjoint sweep must agree with the generic
    odeint_adjoint on gradients wrt weights, y0, AND t."""
    weights = tuple(_weights(seed=4))
    spec = MLPSpec(activation="elu")
    y0 = jnp.asarray(np.random.RandomState(5).randn(12, 4), jnp.float32)
    t = jnp.linspace(0.0, 2.0, 7, dtype=jnp.float32)
    g_out = jnp.asarray(np.random.RandomState(6).randn(7, 12, 4),
                        jnp.float32)

    def loss_fused(w, y0_, t_):
        ys = odeint_adjoint_mlp(spec, w, y0_, t_, rtol=1e-7, atol=1e-9,
                                interpret=True)
        return jnp.sum(ys * g_out)

    def loss_gen(w, y0_, t_):
        ys = odeint_adjoint(lambda tt, yy, p: mlp_apply(spec, p, yy),
                            y0_, t_, params=w, rtol=1e-7, atol=1e-9)
        return jnp.sum(ys * g_out)

    gf = jax.grad(loss_fused, argnums=(0, 1, 2))(weights, y0, t)
    gg = jax.grad(loss_gen, argnums=(0, 1, 2))(weights, y0, t)
    for a, b in zip(jax.tree_util.tree_leaves(gf),
                    jax.tree_util.tree_leaves(gg)):
        d = float(jnp.max(jnp.abs(a - b)))
        m = float(jnp.max(jnp.abs(b))) + 1e-8
        assert d / m < 1e-3, (d, m)


def test_fused_adjoint_packed_batch_gradients():
    """B=256 with the 2-feature state engages sublane packing in both the
    forward (pick_pack -> k=2) and backward (_adjoint_pack gate
    256 % (2*128) == 0) kernels; gradients must match the generic adjoint
    like the unpacked battery does."""
    weights = tuple(_weights(seed=7, dims=(2, 16, 2)))
    spec = MLPSpec(activation="tanh")
    y0 = jnp.asarray(np.random.RandomState(8).randn(256, 2), jnp.float32)
    t = jnp.linspace(0.0, 2.0, 5, dtype=jnp.float32)
    g_out = jnp.asarray(np.random.RandomState(9).randn(5, 256, 2),
                        jnp.float32)

    def loss_fused(w, y0_, t_):
        ys = odeint_adjoint_mlp(spec, w, y0_, t_, rtol=1e-6, atol=1e-8,
                                interpret=True)
        return jnp.sum(ys * g_out)

    def loss_gen(w, y0_, t_):
        ys = odeint_adjoint(lambda tt, yy, p: mlp_apply(spec, p, yy),
                            y0_, t_, params=w, rtol=1e-6, atol=1e-8)
        return jnp.sum(ys * g_out)

    gf = jax.grad(loss_fused, argnums=(0, 1, 2))(weights, y0, t)
    gg = jax.grad(loss_gen, argnums=(0, 1, 2))(weights, y0, t)
    for a, b in zip(jax.tree_util.tree_leaves(gf),
                    jax.tree_util.tree_leaves(gg)):
        d = float(jnp.max(jnp.abs(a - b)))
        m = float(jnp.max(jnp.abs(b))) + 1e-8
        assert d / m < 1e-3, (d, m)


def test_adjoint_grid_blocks_match():
    """mlp_adjoint_solve(n_blocks=2): the backward sweep runs as two
    sequential grid programs whose parameter-cotangent quadratures
    accumulate into REVISITED output windows — results must match the
    single-block kernel to roundoff."""
    from tfdiffeq_tpu.ops.pallas_adjoint import mlp_adjoint_solve
    from tfdiffeq_tpu.ops.pallas_kernels import mlp_solve, pad_mlp_weights

    w = _weights(seed=10, dims=(2, 16, 2))
    warr, dims = pad_mlp_weights(w, jnp.float32)
    y0 = jnp.asarray(np.random.RandomState(11).randn(512, 2),
                     jnp.float32).T
    t = jnp.linspace(0.0, 2.0, 5, dtype=jnp.float32)
    kw = dict(activation="tanh", final_activation="identity",
              input_power=1, interpret=True)
    ys, _ = mlp_solve(warr, dims, y0, t, jnp.float32(0.05), 1e-6, 1e-8,
                      1.0, **kw)
    g = jnp.asarray(np.random.RandomState(12).randn(*ys.shape),
                    jnp.float32) * 0.1

    def run(nb):
        return mlp_adjoint_solve(warr, dims, ys, g, t, jnp.float32(0.05),
                                 1e-6, 1e-8, 1.0, n_blocks=nb, **kw)

    a1, aw1, at1, s1 = run(1)
    a2, aw2, at2, s2 = run(2)
    assert s2.shape == (4,) and int(s2[3]) == 0
    np.testing.assert_allclose(np.asarray(a2), np.asarray(a1), atol=2e-6)
    for (dW1, db1), (dW2, db2) in zip(aw1, aw2):
        np.testing.assert_allclose(np.asarray(dW2), np.asarray(dW1),
                                   rtol=0, atol=5e-6)
        np.testing.assert_allclose(np.asarray(db2), np.asarray(db1),
                                   rtol=0, atol=5e-6)


@pytest.mark.slow
@pytest.mark.parametrize("method", ["bosh3", "tsit5"])
def test_fused_adjoint_other_tableaus(method):
    """The adjoint kernel is tableau-parametrized like the forward."""
    weights = tuple(_weights(seed=21, dims=(3, 10, 3)))
    spec = MLPSpec(activation="tanh")
    y0 = jnp.asarray(np.random.RandomState(22).randn(6, 3), jnp.float32)
    t = jnp.linspace(0.0, 1.2, 4, dtype=jnp.float32)

    def loss_fused(w):
        ys = odeint_adjoint_mlp(spec, w, y0, t, rtol=1e-7, atol=1e-9,
                                method=method, interpret=True)
        return jnp.sum(ys[-1] ** 2)

    def loss_gen(w):
        ys = odeint_adjoint(lambda tt, yy, p: mlp_apply(spec, p, yy),
                            y0, t, params=w, rtol=1e-7, atol=1e-9,
                            method=method)
        return jnp.sum(ys[-1] ** 2)

    gf = jax.grad(loss_fused)(weights)
    gg = jax.grad(loss_gen)(weights)
    for a, b in zip(jax.tree_util.tree_leaves(gf),
                    jax.tree_util.tree_leaves(gg)):
        d = float(jnp.max(jnp.abs(a - b)))
        m = float(jnp.max(jnp.abs(b))) + 1e-8
        assert d / m < 1e-3, (method, d, m)


@pytest.mark.slow
def test_fused_adjoint_reverse_time_grid():
    """Fused adjoint on a DECREASING observation grid matches generic."""
    weights = tuple(_weights(seed=23, dims=(3, 10, 3)))
    spec = MLPSpec(activation="tanh")
    y0 = jnp.asarray(np.random.RandomState(24).randn(6, 3), jnp.float32)
    t = jnp.linspace(1.2, 0.0, 4, dtype=jnp.float32)

    def loss_fused(w):
        ys = odeint_adjoint_mlp(spec, w, y0, t, rtol=1e-7, atol=1e-9,
                                interpret=True)
        return jnp.sum(ys[-1] ** 2)

    def loss_gen(w):
        ys = odeint_adjoint(lambda tt, yy, p: mlp_apply(spec, p, yy),
                            y0, t, params=w, rtol=1e-7, atol=1e-9)
        return jnp.sum(ys[-1] ** 2)

    gf = jax.grad(loss_fused)(weights)
    gg = jax.grad(loss_gen)(weights)
    for a, b in zip(jax.tree_util.tree_leaves(gf),
                    jax.tree_util.tree_leaves(gg)):
        d = float(jnp.max(jnp.abs(a - b)))
        m = float(jnp.max(jnp.abs(b))) + 1e-8
        assert d / m < 1e-3, (d, m)


@pytest.mark.slow
def test_fused_adjoint_seminorm_close_to_full():
    weights = tuple(_weights(seed=7))
    spec = MLPSpec(activation="tanh")
    y0 = jnp.asarray(np.random.RandomState(8).randn(8, 4), jnp.float32)
    t = jnp.linspace(0.0, 1.5, 5, dtype=jnp.float32)

    def loss(w, semi):
        ys = odeint_adjoint_mlp(spec, w, y0, t, rtol=1e-7, atol=1e-9,
                                adjoint_seminorm=semi, interpret=True)
        return jnp.sum(ys[-1] ** 2)

    g_full = jax.grad(lambda w: loss(w, False))(weights)
    g_semi = jax.grad(lambda w: loss(w, True))(weights)
    for a, b in zip(jax.tree_util.tree_leaves(g_full),
                    jax.tree_util.tree_leaves(g_semi)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-3, atol=1e-5)


@pytest.mark.slow
def test_fused_adjoint_return_stats_and_meter():
    from tfdiffeq_tpu import NFEMeter

    weights = tuple(_weights(seed=9, dims=(3, 8, 3)))
    spec = MLPSpec(activation="tanh")
    y0 = jnp.asarray(np.random.RandomState(10).randn(4, 3), jnp.float32)
    t = jnp.linspace(0.0, 1.0, 4, dtype=jnp.float32)
    meter = NFEMeter()

    def loss(w):
        ys, st = odeint_adjoint_mlp(spec, w, y0, t, rtol=1e-5, atol=1e-7,
                                    interpret=True, nfe_meter=meter,
                                    return_stats=True)
        return jnp.sum(ys ** 2) + 0.0 * st.nfe

    jax.grad(loss)(weights)
    jax.effects_barrier()
    s = meter.snapshot()
    assert s["f_nfe"] > 0 and s["b_nfe"] > 0
    assert s["f_calls"] == 1 and s["b_calls"] == 1


def test_weights_from_flax_dense_roundtrip():
    from tfdiffeq_tpu.models.latent_ode import LatentODEFunc

    dyn = LatentODEFunc(latent_dim=4, hidden=20)
    z = jnp.asarray(np.random.RandomState(11).randn(6, 4), jnp.float32)
    variables = dyn.init(jax.random.PRNGKey(0), 0.0, z)
    weights = weights_from_flax_dense(variables)
    spec = MLPSpec(activation="elu")
    np.testing.assert_allclose(
        np.asarray(mlp_apply(spec, weights, z)),
        np.asarray(dyn.apply(variables, 0.0, z)), atol=1e-6)


@pytest.mark.slow
def test_fused_latent_ode_train_step_runs():
    """One --fused latent-ODE training step end-to-end (tiny, interpret)."""
    import os
    import sys
    ex = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "examples")
    if ex not in sys.path:
        sys.path.insert(0, ex)
    import optax
    from latent_ode import (TrainState, build_model, generate_spirals,
                            init_params, make_train_step, parse_args)

    args = parse_args(["--fused", "--nspiral", "4", "--nsample", "8",
                       "--latent_dim", "3", "--nhidden", "8",
                       "--rnn_nhidden", "8"])
    _, samp_trajs, _, samp_ts = generate_spirals(
        nspiral=4, ntotal=40, nsample=8, seed=0)
    xs = jnp.asarray(samp_trajs, jnp.float32)
    samp_ts = jnp.asarray(samp_ts, jnp.float32)
    rec, dyn, dec = build_model(args)
    params = init_params(args, rec, dyn, dec, jax.random.PRNGKey(0))
    opt = optax.adam(1e-2)
    state = TrainState(params, opt.init(params))
    train_step, _ = make_train_step(args, rec, dyn, dec, opt, samp_ts)
    state2, loss1 = train_step(state, xs, jax.random.PRNGKey(1))
    assert np.isfinite(float(loss1))
    changed = any(
        not np.array_equal(np.asarray(a), np.asarray(b))
        for a, b in zip(jax.tree_util.tree_leaves(state.params),
                        jax.tree_util.tree_leaves(state2.params)))
    assert changed


def test_vmem_budget_fallback_to_generic(monkeypatch):
    """Past the fused kernels' VMEM budget, solve_mlp_spec and
    odeint_adjoint_mlp warn and delegate to the generic engine with the
    same result contract."""
    import tfdiffeq_tpu.fast as F

    weights = tuple(_weights(seed=30, dims=(3, 8, 3)))
    spec = MLPSpec(activation="tanh")
    y0 = jnp.asarray(np.random.RandomState(31).randn(4, 3), jnp.float32)
    t = jnp.linspace(0.0, 1.0, 5, dtype=jnp.float32)

    ref = solve_mlp_spec(spec, weights, y0, t, interpret=True)
    monkeypatch.setattr(F, "_VMEM_BUDGET", 1024)
    with pytest.warns(UserWarning, match="VMEM"):
        res = F.solve_mlp_spec(spec, weights, y0, t, interpret=False)
    assert int(res.stats.status) == 0
    np.testing.assert_allclose(np.asarray(res.ys), np.asarray(ref.ys),
                               atol=5e-4, rtol=1e-3)

    def loss(w):
        with pytest.warns(UserWarning, match="VMEM"):
            ys = F.odeint_adjoint_mlp(spec, w, y0, t, interpret=False)
        return jnp.sum(ys ** 2)

    g = jax.grad(loss)(weights)
    assert all(np.all(np.isfinite(np.asarray(x)))
               for x in jax.tree_util.tree_leaves(g))


def test_no_bias_layers():
    weights = tuple(_weights(seed=12, dims=(3, 10, 3), bias=False))
    spec = MLPSpec(activation="tanh")
    y0 = jnp.asarray(np.random.RandomState(13).randn(4, 3), jnp.float32)
    t = jnp.linspace(0.0, 1.0, 4, dtype=jnp.float32)

    res = solve_mlp_spec(spec, weights, y0, t, interpret=True)
    ref = solve(lambda tt, yy: mlp_apply(spec, weights, yy), y0, t,
                rtol=1e-6, atol=1e-8, method="dopri5",
                options={"loop": "while"})
    assert int(res.stats.status) == 0
    np.testing.assert_allclose(np.asarray(res.ys), np.asarray(ref.ys),
                               atol=5e-4, rtol=1e-3)

    def loss(w):
        ys = odeint_adjoint_mlp(spec, w, y0, t, interpret=True)
        return jnp.sum(ys ** 2)

    g = jax.grad(loss)(weights)
    assert all(np.all(np.isfinite(np.asarray(x)))
               for x in jax.tree_util.tree_leaves(g))


def test_time_input_spec_forward_matches_generic():
    """MLPSpec(time_input=True): concat-t dynamics through the fused
    whole-solve kernel match the generic engine."""
    rng = np.random.RandomState(40)
    D, H = 3, 12
    weights = [
        (jnp.asarray(rng.randn(D + 1, H) * 0.3, jnp.float32),
         jnp.asarray(rng.randn(H) * 0.05, jnp.float32)),
        (jnp.asarray(rng.randn(H, D) * 0.3, jnp.float32),
         jnp.asarray(rng.randn(D) * 0.05, jnp.float32)),
    ]
    spec = MLPSpec(activation="tanh", time_input=True)
    y0 = jnp.asarray(rng.randn(8, D), jnp.float32)
    t = jnp.linspace(0.0, 2.0, 6, dtype=jnp.float32)

    res = solve_mlp_spec(spec, weights, y0, t, rtol=1e-6, atol=1e-8,
                         interpret=True)
    ref = solve(lambda tt, yy: mlp_apply(spec, weights, yy, tt), y0, t,
                rtol=1e-6, atol=1e-8, method="dopri5",
                options={"loop": "while"})
    assert int(res.stats.status) == 0
    np.testing.assert_allclose(np.asarray(res.ys), np.asarray(ref.ys),
                               atol=5e-4, rtol=1e-3)

    # round 3: the fused adjoint handles time-input specs (t-column VJP +
    # a_t quadrature in-kernel); the smoke here just runs a grad — full
    # parity is test_fused_adjoint_time_input_matches_generic.
    from tfdiffeq_tpu.fast import odeint_adjoint_mlp as _adj
    g = jax.grad(lambda w: jnp.sum(
        _adj(spec, w, y0, t, interpret=True)))(tuple(weights))
    assert all(np.all(np.isfinite(np.asarray(x)))
               for x in jax.tree_util.tree_leaves(g))


@pytest.mark.slow
def test_cnf_fused_log_prob_and_sample_match_generic():
    """cnf_log_prob_fused: flow + EXACT in-kernel divergence + log-det
    quadrature as one kernel — matches models.cnf.log_prob(trace='exact');
    cnf_sample_fused matches models.cnf.sample."""
    from tfdiffeq_tpu.fast import cnf_log_prob_fused, cnf_sample_fused
    from tfdiffeq_tpu.models.cnf import CNFDynamics, log_prob, sample

    dyn = CNFDynamics(dim=2, hidden=24, depth=3)
    vs = dyn.init(jax.random.PRNGKey(0), 0.0, jnp.ones((4, 2)))
    weights = weights_from_flax_dense(vs)
    x = jnp.asarray(np.random.RandomState(41).randn(12, 2), jnp.float32)

    def f(t, zz):
        return dyn.apply(vs, t, zz)

    lp_ref = log_prob(f, x, rtol=1e-6, atol=1e-8, trace="exact",
                      options={"max_steps": 512})
    lp_fused, st = cnf_log_prob_fused(weights, x, rtol=1e-6, atol=1e-8,
                                      interpret=True)
    assert int(st.status) == 0
    np.testing.assert_allclose(np.asarray(lp_fused), np.asarray(lp_ref),
                               atol=1e-4, rtol=1e-4)

    s_ref = sample(f, jax.random.PRNGKey(1), 16, 2, rtol=1e-6, atol=1e-8,
                   options={"max_steps": 512})
    s_fused = cnf_sample_fused(weights, jax.random.PRNGKey(1), 16, 2,
                               rtol=1e-6, atol=1e-8, interpret=True)
    np.testing.assert_allclose(np.asarray(s_fused), np.asarray(s_ref),
                               atol=1e-4, rtol=1e-4)


@pytest.mark.slow
def test_fused_adjoint_seminorm_step_control_matches_generic_nfe():
    """Regression: the fused seminorm once divided the reduced error sum by
    the FULL element count (2DB + n_params), understating the ratio ~8.7x
    here and accepting oversized steps. Raw fused-vs-generic NFE cannot be
    compared directly (the fused sweep warm-starts dt across observation
    intervals; the generic one re-selects per interval), so compare the
    seminorm/full-norm NFE RATIO of each path — the warm-start effect
    cancels, the norm's step-control effect doesn't."""
    from tfdiffeq_tpu import NFEMeter

    weights = tuple(_weights(seed=50, dims=(4, 64, 64, 4)))
    spec = MLPSpec(activation="tanh")
    y0 = jnp.asarray(np.random.RandomState(51).randn(8, 4), jnp.float32)
    t = jnp.linspace(0.0, 2.0, 5, dtype=jnp.float32)

    def b_nfe(fused, semi):
        meter = NFEMeter()

        def loss(w):
            if fused:
                ys = odeint_adjoint_mlp(spec, w, y0, t, rtol=1e-5,
                                        atol=1e-7, adjoint_seminorm=semi,
                                        interpret=True, nfe_meter=meter)
            else:
                ys = odeint_adjoint(
                    lambda tt, yy, p: mlp_apply(spec, p, yy), y0, t,
                    params=w, rtol=1e-5, atol=1e-7,
                    adjoint_seminorm=semi, nfe_meter=meter)
            return jnp.sum(ys[-1] ** 2)

        jax.grad(loss)(weights)
        jax.effects_barrier()
        return meter.snapshot()["b_nfe"]

    r_fused = b_nfe(True, True) / b_nfe(True, False)
    r_gen = b_nfe(False, True) / b_nfe(False, False)
    # Measured: ~0.83 vs ~0.80. The old bug drove the fused seminorm ratio
    # to ~0.55 (an extra sqrt((2DB+P)/2DB) ~ 8.7x tolerance inflation).
    assert 0.8 < r_fused / r_gen < 1.25, (r_fused, r_gen)


def test_fused_adjoint_backward_failure_poisons_grads():
    """A backward sweep that exhausts max_num_steps must return NaN
    gradients (loud), not a partial adjoint plus raw cotangent sums."""
    weights = tuple(_weights(seed=52, dims=(3, 10, 3)))
    spec = MLPSpec(activation="tanh")
    y0 = jnp.asarray(np.random.RandomState(53).randn(4, 3), jnp.float32)
    t = jnp.linspace(0.0, 1.0, 4, dtype=jnp.float32)

    # Loose forward succeeds within the budget; tight backward cannot.
    def loss(w):
        ys = odeint_adjoint_mlp(spec, w, y0, t, rtol=1e-3, atol=1e-5,
                                adjoint_rtol=1e-9, adjoint_atol=1e-12,
                                max_num_steps=40, interpret=True)
        return jnp.sum(ys ** 2)

    ys_ok = odeint_adjoint_mlp(spec, weights, y0, t, rtol=1e-3, atol=1e-5,
                               max_num_steps=40, interpret=True,
                               return_stats=True)[1]
    assert int(ys_ok.status) == 0          # forward fits the budget
    g = jax.grad(loss)(weights)
    leaves = jax.tree_util.tree_leaves(g)
    assert all(np.all(np.isnan(np.asarray(x))) for x in leaves)


def test_vmem_fallback_passes_max_num_steps(monkeypatch):
    """Regression: the VMEM fallback once dropped max_num_steps/first_step
    when delegating to the generic adjoint. A budget the fused path would
    enforce must also fail loudly on the generic path."""
    import tfdiffeq_tpu.fast as F

    weights = tuple(_weights(seed=54, dims=(3, 8, 3)))
    spec = MLPSpec(activation="tanh")
    y0 = jnp.asarray(np.random.RandomState(55).randn(4, 3), jnp.float32)
    t = jnp.linspace(0.0, 1.0, 4, dtype=jnp.float32)

    monkeypatch.setattr(F, "_VMEM_BUDGET", 1024)
    with pytest.warns(UserWarning, match="VMEM"):
        with pytest.raises(RuntimeError, match="status"):
            F.odeint_adjoint_mlp(spec, weights, y0, t, rtol=1e-7,
                                 atol=1e-9, max_num_steps=2,
                                 interpret=False)


def test_weights_from_flax_dense_ignores_non_dense_keys():
    rng = np.random.RandomState(56)
    kb = lambda a, b: {"kernel": jnp.asarray(rng.randn(a, b), jnp.float32),
                       "bias": jnp.zeros((b,), jnp.float32)}
    params = {"params": {"Dense_0": kb(3, 8), "Dense_1": kb(8, 3),
                         "DenseGeneral_0": kb(9, 9)}}
    ws = weights_from_flax_dense(params)
    assert len(ws) == 2 and ws[0][0].shape == (3, 8)
    with pytest.raises(ValueError, match="Dense"):
        weights_from_flax_dense({"params": {"GRUCell_0": kb(2, 2)}})


@pytest.mark.slow
@pytest.mark.parametrize("mm", ["mxu", "auto"])
def test_mxu_matmul_mode_forward_and_adjoint_parity(mm):
    """MLPSpec(matmul='mxu'/'auto'): wide layers contract on the systolic
    array (one dot per layer) instead of unrolled VPU broadcasts; results
    must match the VPU path and the generic engine at f32 tolerance."""
    weights = tuple(_weights(seed=60, dims=(8, 64, 64, 8)))
    y0 = jnp.asarray(np.random.RandomState(61).randn(16, 8), jnp.float32)
    t = jnp.linspace(0.0, 1.5, 5, dtype=jnp.float32)

    spec = MLPSpec(activation="tanh", matmul=mm)
    res = solve_mlp_spec(spec, weights, y0, t, rtol=1e-6, atol=1e-8,
                         interpret=True)
    ref = solve(lambda tt, yy: mlp_apply(spec, weights, yy), y0, t,
                rtol=1e-6, atol=1e-8, method="dopri5",
                options={"loop": "while"})
    assert int(res.stats.status) == 0
    np.testing.assert_allclose(np.asarray(res.ys), np.asarray(ref.ys),
                               atol=5e-4, rtol=1e-3)

    def loss(w, mode):
        s = MLPSpec(activation="tanh", matmul=mode)
        ys = odeint_adjoint_mlp(s, w, y0, t, rtol=1e-6, atol=1e-8,
                                interpret=True)
        return jnp.sum(ys[-1] ** 2)

    gm = jax.grad(lambda w: loss(w, mm))(weights)
    gv = jax.grad(lambda w: loss(w, "vpu"))(weights)
    for a, b in zip(jax.tree_util.tree_leaves(gm),
                    jax.tree_util.tree_leaves(gv)):
        d = float(jnp.max(jnp.abs(a - b)))
        m = float(jnp.max(jnp.abs(b))) + 1e-8
        assert d / m < 1e-3, (mm, d, m)


@pytest.mark.slow
def test_cnf_log_prob_train_matches_generic_gradients():
    """cnf_log_prob_train (fused forward kernel + generic adjoint
    backward) matches models.cnf.log_prob's direct gradients."""
    from tfdiffeq_tpu.fast import cnf_log_prob_train
    from tfdiffeq_tpu.models.cnf import CNFDynamics, log_prob

    dyn = CNFDynamics(dim=2, hidden=16, depth=2)
    vs = dyn.init(jax.random.PRNGKey(0), 0.0, jnp.ones((4, 2)))
    weights = tuple((W, b) for W, b in weights_from_flax_dense(vs))
    x = jnp.asarray(np.random.RandomState(80).randn(8, 2), jnp.float32)

    def loss_train(w):
        return -jnp.mean(cnf_log_prob_train(w, x, rtol=1e-6, atol=1e-8,
                                            interpret=True))

    def loss_gen(w):
        spec = MLPSpec(activation="tanh", time_input=True)
        lp = log_prob(lambda tt, zz: mlp_apply(spec, w, zz, tt), x,
                      rtol=1e-6, atol=1e-8, trace="exact",
                      options={"max_steps": 512})
        return -jnp.mean(lp)

    lt = float(loss_train(weights))
    lg = float(loss_gen(weights))
    assert abs(lt - lg) < 1e-3, (lt, lg)

    gt = jax.grad(loss_train)(weights)
    gg = jax.grad(loss_gen)(weights)
    for a, b in zip(jax.tree_util.tree_leaves(gt),
                    jax.tree_util.tree_leaves(gg)):
        d = float(jnp.max(jnp.abs(a - b)))
        m = float(jnp.max(jnp.abs(b)))
        assert d < 1e-4 + 5e-3 * m, (d, m)


@pytest.mark.slow
def test_fused_adjoint_time_input_matches_generic():
    """Concat-t (time-dependent) MLP through the fused adjoint kernel:
    weight/bias/y0/t gradients — including the first layer's t-column and
    the a_t quadrature — match the generic odeint_adjoint (round-2
    verdict item 4; previously time_input raised)."""
    rng = np.random.RandomState(3)
    D = 2
    W1 = jnp.asarray(rng.randn(D + 1, 24) * 0.3, jnp.float32)
    b1 = jnp.asarray(rng.randn(24) * 0.1, jnp.float32)
    W2 = jnp.asarray(rng.randn(24, D) * 0.3, jnp.float32)
    b2 = jnp.asarray(rng.randn(D) * 0.1, jnp.float32)
    weights = ((W1, b1), (W2, b2))
    spec = MLPSpec(activation="tanh", time_input=True)
    y0 = jnp.asarray(rng.randn(8, D), jnp.float32)
    t = jnp.linspace(0.0, 2.0, 5, dtype=jnp.float32)
    g_out = jnp.asarray(rng.randn(5, 8, D), jnp.float32)

    def loss_fused(w, y, tt):
        ys = odeint_adjoint_mlp(spec, w, y, tt, rtol=1e-6, atol=1e-8)
        return jnp.sum(ys * g_out)

    def loss_gen(w, y, tt):
        ys = odeint_adjoint(lambda a, b, p: mlp_apply(spec, p, b, a), y,
                            tt, params=w, rtol=1e-6, atol=1e-8)
        return jnp.sum(ys * g_out)

    gf = jax.grad(loss_fused, argnums=(0, 1, 2))(weights, y0, t)
    gg = jax.grad(loss_gen, argnums=(0, 1, 2))(weights, y0, t)
    for a, b in zip(jax.tree_util.tree_leaves(gf),
                    jax.tree_util.tree_leaves(gg)):
        d = float(jnp.max(jnp.abs(a - b)))
        m = float(jnp.max(jnp.abs(b))) + 1e-12
        assert d / m < 1e-4, (d, m)


@pytest.mark.slow
def test_cnf_two_kernel_training_matches_direct():
    """cnf_log_prob_train is now TWO kernels (fused augmented forward +
    fused augmented adjoint backward with the divergence's second-order
    VJP in-kernel): weight and input gradients match the generic
    differentiable bounded loop (round-2 verdict item 4, CNF leg)."""
    from tfdiffeq_tpu.fast import cnf_log_prob_train
    from tfdiffeq_tpu.models.cnf import log_prob

    rng = np.random.RandomState(0)
    D, H = 2, 16
    cweights = tuple(
        (jnp.asarray(rng.randn(i, o) * 0.4, jnp.float32),
         jnp.asarray(rng.randn(o) * 0.1, jnp.float32))
        for i, o in ((D + 1, H), (H, H), (H, D)))
    xs = jnp.asarray(rng.randn(32, D) * 0.8, jnp.float32)
    cspec = MLPSpec(activation="tanh", time_input=True)

    def loss_fused(w):
        return -jnp.mean(cnf_log_prob_train(w, xs, rtol=1e-5, atol=1e-7))

    def loss_gen(w):
        lp = log_prob(lambda tt, zz: mlp_apply(cspec, w, zz, tt), xs,
                      rtol=1e-5, atol=1e-7, trace="exact",
                      options={"max_steps": 2048})
        return -jnp.mean(lp)

    vf, gf = jax.value_and_grad(loss_fused)(cweights)
    vg, gg = jax.value_and_grad(loss_gen)(cweights)
    assert abs(float(vf) - float(vg)) < 1e-4
    for a, b in zip(jax.tree_util.tree_leaves(gf),
                    jax.tree_util.tree_leaves(gg)):
        d = float(jnp.max(jnp.abs(a - b)))
        m = float(jnp.max(jnp.abs(b))) + 1e-12
        assert d / m < 1e-3, (d, m)

    gx_f = jax.grad(lambda xx: -jnp.mean(
        cnf_log_prob_train(cweights, xx, rtol=1e-5, atol=1e-7)))(xs)
    gx_g = jax.grad(lambda xx: -jnp.mean(log_prob(
        lambda tt, zz: mlp_apply(cspec, cweights, zz, tt), xx,
        rtol=1e-5, atol=1e-7, trace="exact",
        options={"max_steps": 2048})))(xs)
    d = float(jnp.max(jnp.abs(gx_f - gx_g)))
    m = float(jnp.max(jnp.abs(gx_g))) + 1e-12
    assert d / m < 1e-3, (d, m)
