"""Gradient correctness (parity with upstream `tests/gradient_tests.py`,
SURVEY.md §4):

(a) direct gradients through the solver (`jax.grad` through the bounded loop
    / scan — the analogue of the reference's taped backprop) checked against
    finite differences and analytic Jacobians;
(b) adjoint-vs-direct agreement — the key `odeint_adjoint` contract.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tfdiffeq_tpu import odeint, odeint_adjoint

A = jnp.asarray([[-0.1, 2.0], [-2.0, -0.1]], jnp.float64)
Y0 = jnp.asarray([2.0, 0.0], jnp.float64)
T = jnp.linspace(0.0, 1.5, 7)


def linear_func(t, y):
    return y @ A.T


def expm_at(tt):
    lam, om = -0.1, 2.0
    e = np.exp(lam * tt)
    c, s = np.cos(om * tt), np.sin(om * tt)
    return e * np.array([[c, s], [-s, c]])


@pytest.mark.parametrize("method", ["dopri5", "rk4", "midpoint", "bosh3"])
def test_grad_y0_matches_analytic_jacobian(method):
    # d y(T) / d y0 == expm(A*T) for the linear ODE.
    # Fixed-grid methods integrate on the (coarse) output grid by default;
    # use a fine step so the *discrete* Jacobian is close to expm(A*T).
    options = None if method in ("dopri5", "bosh3") else {"step_size": 0.002}

    def endpoint(y0):
        ys = odeint(linear_func, y0, T, method=method, options=options)
        return ys[-1]

    J = jax.jacrev(endpoint)(Y0)
    np.testing.assert_allclose(np.asarray(J), expm_at(float(T[-1])),
                               rtol=1e-4, atol=1e-5)


def test_grad_through_closure_params():
    # Plain jax.grad must see closure-captured parameters (bounded loop).
    def loss(Amat):
        def f(t, y):
            return y @ Amat.T
        ys = odeint(f, Y0, T, method="dopri5")
        return jnp.sum(ys[-1] ** 2)

    g = jax.grad(loss)(A)
    # finite differences
    eps = 1e-6
    g_fd = np.zeros((2, 2))
    for i in range(2):
        for j in range(2):
            dA = np.zeros((2, 2)); dA[i, j] = eps
            g_fd[i, j] = (loss(A + dA) - loss(A - dA)) / (2 * eps)
    np.testing.assert_allclose(np.asarray(g), g_fd, rtol=1e-4, atol=1e-6)


def test_adjoint_matches_direct():
    params = {"A": A * 0.9, "b": jnp.asarray([0.1, -0.2], jnp.float64)}

    def f(t, y, p):
        return jnp.tanh(y @ p["A"].T + p["b"]) - 0.1 * y

    g_out = jnp.asarray(np.random.RandomState(0).randn(T.shape[0], 2))

    def loss_direct(y0, t, p):
        ys = odeint(lambda tt, yy: f(tt, yy, p), y0, t, method="dopri5",
                    rtol=1e-9, atol=1e-11)
        return jnp.sum(ys * g_out)

    def loss_adjoint(y0, t, p):
        ys = odeint_adjoint(f, y0, t, params=p, method="dopri5",
                            rtol=1e-9, atol=1e-11)
        return jnp.sum(ys * g_out)

    gd = jax.grad(loss_direct, argnums=(0, 1, 2))(Y0, T, params)
    ga = jax.grad(loss_adjoint, argnums=(0, 1, 2))(Y0, T, params)

    np.testing.assert_allclose(np.asarray(ga[0]), np.asarray(gd[0]),
                               rtol=1e-5, atol=1e-7)  # dy0
    np.testing.assert_allclose(np.asarray(ga[1]), np.asarray(gd[1]),
                               rtol=1e-4, atol=1e-6)  # dt
    for k in params:
        np.testing.assert_allclose(np.asarray(ga[2][k]),
                                   np.asarray(gd[2][k]),
                                   rtol=1e-5, atol=1e-7)


def test_adjoint_no_params():
    def f(t, y):
        return -y

    def loss(y0):
        return jnp.sum(odeint_adjoint(f, y0, jnp.asarray([0.0, 1.0]))[-1])

    g = jax.grad(loss)(jnp.asarray([1.0, 2.0]))
    np.testing.assert_allclose(np.asarray(g),
                               np.exp(-1.0) * np.ones(2), rtol=1e-6)


def test_vmap_over_initial_states():
    y0s = jnp.stack([Y0, Y0 * 0.5, Y0 * -1.0])

    def endpoint(y0):
        return odeint(linear_func, y0, T, method="dopri5")[-1]

    batched = jax.vmap(endpoint)(y0s)
    loop = jnp.stack([endpoint(y0s[i]) for i in range(3)])
    np.testing.assert_allclose(np.asarray(batched), np.asarray(loop),
                               rtol=1e-9, atol=1e-9)


def test_grad_through_fixed_grid_scan_value_and_grad():
    # value_and_grad under jit end-to-end (training-loop shape).
    @jax.jit
    def loss(y0):
        ys = odeint(linear_func, y0, T, method="rk4")
        return jnp.mean(jnp.abs(ys))

    v, g = jax.value_and_grad(loss)(Y0)
    assert np.isfinite(v)
    assert np.all(np.isfinite(np.asarray(g)))


def test_adjoint_with_fixed_grid_step_size():
    """odeint_adjoint must work with fixed-grid methods + step_size (the
    backward converts it to a static per-interval num_steps)."""
    def f(t, y, p):
        return -p * y

    def loss(p):
        ys = odeint_adjoint(f, jnp.ones(2), jnp.linspace(0.0, 1.0, 4),
                            params=p, method="rk4",
                            options={"step_size": 0.05})
        return ys[-1].sum()

    g = jax.grad(loss)(jnp.asarray(1.0))
    # d/dp [2 exp(-p)] at p=1 = -2/e
    np.testing.assert_allclose(float(g), -2.0 * np.exp(-1.0), rtol=1e-5)


def test_adjoint_scalar_t():
    g = jax.grad(lambda y: odeint_adjoint(lambda t, yy: -yy, y, 0.5
                                          ).sum())(jnp.ones(2))
    np.testing.assert_allclose(np.asarray(g), np.ones(2))


def test_adjoint_return_stats_and_nfe_meter():
    """Adjoint observability (reference parity: odenet_mnist logs f/b-NFE):
    return_stats exposes the forward SolverStats; an NFEMeter receives both
    forward and backward solve stats, including under jit+grad."""
    from tfdiffeq_tpu import NFEMeter, solve

    params = {"A": A * 0.9}

    def f(t, y, p):
        return jnp.tanh(y @ p["A"].T)

    ys, st = odeint_adjoint(f, Y0, T, params=params, return_stats=True)
    ref = solve(lambda tt, yy: f(tt, yy, params), Y0, T,
                options={"loop": "while"})
    assert int(st.nfe) == int(ref.stats.nfe)
    assert int(st.status) == 0
    np.testing.assert_allclose(np.asarray(ys), np.asarray(ref.ys),
                               rtol=1e-12)

    meter = NFEMeter()

    @jax.jit
    def loss(p):
        ys = odeint_adjoint(f, Y0, T, params=p, nfe_meter=meter)
        return jnp.sum(ys ** 2)

    jax.grad(loss)(params)
    jax.effects_barrier()
    s = meter.snapshot()
    assert s["f_calls"] == 1 and s["b_calls"] == 1
    assert s["f_nfe"] == int(ref.stats.nfe)
    assert s["b_nfe"] > 0 and s["b_steps"] > 0


def test_adjoint_fixed_grid_irregular_per_interval_grid():
    """Fixed-grid adjoint + step_size on an IRREGULAR observation grid must
    size the backward grid per interval (sum of ceil(span_i/h) steps), not
    (T-1) x ceil(max_span/h), while matching direct gradients."""
    from tfdiffeq_tpu import NFEMeter

    t_irr = jnp.asarray([0.0, 0.1, 0.15, 1.0, 3.0], jnp.float64)
    params = {"A": A * 0.9, "b": jnp.asarray([0.1, -0.2], jnp.float64)}

    def f(t, y, p):
        return jnp.tanh(y @ p["A"].T + p["b"]) - 0.1 * y

    g_out = jnp.asarray(np.random.RandomState(3).randn(t_irr.shape[0], 2))

    def loss_direct(y0, p):
        ys = odeint(lambda tt, yy: f(tt, yy, p), y0, t_irr,
                    method="dopri5", rtol=1e-10, atol=1e-12)
        return jnp.sum(ys * g_out)

    meter = NFEMeter()

    def loss_walk(y0, p):
        ys = odeint_adjoint(f, y0, t_irr, params=p, method="rk4",
                            options={"step_size": 0.01}, nfe_meter=meter)
        return jnp.sum(ys * g_out)

    gd = jax.grad(loss_direct, argnums=(0, 1))(Y0, params)
    gw = jax.grad(loss_walk, argnums=(0, 1))(Y0, params)
    jax.effects_barrier()
    np.testing.assert_allclose(np.asarray(gw[0]), np.asarray(gd[0]),
                               rtol=1e-5, atol=1e-7)
    for k in params:
        np.testing.assert_allclose(np.asarray(gw[1][k]),
                                   np.asarray(gd[1][k]),
                                   rtol=1e-5, atol=1e-7)
    # Per-interval counts: spans (0.1, 0.05, 0.85, 2.0) / 0.01
    # -> 10 + 5 + 85 + 200 = 300 steps; the old max-span scheme took
    # 4 * 200 = 800.
    assert meter.b_steps == 300, meter.snapshot()


def test_adjoint_fixed_grid_walk_reverse_time():
    """Per-interval backward walk on a DECREASING observation grid."""
    t_rev = jnp.asarray([2.0, 1.5, 0.3, 0.0], jnp.float64)

    def f(t, y, p):
        return -p * y

    def loss_walk(p):
        ys = odeint_adjoint(f, jnp.ones(2), t_rev, params=p, method="rk4",
                            options={"step_size": 0.01})
        return ys[-1].sum()

    def loss_direct(p):
        ys = odeint(lambda tt, yy: f(tt, yy, p), jnp.ones(2), t_rev,
                    method="dopri5", rtol=1e-10, atol=1e-12)
        return ys[-1].sum()

    gw = jax.grad(loss_walk)(jnp.asarray(0.7))
    gd = jax.grad(loss_direct)(jnp.asarray(0.7))
    np.testing.assert_allclose(float(gw), float(gd), rtol=1e-6)


@pytest.mark.slow
def test_adjoint_interpolated_mode_matches_direct():
    """adjoint_mode='interpolated' (Daulbaev et al. 2020): the backward
    pass evaluates y(s) from the stored forward dense output instead of
    re-integrating it. Gradients (y0, t, params) must match direct
    backprop; works forward and reverse time."""
    params = {"A": A * 0.9, "b": jnp.asarray([0.1, -0.2], jnp.float64)}

    def f(t, y, p):
        return jnp.tanh(y @ p["A"].T + p["b"]) - 0.1 * y

    for t_obs in (T, T[::-1] * 1.0):
        g_out = jnp.asarray(np.random.RandomState(7).randn(T.shape[0], 2))

        def loss_direct(y0, t, p):
            ys = odeint(lambda tt, yy: f(tt, yy, p), y0, t,
                        method="dopri5", rtol=1e-9, atol=1e-11,
                        options={"max_steps": 2048})
            return jnp.sum(ys * g_out)

        def loss_interp(y0, t, p):
            ys = odeint_adjoint(f, y0, t, params=p, rtol=1e-9, atol=1e-11,
                                adjoint_mode="interpolated",
                                options={"max_steps": 2048})
            return jnp.sum(ys * g_out)

        gd = jax.grad(loss_direct, argnums=(0, 1, 2))(Y0, t_obs, params)
        gi = jax.grad(loss_interp, argnums=(0, 1, 2))(Y0, t_obs, params)
        for a, b in zip(jax.tree_util.tree_leaves(gi),
                        jax.tree_util.tree_leaves(gd)):
            d = float(jnp.max(jnp.abs(a - b)))
            m = float(jnp.max(jnp.abs(b))) + 1e-12
            assert d / m < 1e-4, (d, m)


def test_adjoint_interpolated_rejects_fixed_forward():
    with pytest.raises(ValueError, match="interpolated"):
        odeint_adjoint(lambda t, y: -y, Y0, T, method="rk4",
                       adjoint_mode="interpolated")
    # and fixed-grid ADJOINT + step_size (the per-interval walk integrates
    # y, which 'interpolated' replaces): require num_steps instead.
    with pytest.raises(ValueError, match="num_steps"):
        odeint_adjoint(lambda t, y: -y, Y0, T, method="dopri5",
                       adjoint_method="rk4",
                       adjoint_options={"step_size": 0.1},
                       adjoint_mode="interpolated")

    # num_steps works: interpolated + fixed-grid adjoint
    def loss(y0):
        ys = odeint_adjoint(lambda t, y: -y, y0, T, method="dopri5",
                            adjoint_method="rk4",
                            adjoint_options={"num_steps": 20},
                            adjoint_mode="interpolated")
        return jnp.sum(ys[-1])

    g = jax.grad(loss)(Y0)
    np.testing.assert_allclose(np.asarray(g),
                               np.exp(-float(T[-1])) * np.ones(2),
                               rtol=1e-4)


def test_dense_output_option():
    """options={'dense_output': True} returns evaluable per-step
    interpolants; eval at arbitrary times matches a direct solve."""
    from tfdiffeq_tpu import solve

    res = solve(linear_func, Y0, T, rtol=1e-9, atol=1e-11,
                options={"dense_output": True, "max_steps": 2048})
    assert res.dense is not None
    for tq in (0.33, 0.77, 1.31):
        got = res.dense.eval_flat(jnp.asarray(tq))
        want = expm_at(tq) @ np.asarray(Y0)
        np.testing.assert_allclose(np.asarray(got), want, rtol=1e-6,
                                   atol=1e-8)
    # while mode cannot emit per-step interpolants
    with pytest.raises(ValueError, match="dense_output"):
        solve(linear_func, Y0, T, options={"dense_output": True,
                                           "loop": "while"})


def test_adjoint_seminorm_matches_full_norm():
    """Seminorm backward error control (Kidger et al. 2020) must reproduce
    full-norm adjoint gradients to solve tolerance while taking fewer
    backward steps (measured ~20% faster at rtol 1e-8)."""
    rng = np.random.RandomState(0)
    D, H = 2, 16
    params = {"w1": jnp.asarray(rng.randn(D, H) * 0.1),
              "w2": jnp.asarray(rng.randn(H, D) * 0.1)}
    y0 = jnp.asarray(rng.randn(8, D))
    t = jnp.linspace(0.0, 3.0, 5)

    def f(tt, yy, p):
        return jnp.tanh(yy @ p["w1"]) @ p["w2"]

    def loss(p, semi):
        ys = odeint_adjoint(f, y0, t, params=p, rtol=1e-8, atol=1e-10,
                            adjoint_seminorm=semi)
        return jnp.sum(ys[-1] ** 2)

    g_full = jax.grad(lambda p: loss(p, False))(params)
    g_semi = jax.grad(lambda p: loss(p, True))(params)
    for a, b in zip(jax.tree_util.tree_leaves(g_full),
                    jax.tree_util.tree_leaves(g_semi)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-6)


def test_adjoint_interpolated_budget_exhaustion_is_loud():
    """adjoint_mode='interpolated' forces the forward onto the BUDGETED
    bounded loop; exhausting options['max_steps'] must raise (eager) or
    NaN-poison (traced), never silently return a truncated trajectory."""
    def f(t, y):
        return -y

    with pytest.raises(RuntimeError, match="status"):
        odeint_adjoint(f, Y0, jnp.linspace(0.0, 10.0, 5), rtol=1e-12,
                       atol=1e-14, options={"max_steps": 4},
                       adjoint_mode="interpolated")

    # Traced path: gradients come out NaN instead of silently wrong.
    @jax.jit
    def loss(y0):
        ys = odeint_adjoint(f, y0, jnp.linspace(0.0, 10.0, 5), rtol=1e-12,
                            atol=1e-14, options={"max_steps": 4},
                            adjoint_mode="interpolated")
        return jnp.sum(ys[-1])

    g = jax.grad(loss)(Y0)
    assert np.all(np.isnan(np.asarray(g)))


@pytest.mark.slow
def test_adjoint_forward_solver_hook():
    """odeint_adjoint(forward_solver=...): a fused whole-solve kernel
    replaces the internal forward; gradients (from the generic backward
    sweep over the kernel's trajectory) match the all-generic adjoint."""
    from tfdiffeq_tpu.fast import MLPSpec, mlp_apply, solve_mlp_spec

    rng = np.random.RandomState(70)
    dims = (3, 12, 3)
    weights = tuple(
        (jnp.asarray(rng.randn(a, b) * 0.3 / np.sqrt(a), jnp.float32),
         jnp.asarray(rng.randn(b) * 0.05, jnp.float32))
        for a, b in zip(dims[:-1], dims[1:]))
    spec = MLPSpec(activation="tanh")
    y0 = jnp.asarray(rng.randn(6, 3), jnp.float32)
    t = jnp.linspace(0.0, 1.5, 5, dtype=jnp.float32)

    def f(tt, yy, p):
        return mlp_apply(spec, p, yy)

    def fwd(y0_, t_, p_):
        r = solve_mlp_spec(spec, p_, y0_, t_, rtol=1e-6, atol=1e-8,
                           interpret=True)
        return r.ys, r.stats

    def loss(w, use_hook):
        ys = odeint_adjoint(f, y0, t, params=w, rtol=1e-6, atol=1e-8,
                            forward_solver=fwd if use_hook else None)
        return jnp.sum(ys[-1] ** 2)

    gh = jax.grad(lambda w: loss(w, True))(weights)
    gg = jax.grad(lambda w: loss(w, False))(weights)
    for a, b in zip(jax.tree_util.tree_leaves(gh),
                    jax.tree_util.tree_leaves(gg)):
        d = float(jnp.max(jnp.abs(a - b)))
        m = float(jnp.max(jnp.abs(b))) + 1e-8
        assert d / m < 2e-3, (d, m)

    with pytest.raises(ValueError, match="interpolated"):
        odeint_adjoint(f, y0, t, params=weights, forward_solver=fwd,
                       adjoint_mode="interpolated")


def test_adjoint_method_adams_gradient_parity():
    """adjoint_method='adams' (VCABM backward sweep) matches direct
    gradients — exercises the custom-solver option-allowlist filtering in
    adjoint.py (forward-only adaptive keys like max_steps must be dropped
    before reaching the adams backward solves)."""
    g_out = jnp.asarray(np.random.RandomState(3).randn(*(T.shape[0], 2)))

    def f(t, y, p):
        return y @ p.T

    def loss_direct(y0, p):
        ys = odeint(lambda tt, yy: f(tt, yy, p), y0, T, method="dopri5",
                    rtol=1e-9, atol=1e-11, options={"max_steps": 2048})
        return jnp.sum(ys * g_out)

    def loss_adams(y0, p):
        ys = odeint_adjoint(f, y0, T, params=p, rtol=1e-9, atol=1e-11,
                            method="dopri5", adjoint_method="adams",
                            options={"max_steps": 2048})
        return jnp.sum(ys * g_out)

    gd = jax.grad(loss_direct, argnums=(0, 1))(Y0, A)
    ga = jax.grad(loss_adams, argnums=(0, 1))(Y0, A)
    for a, b in zip(jax.tree_util.tree_leaves(ga),
                    jax.tree_util.tree_leaves(gd)):
        d = float(jnp.max(jnp.abs(a - b)))
        m = float(jnp.max(jnp.abs(b))) + 1e-12
        assert d / m < 1e-4, (d, m)


def test_second_order_gradients_through_direct_loop():
    """Hessian of a loss through odeint's bounded differentiable loop
    (the reference lineage's taped double-backward capability): for the
    linear ODE dy/dt = y A, loss = |y(1)|^2 is quadratic in y0 with
    Hessian 2 expm(A) expm(A)^T."""
    import scipy.linalg as sla

    A = jnp.asarray([[-0.1, 2.0], [-2.0, -0.1]], jnp.float32)

    def f(t, y):
        return y @ A

    y0 = jnp.asarray([1.0, 0.5], jnp.float32)
    t = jnp.linspace(0.0, 1.0, 5, dtype=jnp.float32)

    def loss(y0_):
        ys = odeint(f, y0_, t, rtol=1e-6, atol=1e-8)
        return jnp.sum(ys[-1] ** 2)

    H = jax.hessian(loss)(y0)
    M = jnp.asarray(sla.expm(np.asarray(A, np.float64)), jnp.float32)
    np.testing.assert_allclose(np.asarray(H), np.asarray(2.0 * M @ M.T),
                               rtol=0, atol=1e-5)
