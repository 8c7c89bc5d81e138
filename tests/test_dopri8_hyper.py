"""dopri8 and hypersolver tests (SURVEY.md §2 [MED] components)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tfdiffeq_tpu import odeint, solve

from problems import PROBLEMS


@pytest.mark.parametrize("problem_name", sorted(PROBLEMS))
@pytest.mark.parametrize("reverse", [False, True])
def test_dopri8_accuracy(problem_name, reverse):
    prob = PROBLEMS[problem_name](reverse=reverse)
    ys = odeint(prob.func, prob.y0, prob.t, rtol=1e-9, atol=1e-11,
                method="dopri8")
    err = jnp.max(jnp.abs(ys - prob.y_exact(prob.t)))
    # Intermediate outputs go through the 4th-order interpolant over the
    # (large) 8th-order steps, so the bound is interpolation-limited.
    assert float(err) < 1e-5


def test_dopri8_endpoint_tracks_tolerance():
    # 8th order: endpoint error must drop ~ with tolerance; step count stays
    # small (the whole point of a high-order method).
    prob = PROBLEMS["linear"]()
    t2 = jnp.asarray([prob.t[0], prob.t[-1]])
    errs, accs = [], []
    for tol in (1e-8, 1e-11):
        res = solve(prob.func, prob.y0, t2, rtol=tol, atol=tol * 1e-2,
                    method="dopri8", options={"loop": "while"})
        errs.append(float(jnp.max(jnp.abs(res.ys[-1]
                                          - prob.y_exact(t2)[-1]))))
        accs.append(int(res.stats.n_accepted))
    assert errs[0] < 1e-6 and errs[1] < 1e-9
    assert accs[1] < 4 * accs[0]          # high order: mild step growth


def _linear_setup():
    A = jnp.asarray([[-0.1, 2.0], [-2.0, -0.1]], jnp.float64)
    f = lambda tt, yy: A @ yy
    y0 = jnp.asarray([2.0, 0.0])
    t = jnp.linspace(0.0, 2.0, 21)
    import scipy.linalg as sla
    exact = np.stack([sla.expm(np.asarray(A) * float(ti)) @ np.array([2., 0.])
                      for ti in t])
    return A, f, y0, t, exact


def test_hyper_euler_beats_euler_with_exact_residual():
    A, f, y0, t, exact = _linear_setup()
    ys_e = odeint(f, y0, t, method="euler")
    g2 = lambda tt, yy, ff: (A @ (A @ yy)) / 2.0
    ys_h = odeint(f, y0, t, method="hyper_euler", options={"hypernet": g2})
    err_e = np.abs(np.asarray(ys_e) - exact).max()
    err_h = np.abs(np.asarray(ys_h) - exact).max()
    assert err_h < err_e / 5.0


@pytest.mark.parametrize("method", ["hyper_midpoint", "hyper_heun"])
def test_hyper_order2_with_exact_residual(method):
    A, f, y0, t, exact = _linear_setup()
    ys_base = odeint(f, y0, t, method="midpoint")
    g3 = lambda tt, yy, ff: (A @ (A @ (A @ yy))) / 6.0
    g = g3 if method == "hyper_midpoint" else (
        # Heun's dt^3 residual coefficient for linear f: A^3/6 - A^3/4...
        # exact form differs; A^3/6 still reduces the error substantially.
        g3)
    ys_h = odeint(f, y0, t, method=method, options={"hypernet": g})
    err_b = np.abs(np.asarray(ys_base) - exact).max()
    err_h = np.abs(np.asarray(ys_h) - exact).max()
    assert err_h < err_b


def test_hypernet_trains_with_jax_grad():
    A, f, y0, t, exact = _linear_setup()

    def loss(W):
        g = lambda tt, yy, ff: W @ yy
        ys = odeint(f, y0, t, method="hyper_euler",
                    options={"hypernet": g})
        return jnp.mean((ys - jnp.asarray(exact)) ** 2)

    W = jnp.zeros((2, 2))
    l0 = float(loss(W))
    step = jax.jit(lambda W: W - 0.05 * jax.grad(loss)(W))
    for _ in range(200):
        W = step(W)
    l1 = float(loss(W))
    assert l1 < 0.7 * l0


def test_hyper_requires_hypernet():
    with pytest.raises(ValueError, match="hypernet"):
        odeint(lambda t, y: -y, jnp.ones(1), jnp.asarray([0.0, 1.0]),
               method="hyper_euler")
