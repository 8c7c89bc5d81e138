"""VCABM (`adams`) solver tests.

Validates the on-device fixed-buffer VCABM against (a) closed-form
solutions and (b) a host-control-flow NumPy oracle transcribing the
reference algorithm (upstream `tfdiffeq/adams.py` lineage; SURVEY.md §2
"Variable-coefficient Adams") — the oracle and the compiled solver must
produce the SAME accept/reject sequence and trajectories.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tfdiffeq_tpu import odeint, solve

from problems import PROBLEMS
from vcabm_oracle import vcabm as vcabm_oracle


@pytest.mark.parametrize("problem_name", sorted(PROBLEMS))
@pytest.mark.parametrize("reverse", [False, True])
def test_adams_accuracy(problem_name, reverse):
    prob = PROBLEMS[problem_name](reverse=reverse)
    ys = odeint(prob.func, prob.y0, prob.t, rtol=1e-8, atol=1e-10,
                method="adams")
    err = jnp.max(jnp.abs(ys - prob.y_exact(prob.t)))
    assert float(err) < 1e-4


def test_adams_matches_oracle():
    A = np.array([[-0.1, 2.0], [-2.0, -0.1]])
    t = np.linspace(0.0, 10.0, 20)
    y0 = np.array([2.0, 0.0])

    ys_o, _, acc_o, rej_o, _ = vcabm_oracle(
        lambda tt, yy: A @ yy, y0, t, 1e-8, 1e-10)

    res = solve(lambda tt, yy: jnp.asarray(A) @ yy, jnp.asarray(y0),
                jnp.asarray(t), rtol=1e-8, atol=1e-10, method="adams")
    assert int(res.stats.n_accepted) == acc_o
    assert int(res.stats.n_rejected) == rej_o
    np.testing.assert_allclose(np.asarray(res.ys), ys_o, rtol=1e-9,
                               atol=1e-11)


def test_adams_max_order_option():
    A = np.array([[-0.1, 2.0], [-2.0, -0.1]])
    t = jnp.linspace(0.0, 5.0, 5)
    y0 = jnp.asarray([2.0, 0.0])
    f = lambda tt, yy: jnp.asarray(A) @ yy
    r2 = solve(f, y0, t, rtol=1e-6, atol=1e-8, method="adams",
               options={"max_order": 2})
    r12 = solve(f, y0, t, rtol=1e-6, atol=1e-8, method="adams")
    # Lower max order must cost more steps at equal tolerance.
    assert int(r2.stats.n_accepted) > int(r12.stats.n_accepted)


def test_adams_under_jit_and_pytree():
    def f(t, y):
        return {"a": -y["a"], "b": 0.5 * y["b"]}

    y0 = {"a": jnp.asarray([1.0, 2.0]), "b": jnp.asarray(3.0)}
    t = jnp.linspace(0.0, 1.0, 5)

    @jax.jit
    def go(y0, t):
        return odeint(f, y0, t, rtol=1e-8, atol=1e-10, method="adams")

    ys = go(y0, t)
    np.testing.assert_allclose(
        np.asarray(ys["a"][-1]), np.asarray(y0["a"]) * np.exp(-1.0),
        rtol=1e-4)
    np.testing.assert_allclose(
        np.asarray(ys["b"][-1]), 3.0 * np.exp(0.5), rtol=1e-4)


def test_adams_max_num_steps_status():
    from tfdiffeq_tpu import Status

    res = solve(lambda t, y: -y, jnp.asarray([1.0]),
                jnp.linspace(0.0, 10.0, 5), rtol=1e-12, atol=1e-14,
                method="adams", options={"max_num_steps": 5})
    assert int(res.stats.status) == int(Status.MAX_STEPS_REACHED)
