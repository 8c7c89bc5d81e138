"""API-surface tests (parity with upstream `tests/api_tests.py`, SURVEY.md §4):
pytree states, reverse time, scalar y0, bad inputs, dtype helpers."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import tfdiffeq_tpu as tdt
from tfdiffeq_tpu import cast_double, move_to_device, odeint, solve


def test_tuple_state_roundtrip():
    def f(t, y):
        a, b = y
        return (-a, {"x": -2.0 * b["x"]})

    y0 = (jnp.ones(3), {"x": jnp.ones((2, 2))})
    t = jnp.asarray([0.0, 0.5, 1.0])
    ys = odeint(f, y0, t, method="dopri5")
    assert isinstance(ys, tuple)
    assert ys[0].shape == (3, 3)
    assert ys[1]["x"].shape == (3, 2, 2)
    np.testing.assert_allclose(np.asarray(ys[0][-1]),
                               np.exp(-1.0) * np.ones(3), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(ys[1]["x"][-1]),
                               np.exp(-2.0) * np.ones((2, 2)), rtol=1e-6)


def test_scalar_state():
    ys = odeint(lambda t, y: -y, jnp.asarray(1.0), jnp.asarray([0.0, 1.0]))
    assert ys.shape == (2,)
    np.testing.assert_allclose(np.asarray(ys[-1]), [np.exp(-1.0)], rtol=1e-6)


def test_reverse_time():
    t_fwd = jnp.asarray([0.0, 1.0])
    t_bwd = jnp.asarray([1.0, 0.0])
    y1 = odeint(lambda t, y: -y, jnp.asarray([1.0]), t_fwd)[-1]
    y0_back = odeint(lambda t, y: -y, y1, t_bwd)[-1]
    np.testing.assert_allclose(np.asarray(y0_back), [1.0], rtol=1e-6)


def test_single_time_returns_y0():
    y0 = jnp.asarray([1.0, 2.0])
    ys = odeint(lambda t, y: -y, y0, jnp.asarray([3.0]))
    np.testing.assert_array_equal(np.asarray(ys), np.asarray(y0[None]))


def test_errors():
    y0 = jnp.asarray([1.0])
    t = jnp.asarray([0.0, 1.0])
    with pytest.raises(ValueError, match="Unknown method"):
        odeint(lambda t, y: -y, y0, t, method="nope")
    with pytest.raises(TypeError, match="Unknown solver options"):
        odeint(lambda t, y: -y, y0, t, options={"bogus": 1})
    with pytest.raises(ValueError, match="monotonic"):
        odeint(lambda t, y: -y, y0, jnp.asarray([0.0, 2.0, 1.0]))
    with pytest.raises(TypeError, match="floating"):
        odeint(lambda t, y: -y, jnp.asarray([1, 2]), t)


def test_non_monotonic_skipped_under_jit():
    # traced t skips eager validation but still integrates monotone input
    @jax.jit
    def go(t):
        return odeint(lambda tt, y: -y, jnp.asarray([1.0]), t)

    ys = go(jnp.asarray([0.0, 0.5, 1.0]))
    assert ys.shape == (3, 1)


def test_tolerance_pytree():
    y0 = (jnp.ones(2), jnp.ones(3) * 100)
    rtol = (jnp.full(2, 1e-6), jnp.full(3, 1e-6))
    atol = (jnp.full(2, 1e-8), jnp.full(3, 1e-6))
    ys = odeint(lambda t, y: (-y[0], -y[1]), y0, jnp.asarray([0.0, 1.0]),
                rtol=rtol, atol=atol)
    np.testing.assert_allclose(np.asarray(ys[0][-1]),
                               np.exp(-1.0) * np.ones(2), rtol=1e-5)


def test_move_to_device_and_cast_double():
    x = {"a": jnp.ones(3, jnp.float32)}
    y = move_to_device(x, "cpu:0")
    assert y["a"].devices() == {jax.devices("cpu")[0]}
    z = cast_double(x)
    assert z["a"].dtype == jnp.float64


def test_solve_stats_shape():
    res = solve(lambda t, y: -y, jnp.ones(4), jnp.asarray([0.0, 1.0]))
    assert int(res.stats.status) == int(tdt.Status.OK)
    assert res.ys.shape == (2, 4)


def test_nan_dynamics_reports_dt_underflow():
    def f(t, y):
        return jnp.where(t > 0.5, jnp.nan, -1.0) * y

    res = solve(f, jnp.ones(1), jnp.asarray([0.0, 1.0]), method="dopri5",
                options={"max_steps": 256})
    assert int(res.stats.status) in (int(tdt.Status.DT_UNDERFLOW),
                                     int(tdt.Status.MAX_STEPS_REACHED))


def test_int_times_accepted():
    ys = odeint(lambda t, y: -y, jnp.ones(1), jnp.asarray([0, 1]))
    np.testing.assert_allclose(np.asarray(ys[-1]), [np.exp(-1.0)], rtol=1e-6)


def test_step_telemetry():
    """options={'telemetry': True} returns per-attempt (t0, dt, accepted,
    active) arrays consistent with the solver stats (SURVEY.md §5
    tracing/profiling aux)."""
    from tfdiffeq_tpu import solve

    res = solve(lambda t, y: -y, jnp.ones(3), jnp.linspace(0.0, 2.0, 5),
                options={"telemetry": True, "max_steps": 64,
                         "chunk_size": 8})
    tel = res.telemetry
    assert tel is not None
    assert int(tel.accepted.sum()) == int(res.stats.n_accepted)
    assert int(tel.active.sum()) == (int(res.stats.n_accepted)
                                     + int(res.stats.n_rejected))
    # dt values of active attempts are positive; inactive slots inert.
    act = np.asarray(tel.active)
    assert (np.asarray(tel.dt)[act] > 0).all()

    with pytest.raises(ValueError, match="telemetry"):
        solve(lambda t, y: -y, jnp.ones(3), jnp.linspace(0.0, 2.0, 5),
              options={"telemetry": True, "loop": "while"})


def test_per_leaf_tolerance_pytree():
    """rtol/atol may be pytrees of per-leaf scalars (broadcast to leaves)."""
    f = lambda t, y: {"a": -y["a"], "b": -y["b"]}
    y0 = {"a": jnp.ones(3), "b": jnp.ones(3)}
    ys = odeint(f, y0, jnp.asarray([0.0, 1.0]),
                rtol={"a": 1e-8, "b": 1e-4}, atol={"a": 1e-10, "b": 1e-6})
    np.testing.assert_allclose(np.asarray(ys["a"][-1]),
                               np.exp(-1.0) * np.ones(3), rtol=1e-6)


def test_invalid_times_status_under_jit():
    """Traced non-monotonic t cannot be validated eagerly; the generic path
    must report Status.INVALID_TIMES and zero the outputs beyond y0."""
    from tfdiffeq_tpu import Status, solve

    @jax.jit
    def go(t):
        r = solve(lambda tt, y: -y, jnp.ones(2), t)
        return r.stats.status, r.ys

    st, ys = go(jnp.asarray([0.0, 1.0, 0.5]))
    assert int(st) == int(Status.INVALID_TIMES)
    np.testing.assert_array_equal(np.asarray(ys[1]), 0.0)
    # Valid traced t through the same executable stays OK.
    st2, _ = go(jnp.asarray([0.0, 0.5, 1.0]))
    assert int(st2) == int(Status.OK)


def test_grid_constructor_receives_user_func_and_y0():
    calls = {}

    def gc(func, y0, t):
        calls["y0_is_dict"] = isinstance(y0, dict)
        _ = func(t[0], y0)["a"]        # user-space call must work
        return jnp.linspace(t[0], t[-1], 33)

    ys = odeint(lambda t, y: {"a": -y["a"]}, {"a": jnp.ones(3)},
                jnp.asarray([0.0, 1.0]), method="rk4",
                options={"grid_constructor": gc})
    assert calls["y0_is_dict"]
    np.testing.assert_allclose(np.asarray(ys["a"][-1]),
                               np.exp(-1.0) * np.ones(3), rtol=1e-5)


def test_per_kind_option_validation():
    f = lambda t, y: -y
    y0 = jnp.ones(1)
    t = jnp.asarray([0.0, 1.0])
    with pytest.raises(TypeError, match="step_size"):
        odeint(f, y0, t, method="dopri5", options={"step_size": 0.5})
    with pytest.raises(TypeError, match="safety"):
        odeint(f, y0, t, method="rk4", options={"safety": 0.8})


def test_vmap_per_sample_adaptive_stepping():
    """torchode-style per-sample step-size control falls out of vmap over
    solves: each sample gets its own accept/reject sequence and NFE count
    (lanes run masked until the slowest finishes)."""
    from tfdiffeq_tpu import solve

    rates = jnp.asarray([0.1, 1.0, 10.0])
    t = jnp.asarray([0.0, 5.0])
    per = jax.vmap(lambda y0, r: solve(
        lambda tt, yy: -r * yy, y0, t, rtol=1e-8, atol=1e-10,
        options={"loop": "while"}))
    res = per(jnp.ones((3, 1)), rates)
    nfes = np.asarray(res.stats.nfe)
    assert nfes[0] < nfes[1] < nfes[2]          # work tracks stiffness
    np.testing.assert_allclose(
        np.asarray(res.ys[:, -1, 0]), np.exp(-np.asarray(rates) * 5.0),
        rtol=1e-6, atol=1e-9)
