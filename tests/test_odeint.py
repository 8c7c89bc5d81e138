"""Solver correctness matrix: method x problem x time-direction.

Parity with upstream `tests/odeint_tests.py` (SURVEY.md §4).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tfdiffeq_tpu import Status, odeint, solve

from problems import construct_problem

ADAPTIVE = ["dopri5", "bosh3", "adaptive_heun", "tsit5"]
FIXED = ["euler", "midpoint", "rk4", "rk4_38"]
ADAMS = ["explicit_adams", "fixed_adams"]

# (max |error| tolerance, rtol, step_size) per method at the test settings.
TOL = {
    "dopri5": (1e-6, 1e-7, None),
    "tsit5": (1e-6, 1e-7, None),
    "bosh3": (1e-5, 1e-7, None),
    "adaptive_heun": (1e-2, 1e-4, None),
    "euler": (0.1, None, 0.002),
    "midpoint": (5e-3, None, 0.01),
    "rk4": (1e-3, None, None),
    "rk4_38": (1e-3, None, None),
    "explicit_adams": (2e-2, None, None),
    "fixed_adams": (1e-2, None, None),
}

PROBLEM_NAMES = ["constant", "sine", "linear"]


def _run(method, problem, reverse, options=None):
    p = construct_problem(problem, npts=80, reverse=reverse)
    kwargs = dict(method=method, options=dict(options or {}))
    if method in ADAPTIVE:
        kwargs["rtol"] = TOL[method][1]
        kwargs["atol"] = kwargs["rtol"] * 1e-2
        kwargs["options"].setdefault("loop", "while")
    if TOL[method][2] is not None:
        kwargs["options"]["step_size"] = TOL[method][2]
    ys = odeint(p.func, p.y0, p.t, **kwargs)
    err = float(jnp.max(jnp.abs(ys - p.y_exact(p.t))))
    return err


@pytest.mark.parametrize("reverse", [False, True])
@pytest.mark.parametrize("problem", PROBLEM_NAMES)
@pytest.mark.parametrize("method", ADAPTIVE + FIXED + ADAMS)
def test_solver_accuracy(method, problem, reverse):
    err = _run(method, problem, reverse)
    assert err < TOL[method][0], f"{method}/{problem} rev={reverse}: err={err}"


@pytest.mark.parametrize("reverse", [False, True])
@pytest.mark.parametrize("problem", PROBLEM_NAMES)
@pytest.mark.parametrize("method", ADAPTIVE)
def test_solver_accuracy_bounded_loop(method, problem, reverse):
    """The DEFAULT loop mode faces the full accuracy matrix directly
    (bosh3 at rtol=1e-7 needs >1024 attempts on this span, so the budget is
    sized explicitly)."""
    err = _run(method, problem, reverse,
               options={"loop": "bounded", "max_steps": 4096})
    assert err < TOL[method][0], f"{method}/{problem} rev={reverse}: err={err}"


@pytest.mark.parametrize("method", ["dopri5", "bosh3", "tsit5"])
def test_while_and_bounded_loops_agree(method):
    p = construct_problem("linear", npts=20)
    # bosh3 at the default rtol=1e-7 needs ~1.5k attempts on this span:
    # size the bounded budget explicitly (default is 1024).
    ys_b = odeint(p.func, p.y0, p.t, method=method,
                  options={"loop": "bounded", "max_steps": 4096})
    ys_w = odeint(p.func, p.y0, p.t, method=method, options={"loop": "while"})
    np.testing.assert_allclose(np.asarray(ys_b), np.asarray(ys_w),
                               rtol=1e-12, atol=1e-12)


@pytest.mark.parametrize("loop", ["while", "bounded"])
def test_unroll_is_bit_identical(loop):
    """options={'unroll': k} (k attempts per loop iteration, amortizing TPU
    per-iteration overhead) must not change results at all."""
    p = construct_problem("linear", npts=20)
    base = {"loop": loop, "max_steps": 4096}
    ys1 = odeint(p.func, p.y0, p.t, method="dopri5", options=base)
    ys4 = odeint(p.func, p.y0, p.t, method="dopri5",
                 options=dict(base, unroll=4))
    np.testing.assert_array_equal(np.asarray(ys1), np.asarray(ys4))


def test_dense_output_matches_direct():
    # Integrating straight to sparse times must agree with integrating to
    # dense times (dense output correctness).
    p = construct_problem("linear", npts=77)
    ys_dense = odeint(p.func, p.y0, p.t, method="dopri5")
    sparse_idx = np.array([0, 13, 31, 76])
    ys_sparse = odeint(p.func, p.y0, p.t[sparse_idx], method="dopri5")
    np.testing.assert_allclose(np.asarray(ys_sparse),
                               np.asarray(ys_dense[sparse_idx]),
                               rtol=1e-6, atol=1e-8)


def test_adaptive_convergence_with_tolerance():
    p = construct_problem("linear", npts=10)
    errs = []
    for tol in [1e-4, 1e-6, 1e-8]:
        ys = odeint(p.func, p.y0, p.t, rtol=tol, atol=tol, method="dopri5")
        errs.append(float(jnp.max(jnp.abs(ys - p.y_exact(p.t)))))
    assert errs[2] < errs[0]
    assert errs[2] < 1e-7


def test_fixed_grid_convergence_order():
    # RK4 global error should scale ~h^4.
    p = construct_problem("linear", npts=10)
    errs = {}
    for n in [40, 80]:
        t = jnp.linspace(p.t[0], p.t[-1], n)
        ys = odeint(p.func, p.y0, t, method="rk4")
        errs[n] = float(jnp.max(jnp.abs(ys - p.y_exact(t))))
    rate = np.log2(errs[40] / errs[80])
    assert 3.5 < rate < 4.8, f"rk4 rate {rate}, errs {errs}"


def test_stats_and_status():
    p = construct_problem("linear", npts=10)
    res = solve(p.func, p.y0, p.t, method="dopri5")
    assert int(res.stats.status) == int(Status.OK)
    assert int(res.stats.nfe) > 6
    assert int(res.stats.n_accepted) > 0
    # starved budget reports MAX_STEPS_REACHED
    res2 = solve(p.func, p.y0, p.t, method="dopri5", rtol=1e-10, atol=1e-12,
                 options={"max_steps": 8})
    assert int(res2.stats.status) == int(Status.MAX_STEPS_REACHED)


def test_jit_and_grid_options():
    p = construct_problem("linear", npts=10)

    @jax.jit
    def go(y0, t):
        return odeint(p.func, y0, t, method="dopri5")

    ys = go(p.y0, p.t)
    assert ys.shape == (10, 2)
    err = float(jnp.max(jnp.abs(ys - p.y_exact(p.t))))
    assert err < 1e-6

    ys2 = odeint(p.func, p.y0, p.t, method="rk4",
                 options={"step_size": 0.01})
    err2 = float(jnp.max(jnp.abs(ys2 - p.y_exact(p.t))))
    assert err2 < 1e-7

    ys3 = odeint(p.func, p.y0, p.t, method="fixed_adams",
                 options={"step_size": 0.01, "max_order": 5})
    err3 = float(jnp.max(jnp.abs(ys3 - p.y_exact(p.t))))
    assert err3 < 1e-6


def test_float32_accuracy_budget():
    # TPU is float32: adaptive solve at 1e-5 tolerances should still track
    # the float64 reference within ~1e-3 on the benign spiral.
    p64 = construct_problem("linear", npts=20)
    p32 = construct_problem("linear", dtype=jnp.float32, npts=20)
    ys = odeint(p32.func, p32.y0, p32.t, rtol=1e-5, atol=1e-7,
                method="dopri5")
    ref = p64.y_exact(p64.t)
    err = float(jnp.max(jnp.abs(ys.astype(jnp.float64) - ref)))
    assert err < 1e-3, err


def test_f32_long_grid_compensated_accumulation():
    """Kahan-compensated state accumulation keeps a 25k-step float32 rk4
    integration within the f32 error budget (~2.3e-7 vs 5.5e-7 plain on the
    spiral; SURVEY.md §7 'compensated summation')."""
    A = np.array([[-0.1, 2.0], [-2.0, -0.1]])
    f64 = lambda tt, yy: yy @ jnp.asarray(A).T
    t2 = jnp.asarray([0.0, 25.0])
    ref = odeint(f64, jnp.asarray([2.0, 0.0]), t2, rtol=1e-13, atol=1e-15,
                 method="dopri5", options={"loop": "while"})
    f32 = lambda tt, yy: yy @ jnp.asarray(A, jnp.float32).T
    ys = odeint(f32, jnp.asarray([2.0, 0.0], jnp.float32),
                t2.astype(jnp.float32), method="rk4",
                options={"step_size": 0.001})
    dev = float(jnp.abs(ys[-1].astype(jnp.float64) - ref[-1]).max())
    assert dev < 4e-7, dev


@pytest.mark.slow
def test_complex_state_integration():
    """Complex pytree states (capability extension over the reference):
    dy/dt = i*w*y has exact solution y0*exp(i*w*t); the RMS error norm must
    use |x|^2 for the controller to behave."""
    w = 2.0
    y0 = jnp.asarray([1.0 + 0.5j, 0.3 - 0.2j])
    t = jnp.linspace(0.0, 3.0, 7)
    exact = y0[None, :] * jnp.exp(1j * w * t)[:, None]
    for method in ("dopri5", "adams", "rk4"):
        ys = odeint(lambda tt, yy: 1j * w * yy, y0, t, rtol=1e-9,
                    atol=1e-11, method=method,
                    options={"step_size": 0.01} if method == "rk4" else None)
        assert float(jnp.abs(ys - exact).max()) < 1e-5, method


def test_odeint_eager_raise_and_traced_nan_poison():
    """odeint surfaces failures (reference parity: it raises on
    max_num_steps exhaustion): eager -> RuntimeError; under jit -> the
    trajectory beyond y0 is NaN-poisoned instead of silently stale."""
    p = construct_problem("linear", npts=10)
    starved = dict(rtol=1e-10, atol=1e-12, method="dopri5",
                   options={"max_steps": 8})
    with pytest.raises(RuntimeError, match="MAX_STEPS_REACHED"):
        odeint(p.func, p.y0, p.t, **starved)

    @jax.jit
    def go(y0, t):
        return odeint(p.func, y0, t, **starved)

    ys = np.asarray(go(p.y0, p.t))
    assert np.isfinite(ys[0]).all()
    assert np.isnan(ys[1:]).all()

    # A healthy jitted solve is untouched by the poisoning select.
    @jax.jit
    def ok(y0, t):
        return odeint(p.func, y0, t, method="dopri5")

    ys_ok = np.asarray(ok(p.y0, p.t))
    assert np.isfinite(ys_ok).all()


def test_max_norm_option():
    """options={'norm': 'max'} controls steps with the max norm (stricter
    than RMS, so accuracy must hold and step counts may only grow)."""
    p = construct_problem("linear", npts=10)
    res_max = solve(p.func, p.y0, p.t, rtol=1e-6, atol=1e-8,
                    method="dopri5", options={"norm": "max"})
    res_rms = solve(p.func, p.y0, p.t, rtol=1e-6, atol=1e-8,
                    method="dopri5", options={"norm": "rms"})
    err = float(jnp.max(jnp.abs(res_max.ys - p.y_exact(p.t))))
    assert err < 1e-5, err
    assert int(res_max.stats.nfe) >= int(res_rms.stats.nfe)
    with pytest.raises(ValueError, match="unknown norm"):
        solve(p.func, p.y0, p.t, method="dopri5", options={"norm": "l7"})


def test_while_mode_exact_endpoint_f32_rounding():
    """Regression: the while-mode output mask must use the exactly-carried
    step end, not t0 + dt (in f32, fl(-0.5 + fl(0.8 - (-0.5))) < 0.8, which
    previously zeroed the final output row when one accepted step covered
    the whole span)."""
    from tfdiffeq_tpu import solve

    t = jnp.asarray([-0.5, 0.8], jnp.float32)
    y0 = jnp.asarray([1.0], jnp.float32)
    res = solve(lambda tt, y: -0.1 * y, y0, t, rtol=1e-3, atol=1e-5,
                method="dopri5", options={"loop": "while",
                                          "first_step": 1.3})
    assert int(res.stats.status) == 0
    expected = float(np.exp(-0.1 * 1.3))
    got = float(res.ys[-1, 0])
    assert abs(got - expected) < 1e-4, (got, expected)
    assert got != 0.0
