"""Fixed-grid whole-solve Pallas kernels (ops/pallas_fixed.py).

Parity oracle: the generic fixed-grid engine (`solve(method='rk4', ...)`),
which itself is matrix-tested against closed forms. Runs in Pallas
interpret mode on CPU; the same code compiles under Mosaic on TPU.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tfdiffeq_tpu import solve
from tfdiffeq_tpu.fast import MLPSpec, mlp_apply
from tfdiffeq_tpu.ops.pallas_fixed import (FIXED_TABLEAUS_BY_NAME,
                                           mlp_solve_fixed, plan_solve_fixed)
from tfdiffeq_tpu.ops.pallas_kernels import pad_mlp_weights


def _weights(seed=0, dims=(2, 16, 2), scale=0.4):
    rng = np.random.RandomState(seed)
    out = []
    for a, b in zip(dims[:-1], dims[1:]):
        W = jnp.asarray(rng.randn(a, b) * scale / np.sqrt(a), jnp.float32)
        bb = jnp.asarray(rng.randn(b) * 0.05, jnp.float32)
        out.append((W, bb))
    return out


def _setup(seed=1, B=8, D=2, dims=(2, 16, 2)):
    w = _weights(seed=seed, dims=dims)
    warr, wdims = pad_mlp_weights(w, jnp.float32)
    y0 = jnp.asarray(np.random.RandomState(seed + 1).randn(B, D),
                     jnp.float32)
    return w, warr, wdims, y0


@pytest.mark.parametrize("method", sorted(FIXED_TABLEAUS_BY_NAME))
def test_fixed_kernel_matches_generic_grid_is_t(method):
    """Default grid (= the requested times): step endpoints ARE outputs."""
    w, warr, wdims, y0 = _setup()
    t = jnp.linspace(0.0, 2.0, 9, dtype=jnp.float32)
    spec = MLPSpec(activation="tanh")

    out, stats = mlp_solve_fixed(warr, wdims, y0.T, t, t,
                                 jnp.float32(1.0), activation="tanh",
                                 method=method, interpret=True)
    ref = solve(lambda tt, yy: mlp_apply(spec, w, yy), y0, t,
                method=method)
    tab = FIXED_TABLEAUS_BY_NAME[method]
    assert int(stats[3]) == 0
    assert int(stats[0]) == 1 + tab.stages * 8
    assert int(stats[1]) == 8
    np.testing.assert_allclose(np.asarray(out).transpose(0, 2, 1),
                               np.asarray(ref.ys), rtol=0, atol=1e-5)


def test_fixed_kernel_finer_grid_hermite_outputs():
    """grid finer than tau (the step_size/num_steps path): outputs come
    from the cubic-Hermite drain and must match the generic engine's
    hermite_interp_at to roundoff."""
    w, warr, wdims, y0 = _setup(seed=3)
    t = jnp.asarray([0.0, 0.37, 1.11, 2.0], jnp.float32)
    grid = jnp.linspace(0.0, 2.0, 33, dtype=jnp.float32)
    spec = MLPSpec(activation="tanh")

    out, stats = mlp_solve_fixed(warr, wdims, y0.T, t, grid,
                                 jnp.float32(1.0), activation="tanh",
                                 method="rk4", interpret=True)
    ref = solve(lambda tt, yy: mlp_apply(spec, w, yy), y0, t,
                method="rk4", options={"num_steps": 32})
    assert int(stats[3]) == 0
    assert int(stats[1]) == 32
    np.testing.assert_allclose(np.asarray(out).transpose(0, 2, 1),
                               np.asarray(ref.ys), rtol=0, atol=1e-5)


def test_fixed_kernel_reverse_time_sign():
    """Canonical reverse time: tau = -t increasing, sign = -1."""
    w, warr, wdims, y0 = _setup(seed=5)
    t = jnp.linspace(1.5, 0.0, 7, dtype=jnp.float32)    # decreasing
    tau = -t
    spec = MLPSpec(activation="tanh")

    out, stats = mlp_solve_fixed(warr, wdims, y0.T, tau, tau,
                                 jnp.float32(-1.0), activation="tanh",
                                 method="rk4", interpret=True)
    ref = solve(lambda tt, yy: mlp_apply(spec, w, yy), y0, t,
                method="rk4")
    assert int(stats[3]) == 0
    np.testing.assert_allclose(np.asarray(out).transpose(0, 2, 1),
                               np.asarray(ref.ys), rtol=0, atol=1e-5)


def test_fixed_kernel_packed_and_blocks_match_plain():
    """Sublane packing (D=2, B=512 -> k=4) and sequential grid blocks
    must reproduce the unpacked single-block kernel bit-for-bit-ish."""
    w, warr, wdims, y0 = _setup(seed=7, B=512)
    t = jnp.linspace(0.0, 1.0, 5, dtype=jnp.float32)

    base, s0 = mlp_solve_fixed(warr, wdims, y0.T, t, t, jnp.float32(1.0),
                               activation="tanh", method="rk4",
                               interpret=True, pack=1)
    packed, s1 = mlp_solve_fixed(warr, wdims, y0.T, t, t, jnp.float32(1.0),
                                 activation="tanh", method="rk4",
                                 interpret=True, pack="auto")
    blocked, s2 = mlp_solve_fixed(warr, wdims, y0.T, t, t, jnp.float32(1.0),
                                  activation="tanh", method="rk4",
                                  interpret=True, pack=1, n_blocks=2)
    assert int(s1[0]) == int(s0[0]) and int(s2[0]) == int(s0[0])
    np.testing.assert_allclose(np.asarray(packed), np.asarray(base),
                               rtol=0, atol=1e-6)
    np.testing.assert_allclose(np.asarray(blocked), np.asarray(base),
                               rtol=0, atol=0)


def test_fixed_kernel_invalid_times_status3():
    """Non-monotonic tau under trace -> status 3, zero tail."""
    w, warr, wdims, y0 = _setup(seed=9)
    t = jnp.asarray([0.0, 1.0, 0.5, 2.0], jnp.float32)

    out, stats = mlp_solve_fixed(warr, wdims, y0.T, t, t, jnp.float32(1.0),
                                 activation="tanh", method="rk4",
                                 interpret=True)
    assert int(stats[3]) == 3
    np.testing.assert_array_equal(np.asarray(out[1]),
                                  np.zeros_like(out[1]))
    np.testing.assert_allclose(np.asarray(out[0]), np.asarray(y0.T))


def test_odeint_fuse_fixed_methods_route_and_match():
    """odeint/solve(options={'fuse': True}) with fixed-grid methods:
    engages the fixed whole-solve kernel (no fallback warning), matches
    the generic engine, identical NFE."""
    import warnings

    rng = np.random.RandomState(13)
    W1 = jnp.asarray(rng.randn(2, 24) * 0.3, jnp.float32)
    b1 = jnp.zeros(24, jnp.float32)
    W2 = jnp.asarray(rng.randn(24, 2) * 0.3, jnp.float32)

    def f(tt, yy):
        return jnp.tanh(yy @ W1 + b1) @ W2

    y0 = jnp.asarray(rng.randn(8, 2), jnp.float32)
    t = jnp.linspace(0.0, 2.0, 9, dtype=jnp.float32)

    for method, opts in [("rk4", {}), ("euler", {"num_steps": 64}),
                         ("midpoint", {"step_size": 0.125})]:
        with warnings.catch_warnings():
            warnings.simplefilter("error")
            rf = solve(f, y0, t, method=method,
                       options={"fuse": True, **opts})
        rg = solve(f, y0, t, method=method, options=opts)
        assert int(rf.stats.nfe) == int(rg.stats.nfe), method
        np.testing.assert_allclose(np.asarray(rf.ys), np.asarray(rg.ys),
                                   rtol=0, atol=1e-5, err_msg=method)


def test_odeint_fuse_fixed_grid_constructor_falls_back():
    """Arbitrary grid_constructor callables stay on the generic engine
    (fallback warning, correct result)."""
    import warnings

    def f(tt, yy):
        return -yy

    y0 = jnp.ones((4, 2), jnp.float32)
    t = jnp.linspace(0.0, 1.0, 5, dtype=jnp.float32)
    gc = lambda func, y0_, tt: jnp.linspace(0.0, 1.0, 17)   # noqa: E731

    with warnings.catch_warnings(record=True) as wlist:
        warnings.simplefilter("always")
        rf = solve(f, y0, t, method="rk4",
                   options={"fuse": True, "grid_constructor": gc})
    assert any("falling back" in str(w.message) for w in wlist)
    rg = solve(f, y0, t, method="rk4", options={"grid_constructor": gc})
    np.testing.assert_allclose(np.asarray(rf.ys), np.asarray(rg.ys),
                               rtol=0, atol=0)


def test_solve_mlp_spec_fixed_route():
    """solve_mlp_spec(method='rk4', num_steps=...) matches the generic
    fixed-grid engine with identical NFE."""
    from tfdiffeq_tpu.fast import solve_mlp_spec

    w, warr, wdims, y0 = _setup(seed=17)
    t = jnp.linspace(0.0, 2.0, 9, dtype=jnp.float32)
    spec = MLPSpec(activation="tanh")

    rf = solve_mlp_spec(spec, w, y0, t, method="rk4", num_steps=32,
                        interpret=True)
    rg = solve(lambda tt, yy: mlp_apply(spec, w, yy), y0, t,
               method="rk4", options={"num_steps": 32})
    assert int(rf.stats.nfe) == int(rg.stats.nfe) == 129
    np.testing.assert_allclose(np.asarray(rf.ys), np.asarray(rg.ys),
                               rtol=0, atol=1e-5)


def test_plan_solve_fixed_matches_generic():
    """Arbitrary plain-jnp dynamics through the jaxpr bridge on the fixed
    kernel."""
    from tfdiffeq_tpu.ops import jaxpr_bridge as jb

    rng = np.random.RandomState(11)
    params = {"w1": jnp.asarray(rng.randn(2, 24) * 0.3, jnp.float32),
              "b1": jnp.asarray(rng.randn(24) * 0.05, jnp.float32),
              "w2": jnp.asarray(rng.randn(24, 2) * 0.3, jnp.float32)}

    def func(tt, yy):
        return jnp.tanh((yy ** 3) @ params["w1"] + params["b1"]) \
            @ params["w2"]

    B = 8
    y0 = jnp.asarray(rng.randn(B, 2), jnp.float32)
    t = jnp.linspace(0.0, 2.0, 9, dtype=jnp.float32)

    plan, consts = jb.build_plan(func, t[0], y0)
    BP = 128
    packed = tuple(jb.pack_consts(plan, consts, jnp.float32, BP))
    yT = jnp.pad(y0.T, ((0, 0), (0, BP - B)))
    f0 = jb.eval_plan_xla(plan, packed, t[0], yT)
    out, stats = plan_solve_fixed(plan, packed, yT, t, t,
                                  jnp.float32(1.0), f0, method="rk4",
                                  interpret=True)
    ref = solve(func, y0, t, method="rk4")
    assert int(stats[3]) == 0
    np.testing.assert_allclose(
        np.asarray(out[:, :, :B]).transpose(0, 2, 1),
        np.asarray(ref.ys), rtol=0, atol=1e-5)
