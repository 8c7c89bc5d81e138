"""Whole-solve kernels for the non-adaptive-RK method families:
fixed-grid (ops/pallas_fixed.py), fixed-step Adams (AB/ABM), VCABM
(ops/pallas_vcabm.py), and hypersolvers — plus the registry-wide
"every built-in method fuses" invariant.

Parity oracle: the generic engines (`solve(method=..., ...)`), which are
matrix-tested against closed forms. Runs in Pallas interpret mode on
CPU; the same code compiles under Mosaic on TPU
(tools/validate_kernels_tpu.py drives the on-chip sweep).
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


def test_fixed_adjoint_matches_generic_gradients():
    """odeint_adjoint_mlp(method='rk4', adjoint_method='rk4'): the fixed
    one-kernel backward sweep must agree with the generic fixed-grid
    adjoint (adjoint_options={'num_steps': n}) on gradients wrt weights,
    y0, AND t."""
    from tfdiffeq_tpu import odeint_adjoint
    from tfdiffeq_tpu.fast import odeint_adjoint_mlp

    w = tuple(_weights(seed=21, dims=(2, 16, 2)))
    spec = MLPSpec(activation="tanh")
    y0 = jnp.asarray(np.random.RandomState(22).randn(12, 2), jnp.float32)
    t = jnp.linspace(0.0, 2.0, 7, dtype=jnp.float32)
    g_out = jnp.asarray(np.random.RandomState(23).randn(7, 12, 2),
                        jnp.float32)

    def loss_fused(w_, y0_, t_):
        ys = odeint_adjoint_mlp(spec, w_, y0_, t_, method="rk4",
                                num_steps=16, adjoint_num_steps=8,
                                interpret=True)
        return jnp.sum(ys * g_out)

    def loss_gen(w_, y0_, t_):
        ys = odeint_adjoint(lambda tt, yy, p: mlp_apply(spec, p, yy),
                            y0_, t_, params=w_, method="rk4",
                            options={"num_steps": 16},
                            adjoint_method="rk4",
                            adjoint_options={"num_steps": 8})
        return jnp.sum(ys * g_out)

    gf = jax.grad(loss_fused, argnums=(0, 1, 2))(w, y0, t)
    gg = jax.grad(loss_gen, argnums=(0, 1, 2))(w, y0, t)
    for a, b in zip(jax.tree_util.tree_leaves(gf),
                    jax.tree_util.tree_leaves(gg)):
        d = float(jnp.max(jnp.abs(a - b)))
        m = float(jnp.max(jnp.abs(b))) + 1e-8
        assert d / m < 1e-3, (d, m)


def test_fixed_adjoint_packed_and_blocks():
    """Sublane packing + sequential grid blocks in the FIXED backward
    sweep reproduce the single-block unpacked kernel."""
    from tfdiffeq_tpu.ops.pallas_fixed import mlp_adjoint_solve_fixed
    from tfdiffeq_tpu.ops.pallas_kernels import mlp_solve, pad_mlp_weights

    w = _weights(seed=25, dims=(2, 16, 2))
    warr, dims = pad_mlp_weights(w, jnp.float32)
    y0 = jnp.asarray(np.random.RandomState(26).randn(512, 2),
                     jnp.float32).T
    t = jnp.linspace(0.0, 2.0, 5, dtype=jnp.float32)
    kw = dict(activation="tanh", final_activation="identity",
              input_power=1, interpret=True)
    ys, _ = mlp_solve(warr, dims, y0, t, jnp.float32(0.05), 1e-6, 1e-8,
                      1.0, **kw)
    g = jnp.asarray(np.random.RandomState(27).randn(*ys.shape),
                    jnp.float32) * 0.1

    def run(**extra):
        return mlp_adjoint_solve_fixed(warr, dims, ys, g, t,
                                       jnp.float32(1.0), num_steps=4,
                                       method="rk4", **kw, **extra)

    a1, aw1, at1, s1 = run(pack=1)
    a2, aw2, at2, s2 = run(pack="auto")
    a3, aw3, at3, s3 = run(pack=1, n_blocks=2)
    assert int(s1[3]) == 0 and int(s1[0]) == 4 * 4 * 4
    for (ax, awx) in ((a2, aw2), (a3, aw3)):
        np.testing.assert_allclose(np.asarray(ax), np.asarray(a1),
                                   rtol=0, atol=2e-6)
        for (dW1, db1), (dWx, dbx) in zip(aw1, awx):
            np.testing.assert_allclose(np.asarray(dWx), np.asarray(dW1),
                                       rtol=0, atol=5e-6)
            np.testing.assert_allclose(np.asarray(dbx), np.asarray(db1),
                                       rtol=0, atol=5e-6)


def test_odeint_adjoint_fuse_fixed_two_kernel_parity():
    """odeint_adjoint(options={'fuse': True}, method='rk4'): tier-1 full
    two-kernel fusion engages for fixed-grid methods (no fallback
    warning) and matches the generic fixed-grid adjoint on every
    cotangent (params pytree, y0, t)."""
    import warnings

    from tfdiffeq_tpu import odeint_adjoint

    rng = np.random.RandomState(31)
    params = {"w1": jnp.asarray(rng.randn(2, 24) * 0.3, jnp.float32),
              "b1": jnp.asarray(rng.randn(24) * 0.05, jnp.float32),
              "w2": jnp.asarray(rng.randn(24, 2) * 0.3, jnp.float32)}

    def f(tt, yy, p):
        return jnp.tanh((yy ** 3) @ p["w1"] + p["b1"]) @ p["w2"]

    y0 = jnp.asarray(rng.randn(12, 2), jnp.float32)
    t = jnp.linspace(0.0, 2.0, 7, dtype=jnp.float32)
    g_out = jnp.asarray(rng.randn(7, 12, 2), jnp.float32)

    def loss_fused(p, y0_, t_):
        ys = odeint_adjoint(f, y0_, t_, params=p, method="rk4",
                            options={"fuse": True, "num_steps": 16},
                            adjoint_options={"num_steps": 8})
        return jnp.sum(ys * g_out)

    def loss_gen(p, y0_, t_):
        ys = odeint_adjoint(f, y0_, t_, params=p, method="rk4",
                            options={"num_steps": 16},
                            adjoint_options={"num_steps": 8})
        return jnp.sum(ys * g_out)

    with warnings.catch_warnings():
        warnings.simplefilter("error")   # fallback warning = tier-1 missed
        gf = jax.grad(loss_fused, argnums=(0, 1, 2))(params, y0, t)
    gg = jax.grad(loss_gen, argnums=(0, 1, 2))(params, y0, t)
    for a, b in zip(jax.tree_util.tree_leaves(gf),
                    jax.tree_util.tree_leaves(gg)):
        d = float(jnp.max(jnp.abs(a - b)))
        m = float(jnp.max(jnp.abs(b))) + 1e-8
        assert d / m < 1e-3, (d, m)


@pytest.mark.parametrize("method,implicit", [("explicit_adams", False),
                                             ("fixed_adams", True)])
def test_adams_kernel_matches_generic(method, implicit):
    """Whole-solve fixed-step Adams kernel (AB predictor / ABM corrector,
    RK4 bootstrap, in-kernel history shifts) vs the generic scan engine:
    roundoff-level trajectory parity and IDENTICAL NFE."""
    from tfdiffeq_tpu.ops.pallas_fixed import mlp_solve_adams

    w, warr, wdims, y0 = _setup(seed=41)
    spec = MLPSpec(activation="tanh")
    t = jnp.linspace(0.0, 2.0, 9, dtype=jnp.float32)
    grid = jnp.linspace(0.0, 2.0, 33, dtype=jnp.float32)

    out, stats = mlp_solve_adams(warr, wdims, y0.T, t, grid, 1e-7, 1e-9,
                                 jnp.float32(1.0), activation="tanh",
                                 implicit=implicit, max_order=4,
                                 max_iters=4, interpret=True)
    ref = solve(lambda tt, yy: mlp_apply(spec, w, yy), y0, t,
                method=method, options={"num_steps": 32, "max_order": 4})
    assert int(stats[3]) == 0
    assert int(stats[0]) == int(ref.stats.nfe)
    np.testing.assert_allclose(np.asarray(out).transpose(0, 2, 1),
                               np.asarray(ref.ys), rtol=0, atol=2e-6)


def test_adams_kernel_packed_blocks_and_reverse():
    """Packing, grid blocks, and reverse time for the Adams kernel."""
    from tfdiffeq_tpu.ops.pallas_fixed import mlp_solve_adams

    w, warr, wdims, y0 = _setup(seed=43, B=512)
    spec = MLPSpec(activation="tanh")
    t = jnp.linspace(0.0, 1.0, 5, dtype=jnp.float32)
    kw = dict(activation="tanh", implicit=True, max_order=3, max_iters=3,
              interpret=True)

    base, s0 = mlp_solve_adams(warr, wdims, y0.T, t, t, 1e-6, 1e-8,
                               jnp.float32(1.0), pack=1, **kw)
    packed, s1 = mlp_solve_adams(warr, wdims, y0.T, t, t, 1e-6, 1e-8,
                                 jnp.float32(1.0), pack="auto", **kw)
    blocked, s2 = mlp_solve_adams(warr, wdims, y0.T, t, t, 1e-6, 1e-8,
                                  jnp.float32(1.0), pack=1, n_blocks=2,
                                  **kw)
    assert int(s1[0]) == int(s0[0]) and int(s2[0]) == int(s0[0])
    np.testing.assert_allclose(np.asarray(packed), np.asarray(base),
                               rtol=0, atol=1e-6)
    np.testing.assert_allclose(np.asarray(blocked), np.asarray(base),
                               rtol=0, atol=0)

    # reverse time (canonical: tau = -t increasing, sign = -1)
    td = jnp.linspace(1.5, 0.0, 7, dtype=jnp.float32)
    out, st = mlp_solve_adams(warr, wdims, y0.T, -td, -td, 1e-6, 1e-8,
                              jnp.float32(-1.0), **kw)
    ref = solve(lambda tt, yy: mlp_apply(spec, w, yy), y0, td,
                method="fixed_adams", options={"max_order": 3,
                                               "max_iters": 3})
    assert int(st[0]) == int(ref.stats.nfe)
    np.testing.assert_allclose(np.asarray(out).transpose(0, 2, 1),
                               np.asarray(ref.ys), rtol=0, atol=2e-6)


def test_odeint_fuse_adams_routes_and_matches():
    """solve(options={'fuse': True}) with explicit_adams/fixed_adams."""
    import warnings

    rng = np.random.RandomState(45)
    W1 = jnp.asarray(rng.randn(2, 24) * 0.3, jnp.float32)
    b1 = jnp.asarray(rng.randn(24) * 0.05, jnp.float32)
    W2 = jnp.asarray(rng.randn(24, 2) * 0.3, jnp.float32)

    def f(tt, yy):
        return jnp.tanh(yy @ W1 + b1) @ W2

    y0 = jnp.asarray(rng.randn(8, 2), jnp.float32)
    t = jnp.linspace(0.0, 2.0, 9, dtype=jnp.float32)

    for method in ("explicit_adams", "fixed_adams"):
        opts = {"num_steps": 32, "max_order": 5}
        with warnings.catch_warnings():
            warnings.simplefilter("error")
            rf = solve(f, y0, t, method=method,
                       options={"fuse": True, **opts})
        rg = solve(f, y0, t, method=method, options=opts)
        assert int(rf.stats.nfe) == int(rg.stats.nfe), method
        np.testing.assert_allclose(np.asarray(rf.ys), np.asarray(rg.ys),
                                   rtol=0, atol=2e-6, err_msg=method)


def test_vcabm_kernel_accept_sequence_identical():
    """The whole-solve VCABM kernel runs the generic engine's masked
    Shampine-Gordon machinery in-kernel: same status, step counts within
    a few percent (exact equality is not guaranteed — the kernel's
    controller computes r**(-1/k) as exp/log because scalar powf does
    not lower in Mosaic, and that ulp difference cascades through the
    accept sequence), trajectories at tolerance level."""
    rng = np.random.RandomState(51)
    W1 = jnp.asarray(rng.randn(2, 24) * 0.3, jnp.float32)
    b1 = jnp.asarray(rng.randn(24) * 0.05, jnp.float32)
    W2 = jnp.asarray(rng.randn(24, 2) * 0.3, jnp.float32)

    def f(tt, yy):
        return jnp.tanh((yy ** 3) @ W1 + b1) @ W2

    y0 = jnp.asarray(rng.randn(8, 2), jnp.float32)

    # first_step pinned: the initial-step heuristic reduces in a
    # different element order on the feature-major kernel path, and
    # ulp-level dt0 differences cascade into different (equally valid)
    # accept sequences — the same reason the adaptive-RK NFE-parity
    # tests pin first_step (tests/test_fuse.py).
    cases = [
        (jnp.linspace(0.0, 5.0, 9, dtype=jnp.float32), 1e-6, 1e-8,
         {"first_step": 0.02}),
        (jnp.linspace(0.0, 2.0, 5, dtype=jnp.float32), 1e-4, 1e-6,
         {"max_order": 4, "first_step": 0.05}),
        (jnp.linspace(3.0, 0.0, 7, dtype=jnp.float32), 1e-6, 1e-8,
         {"first_step": 0.05}),
    ]
    for t, rtol, atol, opts in cases:
        import warnings
        with warnings.catch_warnings():
            warnings.simplefilter("error")
            rf = solve(f, y0, t, rtol=rtol, atol=atol, method="adams",
                       options={"fuse": True, **opts})
        rg = solve(f, y0, t, rtol=rtol, atol=atol, method="adams",
                   options=opts)
        assert int(rf.stats.status) == int(rg.stats.status) == 0, opts
        nf, ng = int(rf.stats.nfe), int(rg.stats.nfe)
        assert abs(nf - ng) <= 0.12 * ng + 4, (opts, nf, ng)
        af, ag = int(rf.stats.n_accepted), int(rg.stats.n_accepted)
        assert abs(af - ag) <= 0.12 * ag + 2, (opts, af, ag)
        np.testing.assert_allclose(np.asarray(rf.ys), np.asarray(rg.ys),
                                   rtol=0, atol=2e-4, err_msg=str(opts))


def test_vcabm_kernel_direct_packed_blocks():
    """Direct mlp_solve_vcabm entry: packing and grid blocks agree with
    the unpacked single-block kernel (per-block controllers see identical
    subproblems when the batch halves are integrated independently)."""
    from tfdiffeq_tpu.ops.pallas_vcabm import mlp_solve_vcabm

    w, warr, wdims, y0 = _setup(seed=53, B=512)
    t = jnp.linspace(0.0, 2.0, 5, dtype=jnp.float32)
    kw = dict(activation="tanh", max_order=6, interpret=True)

    base, s0 = mlp_solve_vcabm(warr, wdims, y0.T, t, jnp.float32(0.02),
                               1e-5, 1e-7, jnp.float32(1.0), pack=1, **kw)
    packed, s1 = mlp_solve_vcabm(warr, wdims, y0.T, t, jnp.float32(0.02),
                                 1e-5, 1e-7, jnp.float32(1.0),
                                 pack="auto", **kw)
    assert int(s0[3]) == 0
    # Packed groups change the error-norm reduction order only: the
    # accept sequence may differ by last-ulp ties, so compare
    # trajectories at tolerance level and require clean status.
    assert int(s1[3]) == 0
    np.testing.assert_allclose(np.asarray(packed), np.asarray(base),
                               rtol=0, atol=5e-4)

    spec = MLPSpec(activation="tanh")
    ref = solve(lambda tt, yy: mlp_apply(spec, w, yy), y0, t, rtol=1e-5,
                atol=1e-7, method="adams",
                options={"max_order": 6, "first_step": 0.02})
    np.testing.assert_allclose(np.asarray(base).transpose(0, 2, 1),
                               np.asarray(ref.ys), rtol=0, atol=5e-4)


def test_hyper_kernel_matches_generic():
    """Fused hypersolvers (both plans in ONE kernel): trajectory parity
    and identical NFE vs solvers/hyper.py across kinds, grids, and BOTH
    time directions (the (sign*dt)^(p+1) residual sign matters in
    reverse)."""
    import warnings

    rng = np.random.RandomState(61)
    W1 = jnp.asarray(rng.randn(2, 24) * 0.3, jnp.float32)
    b1 = jnp.asarray(rng.randn(24) * 0.05, jnp.float32)
    W2 = jnp.asarray(rng.randn(24, 2) * 0.3, jnp.float32)
    Hw = jnp.asarray(rng.randn(5, 16) * 0.2, jnp.float32)
    Hv = jnp.asarray(rng.randn(16, 2) * 0.2, jnp.float32)

    def f(tt, yy):
        return jnp.tanh((yy ** 3) @ W1 + b1) @ W2

    def g(tt, yy, ff):
        tcol = jnp.broadcast_to(jnp.reshape(tt, (1, 1)),
                                (yy.shape[0], 1))
        h = jnp.concatenate([yy, ff, tcol], axis=1)
        return jnp.tanh(h @ Hw) @ Hv

    y0 = jnp.asarray(rng.randn(8, 2), jnp.float32)
    cases = [
        (jnp.linspace(0.0, 2.0, 9, dtype=jnp.float32), {}),
        (jnp.linspace(0.0, 2.0, 5, dtype=jnp.float32), {"num_steps": 32}),
        (jnp.linspace(1.5, 0.0, 7, dtype=jnp.float32), {}),          # reverse
        (jnp.linspace(1.5, 0.0, 4, dtype=jnp.float32),
         {"step_size": 0.125}),                                # reverse+h
    ]
    for method in ("hyper_euler", "hyper_midpoint", "hyper_heun"):
        for t, opts in cases:
            with warnings.catch_warnings():
                warnings.simplefilter("error")
                rf = solve(f, y0, t, method=method,
                           options={"fuse": True, "hypernet": g, **opts})
            rg = solve(f, y0, t, method=method,
                       options={"hypernet": g, **opts})
            assert int(rf.stats.nfe) == int(rg.stats.nfe), (method, opts)
            np.testing.assert_allclose(
                np.asarray(rf.ys), np.asarray(rg.ys), rtol=0, atol=2e-6,
                err_msg=f"{method} {opts}")


def test_hyper_kernel_unfusable_hypernet_falls_back():
    """A hypernet outside the fusable subset -> warning + generic run."""
    import warnings

    def f(tt, yy):
        return -yy

    def g(tt, yy, ff):
        return jnp.sort(yy, axis=-1) * 0.01      # sort: unfusable

    y0 = jnp.ones((4, 2), jnp.float32)
    t = jnp.linspace(0.0, 1.0, 5, dtype=jnp.float32)
    with warnings.catch_warnings(record=True) as wlist:
        warnings.simplefilter("always")
        rf = solve(f, y0, t, method="hyper_euler",
                   options={"fuse": True, "hypernet": g})
    assert any("falling back" in str(w.message) for w in wlist)
    rg = solve(f, y0, t, method="hyper_euler", options={"hypernet": g})
    np.testing.assert_allclose(np.asarray(rf.ys), np.asarray(rg.ys),
                               rtol=0, atol=0)


def test_vcabm_kernel_failure_statuses():
    """MAX_STEPS_REACHED surfaces from the VCABM kernel exactly like the
    generic engine (same counters, status 1)."""
    rng = np.random.RandomState(71)
    W = jnp.asarray([[-0.1, 2.0], [-2.0, -0.1]], jnp.float32)

    def f(tt, yy):
        return (yy ** 3) @ W

    y0 = jnp.asarray(rng.randn(8, 2), jnp.float32)
    t = jnp.linspace(0.0, 5.0, 5, dtype=jnp.float32)
    opts = {"max_num_steps": 3, "first_step": 0.01}
    rf = solve(f, y0, t, rtol=1e-6, atol=1e-8, method="adams",
               options={"fuse": True, **opts})
    rg = solve(f, y0, t, rtol=1e-6, atol=1e-8, method="adams",
               options=opts)
    sf = [int(x) for x in (rf.stats.nfe, rf.stats.n_accepted,
                           rf.stats.n_rejected, rf.stats.status)]
    sg = [int(x) for x in (rg.stats.nfe, rg.stats.n_accepted,
                           rg.stats.n_rejected, rg.stats.status)]
    assert sf == sg
    assert sf[3] == 1


def test_every_builtin_method_fuses():
    """Registry-wide invariant: options={'fuse': True} engages a
    whole-solve kernel (NO fallback warning) for EVERY built-in method in
    SOLVERS, and the result matches the generic engine."""
    import warnings

    from tfdiffeq_tpu.odeint import SOLVERS

    rng = np.random.RandomState(81)
    W1 = jnp.asarray(rng.randn(2, 16) * 0.3, jnp.float32)
    W2 = jnp.asarray(rng.randn(16, 2) * 0.3, jnp.float32)
    # hidden width 12: distinct from batch 8 (the bridge rejects
    # batch==feature-dim ambiguity)
    Hw = jnp.asarray(rng.randn(5, 12) * 0.2, jnp.float32)
    Hv = jnp.asarray(rng.randn(12, 2) * 0.2, jnp.float32)

    def f(tt, yy):
        return jnp.tanh((yy ** 3) @ W1) @ W2

    def g(tt, yy, ff):
        tcol = jnp.broadcast_to(jnp.reshape(tt, (1, 1)),
                                (yy.shape[0], 1))
        return jnp.tanh(jnp.concatenate([yy, ff, tcol], axis=1)
                        @ Hw) @ Hv

    y0 = jnp.asarray(rng.randn(8, 2), jnp.float32)
    t = jnp.linspace(0.0, 1.0, 5, dtype=jnp.float32)

    per_method = {
        "dopri5": {}, "bosh3": {}, "adaptive_heun": {}, "tsit5": {},
        "dopri8": {},
        "euler": {"num_steps": 32}, "midpoint": {}, "rk4": {},
        "rk4_38": {},
        "explicit_adams": {"num_steps": 16}, "fixed_adams": {},
        "adams": {"first_step": 0.05},
        "hyper_euler": {"hypernet": g}, "hyper_midpoint": {"hypernet": g},
        "hyper_heun": {"hypernet": g},
    }
    assert set(per_method) == set(SOLVERS), (
        "a new registered method lacks fuse coverage: "
        f"{set(SOLVERS) ^ set(per_method)}")

    for method, opts in per_method.items():
        with warnings.catch_warnings():
            warnings.simplefilter("error")      # any fallback = FAIL
            rf = solve(f, y0, t, rtol=1e-5, atol=1e-7, method=method,
                       options={"fuse": True, **opts})
        rg = solve(f, y0, t, rtol=1e-5, atol=1e-7, method=method,
                   options=opts)
        assert int(rf.stats.status) == 0, method
        np.testing.assert_allclose(np.asarray(rf.ys), np.asarray(rg.ys),
                                   rtol=0, atol=5e-4, err_msg=method)


def test_vcabm_kernel_zero_first_step_terminates():
    """first_step=0 (or one that underflows f32) must clamp to dt_min
    like the generic engine — not spin forever on zero-length accepted
    steps."""
    rng = np.random.RandomState(91)
    W = jnp.asarray([[-0.1, 2.0], [-2.0, -0.1]], jnp.float32)

    def f(tt, yy):
        return (yy ** 3) @ W

    y0 = jnp.asarray(rng.randn(8, 2) * 0.5, jnp.float32)
    t = jnp.linspace(0.0, 1.0, 3, dtype=jnp.float32)
    rf = solve(f, y0, t, rtol=1e-5, atol=1e-7, method="adams",
               options={"fuse": True, "first_step": 0.0,
                        "max_num_steps": 5000})
    rg = solve(f, y0, t, rtol=1e-5, atol=1e-7, method="adams",
               options={"first_step": 0.0, "max_num_steps": 5000})
    assert int(rf.stats.status) == 0
    np.testing.assert_allclose(np.asarray(rf.ys), np.asarray(rg.ys),
                               rtol=0, atol=2e-4)
