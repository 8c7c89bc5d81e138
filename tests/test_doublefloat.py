"""Double-float engine (ops/doublefloat.py): the TPU-native cast_double.

North-star contract (BASELINE.json): dopri5 batched-spiral trajectory
within 1e-6 of the f64 reference — using ONLY f32 arithmetic (the engine is
what runs on the chip; these tests drive the identical f32 program on CPU,
where a true f64 reference exists in-process).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tfdiffeq_tpu import odeint_df, solve, solve_df
from tfdiffeq_tpu.ops.doublefloat import (df_add, df_mul_f, two_prod,
                                          two_sum)

A32 = jnp.asarray([[-0.1, 2.0], [-2.0, -0.1]], jnp.float32)
A64 = A32.astype(jnp.float64)
Y32 = jnp.asarray(np.random.RandomState(1).randn(16, 2) * 1.5, jnp.float32)
T32 = jnp.linspace(0.0, 25.0, 32, dtype=jnp.float32)


def f32dyn(t, y):
    return jnp.dot(y ** 3, A32, precision=jax.lax.Precision.HIGHEST)


def f64dyn(t, y):
    return (y ** 3) @ A64


def _f64_reference():
    return solve(f64dyn, Y32.astype(jnp.float64), T32.astype(jnp.float64),
                 rtol=1e-12, atol=1e-14, options={"loop": "while"}).ys


def test_error_free_transforms():
    rng = np.random.RandomState(0)
    a = jnp.asarray(rng.randn(64).astype(np.float32) * 100)
    b = jnp.asarray(rng.randn(64).astype(np.float32) * 1e-3)
    s, e = two_sum(a, b)
    exact = a.astype(jnp.float64) + b.astype(jnp.float64)
    np.testing.assert_array_equal(
        np.asarray(s.astype(jnp.float64) + e.astype(jnp.float64)),
        np.asarray(exact))
    p, e = two_prod(a, b)
    exact = a.astype(jnp.float64) * b.astype(jnp.float64)
    np.testing.assert_array_equal(
        np.asarray(p.astype(jnp.float64) + e.astype(jnp.float64)),
        np.asarray(exact))


def test_df_arithmetic_accuracy():
    # summing 1 + k*eps/2 many times: plain f32 stalls, df tracks exactly
    x = (jnp.float32(1.0), jnp.float32(0.0))
    inc = jnp.float32(3e-8)
    for _ in range(100):
        x = df_add(x, (inc, jnp.float32(0.0)))
    got = float(x[0]) + float(x[1])
    assert abs(got - (1.0 + 100 * 3e-8)) < 1e-12
    y = df_mul_f((jnp.float32(1.0), jnp.float32(1e-8)), jnp.float32(3.0))
    assert abs((float(y[0]) + float(y[1])) - 3.00000003) < 1e-12


@pytest.mark.slow
def test_df_breaks_the_f32_floor():
    """Error scales DOWN with rtol (plain f32 floors at ~1e-5 on this
    config); rtol 1e-10 meets the 1e-6 north-star bound."""
    ref = _f64_reference()
    errs = {}
    for rtol, atol in ((1e-8, 1e-10), (1e-10, 1e-12)):
        r = solve_df(f32dyn, Y32, T32, rtol=rtol, atol=atol)
        assert int(r.stats.status) == 0
        errs[rtol] = float(jnp.max(jnp.abs(
            r.ys.astype(jnp.float64) - ref)))
    assert errs[1e-10] < errs[1e-8]
    assert errs[1e-10] <= 1e-6, errs


def test_df_matches_f64_short_span():
    """Cheap CI-tier check: span 5, rtol 1e-9 -> well under 1e-6."""
    t = jnp.linspace(0.0, 5.0, 9, dtype=jnp.float32)
    ref = solve(f64dyn, Y32.astype(jnp.float64), t.astype(jnp.float64),
                rtol=1e-12, atol=1e-14, options={"loop": "while"}).ys
    r = solve_df(f32dyn, Y32, t, rtol=1e-9, atol=1e-11)
    assert int(r.stats.status) == 0
    err = float(jnp.max(jnp.abs(r.ys.astype(jnp.float64) - ref)))
    assert err <= 1e-6, err


def test_df_reverse_time_and_pytree():
    t = jnp.linspace(2.0, 0.0, 5, dtype=jnp.float32)

    def f(tt, y):
        return {"a": -y["a"], "b": 0.5 * y["b"]}

    y0 = {"a": jnp.ones(3, jnp.float32), "b": jnp.ones(2, jnp.float32)}
    ys = odeint_df(f, y0, t, rtol=1e-9, atol=1e-11)
    ref = solve(f, y0, t, rtol=1e-9, atol=1e-11,
                options={"loop": "while"})
    for k in ("a", "b"):
        np.testing.assert_allclose(np.asarray(ys[k]),
                                   np.asarray(ref.ys[k]), rtol=1e-5)


def test_df_failure_status():
    r = solve_df(f32dyn, Y32, T32, rtol=1e-8, atol=1e-10,
                 max_num_steps=5)
    assert int(r.stats.status) == 1
    with pytest.raises(RuntimeError, match="MAX_STEPS"):
        odeint_df(f32dyn, Y32, T32,
                  options={"max_num_steps": 5})


def test_df_under_jit():
    t = jnp.linspace(0.0, 1.0, 3, dtype=jnp.float32)

    @jax.jit
    def run(y):
        return solve_df(f32dyn, y, t, rtol=1e-9, atol=1e-11).ys

    out = run(Y32)
    ref = solve(f64dyn, Y32.astype(jnp.float64), t.astype(jnp.float64),
                rtol=1e-12, atol=1e-14, options={"loop": "while"}).ys
    assert float(jnp.max(jnp.abs(out.astype(jnp.float64) - ref))) < 1e-6


# ---------------------------------------------------------------------------
# df continuous adjoint (round-4: 1e-6-grade TRAINING on f32-only hardware)
# ---------------------------------------------------------------------------

def _mlp_setup():
    rng = np.random.RandomState(0)
    p = {"w1": jnp.asarray(rng.randn(2, 16) * 0.3, jnp.float32),
         "b1": jnp.asarray(rng.randn(16) * 0.05, jnp.float32),
         "w2": jnp.asarray(rng.randn(16, 2) * 0.3, jnp.float32)}
    y0 = jnp.asarray(rng.randn(8, 2), jnp.float32)
    t = jnp.linspace(0.0, 2.0, 5, dtype=jnp.float32)
    g_out = jnp.asarray(rng.randn(5, 8, 2), jnp.float32)

    def dyn(tt, yy, pp):
        return jnp.tanh((yy ** 3) @ pp["w1"] + pp["b1"]) @ pp["w2"]

    return p, y0, t, g_out, dyn


def test_df_adjoint_matches_f64_oracle():
    """Every cotangent (weights, y0, t) of the df adjoint matches the f64
    generic adjoint to ~1e-6 relative — f64-grade training gradients from
    f32 arithmetic (the north-star bound extended to TRAINING)."""
    from tfdiffeq_tpu import odeint_adjoint
    from tfdiffeq_tpu.ops.doublefloat import odeint_adjoint_df

    p, y0, t, g_out, dyn = _mlp_setup()

    def loss_df(pp, yy, tt):
        ys = odeint_adjoint_df(dyn, yy, tt, params=pp,
                               rtol=1e-9, atol=1e-11)
        return jnp.sum(ys * g_out)

    gd = jax.grad(loss_df, argnums=(0, 1, 2))(p, y0, t)

    p64 = jax.tree_util.tree_map(lambda x: x.astype(jnp.float64), p)

    def loss64(pp, yy, tt):
        ys = odeint_adjoint(dyn, yy, tt, params=pp,
                            rtol=1e-11, atol=1e-13)
        return jnp.sum(ys * g_out.astype(jnp.float64))

    g64 = jax.grad(loss64, argnums=(0, 1, 2))(
        p64, y0.astype(jnp.float64), t.astype(jnp.float64))

    for a, b in zip(jax.tree_util.tree_leaves(gd),
                    jax.tree_util.tree_leaves(g64)):
        d = float(jnp.max(jnp.abs(a.astype(jnp.float64) - b)))
        m = float(jnp.max(jnp.abs(b))) + 1e-12
        assert d / m < 2e-6, (a.shape, d / m)


def test_df_adjoint_trains():
    """One SGD step through the df adjoint reduces the loss (end-to-end
    training viability, pytree params)."""
    from tfdiffeq_tpu.ops.doublefloat import odeint_adjoint_df

    p, y0, t, _, dyn = _mlp_setup()
    target = -y0

    def loss(pp):
        ys = odeint_adjoint_df(dyn, y0, t, params=pp,
                               rtol=1e-8, atol=1e-10)
        return jnp.mean((ys[-1] - target) ** 2)

    l0, g = jax.value_and_grad(loss)(p)
    p1 = jax.tree_util.tree_map(lambda a, b: a - 0.1 * b, p, g)
    l1 = loss(p1)
    assert float(l1) < float(l0)
    assert all(bool(jnp.all(jnp.isfinite(v)))
               for v in jax.tree_util.tree_leaves(g))


def test_df_adjoint_no_params_and_failure_poison():
    from tfdiffeq_tpu.ops.doublefloat import odeint_adjoint_df

    _, y0, t, _, _ = _mlp_setup()

    def loss(yy):
        ys = odeint_adjoint_df(lambda tt, zz: -zz, yy, t,
                               rtol=1e-9, atol=1e-11)
        return jnp.sum(ys[-1])

    g = jax.grad(loss)(y0)
    ref = jnp.exp(-(t[-1] - t[0]))
    assert float(jnp.max(jnp.abs(g - ref))) < 1e-6

    # Forward failure (max_num_steps) must poison gradients, not return
    # finite-but-wrong ones.
    def loss_bad(yy):
        ys = odeint_adjoint_df(lambda tt, zz: -zz * (1 + zz * zz), yy, t,
                               rtol=1e-12, atol=1e-14, max_num_steps=3)
        return jnp.sum(ys[-1])

    g_bad = jax.jit(jax.grad(loss_bad))(y0)
    assert bool(jnp.all(jnp.isnan(g_bad)))
