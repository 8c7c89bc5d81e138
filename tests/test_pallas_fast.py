"""Fused Pallas fast-path tests (interpret mode on CPU).

Validates the single-step kernel and the whole-solve kernel against the
generic adaptive engine (ops/pallas_kernels.py, fast.py). On real TPU the
same code runs compiled; the drive recipe in .claude/skills/verify covers
that path.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tfdiffeq_tpu import solve
from tfdiffeq_tpu.fast import solve_mlp, solve_mlp_stepwise
from tfdiffeq_tpu.ops.pallas_kernels import dopri5_mlp_step, mlp_f
from tfdiffeq_tpu.ops.rk import runge_kutta_step
from tfdiffeq_tpu.ops.tableaus import DOPRI5


def _setup(B=96, H=50, D=2, dtype=jnp.float32, seed=0):
    rng = np.random.RandomState(seed)
    params = {
        "w1": jnp.asarray(rng.randn(D, H) * 0.1, dtype),
        "b1": jnp.asarray(rng.randn(H) * 0.05, dtype),
        "w2": jnp.asarray(rng.randn(H, D) * 0.1, dtype),
        "b2": jnp.asarray(rng.randn(D) * 0.05, dtype),
    }
    y0 = jnp.asarray(rng.randn(B, D) * 1.5, dtype)
    return params, y0


def _dyn(params):
    def f(tt, yy):
        h = jnp.tanh((yy ** 3) @ params["w1"] + params["b1"])
        return h @ params["w2"] + params["b2"]
    return f


def test_step_kernel_matches_generic_f64():
    params, y0 = _setup(dtype=jnp.float64)
    yT = y0.T
    f0 = mlp_f(params, yT)
    dt = jnp.float64(0.07)
    rtol, atol = jnp.float64(1e-6), jnp.float64(1e-8)
    y1, f1, ratio, ymid = dopri5_mlp_step(params, yT, f0, dt, rtol, atol,
                                          interpret=True)

    flatf = lambda t, yf: mlp_f(params, yf.reshape(yT.shape)).ravel()
    res = runge_kutta_step(flatf, yT.ravel(), f0.ravel(), jnp.float64(0.0),
                           dt, DOPRI5)
    np.testing.assert_allclose(np.asarray(y1.ravel()), np.asarray(res.y1),
                               rtol=1e-12, atol=1e-14)
    np.testing.assert_allclose(np.asarray(f1.ravel()), np.asarray(res.f1),
                               rtol=1e-12, atol=1e-14)
    scale = atol + rtol * jnp.maximum(jnp.abs(yT.ravel()), jnp.abs(res.y1))
    ref_ratio = jnp.sqrt(jnp.mean((res.y_err / scale) ** 2))
    np.testing.assert_allclose(float(ratio), float(ref_ratio), rtol=1e-6)


@pytest.mark.parametrize("path", ["whole", "stepwise"])
def test_fused_solve_matches_generic(path):
    params, y0 = _setup()
    t = jnp.linspace(0.0, 5.0, 12, dtype=jnp.float32)
    fn = solve_mlp if path == "whole" else solve_mlp_stepwise
    r = fn(params, y0, t, rtol=1e-6, atol=1e-8, interpret=True)
    r2 = solve(_dyn(params), y0, t, rtol=1e-6, atol=1e-8, method="dopri5",
               options={"loop": "while"})
    assert int(r.stats.status) == 0
    # f32 summation-order differences may shift a borderline accept; the
    # trajectories must still agree to f32 solve accuracy.
    np.testing.assert_allclose(np.asarray(r.ys), np.asarray(r2.ys),
                               rtol=1e-3, atol=2e-4)


def test_fused_solve_under_jit_with_batching():
    params, y0 = _setup(B=64)
    t = jnp.linspace(0.0, 2.0, 6, dtype=jnp.float32)

    @jax.jit
    def go(y0):
        r = solve_mlp(params, y0, t, rtol=1e-5, atol=1e-7, interpret=True)
        return r.ys, r.stats.nfe

    ys, nfe = go(y0)
    assert ys.shape == (6, 64, 2)
    assert int(nfe) > 0


def test_fused_solve_max_steps_status():
    params, y0 = _setup(B=32)
    t = jnp.linspace(0.0, 50.0, 4, dtype=jnp.float32)
    r = solve_mlp(params, y0, t, rtol=1e-7, atol=1e-9, interpret=True,
                  max_num_steps=3, first_step=0.01)
    assert int(r.stats.status) == 1          # MAX_STEPS_REACHED


def test_fused_solve_input_validation():
    params, y0 = _setup()
    with pytest.raises(ValueError, match="batch, dim"):
        solve_mlp(params, y0[0], jnp.asarray([0.0, 1.0]))
    with pytest.raises(ValueError, match="monotonic"):
        solve_mlp(params, y0, jnp.asarray([0.0, 1.0, 0.5]))


def test_fused_solve_decreasing_t():
    """Decreasing t canonicalizes (tau = -t, sign = -1) like the generic
    engine instead of erroring."""
    from tfdiffeq_tpu import solve
    params, y0 = _setup(B=16)
    t = jnp.linspace(1.0, 0.0, 5, dtype=jnp.float32)
    r = solve_mlp(params, y0, t, rtol=1e-6, atol=1e-8, interpret=True)
    assert int(r.stats.status) == 0

    def dyn(tt, yy):
        return jnp.tanh((yy ** 3) @ params["w1"] + params["b1"]) \
            @ params["w2"] + params["b2"]

    ref = solve(dyn, y0, t, rtol=1e-6, atol=1e-8, method="dopri5",
                options={"loop": "while"})
    np.testing.assert_allclose(np.asarray(r.ys), np.asarray(ref.ys),
                               atol=5e-4, rtol=1e-3)


def test_fused_solve_invalid_times_under_jit():
    """Traced t bypasses eager validation; the kernel must report
    INVALID_TIMES (3) and return a deterministic zero-filled tail."""
    params, y0 = _setup(B=16)

    @jax.jit
    def go(t):
        r = solve_mlp(params, y0, t, interpret=True)
        return r.ys, r.stats.status

    ys, status = go(jnp.asarray([0.0, 1.0, 0.5]))   # non-monotonic
    assert int(status) == 3
    np.testing.assert_array_equal(np.asarray(ys[1]), 0.0)


def test_fused_solve_early_exit_output_is_deterministic():
    params, y0 = _setup(B=16)
    t = jnp.linspace(0.0, 50.0, 6, dtype=jnp.float32)
    r = solve_mlp(params, y0, t, rtol=1e-7, atol=1e-9, interpret=True,
                  max_num_steps=2, first_step=0.01)
    assert int(r.stats.status) == 1
    # Unreached output rows are zeros, not uninitialized memory.
    np.testing.assert_array_equal(np.asarray(r.ys[-1]), 0.0)


def test_hyper_reverse_time_sign():
    """Reverse-time hypersolver correction must still cancel the truncation
    error (sign**(p+1) factor); regression for the review finding."""
    import scipy.linalg as sla
    from tfdiffeq_tpu import odeint

    A = jnp.asarray([[-0.1, 2.0], [-2.0, -0.1]], jnp.float64)
    f = lambda tt, yy: A @ yy
    t = jnp.linspace(0.0, -2.0, 21)   # decreasing
    exact = np.stack([sla.expm(np.asarray(A) * float(ti))
                      @ np.array([2.0, 0.0]) for ti in t])
    y0 = jnp.asarray([2.0, 0.0])
    g3 = lambda tt, yy, ff: (A @ (A @ (A @ yy))) / 6.0
    ys_base = odeint(f, y0, t, method="midpoint")
    ys_h = odeint(f, y0, t, method="hyper_midpoint",
                  options={"hypernet": g3})
    err_b = np.abs(np.asarray(ys_base) - exact).max()
    err_h = np.abs(np.asarray(ys_h) - exact).max()
    assert err_h < err_b, (err_h, err_b)


@pytest.mark.parametrize("method", ["bosh3", "adaptive_heun", "tsit5",
                                    "dopri8"])
@pytest.mark.slow
def test_fused_solve_other_tableaus(method):
    """The whole-solve kernel is tableau-parametrized; each method must
    match the generic engine's trajectory at the solve tolerance."""
    params, y0 = _setup(B=64)
    t = jnp.linspace(0.0, 5.0, 12, dtype=jnp.float32)
    r = solve_mlp(params, y0, t, rtol=1e-5, atol=1e-7, method=method,
                  interpret=True, first_step=0.01)
    r2 = solve(_dyn(params), y0, t, rtol=1e-5, atol=1e-7, method=method,
               options={"loop": "while", "first_step": 0.01})
    assert int(r.stats.status) == 0
    np.testing.assert_allclose(np.asarray(r.ys), np.asarray(r2.ys),
                               rtol=2e-2, atol=5e-3)


def test_vmem_model_grids_the_onchip_oom_config():
    """Regression: B=131072/T=8/D=2 landed EXACTLY on the 12 MB budget
    under the old 1-trajectory-buffer model, ran single-block, and
    scoped-VMEM-OOMed on-chip at 18.68M/16M (the output window is
    double-buffered even without a grid). The model must (a) budget two
    trajectory buffers, (b) account for sublane-padded packed rows, and
    (c) push this config into >= 2 grid blocks."""
    from tfdiffeq_tpu.fast import (_VMEM_BUDGET, _fused_vmem_bytes,
                                   _grid_block_size)
    assert _fused_vmem_bytes(8, 2, 131072, 2) > _VMEM_BUDGET
    b_blk = _grid_block_size(8, 2, 2)
    assert b_blk is not None and -(-131072 // b_blk) >= 2
    # Sublane padding: D=5 packs at k=1 and allocates 8 rows, not 5.
    assert _fused_vmem_bytes(8, 5, 1024, 1) == _fused_vmem_bytes(
        8, 8, 1024, 1)
    # The headline config (T=64, D=2, B=4096) must stay single-block.
    assert _fused_vmem_bytes(64, 2, 4096, 2) <= _VMEM_BUDGET
