"""Multi-device sharding and compile-cache tests (8 virtual CPU devices).

The reference is single-device (SURVEY.md §2 "no parallelism strategies");
these tests cover the TPU-native scale-out story: batch-axis data
parallelism via jax.sharding + jit, and the jit-retrace discipline
(SURVEY.md §7 hard part #5).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from tfdiffeq_tpu import odeint, solve
from tfdiffeq_tpu.parallel.sharding import batch_sharding, make_mesh


def _f(t, y):
    return -0.5 * y


def test_data_parallel_solve_matches_single_device():
    assert jax.device_count() >= 8, "conftest must set 8 host devices"
    mesh = make_mesh((8,), ("data",))
    y0 = jnp.arange(64.0 * 3).reshape(64, 3) / 17.0
    t = jnp.linspace(0.0, 1.0, 5)

    ref = odeint(_f, y0, t, rtol=1e-8, atol=1e-10)

    y0_sh = jax.device_put(y0, batch_sharding(mesh, y0.ndim))

    @jax.jit
    def go(y0):
        return odeint(_f, y0, t, rtol=1e-8, atol=1e-10)

    out = go(y0_sh)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-10, atol=1e-12)


def test_sharded_training_step_psum_grads():
    mesh = make_mesh((8,), ("data",))
    B, D = 32, 2
    rng = np.random.RandomState(0)
    W = jnp.asarray(rng.randn(D, D) * 0.1)
    y0 = jnp.asarray(rng.randn(B, D))
    target = -y0
    t = jnp.linspace(0.0, 1.0, 3)
    data_sh = NamedSharding(mesh, P("data", None))

    def loss_fn(W, y0, target):
        ys = odeint(lambda tt, yy: yy @ W.T, y0, t, rtol=1e-4, atol=1e-6,
                    options={"max_steps": 64, "chunk_size": 8})
        return jnp.mean((ys[-1] - target) ** 2)

    g_ref = jax.grad(loss_fn)(W, y0, target)

    step = jax.jit(jax.grad(loss_fn),
                   in_shardings=(None, data_sh, data_sh))
    g = step(W, jax.device_put(y0, data_sh),
             jax.device_put(target, data_sh))
    np.testing.assert_allclose(np.asarray(g), np.asarray(g_ref), rtol=1e-8)


def test_no_retrace_on_tolerance_or_time_values():
    trace_count = [0]

    def f(t, y):
        trace_count[0] += 1
        return -y

    y0 = jnp.ones(4)

    @jax.jit
    def go(y0, t, rtol, atol):
        return odeint(f, y0, t, rtol=rtol, atol=atol,
                      options={"loop": "while"})

    go(y0, jnp.linspace(0.0, 1.0, 5), 1e-6, 1e-8)
    n_first = trace_count[0]
    assert n_first > 0
    # Different time VALUES, tolerances: same executable, no retrace.
    go(y0, jnp.linspace(0.0, 2.0, 5), 1e-7, 1e-9)
    go(y0, jnp.linspace(1.0, 0.0, 5), 1e-5, 1e-7)   # reverse time too
    assert trace_count[0] == n_first


def test_raise_on_failure_and_checkify():
    from tfdiffeq_tpu.utils.debug import (SolverFailure, checkify_solve,
                                          raise_on_failure)

    res = solve(_f, jnp.ones(2), jnp.asarray([0.0, 1.0]))
    assert raise_on_failure(res) is res

    bad = solve(lambda t, y: -y, jnp.ones(2), jnp.asarray([0.0, 50.0]),
                rtol=1e-10, atol=1e-12, method="dopri5",
                options={"max_num_steps": 2, "loop": "while"})
    with pytest.raises(SolverFailure, match="MAX_STEPS"):
        raise_on_failure(bad)

    checked = checkify_solve(
        lambda y0: solve(lambda t, y: -y, y0, jnp.asarray([0.0, 50.0]),
                         rtol=1e-10, atol=1e-12,
                         options={"max_num_steps": 2, "loop": "while"}))
    err, _ = checked(jnp.ones(2))
    with pytest.raises(Exception, match="status"):
        err.throw()


def test_shard_batch_scalar_leaves_replicated():
    from tfdiffeq_tpu.parallel.sharding import make_mesh, shard_batch

    mesh = make_mesh((8,), ("data",))
    out = shard_batch({"x": jnp.ones((8, 3)), "s": jnp.asarray(2.0)}, mesh)
    assert float(out["s"]) == 2.0


def test_make_mesh_extends_axis_names():
    from tfdiffeq_tpu.parallel.sharding import make_mesh

    m = make_mesh((8, 1, 1))
    assert m.axis_names == ("data", "model", "ax2")


def test_sharded_fused_solve():
    """Whole-solve Pallas kernel under shard_map: every batch shard runs an
    independent in-kernel adaptive solve (per-shard step control, zero
    per-step cross-chip collectives); stats aggregate across shards."""
    from tfdiffeq_tpu.fast import solve_mlp, solve_mlp_sharded
    from tfdiffeq_tpu.parallel.sharding import make_mesh

    rng = np.random.RandomState(0)
    params = {"w1": jnp.asarray(rng.randn(2, 50) * 0.1, jnp.float32),
              "b1": jnp.zeros(50, jnp.float32),
              "w2": jnp.asarray(rng.randn(50, 2) * 0.1, jnp.float32),
              "b2": jnp.zeros(2, jnp.float32)}
    y0 = jnp.asarray(rng.randn(64, 2) * 1.5, jnp.float32)
    t = jnp.linspace(0.0, 5.0, 8, dtype=jnp.float32)
    mesh = make_mesh((8,), ("data",))

    r = solve_mlp_sharded(params, y0, t, mesh, rtol=1e-5, atol=1e-7)
    r1 = solve_mlp(params, y0, t, rtol=1e-5, atol=1e-7)
    assert int(r.stats.status) == 0
    assert r.ys.shape == r1.ys.shape
    # Per-shard error norms differ from the global norm, so trajectories
    # agree only to solve tolerance.
    np.testing.assert_allclose(np.asarray(r.ys), np.asarray(r1.ys),
                               atol=5e-3)
    with pytest.raises(ValueError, match="divisible"):
        solve_mlp_sharded(params, y0[:63], t, mesh)


def test_globally_coupled_sharded_fused_matches_single_device():
    """`solve_mlp_global_sharded` psums the error norm across shards each
    attempt, so all shards share ONE step-size controller.

    Run at float64, where the claim is provable: the embedded error
    estimate has a real signal (at f32 the startup error estimate is
    cancellation NOISE — measured: 1e-5 relative dt changes re-randomize
    the ratio by 3x — so psum-vs-sequential reduction-order last-bit
    differences legitimately perturb the startup step sequence; at f64 the
    noise floor is ~1e-11 of scale and the sequences must coincide).
    Asserts the sharded solve takes the IDENTICAL accept/reject sequence
    (same NFE) as the single-device fused stepwise solve and matches its
    trajectory to reduction-order roundoff."""
    from tfdiffeq_tpu.fast import solve_mlp_global_sharded, solve_mlp_stepwise
    from tfdiffeq_tpu.parallel.sharding import make_mesh

    rng = np.random.RandomState(1)
    params = {"w1": jnp.asarray(rng.randn(2, 50) * 0.1, jnp.float64),
              "b1": jnp.zeros(50, jnp.float64),
              "w2": jnp.asarray(rng.randn(50, 2) * 0.1, jnp.float64),
              "b2": jnp.zeros(2, jnp.float64)}
    y0 = jnp.asarray(rng.randn(64, 2) * 1.5, jnp.float64)
    t = jnp.linspace(0.0, 5.0, 8, dtype=jnp.float64)
    mesh = make_mesh((8,), ("data",))

    rg = solve_mlp_global_sharded(params, y0, t, mesh, rtol=1e-5, atol=1e-7,
                                  first_step=0.01)
    r1 = solve_mlp_stepwise(params, y0, t, rtol=1e-5, atol=1e-7,
                            first_step=0.01)
    assert int(rg.stats.status) == 0
    assert int(rg.stats.nfe) == int(r1.stats.nfe)
    assert int(rg.stats.n_accepted) == int(r1.stats.n_accepted)
    assert int(rg.stats.n_rejected) == int(r1.stats.n_rejected)
    np.testing.assert_allclose(np.asarray(rg.ys), np.asarray(r1.ys),
                               atol=1e-9, rtol=1e-9)

    # f32 sanity: globally-coupled control still converges to the right
    # trajectory (startup noise may perturb the step sequence).
    p32 = jax.tree_util.tree_map(lambda x: x.astype(jnp.float32), params)
    rg32 = solve_mlp_global_sharded(p32, y0.astype(jnp.float32),
                                    t.astype(jnp.float32), mesh,
                                    rtol=1e-5, atol=1e-7, first_step=0.01)
    assert int(rg32.stats.status) == 0
    np.testing.assert_allclose(np.asarray(rg32.ys), np.asarray(r1.ys),
                               atol=5e-4)


def test_latent_ode_example_data_parallel():
    """examples/latent_ode.py --dp: full training step data-parallel over
    the 8-device CPU mesh (batch sharded, params replicated, XLA-inserted
    gradient psum)."""
    import os
    import sys
    ex = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "examples")
    if ex not in sys.path:
        sys.path.insert(0, ex)
    import latent_ode

    state = latent_ode.main([
        "--dp", "--nspiral", "8", "--ntimes", "40", "--nsample", "8",
        "--latent_dim", "3", "--nhidden", "8", "--rnn_nhidden", "8",
        "--niters", "2"])
    for leaf in jax.tree_util.tree_leaves(state.params):
        assert np.all(np.isfinite(np.asarray(leaf)))


def test_dryrun_bootstrap_guard(monkeypatch):
    """The self-bootstrap re-exec must be one-shot: a child that still sees
    too few devices fails loudly instead of forking an identical grandchild
    forever."""
    import __graft_entry__ as ge

    monkeypatch.setenv("_GRAFT_DRYRUN_BOOTSTRAPPED", "1")
    with pytest.raises(RuntimeError, match="bootstrap"):
        ge.dryrun_multichip(4096)


@pytest.mark.slow
def test_sharded_fused_conv_solve():
    """solve_conv_ode_sharded: each batch shard runs its own fused
    conv-ODE solve; per-shard results equal the per-block single-device
    solves exactly."""
    import numpy as np

    from tfdiffeq_tpu.fast import solve_conv_ode, solve_conv_ode_sharded
    from tfdiffeq_tpu.models.odenet import ODEConvFunc

    mod = ODEConvFunc(features=16, groups=8)
    x = jnp.asarray(np.random.RandomState(0).randn(8, 7, 7, 16) * 0.5,
                    jnp.float32)
    vs = mod.init(jax.random.PRNGKey(0), 0.0, x)
    t = jnp.asarray([0.0, 1.0], jnp.float32)
    mesh = make_mesh((4,), ("data",), devices=jax.devices()[:4])

    res = solve_conv_ode_sharded(vs, x, t, mesh, groups=8, rtol=1e-4,
                                 atol=1e-4, interpret=True)
    assert int(res.stats.status) == 0
    for s in range(4):
        blk = solve_conv_ode(vs, x[2 * s:2 * s + 2], t, groups=8,
                             rtol=1e-4, atol=1e-4, interpret=True)
        np.testing.assert_allclose(
            np.asarray(res.ys[:, 2 * s:2 * s + 2]), np.asarray(blk.ys),
            atol=2e-5)


def test_sharded_plan_fused_solve_and_training():
    """Plan-driven (auto-fused) solves + two-kernel training under
    shard_map: arbitrary plain-jnp dynamics, batch sharded, params
    replicated; jax.grad through the sharded wrapper psums the weight
    cotangents (DP all-reduce generated by shard_map's transpose)."""
    from tfdiffeq_tpu import odeint_adjoint
    from tfdiffeq_tpu.fast import (odeint_adjoint_fused_sharded,
                                   solve_fused, solve_fused_sharded)
    from tfdiffeq_tpu.parallel.sharding import make_mesh

    rng = np.random.RandomState(0)
    W1 = jnp.asarray(rng.randn(2, 16) * 0.3, jnp.float32)
    B1 = jnp.asarray(rng.randn(16) * 0.1, jnp.float32)
    W2 = jnp.asarray(rng.randn(16, 2) * 0.3, jnp.float32)
    y0 = jnp.asarray(rng.randn(64, 2), jnp.float32)
    t = jnp.linspace(0.0, 2.0, 5, dtype=jnp.float32)
    g = jnp.asarray(rng.randn(5, 64, 2), jnp.float32)
    mesh = make_mesh((8,), ("data",))

    def dyn(tt, yy):
        return jnp.tanh((yy ** 3) @ W1 + B1) @ W2

    # forward
    r = solve_fused_sharded(dyn, y0, t, mesh, rtol=1e-5, atol=1e-7)
    r1 = solve_fused(dyn, y0, t, rtol=1e-5, atol=1e-7)
    assert int(r.stats.status) == 0
    np.testing.assert_allclose(np.asarray(r.ys), np.asarray(r1.ys),
                               atol=5e-3)
    with pytest.raises(ValueError, match="divisible"):
        solve_fused_sharded(dyn, y0[:63], t, mesh)

    # training: grads vs the unsharded generic adjoint
    def dynp(tt, yy, p):
        return jnp.tanh((yy ** 3) @ p[0] + p[1]) @ p[2]

    params = (W1, B1, W2)

    def loss_sh(p, y):
        ys = odeint_adjoint_fused_sharded(dynp, y, t, mesh, params=p,
                                          rtol=1e-6, atol=1e-8)
        return jnp.sum(ys * g)

    def loss_ref(p, y):
        ys = odeint_adjoint(dynp, y, t, params=p, rtol=1e-6, atol=1e-8)
        return jnp.sum(ys * g)

    gf = jax.grad(loss_sh, argnums=(0, 1))(params, y0)
    gg = jax.grad(loss_ref, argnums=(0, 1))(params, y0)
    for a, b in zip(jax.tree_util.tree_leaves(gf),
                    jax.tree_util.tree_leaves(gg)):
        d = float(jnp.max(jnp.abs(a - b)))
        m = float(jnp.max(jnp.abs(b))) + 1e-12
        # per-shard backward step control vs global: tolerance-level match
        assert d / m < 5e-3, (d, m)

    with pytest.raises(ValueError, match="unsupported"):
        odeint_adjoint_fused_sharded(dynp, y0, t, mesh, params=params,
                                     return_stats=True)


def test_sharded_fixed_and_adams_solves():
    """Fixed-grid / Adams / VCABM methods through solve_fused_sharded:
    batch-sharded whole-solve kernels match the unsharded kernel (fixed
    sequences are deterministic, so parity is roundoff-level)."""
    from tfdiffeq_tpu.fast import solve_fused, solve_fused_sharded
    from tfdiffeq_tpu.parallel.sharding import make_mesh

    rng = np.random.RandomState(7)
    W1 = jnp.asarray(rng.randn(2, 16) * 0.3, jnp.float32)
    W2 = jnp.asarray(rng.randn(16, 2) * 0.3, jnp.float32)
    y0 = jnp.asarray(rng.randn(64, 2), jnp.float32)
    t = jnp.linspace(0.0, 2.0, 5, dtype=jnp.float32)
    mesh = make_mesh((8,), ("data",))

    def dyn(tt, yy):
        return jnp.tanh((yy ** 3) @ W1) @ W2

    cases = [
        dict(method="rk4", num_steps=32),
        dict(method="fixed_adams", num_steps=32, max_order=4),
        dict(method="adams", rtol=1e-5, atol=1e-7, first_step=0.05),
    ]
    for kw in cases:
        r = solve_fused_sharded(dyn, y0, t, mesh, **kw)
        r1 = solve_fused(dyn, y0, t, **kw)
        assert int(r.stats.status) == 0, kw
        np.testing.assert_allclose(np.asarray(r.ys), np.asarray(r1.ys),
                                   atol=1e-3, err_msg=str(kw))
        if kw["method"] != "adams":
            # deterministic step count per shard: 8x the per-solve NFE
            assert int(r.stats.nfe) == 8 * int(r1.stats.nfe), kw
