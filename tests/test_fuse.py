"""jaxpr -> Pallas auto-fusion bridge (ops/jaxpr_bridge.py).

Round-2 verdict item 1: arbitrary plain-jnp dynamics must run the fused
whole-solve kernel via `options={'fuse': True}` with clean fallback.
Parity is checked against the generic while-loop engine on the SAME f32
arithmetic; matching NFE counts prove the step sequences are identical
(same controller decisions), so differences are pure roundoff.

All tests run the kernel in Pallas interpret mode (CPU).
"""

import warnings

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tfdiffeq_tpu import odeint, odeint_adjoint, solve
from tfdiffeq_tpu.fast import solve_fused
from tfdiffeq_tpu.ops.jaxpr_bridge import FusionError, build_plan

A = jnp.asarray([[-0.1, 2.0], [-2.0, -0.1]], jnp.float32)
_rng = np.random.RandomState(1)
W1 = jnp.asarray(_rng.randn(2, 16) * 0.3, jnp.float32)
B1 = jnp.asarray(_rng.randn(16) * 0.1, jnp.float32)
W2 = jnp.asarray(_rng.randn(16, 2) * 0.3, jnp.float32)
W1C = jnp.asarray(_rng.randn(3, 16) * 0.3, jnp.float32)
WM1 = jnp.asarray(_rng.randn(2, 64) * 0.2, jnp.float32)
WM2 = jnp.asarray(_rng.randn(64, 2) * 0.2, jnp.float32)

Y0 = jnp.asarray(np.random.RandomState(0).randn(8, 2) * 1.5, jnp.float32)
T = jnp.linspace(0.0, 5.0, 7, dtype=jnp.float32)


def spiral(t, y):
    return (y ** 3) @ A


def mlp(t, y):
    return jnp.tanh(y @ W1 + B1) @ W2


def timedep(t, y):
    return jnp.sin(t) * y - 0.3 * y ** 3 + 0.1


def concat_t(t, y):
    tt = jnp.broadcast_to(t, (y.shape[0], 1)).astype(y.dtype)
    return jnp.tanh(jnp.concatenate([y, tt], axis=-1) @ W1C) @ W2


def gated(t, y):
    return jnp.where(y > 0, -0.5 * y, -0.1 * y)


def gelu_exact(t, y):
    # erf lowers via the in-plan A&S approximation (1.5e-7 abs, below f32
    # resolution) — NFE equality vs the generic engine is not asserted for
    # this one (same carve-out as sigmoid_mxu's reduction-order ulps).
    return jax.nn.gelu(y @ W1 + B1, approximate=False) @ W2


def sigmoid_mxu(t, y):
    # 2->64 layer crosses the auto-MXU threshold; sigmoid exercises
    # custom_jvp inlining.
    return jax.nn.sigmoid(y @ WM1) @ WM2 - 0.2 * y


DYNAMICS = {"spiral": spiral, "mlp": mlp, "timedep": timedep,
            "concat_t": concat_t, "gated": gated,
            "sigmoid_mxu": sigmoid_mxu, "gelu_exact": gelu_exact}


@pytest.mark.parametrize("name", sorted(DYNAMICS))
def test_fused_matches_generic(name):
    f = DYNAMICS[name]
    # first_step pinned: the auto-dt0 heuristic reduces over a different
    # ravel order in the two paths, and its f32 startup estimate is
    # cancellation noise (BASELINE.md) — pinning isolates solver parity.
    r = solve_fused(f, Y0, T, rtol=1e-6, atol=1e-8, first_step=0.05)
    ref = solve(f, Y0, T, rtol=1e-6, atol=1e-8, method="dopri5",
                options={"loop": "while", "first_step": 0.05})
    assert int(r.stats.status) == 0
    if name not in ("sigmoid_mxu", "gelu_exact"):
        # identical accept/reject sequence => identical NFE (the MXU case
        # reduces its dots in a different order than XLA, so its error
        # ratios differ in the last ulp and the sequence may diverge)
        assert int(r.stats.nfe) == int(ref.stats.nfe)
    # identical sequences; residual is per-step roundoff accumulated over
    # ~150 steps of an amplitude-3 trajectory
    np.testing.assert_allclose(np.asarray(r.ys), np.asarray(ref.ys),
                               atol=1e-5)


def test_fused_reverse_time_and_methods():
    tr = jnp.linspace(5.0, 0.0, 7, dtype=jnp.float32)
    for method in ("dopri5", "bosh3", "tsit5"):
        r = solve_fused(spiral, Y0, tr, rtol=1e-6, atol=1e-8,
                        method=method)
        ref = solve(spiral, Y0, tr, rtol=1e-6, atol=1e-8, method=method,
                    options={"loop": "while"})
        np.testing.assert_allclose(np.asarray(r.ys), np.asarray(ref.ys),
                                   atol=5e-6)


def test_fused_sublane_packed_batch():
    """B=512 engages sublane packing (pick_pack(2, 512) == 4): the state
    runs as [8, 128] blocks, cutting elementwise solver passes ~4x. The
    error norm sees the same element multiset, so only reduction-order
    ulps can perturb the step sequence — parity vs the generic engine
    stays within the usual roundoff envelope."""
    from tfdiffeq_tpu.ops.pallas_kernels import (pack_state, pick_pack,
                                                 unpack_state)

    assert pick_pack(2, 512) == 4
    assert pick_pack(2, 8) == 1          # small batches stay unpacked
    x = jnp.arange(2 * 512, dtype=jnp.float32).reshape(2, 512)
    assert jnp.array_equal(unpack_state(pack_state(x, 4), 4, 2), x)

    y0 = jnp.asarray(np.random.RandomState(3).randn(512, 2) * 1.5,
                     jnp.float32)
    r = solve_fused(spiral, y0, T, rtol=1e-6, atol=1e-8, first_step=0.05)
    ref = solve(spiral, y0, T, rtol=1e-6, atol=1e-8, method="dopri5",
                options={"loop": "while", "first_step": 0.05})
    assert int(r.stats.status) == 0
    np.testing.assert_allclose(np.asarray(r.ys), np.asarray(ref.ys),
                               atol=2e-4)

    # Odd batch inside a group: 384/4 = 96 lanes -> lane-padded to 128;
    # pad lanes must stay masked out of the error norm.
    y0b = y0[:384]
    rb = solve_fused(spiral, y0b, T, rtol=1e-6, atol=1e-8,
                     first_step=0.05)
    refb = solve(spiral, y0b, T, rtol=1e-6, atol=1e-8, method="dopri5",
                 options={"loop": "while", "first_step": 0.05})
    assert int(rb.stats.status) == 0
    np.testing.assert_allclose(np.asarray(rb.ys), np.asarray(refb.ys),
                               atol=2e-4)


def test_whole_solve_grid_blocks():
    """n_blocks > 1 runs lane blocks as sequential grid programs in one
    launch (per-block controller, like the conv tier / sharded solves):
    trajectories match the single-block kernel within step-sequence
    noise, stats sum, and sublane packing composes per block."""
    from tfdiffeq_tpu.ops import jaxpr_bridge as jb
    from tfdiffeq_tpu.ops import pallas_kernels as pk

    B = 1024
    y0 = jnp.asarray(np.random.RandomState(5).randn(B, 2) * 1.2,
                     jnp.float32)
    tt = jnp.linspace(0.0, 2.0, 5, dtype=jnp.float32)
    plan, consts = jb.build_plan(spiral, jnp.float32(0.0), y0)
    yT, f0 = y0.T, spiral(tt[0], y0).T
    packed = tuple(jb.pack_consts(plan, consts, jnp.float32, 512))

    def run(nb, kp):
        y0p = pk.pack_state_blocks(yT, kp, nb) if kp > 1 else yT
        f0p = pk.pack_state_blocks(f0, kp, nb) if kp > 1 else f0
        out, stats = jb.plan_solve(plan, packed, y0p, tt,
                                   jnp.float32(0.05), 1e-6, 1e-8, 1.0,
                                   f0p, interpret=True, pack=kp,
                                   n_blocks=nb)
        if kp > 1:
            out = pk.unpack_state_blocks(out, kp, 2, nb)
        return out, stats

    o_ref, s_ref = run(1, 1)
    for nb, kp in [(2, 1), (2, 4)]:
        o, s = run(nb, kp)
        assert s.shape == (nb, 4)
        assert int(jnp.max(s[:, 3])) == 0
        # every block re-solves its slice: total accepted >= single-block
        assert int(jnp.sum(s[:, 1])) >= int(s_ref[1])
        np.testing.assert_allclose(np.asarray(o), np.asarray(o_ref),
                                   atol=2e-3)


def test_mlp_solve_grid_blocks_match():
    from tfdiffeq_tpu.ops.pallas_kernels import mlp_solve, pad_mlp_weights

    w = [(W1, B1), (W2, jnp.zeros(2, jnp.float32))]
    warr, dims = pad_mlp_weights(w, jnp.float32)
    y0 = jnp.asarray(np.random.RandomState(6).randn(1024, 2) * 1.2,
                     jnp.float32).T
    tt = jnp.linspace(0.0, 2.0, 5, dtype=jnp.float32)
    kw = dict(activation="tanh", final_activation="identity",
              input_power=1, interpret=True)
    o1, s1 = mlp_solve(warr, dims, y0, tt, jnp.float32(0.05), 1e-6, 1e-8,
                       1.0, n_blocks=1, **kw)
    o2, s2 = mlp_solve(warr, dims, y0, tt, jnp.float32(0.05), 1e-6, 1e-8,
                       1.0, n_blocks=2, **kw)
    assert s2.shape == (4,) and int(s2[3]) == 0     # merged stats
    assert o2.shape == o1.shape
    np.testing.assert_allclose(np.asarray(o2), np.asarray(o1), atol=2e-3)


def test_mlp_solve_pack_matches_unpacked():
    """mlp_solve(pack=4) vs pack=1 on identical inputs: same dynamics,
    same controller — trajectories agree to roundoff-sequence noise."""
    from tfdiffeq_tpu.ops.pallas_kernels import mlp_solve, pad_mlp_weights

    w = [(W1, B1), (W2, jnp.zeros(2, jnp.float32))]
    warr, dims = pad_mlp_weights(w, jnp.float32)
    y0 = jnp.asarray(np.random.RandomState(4).randn(512, 2) * 1.2,
                     jnp.float32).T
    tt = jnp.linspace(0.0, 2.0, 5, dtype=jnp.float32)
    kw = dict(activation="tanh", final_activation="identity",
              input_power=1, interpret=True)
    o1, s1 = mlp_solve(warr, dims, y0, tt, jnp.float32(0.05), 1e-6, 1e-8,
                       1.0, pack=1, **kw)
    o4, s4 = mlp_solve(warr, dims, y0, tt, jnp.float32(0.05), 1e-6, 1e-8,
                       1.0, pack=4, **kw)
    assert int(s1[3]) == 0 and int(s4[3]) == 0
    assert o1.shape == o4.shape
    np.testing.assert_allclose(np.asarray(o4), np.asarray(o1), atol=5e-5)


def test_fused_unbatched_y0():
    r = solve_fused(spiral, Y0[0], T)
    ref = solve(spiral, Y0[0], T, rtol=1e-6, atol=1e-8,
                options={"loop": "while"})
    assert r.ys.shape == (7, 2)
    np.testing.assert_allclose(np.asarray(r.ys), np.asarray(ref.ys),
                               atol=5e-6)


def test_odeint_fuse_option_and_fallback():
    ys = odeint(spiral, Y0, T, rtol=1e-6, atol=1e-8,
                options={"fuse": True})
    ref = solve(spiral, Y0, T, rtol=1e-6, atol=1e-8,
                options={"loop": "while"})
    np.testing.assert_allclose(np.asarray(ys), np.asarray(ref.ys),
                               atol=5e-6)

    # unfusable primitive (sort) -> warning + generic result
    def unfusable(t, y):
        return jnp.sort(y, axis=-1) * -0.5

    with warnings.catch_warnings(record=True) as wlog:
        warnings.simplefilter("always")
        ys2 = odeint(unfusable, Y0, T, rtol=1e-6, atol=1e-8,
                     options={"fuse": True})
    assert any("falling back" in str(w.message) for w in wlog)
    ref2 = solve(unfusable, Y0, T, rtol=1e-6, atol=1e-8)
    np.testing.assert_allclose(np.asarray(ys2), np.asarray(ref2.ys),
                               atol=1e-6)

    # pytree state: rides the fused tier via the feature-concat adapter
    # (fast.tree_state_adapter) — correct result, NO fallback warning.
    def tree_f(t, y):
        return {"a": -y["a"]}

    with warnings.catch_warnings(record=True) as wlog:
        warnings.simplefilter("always")
        ys3 = odeint(tree_f, {"a": Y0}, T, options={"fuse": True})
    assert not any("falling back" in str(w.message) for w in wlog)
    assert ys3["a"].shape == (7, 8, 2)
    ref3 = odeint(tree_f, {"a": Y0}, T)
    np.testing.assert_allclose(np.asarray(ys3["a"]),
                               np.asarray(ref3["a"]), atol=5e-6)

    # pytree state whose dynamics are unfusable (sort) -> fallback, not
    # crash: the adapter wraps, the bridge rejects, the generic engine
    # serves the dict state.
    def tree_unfusable(t, y):
        return {"a": jnp.sort(y["a"], axis=-1) * -0.5}

    with warnings.catch_warnings(record=True) as wlog:
        warnings.simplefilter("always")
        ys4 = odeint(tree_unfusable, {"a": Y0}, T, options={"fuse": True})
    assert any("falling back" in str(w.message) for w in wlog)
    assert ys4["a"].shape == (7, 8, 2)

    # Every built-in method now fuses (tests/test_fixed_fused.py covers
    # the fixed/Adams/hyper parity batteries); a hypersolver without its
    # required hypernet still errors loudly rather than falling back.
    with pytest.raises(ValueError, match="hypernet"):
        odeint(spiral, Y0, T, method="hyper_euler",
               options={"fuse": True})


def test_fuse_under_jit_with_traced_weights():
    def run(Amat, y):
        return solve(lambda tt, yy: (yy ** 3) @ Amat, y, T, rtol=1e-6,
                     atol=1e-8, options={"fuse": True,
                                         "first_step": 0.01}).ys

    out = jax.jit(run)(A, Y0)
    ref = solve(spiral, Y0, T, rtol=1e-6, atol=1e-8,
                options={"loop": "while", "first_step": 0.01})
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref.ys),
                               atol=5e-6)


def test_adjoint_fuse_gradient_parity():
    g_out = jnp.asarray(np.random.RandomState(2).randn(5, 8, 2),
                        jnp.float32)
    t5 = jnp.linspace(0.0, 2.0, 5, dtype=jnp.float32)

    def f(tt, yy, p):
        return jnp.tanh(yy @ p[0] + p[1]) @ p[2]

    params = (W1, B1, W2)

    def loss(p, y, fuse):
        ys = odeint_adjoint(f, y, t5, params=p, rtol=1e-6, atol=1e-8,
                            options={"fuse": True} if fuse else None)
        return jnp.sum(ys * g_out)

    gf = jax.grad(loss, argnums=(0, 1))(params, Y0, True)
    gg = jax.grad(loss, argnums=(0, 1))(params, Y0, False)
    for a, b in zip(jax.tree_util.tree_leaves(gf),
                    jax.tree_util.tree_leaves(gg)):
        d = float(jnp.max(jnp.abs(a - b)))
        m = float(jnp.max(jnp.abs(b))) + 1e-12
        assert d / m < 1e-4, (d, m)


def test_adjoint_fuse_fallback_still_trains():
    def fb(tt, yy, p):
        return jnp.sort(yy, axis=-1) * p     # sort: outside the plan ISA

    with warnings.catch_warnings(record=True) as wlog:
        warnings.simplefilter("always")
        g = jax.grad(lambda p: jnp.sum(odeint_adjoint(
            fb, Y0, T, params=p, options={"fuse": True})))(jnp.float32(-0.5))
    assert any("generic engine" in str(w.message) for w in wlog)
    assert np.isfinite(float(g))


def test_build_plan_batch_reduction_and_computed_weights():
    # cross-batch SUM coupling fuses since round 4 (mean-field 'bsum',
    # tests/test_meanfield.py) and marks the plan batch-coupled
    plan, _ = build_plan(
        lambda t, y: y - jnp.mean(y, axis=0, keepdims=True), T[0], Y0)
    assert plan.batch_coupled
    assert any(ins[0] == "bsum" for ins in plan.instrs)
    # batch-axis max/min fuse since round 5 ('bmax', lane-masked extrema
    # with tie-split adjoint routing — tests/test_meanfield.py)
    plan_mx, _ = build_plan(
        lambda t, y: y - jnp.max(y, axis=0, keepdims=True), T[0], Y0)
    assert plan_mx.batch_coupled
    assert any(ins[0] == "bmax" for ins in plan_mx.instrs)
    # computed (non-const) dot weights must not fuse
    with pytest.raises(FusionError):
        build_plan(lambda t, y: y @ (A @ A), T[0], Y0)


def test_plan_cache_hit_across_calls():
    """Equal-structure dynamics produce EQUAL plans (one kernel compile)."""
    A2 = 2.0 * A
    p1, c1 = build_plan(spiral, T[0], Y0)
    p2, c2 = build_plan(lambda tt, yy: (yy ** 3) @ A2, T[0], Y0)
    assert p1 == p2 and hash(p1) == hash(p2)
    assert len(c1) == len(c2) == 1


def test_fused_dense_output():
    """dense_output=True persists the in-kernel per-step interpolants;
    post-hoc evaluation matches direct solves (round-2 verdict item 10)."""
    r = solve_fused(mlp, Y0, T, rtol=1e-6, atol=1e-8, dense_output=True,
                    max_num_steps=256)
    assert r.dense is not None
    for tq in (0.37, 2.11, 4.93):
        got = r.dense.eval_flat(jnp.asarray(tq, jnp.float32)).reshape(
            Y0.shape)
        want = solve(mlp, Y0, jnp.asarray([0.0, tq], jnp.float32),
                     rtol=1e-8, atol=1e-10,
                     options={"loop": "while"}).ys[-1]
        assert float(jnp.max(jnp.abs(got - want))) < 1e-5


@pytest.mark.parametrize("B_cfg,S_cfg", [(8, 256), (1024, 64)],
                         ids=["single_block", "grid_blocked"])
def test_interpolated_adjoint_with_fused_forward(B_cfg, S_cfg):
    """adjoint_mode='interpolated' driven by the FUSED forward's dense
    output matches the generic interpolated adjoint (the fastest forward
    now feeds the cheapest backward). The grid_blocked config exceeds the
    dense VMEM model, so the forward runs as sequential lane-block
    programs and the interpolants come back as a per-block
    BlockDenseOutput (round-4 verdict item 5)."""
    t5 = jnp.linspace(0.0, 2.0, 5, dtype=jnp.float32)
    rng = np.random.RandomState(4)
    y0 = (Y0 if B_cfg == Y0.shape[0]
          else jnp.asarray(rng.randn(B_cfg, 2) * 1.2, jnp.float32))
    g_out = jnp.asarray(rng.randn(5, B_cfg, 2), jnp.float32)

    if B_cfg > 128:
        # The honest dense sizing must actually route this config to the
        # grid (otherwise the test silently re-covers single-block).
        from tfdiffeq_tpu.fast import (_VMEM_BUDGET, _fused_vmem_bytes)
        assert _fused_vmem_bytes(5 + 5 * S_cfg, 2, B_cfg, 2,
                                 kpack=1) > _VMEM_BUDGET

    def fp(tt, yy, p):
        return jnp.tanh(yy @ p[0] + p[1]) @ p[2]

    params = (W1, B1, W2)

    def loss(p, fuse):
        ys = odeint_adjoint(
            fp, y0, t5, params=p, rtol=1e-6, atol=1e-8,
            adjoint_mode="interpolated",
            options={"fuse": True, "max_num_steps": S_cfg} if fuse
            else {"max_steps": 2048})
        return jnp.sum(ys * g_out)

    gf = jax.grad(loss)(params, True)
    gg = jax.grad(loss)(params, False)
    for a, b in zip(jax.tree_util.tree_leaves(gf),
                    jax.tree_util.tree_leaves(gg)):
        d = float(jnp.max(jnp.abs(a - b)))
        m = float(jnp.max(jnp.abs(b))) + 1e-12
        assert d / m < 1e-4, (d, m)


def test_grid_blocked_dense_output_eval():
    """dense_output past the VMEM budget: the solve runs as lane-block
    grid programs, each emitting its OWN interpolant window; the
    assembled BlockDenseOutput evaluates anywhere in the span at solver
    accuracy (round-4 verdict item 5)."""
    from tfdiffeq_tpu.solvers.base import BlockDenseOutput

    B = 1024
    y0 = jnp.asarray(np.random.RandomState(7).randn(B, 2) * 1.2,
                     jnp.float32)
    t5 = jnp.linspace(0.0, 2.0, 5, dtype=jnp.float32)
    r = solve_fused(mlp, y0, t5, rtol=1e-6, atol=1e-8,
                    dense_output=True, max_num_steps=64)
    assert isinstance(r.dense, BlockDenseOutput)
    assert int(r.stats.status) == 0
    probes = jnp.asarray([0.13, 0.77, 1.31, 1.99], jnp.float32)
    # oracle: integrate FROM t=0 (solve treats t[0] as the initial time)
    ref = solve(lambda tt, yy: mlp(tt, yy), y0,
                jnp.concatenate([jnp.zeros((1,), jnp.float32), probes]),
                rtol=1e-9, atol=1e-11, options={"loop": "while"}).ys[1:]
    vals = r.dense.eval_flat(probes)
    assert float(jnp.max(jnp.abs(vals - ref.reshape(4, -1)))) < 5e-5
    # exact at the endpoint (the kernel writes y1 there, not the
    # interpolant)
    v_end = r.dense.eval_flat(t5[-1])
    assert float(jnp.max(jnp.abs(
        v_end - r.ys[-1].reshape(-1)))) < 1e-6


def test_fuse_round_half_to_even():
    """The bridge's `round` lowering must keep jnp.round's
    round-half-to-even tie semantics (a bare floor(x+0.5) breaks ties
    upward and diverges from the generic engine)."""
    def fr(t, y):
        return jnp.round(y) * -0.1

    y0 = jnp.asarray([[-1.5, 2.5], [1.5, 0.3], [0.5, -2.5], [3.5, -0.5]],
                     jnp.float32)
    t = jnp.linspace(0.0, 1.0, 3, dtype=jnp.float32)
    with warnings.catch_warnings():
        warnings.simplefilter("error")
        a = solve(fr, y0, t, method="rk4", options={"fuse": True})
    b = solve(fr, y0, t, method="rk4")
    np.testing.assert_array_equal(np.asarray(a.ys), np.asarray(b.ys))


def test_fuse_adjoint_honors_backward_step_size():
    """options={'fuse': True} with a fixed adjoint method and
    adjoint_options={'step_size': h}: the per-interval backward walk must
    be honored (tier 1 would integrate ONE step per interval; the gate
    must route to tier 2 — fused forward + generic walk backward)."""
    rng = np.random.RandomState(0)
    p = {"w1": jnp.asarray(rng.randn(2, 16) * 0.3, jnp.float32),
         "w2": jnp.asarray(rng.randn(16, 2) * 0.3, jnp.float32)}

    def f(tt, yy, pp):
        return jnp.tanh(yy @ pp["w1"]) @ pp["w2"]

    y0 = jnp.asarray(rng.randn(8, 2), jnp.float32)
    t = jnp.linspace(0.0, 2.0, 5, dtype=jnp.float32)
    g_out = jnp.asarray(rng.randn(5, 8, 2), jnp.float32)

    def loss(pp, fuse):
        opts = {"fuse": True} if fuse else {}
        ys = odeint_adjoint(f, y0, t, params=pp, method="dopri5",
                            options=opts, adjoint_method="euler",
                            adjoint_options={"step_size": 0.005})
        return jnp.sum(ys * g_out)

    gf = jax.grad(lambda pp: loss(pp, True))(p)
    gg = jax.grad(lambda pp: loss(pp, False))(p)
    for k in gf:
        d = float(jnp.max(jnp.abs(gf[k] - gg[k])))
        m = float(jnp.max(jnp.abs(gg[k]))) + 1e-8
        assert d / m < 5e-3, (k, d / m)


def test_fuse_feature_axis_flip():
    """jnp.flip(y, axis=-1) fuses via the `rev` ISA op (forward AND the
    plan-adjoint transpose); batch-axis flips keep the generic engine."""
    def frev(t, y):
        return jnp.flip(y, axis=-1) * -0.5 + 0.1 * y

    y0 = jnp.asarray(np.random.RandomState(2).randn(8, 2), jnp.float32)
    t = jnp.linspace(0.0, 2.0, 5, dtype=jnp.float32)
    with warnings.catch_warnings():
        warnings.simplefilter("error")
        a = solve(frev, y0, t, rtol=1e-6, atol=1e-8, method="dopri5",
                  options={"fuse": True, "first_step": 0.05})
    b = solve(frev, y0, t, rtol=1e-6, atol=1e-8, method="dopri5",
              options={"loop": "while", "first_step": 0.05})
    assert int(a.stats.nfe) == int(b.stats.nfe)
    np.testing.assert_allclose(np.asarray(a.ys), np.asarray(b.ys),
                               atol=1e-5)

    # two-kernel training through the rev transpose
    def frev_p(t, y, p):
        return jnp.flip(y, axis=-1) @ p["w"] - 0.2 * y

    params = {"w": jnp.asarray(np.random.RandomState(3).randn(2, 2) * 0.4,
                               jnp.float32)}
    g_out = jnp.asarray(np.random.RandomState(4).randn(5, 8, 2),
                        jnp.float32)

    def loss(p, fuse):
        opts = {"fuse": True} if fuse else {}
        ys = odeint_adjoint(frev_p, y0, t, params=p, rtol=1e-6, atol=1e-8,
                            options=opts)
        return jnp.sum(ys * g_out)

    with warnings.catch_warnings():
        warnings.simplefilter("error")
        gf = jax.grad(lambda p: loss(p, True))(params)
    gg = jax.grad(lambda p: loss(p, False))(params)
    d = float(jnp.max(jnp.abs(gf["w"] - gg["w"])))
    m = float(jnp.max(jnp.abs(gg["w"]))) + 1e-8
    assert d / m < 1e-3, (d, m)

    # batch-axis flip: clean fallback
    def fbad(t, y):
        return jnp.flip(y, axis=0) * -0.5

    with warnings.catch_warnings(record=True) as wlist:
        warnings.simplefilter("always")
        solve(fbad, y0, t, method="dopri5", options={"fuse": True})
    assert any("falling back" in str(w.message) for w in wlist)


def test_fuse_trig_inverse_hyperbolics():
    """tan / asinh / acosh / atanh lower via sin-cos and log/sqrt
    compositions; forward NFE parity and adjoint gradients match."""
    def f(t, y):
        return (jnp.tan(0.3 * y) - 0.5 * jnp.arcsinh(y)
                + 0.1 * jnp.arctanh(jnp.tanh(y))
                + 0.01 * jnp.arccosh(y * y + 2.0))

    y0 = jnp.asarray(np.random.RandomState(5).randn(8, 2) * 0.5,
                     jnp.float32)
    t = jnp.linspace(0.0, 1.0, 5, dtype=jnp.float32)
    with warnings.catch_warnings():
        warnings.simplefilter("error")
        a = solve(f, y0, t, rtol=1e-6, atol=1e-8,
                  options={"fuse": True, "first_step": 0.02})
    b = solve(f, y0, t, rtol=1e-6, atol=1e-8,
              options={"loop": "while", "first_step": 0.02})
    assert int(a.stats.nfe) == int(b.stats.nfe)
    np.testing.assert_allclose(np.asarray(a.ys), np.asarray(b.ys),
                               atol=1e-5)

    def fp(tt, yy, p):
        return jnp.tan(p * yy) - 0.5 * jnp.arcsinh(yy)

    def loss(p, fuse):
        opts = {"fuse": True} if fuse else {}
        return jnp.sum(odeint_adjoint(fp, y0, t, params=p, rtol=1e-6,
                                      atol=1e-8, options=opts))

    with warnings.catch_warnings():
        warnings.simplefilter("error")
        gf = jax.grad(lambda p: loss(p, True))(jnp.float32(0.3))
    gg = jax.grad(lambda p: loss(p, False))(jnp.float32(0.3))
    assert abs(float(gf - gg)) / abs(float(gg)) < 1e-4


def test_fuse_b1_reduce_and_edge_plans():
    """Edge plans from the bridge review: B==1 scalar reduces must mask
    pad lanes; size-1-axis reduces are squeezes; scalar concat pieces
    materialize; dual-role (dot-weight AND elementwise) consts fall back
    cleanly; max-tie gradients split 0.5/0.5 like jax.lax."""
    y0 = jnp.asarray([[0.5, -0.3]], jnp.float32)
    t = jnp.linspace(0.0, 1.0, 4, dtype=jnp.float32)

    def f1(tt, yy):
        return -yy * jnp.mean(jnp.exp(yy))

    def f2(tt, yy):
        return yy * 0.1 + 0.1 * jnp.sum(yy, axis=0)

    for f in (f1, f2):
        with warnings.catch_warnings():
            warnings.simplefilter("error")
            a = solve(f, y0, t, rtol=1e-6, atol=1e-8,
                      options={"fuse": True, "first_step": 0.02})
        b = solve(f, y0, t, rtol=1e-6, atol=1e-8,
                  options={"loop": "while", "first_step": 0.02})
        np.testing.assert_allclose(np.asarray(a.ys), np.asarray(b.ys),
                                   atol=1e-5)

    rng = np.random.RandomState(0)
    y04 = jnp.asarray(rng.rand(4, 2) + 1.0, jnp.float32)
    bvec = jnp.asarray([0.3], jnp.float32)

    def f4(tt, yy):
        feat = jnp.concatenate([jnp.reshape(tt, (1,)), bvec])
        return yy * feat

    a4 = solve(f4, y04, t, rtol=1e-6, atol=1e-8,
               options={"fuse": True, "first_step": 0.02})
    b4 = solve(f4, y04, t, rtol=1e-6, atol=1e-8,
               options={"loop": "while", "first_step": 0.02})
    np.testing.assert_allclose(np.asarray(a4.ys), np.asarray(b4.ys),
                               atol=1e-5)

    Wd = jnp.asarray(rng.randn(2, 2) * 0.2, jnp.float32)

    def f5(tt, yy):
        return (yy @ Wd) * jnp.sum(Wd)

    with warnings.catch_warnings(record=True) as wl:
        warnings.simplefilter("always")
        a5 = solve(f5, y04, t, options={"fuse": True})
    assert any("falling back" in str(w.message) for w in wl)
    b5 = solve(f5, y04, t)
    np.testing.assert_array_equal(np.asarray(a5.ys), np.asarray(b5.ys))


def test_fuse_adjoint_log_dynamics_and_max_ties():
    """Pad-lane primals can be non-finite (log of the pinned-zero pad
    state): the plan-adjoint weight quadrature must mask BOTH factors.
    Max ties split 0.5/0.5 like jax.lax's balanced_eq."""
    rng = np.random.RandomState(0)
    t = jnp.linspace(0.0, 1.0, 4, dtype=jnp.float32)
    W = jnp.asarray(rng.randn(2, 2) * 0.1, jnp.float32)
    y0 = jnp.asarray(rng.rand(4, 2) + 1.0, jnp.float32)

    def f(tt, yy, p):
        return jnp.log(yy) @ p

    def loss(p, fuse):
        opts = {"fuse": True} if fuse else {}
        return jnp.sum(odeint_adjoint(f, y0, t, params=p, rtol=1e-6,
                                      atol=1e-8, options=opts))

    with warnings.catch_warnings():
        warnings.simplefilter("error")
        gf = jax.grad(lambda p: loss(p, True))(W)
    gg = jax.grad(lambda p: loss(p, False))(W)
    assert bool(jnp.all(jnp.isfinite(gf)))
    np.testing.assert_allclose(np.asarray(gf), np.asarray(gg), atol=5e-6)

    def f6(tt, yy, p):
        return jnp.maximum(yy * p, 0.0) - 0.5 * yy

    y06 = jnp.asarray([[0.0, 1.0], [-1.0, 0.0], [0.0, 0.0], [0.5, -0.5]],
                      jnp.float32)

    def loss6(p, fuse):
        opts = {"fuse": True} if fuse else {}
        return jnp.sum(odeint_adjoint(f6, y06, t, params=p, rtol=1e-6,
                                      atol=1e-8, options=opts))

    with warnings.catch_warnings():
        warnings.simplefilter("error")
        gf6 = jax.grad(lambda p: loss6(p, True))(jnp.float32(1.0))
    gg6 = jax.grad(lambda p: loss6(p, False))(jnp.float32(1.0))
    assert abs(float(gf6 - gg6)) < 1e-5


def test_fuse_zero_first_step_clamps():
    """first_step=0 must clamp to dt_min (generic parity) in the fused
    forward AND adjoint kernels — not spin on zero-length accepted
    steps until max_num_steps."""
    def f(tt, yy):
        return -yy

    y0 = jnp.asarray(np.random.RandomState(6).randn(4, 2), jnp.float32)
    t = jnp.linspace(0.0, 1.0, 3, dtype=jnp.float32)
    rf = solve(f, y0, t, rtol=1e-6, atol=1e-8, method="dopri5",
               options={"fuse": True, "first_step": 0.0,
                        "max_num_steps": 500})
    rg = solve(f, y0, t, rtol=1e-6, atol=1e-8, method="dopri5",
               options={"loop": "while", "first_step": 0.0,
                        "max_num_steps": 500})
    assert int(rf.stats.status) == 0
    assert int(rf.stats.nfe) == int(rg.stats.nfe)

    def fp(tt, yy, p):
        return -yy * p

    def loss(p):
        ys = odeint_adjoint(fp, y0, t, params=p, rtol=1e-6, atol=1e-8,
                            options={"fuse": True, "first_step": 0.0,
                                     "max_num_steps": 500})
        return jnp.sum(ys)

    g = jax.grad(loss)(jnp.float32(1.0))
    assert np.isfinite(float(g))
