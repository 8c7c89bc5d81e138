"""Per-lane adjoint TRAINING (round-4 verdict item 3).

`odeint_adjoint(..., options={'fuse': True, 'per_sample': True})` runs
BOTH sweeps with per-lane step controllers: the forward via the per-lane
whole-solve kernel (`pallas_kernels._make_perlane_kernel`) and the
backward via the two-pass per-lane adjoint kernel
(`pallas_adjoint._make_perlane_adjoint_kernel`): the RK trial chain on
(y, a_y) steps per-lane under a per-sample seminorm, then the
lane-reduced parameter quadrature runs a second 'quad' evaluator pass
with each lane's quadrature weight folded into its stage cotangent
(every cotangent is columnwise-linear in a_y). The oracle throughout is
jax.vmap of the generic adjoint — exact per-sample semantics.
"""

import warnings

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tfdiffeq_tpu.adjoint import odeint_adjoint
from tfdiffeq_tpu.fast import MLPSpec, odeint_adjoint_mlp

B = 8
KS = jnp.asarray(np.logspace(0, 1.5, B), jnp.float32)    # 1 .. ~32x
T = jnp.linspace(0.0, 1.0, 5, dtype=jnp.float32)
Y0 = jnp.ones((B, 1), jnp.float32)


def stiff_f(tt, yy, k):
    return -k[:, None] * yy


def rel(a, b):
    fa = jnp.concatenate([x.ravel() for x in jax.tree_util.tree_leaves(a)])
    fb = jnp.concatenate([x.ravel() for x in jax.tree_util.tree_leaves(b)])
    return float(jnp.max(jnp.abs(fa - fb)) / (jnp.max(jnp.abs(fb)) + 1e-30))


def _oracle_grads():
    """Per-sample generic adjoint: the exact semantic oracle."""
    def loss(k, y0_):
        def one(ks, ys0):
            ys = odeint_adjoint(lambda tt, yy, kk: -kk * yy, ys0, T,
                                params=ks, rtol=1e-6, atol=1e-8)
            return jnp.sum(ys ** 2)
        return jnp.sum(jax.vmap(one)(k, y0_))
    return jax.grad(loss, argnums=(0, 1))(KS, Y0)


def test_perlane_training_matches_vmap_generic_on_stiff_battery():
    """Round-4 verdict item 3's done criterion: grads through
    options={'fuse': True, 'per_sample': True} match vmap-of-generic-
    adjoint <= 1e-5 on the stiffness battery — including the PER-SAMPLE
    parameter cotangent (a 'batch' const: each lane's quadrature
    accumulates at its own accepted steps)."""
    def loss(k, y0_):
        with warnings.catch_warnings():
            warnings.simplefilter("error")      # any fallback = FAIL
            ys = odeint_adjoint(stiff_f, y0_, T, params=k, rtol=1e-6,
                                atol=1e-8,
                                options={"fuse": True, "per_sample": True})
        return jnp.sum(ys ** 2)

    gk, gy = jax.grad(loss, argnums=(0, 1))(KS, Y0)
    gk_ref, gy_ref = _oracle_grads()
    assert rel(gk, gk_ref) < 1e-5, rel(gk, gk_ref)
    assert rel(gy, gy_ref) < 1e-5, rel(gy, gy_ref)


def test_perlane_backward_lane_counts_differ():
    """The backward sweep itself steps per-lane: the stiffest lane's
    backward NFE must exceed the mildest's (kernel-level check via
    plan_perlane_adjoint_solve's lane_stats)."""
    from tfdiffeq_tpu.ops import jaxpr_bridge as jb
    from tfdiffeq_tpu.ops.plan_adjoint import plan_perlane_adjoint_solve

    plan, consts = jb.build_plan(
        lambda tt, yy: stiff_f(tt, yy, KS), T[0], Y0)
    packed = tuple(jb.pack_consts(plan, consts, jnp.float32, 128))
    # Forward trajectory (exact solution of the linear decay).
    ys = jnp.exp(-KS[None, :, None] * T[:, None, None]) \
        * Y0[None]                                        # [T, B, 1]
    ysT = jnp.transpose(ys, (0, 2, 1))
    g = jnp.ones_like(ysT)
    ay0, dconsts, at, stats, lane_stats = plan_perlane_adjoint_solve(
        plan, packed, ysT, g, T, 0.05, 1e-6, 1e-8, 1.0,
        interpret=True)
    nfe_l = np.asarray(lane_stats[0])
    assert int(stats[3]) == 0
    assert nfe_l[B - 1] > 2 * nfe_l[0], nfe_l


def test_perlane_mlp_training_path():
    """odeint_adjoint_mlp(per_sample=True): fused-MLP per-lane training
    grads match the shared-controller fused path at the solve tolerance
    (same dynamics, same quadrature machinery, different stepping)."""
    rng = np.random.RandomState(0)
    Dm, H, Bm = 2, 16, 8
    weights = ((jnp.asarray(rng.randn(Dm, H) * 0.4, jnp.float32),
                jnp.asarray(rng.randn(H) * 0.1, jnp.float32)),
               (jnp.asarray(rng.randn(H, Dm) * 0.4, jnp.float32),
                jnp.asarray(rng.randn(Dm) * 0.1, jnp.float32)))
    spec = MLPSpec(activation="tanh")
    y0 = jnp.asarray(rng.randn(Bm, Dm), jnp.float32) \
        * jnp.linspace(0.1, 3.0, Bm)[:, None]
    t = jnp.linspace(0.0, 1.5, 4, dtype=jnp.float32)

    def loss(w, y0_, per_sample):
        ys = odeint_adjoint_mlp(spec, w, y0_, t, rtol=1e-6, atol=1e-8,
                                interpret=True, per_sample=per_sample,
                                adjoint_seminorm=True)
        return jnp.sum(jnp.sin(ys))

    g_pl = jax.grad(loss, argnums=(0, 1))(weights, y0, True)
    g_sh = jax.grad(loss, argnums=(0, 1))(weights, y0, False)
    assert rel(g_pl, g_sh) < 1e-5, rel(g_pl, g_sh)


def test_perlane_time_dependent_dynamics_t_grads():
    """Concat-t (time-dependent) dynamics: the per-lane backward also
    integrates the a_t quadrature per-lane; d loss/d t matches the
    generic adjoint."""
    def f(tt, yy, k):
        return -k[:, None] * yy * (1.0 + 0.5 * jnp.sin(tt))

    def loss_fused(t_):
        with warnings.catch_warnings():
            warnings.simplefilter("error")
            ys = odeint_adjoint(f, Y0, t_, params=KS, rtol=1e-6,
                                atol=1e-8,
                                options={"fuse": True,
                                         "per_sample": True})
        return jnp.sum(ys ** 2)

    def loss_gen(t_):
        def one(ks, ys0):
            ys = odeint_adjoint(lambda tt, yy, kk: -kk * yy
                                * (1.0 + 0.5 * jnp.sin(tt)),
                                ys0, t_, params=ks, rtol=1e-6, atol=1e-8)
            return jnp.sum(ys ** 2)
        return jnp.sum(jax.vmap(one)(KS, Y0))

    gt = jax.grad(loss_fused)(T)
    gt_ref = jax.grad(loss_gen)(T)
    assert rel(gt, gt_ref) < 2e-4, (np.asarray(gt), np.asarray(gt_ref))


def test_perlane_rejects_non_adaptive():
    with pytest.raises(ValueError, match="adaptive"):
        odeint_adjoint_mlp(
            MLPSpec(), ((jnp.zeros((1, 4)), jnp.zeros(4)),
                        (jnp.zeros((4, 1)), jnp.zeros(1))),
            jnp.ones((4, 1)), T, method="rk4", per_sample=True,
            interpret=True)


def test_perlane_batch_coupled_falls_back_to_vmap_semantics():
    """bsum (mean-field) dynamics cannot run per-lane in-kernel; the
    dispatcher must fall back to vmap-of-generic... except mean-field
    dynamics are genuinely batch-coupled, so vmap changes the model —
    the correct behavior is the FusionError-driven warning + vmap
    fallback producing the per-sample (uncoupled) interpretation. Pin
    the warning so the behavior stays explicit."""
    def f(tt, yy, k):
        return -k[:, None] * yy + 0.01 * jnp.mean(yy, axis=0,
                                                  keepdims=True)

    def loss(k):
        ys = odeint_adjoint(f, Y0, T, params=k, rtol=1e-5, atol=1e-7,
                            options={"fuse": True, "per_sample": True})
        return jnp.sum(ys ** 2)

    with pytest.warns(UserWarning, match="vmap of the generic"):
        g = jax.grad(loss)(KS)
    assert bool(jnp.all(jnp.isfinite(g)))
