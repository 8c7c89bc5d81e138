"""Plan-driven fused adjoint (ops/plan_adjoint.py; fast.odeint_adjoint_fused).

Two-kernel O(1)-memory training for ARBITRARY fusable plain-jnp dynamics:
forward = one whole-solve Pallas kernel (jaxpr->Pallas bridge), backward =
one kernel running the entire continuous-adjoint sweep with the plan's
reverse-mode VJP evaluated in-kernel. Parity oracle: the generic
`odeint_adjoint` on the same f32 arithmetic.

All tests run the kernels in Pallas interpret mode (CPU); the same code
path compiles under Mosaic on TPU (driven separately — see BASELINE.md).

Reference parity note: upstream tfdiffeq has no analogue — its adjoint
re-enters the eager odeint on an augmented func (SURVEY.md §3.3).
"""

import warnings

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tfdiffeq_tpu import odeint_adjoint
from tfdiffeq_tpu.fast import odeint_adjoint_fused
from tfdiffeq_tpu.ops.jaxpr_bridge import FusionError, build_plan
from tfdiffeq_tpu.ops.plan_adjoint import check_plan_adjoint, plan_uses_t
from tfdiffeq_tpu.utils.nfe import NFEMeter

A = jnp.asarray([[-0.1, 2.0], [-2.0, -0.1]], jnp.float32)
_rng = np.random.RandomState(7)
W1 = jnp.asarray(_rng.randn(2, 16) * 0.3, jnp.float32)
B1 = jnp.asarray(_rng.randn(16) * 0.1, jnp.float32)
W2 = jnp.asarray(_rng.randn(16, 2) * 0.3, jnp.float32)

Y0 = jnp.asarray(np.random.RandomState(0).randn(8, 2) * 1.2, jnp.float32)
T5 = jnp.linspace(0.0, 2.0, 5, dtype=jnp.float32)
G5 = jnp.asarray(np.random.RandomState(2).randn(5, 8, 2), jnp.float32)


def _assert_close(got, want, rel=1e-4, label=""):
    for i, (a, b) in enumerate(zip(jax.tree_util.tree_leaves(got),
                                   jax.tree_util.tree_leaves(want))):
        d = float(jnp.max(jnp.abs(a - b)))
        m = float(jnp.max(jnp.abs(b))) + 1e-12
        assert d / m < rel, (label, i, d, m)


def _grads(func, params, y0=Y0, t=T5, g=G5, fused=True, **kw):
    """d sum(ys*g) / d (params, y0, t) through either path."""
    def loss(p, y, tt):
        if fused:
            ys = odeint_adjoint_fused(func, y, tt, params=p, rtol=1e-6,
                                      atol=1e-8, **kw)
        else:
            ys = odeint_adjoint(func, y, tt, params=p, rtol=1e-6,
                                atol=1e-8,
                                adjoint_seminorm=kw.get(
                                    "adjoint_seminorm", False))
        return jnp.sum(ys * g)

    return jax.grad(loss, argnums=(0, 1, 2))(params, y0, t)


FAMILIES = {
    # name: (func(t, y, p), params)
    "spiral": (lambda t, y, p: (y ** 3) @ p, A),
    "mlp_bias": (lambda t, y, p: jnp.tanh(y @ p[0] + p[1]) @ p[2],
                 (W1, B1, W2)),
    "timedep": (lambda t, y, p: jnp.sin(t) * y - p * y ** 3 + 0.1,
                jnp.float32(0.3)),
    "tied": (lambda t, y, p: jnp.tanh(y @ p) @ p.T * 0.5, W1),
    "computed_bias": (lambda t, y, p: jnp.tanh(y @ p[0] + 2.0 * p[1])
                      @ p[2] - 0.1 * y, (W1, B1, W2)),
    # exact (erf-based) GELU: the in-kernel erf is the A&S 7.1.26
    # approximation (1.5e-7 abs, below f32 resolution) with the EXACT
    # 2/sqrt(pi) e^{-x^2} adjoint rule
    "gelu_exact": (lambda t, y, p: jax.nn.gelu(y @ p[0] + p[1],
                                               approximate=False) @ p[2],
                   (W1, B1, W2)),
}


@pytest.mark.parametrize("name", sorted(FAMILIES))
def test_gradient_parity_vs_generic(name):
    func, params = FAMILIES[name]
    gf = _grads(func, params, fused=True)
    gg = _grads(func, params, fused=False)
    _assert_close(gf, gg, rel=2e-4, label=name)


def test_packed_adjoint_gradient_parity():
    """B=256 engages sublane packing in BOTH kernels (forward pack via
    pick_pack, backward via _adjoint_pack's B % k*LANE gate): the whole
    two-kernel training path runs on [k*D, B/k] blocks. Parity vs the
    generic adjoint must hold exactly as at B=8."""
    func, params = FAMILIES["mlp_bias"]
    y0 = jnp.asarray(np.random.RandomState(9).randn(256, 2) * 1.2,
                     jnp.float32)
    g = jnp.asarray(np.random.RandomState(10).randn(5, 256, 2),
                    jnp.float32)
    gf = _grads(func, params, y0=y0, g=g, fused=True)
    gg = _grads(func, params, y0=y0, g=g, fused=False)
    _assert_close(gf, gg, rel=2e-4, label="packed")


def test_per_sample_data_const():
    """A per-sample [B, D] constant closed over by the dynamics gets a
    per-sample cotangent (the 'batch' const layout)."""
    drive = jnp.asarray(np.random.RandomState(5).randn(8, 2) * 0.5,
                        jnp.float32)

    def f(t, y, p):
        return jnp.tanh(y @ W1) @ W2 + p

    gf = _grads(f, drive, fused=True)
    gg = _grads(f, drive, fused=False)
    assert gf[0].shape == drive.shape
    _assert_close(gf, gg, rel=2e-4, label="data_const")


def test_reverse_time_and_no_params():
    tr = jnp.linspace(2.0, 0.0, 5, dtype=jnp.float32)
    # small amplitude: the cubic spiral GROWS backward in time
    y_small = Y0 * 0.4

    def f2(t, y):
        return (y ** 3) @ A

    def loss(y, tt):
        return jnp.sum(odeint_adjoint_fused(f2, y, tt, rtol=1e-6,
                                            atol=1e-8) * G5)

    def loss_ref(y, tt):
        return jnp.sum(odeint_adjoint(lambda t_, y_: (y_ ** 3) @ A, y, tt,
                                      rtol=1e-6, atol=1e-8) * G5)

    gf = jax.grad(loss, argnums=(0, 1))(y_small, tr)
    gg = jax.grad(loss_ref, argnums=(0, 1))(y_small, tr)
    _assert_close(gf, gg, rel=2e-4, label="reverse")


def test_unbatched_y0():
    g1 = jnp.asarray(np.random.RandomState(3).randn(5, 2), jnp.float32)

    def loss(p, y, fused):
        f = lambda t, yy, pp: (yy ** 3) @ pp
        ys = (odeint_adjoint_fused(f, y, T5, params=p)
              if fused else odeint_adjoint(f, y, T5, params=p))
        assert ys.shape == (5, 2)
        return jnp.sum(ys * g1)

    gf = jax.grad(loss, argnums=(0, 1))(A, Y0[0], True)
    gg = jax.grad(loss, argnums=(0, 1))(A, Y0[0], False)
    _assert_close(gf, gg, rel=2e-4, label="unbatched")


def test_seminorm_close_to_full():
    func, params = FAMILIES["mlp_bias"]
    gf = _grads(func, params, fused=True, adjoint_seminorm=True)
    gg = _grads(func, params, fused=False, adjoint_seminorm=True)
    _assert_close(gf, gg, rel=5e-4, label="seminorm")


def test_return_stats_and_meter():
    meter = NFEMeter()
    func, params = FAMILIES["mlp_bias"]

    def loss(p):
        ys, stats = odeint_adjoint_fused(func, Y0, T5, params=p,
                                         return_stats=True,
                                         nfe_meter=meter)
        return jnp.sum(ys * G5)

    g = jax.grad(loss)(params)
    assert all(bool(jnp.all(jnp.isfinite(x))) for x in g)
    if meter.disabled_reason is None:
        assert meter.f_nfe > 0 and meter.b_nfe > 0


def test_backward_failure_poisons_grads():
    func, params = FAMILIES["mlp_bias"]

    def loss(p):
        ys = odeint_adjoint_fused(func, Y0, T5, params=p,
                                  adjoint_rtol=1e-9, adjoint_atol=1e-12,
                                  max_num_steps=3)
        return jnp.sum(ys * G5)

    g = jax.grad(loss)(params)
    # forward also truncates at 3 steps -> poisoned trajectory or poisoned
    # backward; either way gradients must NOT be silently wrong
    assert not all(bool(jnp.all(jnp.isfinite(x))) for x in g)


def test_check_plan_adjoint_rejects_argmax_reductions():
    plan, _ = build_plan(
        lambda t, y: y - jnp.max(y, axis=-1, keepdims=True), T5[0], Y0)
    with pytest.raises(FusionError, match="reduce_max"):
        check_plan_adjoint(plan)


def test_plan_uses_t():
    p1, _ = build_plan(lambda t, y: (y ** 3) @ A, T5[0], Y0)
    assert not plan_uses_t(p1)
    p2, _ = build_plan(lambda t, y: jnp.sin(t) * y, T5[0], Y0)
    assert plan_uses_t(p2)


def test_odeint_adjoint_full_fuse_tier_engages():
    """options={'fuse': True} with a clean option surface runs the
    two-kernel path with NO fallback warning."""
    func, params = FAMILIES["mlp_bias"]

    def loss(p, fuse):
        ys = odeint_adjoint(func, Y0, T5, params=p, rtol=1e-6, atol=1e-8,
                            options={"fuse": True} if fuse else None)
        return jnp.sum(ys * G5)

    with warnings.catch_warnings(record=True) as wlog:
        warnings.simplefilter("always")
        gf = jax.grad(loss)(params, True)
    assert not [w for w in wlog if "fuse" in str(w.message).lower()], \
        [str(w.message) for w in wlog]
    gg = jax.grad(loss)(params, False)
    _assert_close(gf, gg, rel=2e-4, label="tier1")


def test_odeint_adjoint_tier2_fallback_on_unsupported_grad():
    """Dynamics fusable forward but not backward (reduce_max) fall to
    tier 2 (fused forward + generic backward) with a warning, and still
    produce correct gradients."""
    def f(tt, yy, p):
        return (yy - jnp.max(yy, axis=-1, keepdims=True)) * p

    def loss(p, fuse):
        ys = odeint_adjoint(f, Y0, T5, params=p, rtol=1e-6, atol=1e-8,
                            options={"fuse": True} if fuse else None)
        return jnp.sum(ys * G5)

    with warnings.catch_warnings(record=True) as wlog:
        warnings.simplefilter("always")
        gf = jax.grad(loss)(jnp.float32(-0.5), True)
    assert any("generic backward" in str(w.message) for w in wlog)
    gg = jax.grad(loss)(jnp.float32(-0.5), False)
    _assert_close(gf, gg, rel=2e-4, label="tier2")


def test_vmem_budget_falls_back_to_generic(monkeypatch):
    import tfdiffeq_tpu.fast as fast_mod
    monkeypatch.setattr(fast_mod, "_VMEM_BUDGET", 1)
    monkeypatch.setattr(fast_mod, "_auto_interpret", lambda x: False)
    func, params = FAMILIES["mlp_bias"]

    with warnings.catch_warnings(record=True) as wlog:
        warnings.simplefilter("always")
        g = jax.grad(lambda p: jnp.sum(odeint_adjoint_fused(
            func, Y0, T5, params=p) * G5))(params)
    assert any("VMEM" in str(w.message) for w in wlog)
    gg = _grads(func, params, fused=False)
    _assert_close(g, gg[0], rel=2e-4, label="vmem_fallback")
