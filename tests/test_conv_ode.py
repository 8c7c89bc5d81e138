"""Fused conv-ODE tier (ops/conv_ode.py, ops/pallas_conv.py,
fast.solve_conv_ode) — the MNIST ODEBlock dynamics as one kernel.

Interpret mode on CPU; the same code path compiles under Mosaic on TPU
(driven separately — BASELINE.md has measured numbers).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tfdiffeq_tpu import solve
from tfdiffeq_tpu.fast import solve_conv_ode
from tfdiffeq_tpu.models.odenet import ODEConvFunc
from tfdiffeq_tpu.ops.conv_ode import (ConvODESpec, conv_ode_apply,
                                       conv_params_from_flax)


def _setup(B=3, C=16, groups=8, seed=0):
    mod = ODEConvFunc(features=C, groups=groups)
    x = jnp.asarray(np.random.RandomState(seed).randn(B, 7, 7, C) * 0.5,
                    jnp.float32)
    vs = mod.init(jax.random.PRNGKey(seed), 0.0, x)
    return mod, vs, x


def test_feature_major_dynamics_match_flax():
    """conv_ode_apply (9 masked rolls + reduce/spread-dot GroupNorm) ==
    ODEConvFunc.apply (XLA convs + nn.GroupNorm) to f32 roundoff."""
    mod, vs, x = _setup(B=4, C=64, groups=32)
    params = conv_params_from_flax(vs)
    spec = ConvODESpec(channels=64, groups=32)
    for t in (0.0, 0.37, 1.0):
        want = mod.apply(vs, t, x)
        got = conv_ode_apply(params, t, x, spec)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=1e-5)


@pytest.mark.slow
@pytest.mark.parametrize("method", ["dopri5", "bosh3", "tsit5"])
def test_fused_conv_solve_matches_generic(method):
    mod, vs, x = _setup()
    t = jnp.asarray([0.0, 0.5, 1.0], jnp.float32)

    res = solve_conv_ode(vs, x, t, groups=8, rtol=1e-4, atol=1e-4,
                         method=method, interpret=True)
    ref = solve(lambda tt, yy: mod.apply(vs, tt, yy), x, t,
                rtol=1e-4, atol=1e-4, method=method,
                options={"loop": "while"})
    assert int(res.stats.status) == 0
    assert int(res.stats.nfe) == int(ref.stats.nfe)
    np.testing.assert_allclose(np.asarray(res.ys), np.asarray(ref.ys),
                               atol=5e-4, rtol=1e-3)


def test_fused_conv_solve_reverse_time():
    mod, vs, x = _setup(seed=1)
    t = jnp.asarray([1.0, 0.4, 0.0], jnp.float32)   # decreasing

    res = solve_conv_ode(vs, x, t, groups=8, rtol=1e-4, atol=1e-4,
                         interpret=True)
    ref = solve(lambda tt, yy: mod.apply(vs, tt, yy), x, t,
                rtol=1e-4, atol=1e-4, method="dopri5",
                options={"loop": "while"})
    assert int(res.stats.status) == 0
    np.testing.assert_allclose(np.asarray(res.ys), np.asarray(ref.ys),
                               atol=5e-4, rtol=1e-3)


@pytest.mark.slow
def test_fused_conv_batch_chunking(monkeypatch):
    """Batches beyond the Mosaic stack budget are auto-chunked into fused
    per-block solves (independent per-block controllers); results match
    the unchunked solve at tolerance level, and a ragged final block is
    padded and sliced correctly."""
    import tfdiffeq_tpu.fast as F

    mod, vs, x = _setup(B=5, seed=2)
    t = jnp.asarray([0.0, 1.0], jnp.float32)
    ref = solve_conv_ode(vs, x, t, groups=8, rtol=1e-4, atol=1e-4,
                         interpret=True)
    # Blockwise references BEFORE shrinking the budget (unchunked).
    blk01 = solve_conv_ode(vs, x[0:2], t, groups=8, rtol=1e-4, atol=1e-4,
                           interpret=True)
    blk23 = solve_conv_ode(vs, x[2:4], t, groups=8, rtol=1e-4, atol=1e-4,
                           interpret=True)
    # Shrink the budget so b_chunk = 2 (NP 128) -> blocks (2, 2, 1-pad).
    budget2 = 4 * (F._CONV_STACK_BLOCKS + 2) * 16 * 128
    monkeypatch.setattr(F, "_CONV_STACK_BUDGET", budget2)
    res = F.solve_conv_ode(vs, x, t, groups=8, rtol=1e-4, atol=1e-4,
                           interpret=True)
    assert int(res.stats.status) == 0
    assert res.ys.shape == ref.ys.shape
    # Strong invariant: chunked == concatenation of per-block solves (the
    # dynamics have no cross-sample coupling; only the controller's error
    # norm population changes per block).
    np.testing.assert_allclose(np.asarray(res.ys[:, 0:2]),
                               np.asarray(blk01.ys), atol=2e-5)
    np.testing.assert_allclose(np.asarray(res.ys[:, 2:4]),
                               np.asarray(blk23.ys), atol=2e-5)
    # Weak: matches the unchunked solve at a few x tolerance (different
    # accept sequences).
    np.testing.assert_allclose(np.asarray(res.ys), np.asarray(ref.ys),
                               atol=2e-2)
    # Per-block stats are summed: more blocks => at least as many NFE.
    assert int(res.stats.nfe) >= int(ref.stats.nfe)


@pytest.mark.slow
def test_fused_conv_generic_fallback_on_huge_t(monkeypatch):
    import tfdiffeq_tpu.fast as F

    mod, vs, x = _setup(seed=3)
    t = jnp.asarray([0.0, 1.0], jnp.float32)
    ref = solve_conv_ode(vs, x, t, groups=8, rtol=1e-4, atol=1e-4,
                         interpret=True)
    monkeypatch.setattr(F, "_CONV_STACK_BUDGET", 1024)
    with pytest.warns(UserWarning, match="VMEM"):
        res = F.solve_conv_ode(vs, x, t, groups=8, rtol=1e-4, atol=1e-4,
                               interpret=True)
    assert int(res.stats.status) == 0
    np.testing.assert_allclose(np.asarray(res.ys), np.asarray(ref.ys),
                               atol=5e-4, rtol=1e-3)


def test_fused_conv_input_validation():
    mod, vs, x = _setup()
    with pytest.raises(ValueError, match="B, H, W, C"):
        solve_conv_ode(vs, x[0], jnp.asarray([0.0, 1.0]), groups=8,
                       interpret=True)
    with pytest.raises(ValueError, match="monotonic"):
        solve_conv_ode(vs, x, jnp.asarray([0.0, 1.0, 0.5]), groups=8,
                       interpret=True)
    with pytest.raises(ValueError, match="divisible"):
        solve_conv_ode(vs, x, jnp.asarray([0.0, 1.0]), groups=5,
                       interpret=True)


@pytest.mark.slow
def test_odeblock_fused_flag_matches_generic():
    """ODEBlock(fused=True) routes the solve through the fused kernel and
    reproduces the generic block's logits."""
    from tfdiffeq_tpu.models.odenet import ODENetMNIST

    m = ODENetMNIST(tol=1e-3)
    mf = ODENetMNIST(tol=1e-3, fused=True)
    x = jnp.asarray(np.random.RandomState(0).randn(2, 28, 28, 1),
                    jnp.float32)
    vs = m.init(jax.random.PRNGKey(0), x)
    la, _ = m.apply(vs, x, mutable=["diagnostics"])
    lb, diag = mf.apply(vs, x, mutable=["diagnostics"])
    np.testing.assert_allclose(np.asarray(lb), np.asarray(la), atol=1e-4)
    leaves = jax.tree_util.tree_leaves(diag)
    assert leaves
    # sow appends: leaf 0 is the init-time 0 carried in `vs`, the last
    # leaf is this apply's NFE.
    nfe = int(jnp.asarray(leaves[-1]).ravel()[-1])
    assert nfe > 0


def test_group_norm_negative_variance_clamp():
    """f32 cancellation in E[x^2] - mean^2 can go negative beyond eps for
    near-constant large-magnitude groups; flax clamps, so must we — else
    rsqrt(negative) NaNs every RK stage and the solve dies at
    DT_UNDERFLOW where the generic path integrates fine."""
    import flax.linen as nn

    from tfdiffeq_tpu.ops.conv_ode import (ConvODESpec, group_matrix,
                                           group_norm, reduce_matrix)

    spec = ConvODESpec(channels=16, groups=8)
    B = 2
    rng = np.random.RandomState(0)
    # One group pinned near-constant at large magnitude.
    x = jnp.asarray(rng.randn(B, 7, 7, 16), jnp.float32)
    x = x.at[..., 0:2].set(173.2578)
    xf = jnp.transpose(x, (3, 0, 1, 2)).reshape(16, B * 49)
    scale = jnp.ones((16, 1), jnp.float32)
    bias = jnp.zeros((16, 1), jnp.float32)
    out = group_norm(xf, scale, bias, reduce_matrix(B, spec),
                     group_matrix(spec), spec)
    assert np.all(np.isfinite(np.asarray(out)))
    ref = nn.GroupNorm(num_groups=8, use_bias=False, use_scale=False,
                       epsilon=spec.eps).apply({}, x)
    reff = jnp.transpose(ref, (3, 0, 1, 2)).reshape(16, B * 49)
    assert np.all(np.isfinite(np.asarray(reff)))
    # The pinned group is degenerate (output = f32 summation residue
    # scaled by 1/sqrt(eps) — implementation-defined noise in BOTH
    # implementations); compare the healthy groups only.
    np.testing.assert_allclose(np.asarray(out[2:]), np.asarray(reff[2:]),
                               atol=1e-3)


def test_odeblock_fused_small_features():
    """ODEBlock(features=16, fused=True) must use the block's effective
    num_groups (min(32, features)), not the solve_conv_ode default."""
    from tfdiffeq_tpu.models.odenet import ODEBlock

    blk = ODEBlock(features=16, tol=1e-3)
    blkf = ODEBlock(features=16, tol=1e-3, fused=True)
    x = jnp.asarray(np.random.RandomState(1).randn(2, 7, 7, 16) * 0.5,
                    jnp.float32)
    vs = blk.init(jax.random.PRNGKey(0), x)
    ya, _ = blk.apply(vs, x, mutable=["diagnostics"])
    yb, _ = blkf.apply(vs, x, mutable=["diagnostics"])
    np.testing.assert_allclose(np.asarray(yb), np.asarray(ya), atol=1e-4)


@pytest.mark.slow
def test_odeblock_fused_adjoint_trains():
    """ODEBlock(fused=True, adjoint=True): fused forward + generic
    O(1)-memory backward — gradients match the all-generic adjoint
    block at tolerance level."""
    from tfdiffeq_tpu.models.odenet import ODEBlock

    x = jnp.asarray(np.random.RandomState(4).randn(2, 7, 7, 16) * 0.5,
                    jnp.float32)
    blk = ODEBlock(features=16, tol=1e-3, adjoint=True)
    blkf = ODEBlock(features=16, tol=1e-3, adjoint=True, fused=True)
    vs = blk.init(jax.random.PRNGKey(0), x)
    p0 = vs["params"]

    def loss(model, p):
        y, _ = model.apply({"params": p}, x, mutable=["diagnostics"])
        return jnp.sum(y ** 2)

    g = jax.grad(lambda p: loss(blk, p))(p0)
    gf = jax.grad(lambda p: loss(blkf, p))(p0)
    for a, b in zip(jax.tree_util.tree_leaves(gf),
                    jax.tree_util.tree_leaves(g)):
        d = float(jnp.max(jnp.abs(a - b)))
        m = float(jnp.max(jnp.abs(b)))
        assert d < 1e-4 + 5e-2 * m, (d, m)
