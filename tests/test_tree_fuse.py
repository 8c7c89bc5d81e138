"""Pytree (tuple/dict) states on the FUSED tier.

The reference supports tuple-of-tensors state (SURVEY.md §2 "Input
checking"); the generic engine generalizes that to any pytree via a flat
ravel. Round 4 puts pytree states on the fused Pallas path too:
`fast.tree_state_adapter` concatenates leaves sharing a leading batch axis
into one [B, D] array along the feature axis, and the wrapper's
slice/reshape/concat ops lower through the bridge's existing ISA. These
tests pin parity (trajectories, NFE, adjoint cotangents) against the
generic engine and the fallback contract for non-conforming trees.
"""
import warnings

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tfdiffeq_tpu import odeint_adjoint, solve
from tfdiffeq_tpu.fast import tree_state_parts
from tfdiffeq_tpu.ops.jaxpr_bridge import FusionError

rng = np.random.RandomState(0)
B = 8
W = jnp.asarray(rng.randn(2, 2) * 0.5, jnp.float32)
T = jnp.linspace(0.0, 2.0, 5, dtype=jnp.float32)
Y0 = {"pos": jnp.asarray(rng.randn(B, 2), jnp.float32),
      "logp": jnp.asarray(rng.randn(B), jnp.float32)}


def dyn(tt, y):
    v = jnp.tanh(y["pos"] @ W)
    return {"pos": v, "logp": -jnp.sum(v, axis=-1)}


def _fused_silently(func, y0, t, **kw):
    """Solve with fuse: True, failing the test on any fallback warning."""
    with warnings.catch_warnings():
        warnings.simplefilter("error")
        opts = dict(kw.pop("options", {}), fuse=True)
        return solve(func, y0, t, options=opts, **kw)


def test_dict_state_fused_matches_generic():
    rf = _fused_silently(dyn, Y0, T, rtol=1e-6, atol=1e-8,
                         method="dopri5")
    rg = solve(dyn, Y0, T, rtol=1e-6, atol=1e-8, method="dopri5",
               options={"loop": "while"})
    for k in Y0:
        assert rf.ys[k].shape == rg.ys[k].shape
        assert float(jnp.max(jnp.abs(rf.ys[k] - rg.ys[k]))) < 1e-5
    assert int(rf.stats.nfe) == int(rg.stats.nfe)
    assert int(rf.stats.status) == 0


@pytest.mark.parametrize("method,opts", [
    ("rk4", {"num_steps": 32}),
    ("adams", {}),
])
def test_tuple_state_other_methods(method, opts):
    y0 = (Y0["pos"], Y0["logp"])

    def dynt(tt, y):
        v = jnp.tanh(y[0] @ W)
        return (v, -jnp.sum(v, axis=-1))

    rf = _fused_silently(dynt, y0, T, rtol=1e-6, atol=1e-8,
                         method=method, options=dict(opts))
    rg = solve(dynt, y0, T, rtol=1e-6, atol=1e-8, method=method,
               options=dict(opts))
    for a, b in zip(rf.ys, rg.ys):
        assert float(jnp.max(jnp.abs(a - b))) < 2e-5
    assert int(rf.stats.status) == 0
    if method != "adams":
        # NFE identity holds for fixed-step methods; VCABM's fused
        # contract is trajectories-at-tolerance with a step-count
        # envelope (controller ulp cascade, BASELINE.md round-3 table).
        assert int(rf.stats.nfe) == int(rg.stats.nfe)


def test_rank3_leaf_fuses_flatten_to_features():
    """Round-4 verdict item 4: rank-3 batch-leading states FUSE via the
    bridge's flatten-to-features layout (elementwise/broadcast dynamics;
    reshapes between [B, ...] views are block identities)."""
    y3 = jnp.asarray(rng.randn(B, 2, 3), jnp.float32)

    def dyn3(tt, y):
        return -0.5 * y + 0.1 * jnp.tanh(y)

    rf = _fused_silently(dyn3, y3, T, rtol=1e-6, atol=1e-8,
                         method="dopri5")
    rg = solve(dyn3, y3, T, rtol=1e-6, atol=1e-8, method="dopri5",
               options={"loop": "while"})
    assert float(jnp.max(jnp.abs(rf.ys - rg.ys))) < 1e-5
    assert int(rf.stats.nfe) == int(rg.stats.nfe)


def test_field_plus_aux_state_fuses_and_trains():
    """The verdict's done criterion: a {field [B, H, W], scalar-aux [B]}
    augmented state solves FUSED with parity vs generic — including
    cross-leaf coupling (aux scales the field; the field's energy drives
    the aux) and tier-1 two-kernel training with a PER-SAMPLE rank-3
    param const."""
    y0 = {"field": jnp.asarray(rng.randn(B, 4, 4), jnp.float32),
          "aux": jnp.asarray(rng.randn(B), jnp.float32)}
    K = jnp.asarray(rng.rand(B, 4, 4) + 0.5, jnp.float32)

    def dynf(tt, y, k):
        f = y["field"]
        df = -k * f + 0.2 * jnp.tanh(f) * y["aux"][:, None, None]
        da = -0.1 * y["aux"] + 0.01 * jnp.sum(f * f, axis=(1, 2))
        return {"field": df, "aux": da}

    rf = _fused_silently(lambda tt, y: dynf(tt, y, K), y0, T,
                         rtol=1e-6, atol=1e-8, method="dopri5")
    rg = solve(lambda tt, y: dynf(tt, y, K), y0, T, rtol=1e-6, atol=1e-8,
               method="dopri5", options={"loop": "while"})
    for k in y0:
        assert float(jnp.max(jnp.abs(rf.ys[k] - rg.ys[k]))) < 1e-5, k
    # f32 summation-order differences (feature-concat vs ravel) may flip
    # one borderline accept; trajectories above are the contract.
    assert abs(int(rf.stats.n_accepted) - int(rg.stats.n_accepted)) <= 1

    def loss(k, y, fuse):
        with warnings.catch_warnings():
            if fuse:
                warnings.simplefilter("error")
            ys = odeint_adjoint(dynf, y, T, params=k, rtol=1e-6,
                                atol=1e-8,
                                options={"fuse": True} if fuse else None)
        return jnp.sum(ys["field"] ** 2) + jnp.sum(jnp.sin(ys["aux"]))

    gf = jax.tree_util.tree_leaves(
        jax.grad(loss, argnums=(0, 1))(K, y0, True))
    gg = jax.tree_util.tree_leaves(
        jax.grad(loss, argnums=(0, 1))(K, y0, False))
    for a, b in zip(gf, gg):
        d = float(jnp.max(jnp.abs(a - b)))
        m = float(jnp.max(jnp.abs(b))) + 1e-12
        assert d / m < 1e-4, (d, m)


def test_rank3_spatial_ops_fall_back():
    """Ops whose flattened-row semantics would differ (partial-axis
    reduce, inner-axis slice) must REJECT — fallback with parity, never
    silent wrongness."""
    y3 = jnp.asarray(rng.randn(B, 2, 3), jnp.float32)

    def dynsp(tt, y):                 # partial (inner-axis) reduce
        return -y + 0.1 * jnp.sum(y, axis=2, keepdims=True)

    with pytest.warns(UserWarning, match="falling back"):
        rf = solve(dynsp, y3, T, rtol=1e-6, atol=1e-8, method="dopri5",
                   options={"fuse": True})
    rg = solve(dynsp, y3, T, rtol=1e-6, atol=1e-8, method="dopri5",
               options={"loop": "while"})
    assert float(jnp.max(jnp.abs(rf.ys - rg.ys))) < 1e-5

    def dynsl(tt, y):                 # inner-axis slice
        return -y + 0.1 * jnp.concatenate(
            [y[:, :, 1:], y[:, :, :1]], axis=2)

    with pytest.warns(UserWarning, match="falling back"):
        rf = solve(dynsl, y3, T, rtol=1e-6, atol=1e-8, method="dopri5",
                   options={"fuse": True})
    rg = solve(dynsl, y3, T, rtol=1e-6, atol=1e-8, method="dopri5",
               options={"loop": "while"})
    assert float(jnp.max(jnp.abs(rf.ys - rg.ys))) < 1e-5


def test_mismatched_batch_axis_falls_back():
    y0 = {"a": jnp.ones((4, 2), jnp.float32),
          "b": jnp.ones((5,), jnp.float32)}
    with pytest.raises(FusionError, match="leading"):
        tree_state_parts(y0)

    def d(tt, y):
        return {"a": -y["a"], "b": -y["b"]}

    with pytest.warns(UserWarning, match="falling back"):
        rf = solve(d, y0, T, method="dopri5", options={"fuse": True})
    assert int(rf.stats.status) == 0


def test_scalar_leaf_falls_back():
    y0 = {"a": jnp.ones((4, 2), jnp.float32),
          "s": jnp.asarray(1.0, jnp.float32)}
    with pytest.raises(FusionError, match="scalar leaves"):
        tree_state_parts(y0)


def test_pytree_fused_adjoint_grads_match_generic():
    """Tier-1 two-kernel training with a dict state: cotangents for the
    params pytree AND every y0 leaf match the generic continuous
    adjoint."""
    params = {"W": W, "b": jnp.zeros((2,), jnp.float32)}
    t4 = jnp.linspace(0.0, 1.5, 4, dtype=jnp.float32)

    def dp(tt, y, p):
        v = jnp.tanh(y["pos"] @ p["W"] + p["b"])
        return {"pos": v, "logp": -jnp.sum(v, axis=-1)}

    def loss(p, y, fuse):
        with warnings.catch_warnings():
            if fuse:
                warnings.simplefilter("error")
            ys = odeint_adjoint(
                dp, y, t4, params=p, rtol=1e-6, atol=1e-8,
                options={"fuse": True} if fuse
                else {"max_steps": 2048})
        return jnp.sum(ys["pos"] ** 2) + jnp.sum(jnp.sin(ys["logp"]))

    gf = jax.grad(loss, argnums=(0, 1))(params, Y0, True)
    gg = jax.grad(loss, argnums=(0, 1))(params, Y0, False)
    flat_f, _ = jax.tree_util.tree_flatten(gf)
    flat_g, _ = jax.tree_util.tree_flatten(gg)
    for a, b in zip(flat_f, flat_g):
        d = float(jnp.max(jnp.abs(a - b)))
        m = float(jnp.max(jnp.abs(b))) + 1e-12
        assert d / m < 1e-4, (d, m)
