"""Mixed-precision MXU tier tests (round-4 verdict item 2).

`MLPSpec(dot_precision='mixed')` quantizes weights to bf16 (the standard
serving-time model transform) and splits activations hi/lo-bf16 so each
dot is TWO systolic passes with f32 accumulation (~2^-18 relative error),
vs 3 passes for 'highest'. The dynamics integrated is therefore the
bf16-WEIGHT model, computed accurately — deterministic, so adaptive error
control keeps working (unlike the one-pass 'bf16' tier whose ~2e-3
activation noise poisons the embedded error estimate).

These run in interpret mode on CPU, where the bf16 casts are real (the
'bf16' tier, by contrast, is NOT CPU-testable: precision=None on CPU
computes exact f32). On-chip behavior is pinned by
tools/validate_kernels_tpu.py phase 8 and the BENCH mixed rows.
"""

import dataclasses

import jax.numpy as jnp
import numpy as np
import pytest

from tfdiffeq_tpu.fast import (DOT_PASSES, MLPSpec, calibrate_dot_precision,
                               solve_mlp_spec)


def _wide(B=96, D=64, H=128, seed=0):
    rng = np.random.RandomState(seed)
    dims = (D, H, H, D)
    weights = [
        (jnp.asarray(rng.randn(dims[i], dims[i + 1]) / np.sqrt(dims[i]),
                     jnp.float32),
         jnp.zeros((dims[i + 1],), jnp.float32))
        for i in range(3)
    ]
    y0 = jnp.asarray(rng.randn(B, D) * 0.5, jnp.float32)
    return weights, y0


SPEC = MLPSpec(activation="tanh", matmul="mxu")
T = jnp.linspace(0.0, 2.0, 5, dtype=jnp.float32)


def _solve(spec, weights, y0, rtol, **kw):
    kw.setdefault("atol", rtol)
    kw.setdefault("first_step", 0.01)
    return solve_mlp_spec(spec, weights, y0, T, rtol=rtol, method="dopri5",
                          interpret=True, **kw)


def test_mixed_integrates_the_bf16_weight_model():
    """The 'mixed' trajectory must match 'highest' run on pre-quantized
    bf16 weights (the model it claims to solve) to ~dot-split accuracy —
    far tighter than the ~2e-3 weight-quantization gap to the f32 model."""
    weights, y0 = _wide()
    wq = [(W.astype(jnp.bfloat16).astype(jnp.float32), b)
          for W, b in weights]
    r_mixed = _solve(dataclasses.replace(SPEC, dot_precision="mixed"),
                     weights, y0, rtol=1e-6)
    r_ref = _solve(SPEC, wq, y0, rtol=1e-6)
    assert int(r_mixed.stats.status) == 0
    err = float(jnp.max(jnp.abs(r_mixed.ys - r_ref.ys)))
    assert err < 5e-5, err
    # ... and it is NOT the f32-weight trajectory (weight quantization is
    # a real, visible model transform, ~1e-3 here).
    r_f32 = _solve(SPEC, weights, y0, rtol=1e-6)
    gap = float(jnp.max(jnp.abs(r_mixed.ys - r_f32.ys)))
    assert gap > 1e-4, gap


def test_mixed_nfe_parity_at_serving_tolerance():
    """At serving tolerances the 2^-18 dot noise sits under the embedded
    error estimate: step counts match 'highest' run on the SAME
    (pre-quantized) model to within one borderline accept — the reference
    dynamics is identical by construction, so any difference IS the noise
    (observed: equal at 1e-3, one extra step at 1e-4 where the controller
    sits on an accept threshold)."""
    weights, y0 = _wide()
    wq = [(W.astype(jnp.bfloat16).astype(jnp.float32), b)
          for W, b in weights]
    for rtol in (1e-3, 1e-4):
        r_hi = _solve(SPEC, wq, y0, rtol=rtol)
        r_mx = _solve(dataclasses.replace(SPEC, dot_precision="mixed"),
                      weights, y0, rtol=rtol)
        assert (int(r_mx.stats.n_accepted)
                <= int(r_hi.stats.n_accepted) + 1), rtol
        assert int(r_mx.stats.n_rejected) <= int(r_hi.stats.n_rejected) + 1


def test_mixed_wins_the_pass_cost_model_at_tight_tolerance():
    """At rtol=1e-6 the noise floor inflates NFE a few percent — but at
    2/3 the passes the MXU-time product must still beat 'highest' (this
    is the economics `calibrate_dot_precision` gates on)."""
    weights, y0 = _wide()
    r_hi = _solve(SPEC, weights, y0, rtol=1e-6)
    r_mx = _solve(dataclasses.replace(SPEC, dot_precision="mixed"),
                  weights, y0, rtol=1e-6)
    nfe_hi, nfe_mx = int(r_hi.stats.nfe), int(r_mx.stats.nfe)
    assert nfe_mx <= nfe_hi * 1.3, (nfe_mx, nfe_hi)
    assert nfe_mx * DOT_PASSES["mixed"] < nfe_hi * DOT_PASSES["highest"]


def test_calibrate_picks_mixed_then_falls_back():
    """The pass-cost gate returns 'mixed' where its NFE economics win and
    'highest' where the noise floor blows the step count past the
    inflation cap (tight rtol on a long horizon)."""
    weights, y0 = _wide(B=32)
    sp = calibrate_dot_precision(SPEC, weights, y0, T, rtol=1e-6, atol=1e-6,
                                 candidates=("mixed",), first_step=0.01,
                                 interpret=True)
    assert sp.dot_precision == "mixed"
    sp = calibrate_dot_precision(SPEC, weights, y0, T, rtol=1e-8, atol=1e-8,
                                 candidates=("mixed",),
                                 max_nfe_inflation=0.3, first_step=0.01,
                                 interpret=True)
    assert sp.dot_precision == "highest"


def test_mixed_fixed_grid_and_method_gates():
    """Fixed-grid methods accept 'mixed' (trajectory ~= quantized-weight
    reference); the Adams kernels reject every reduced-precision tier."""
    weights, y0 = _wide(B=32)
    spec_mx = dataclasses.replace(SPEC, dot_precision="mixed")
    r = solve_mlp_spec(spec_mx, weights, y0, T, method="rk4", num_steps=64,
                       interpret=True)
    wq = [(W.astype(jnp.bfloat16).astype(jnp.float32), b)
          for W, b in weights]
    ref = solve_mlp_spec(SPEC, wq, y0, T, method="rk4", num_steps=64,
                         interpret=True)
    np.testing.assert_allclose(np.asarray(r.ys), np.asarray(ref.ys),
                               atol=5e-5)
    with pytest.raises(ValueError, match="not supported"):
        solve_mlp_spec(spec_mx, weights, y0, T, method="adams",
                       interpret=True)


# ---------------------------------------------------------------------------
# Plan/bridge path: options={'fuse': True, 'dot_precision': ...} brings the
# same tiers to ARBITRARY bridge-compiled dynamics (round 5).
# ---------------------------------------------------------------------------

import warnings

import jax

from tfdiffeq_tpu import odeint_adjoint, solve


def _plain_mlp_dyn(weights):
    def dyn(tt, y):
        h = y
        for i, (W, b) in enumerate(weights):
            h = h @ W + b
            if i < len(weights) - 1:
                h = jnp.tanh(h)
        return h
    return dyn


def test_plan_mixed_integrates_the_bf16_weight_model():
    """The fused-option tier must match 'highest' fusion of the SAME
    pre-quantized closed-over weights (the model it claims to solve)."""
    weights, y0 = _wide()
    wq = [(W.astype(jnp.bfloat16).astype(jnp.float32), b)
          for W, b in weights]
    with warnings.catch_warnings():
        warnings.simplefilter("error")          # no fallback allowed
        r_mx = solve(_plain_mlp_dyn(weights), y0, T, rtol=1e-6, atol=1e-6,
                     options={"fuse": True, "dot_precision": "mixed",
                              "first_step": 0.01})
        r_ref = solve(_plain_mlp_dyn(wq), y0, T, rtol=1e-6, atol=1e-6,
                      options={"fuse": True, "first_step": 0.01})
    err = float(jnp.max(jnp.abs(r_mx.ys - r_ref.ys)))
    assert err < 5e-5, err
    # NFE economics: same gate as the MLPSpec tier.
    assert (int(r_mx.stats.nfe) * DOT_PASSES["mixed"]
            < int(r_ref.stats.nfe) * DOT_PASSES["highest"])
    # And it is NOT the f32-weight trajectory.
    r_f32 = solve(_plain_mlp_dyn(weights), y0, T, rtol=1e-6, atol=1e-6,
                  options={"fuse": True, "first_step": 0.01})
    assert float(jnp.max(jnp.abs(r_mx.ys - r_f32.ys))) > 1e-4


def test_plan_mixed_fixed_grid_and_gates():
    """rk4 accepts 'mixed' and 'bf16'; adaptive rejects 'bf16'; the
    Adams kernels reject both; unfusable dynamics must raise (a
    precision request never silently falls back to a differently-
    precisioned generic solve)."""
    weights, y0 = _wide(B=32)
    wq = [(W.astype(jnp.bfloat16).astype(jnp.float32), b)
          for W, b in weights]
    r = solve(_plain_mlp_dyn(weights), y0, T, method="rk4",
              options={"fuse": True, "dot_precision": "mixed",
                       "num_steps": 64})
    ref = solve(_plain_mlp_dyn(wq), y0, T, method="rk4",
                options={"fuse": True, "num_steps": 64})
    np.testing.assert_allclose(np.asarray(r.ys), np.asarray(ref.ys),
                               atol=5e-5)
    with pytest.raises(ValueError, match="fixed-grid"):
        solve(_plain_mlp_dyn(weights), y0, T, rtol=1e-4, atol=1e-4,
              options={"fuse": True, "dot_precision": "bf16"})
    with pytest.raises(ValueError, match="Adams"):
        solve(_plain_mlp_dyn(weights), y0, T, rtol=1e-4, atol=1e-4,
              method="adams",
              options={"fuse": True, "dot_precision": "mixed"})
    with pytest.raises(ValueError, match="fusion failed"):
        # A batch-axis cumsum is outside the bridge ISA -> FusionError ->
        # must surface as ValueError, not a generic-engine fallback.
        solve(lambda tt, yy: -yy * jnp.cumsum(yy, axis=0),
              y0, T, rtol=1e-4, atol=1e-4,
              options={"fuse": True, "dot_precision": "mixed"})


def test_plan_mixed_rejected_for_training():
    weights, y0 = _wide(B=32)

    def loss(w):
        dyn = lambda tt, yy, ww: jnp.tanh(yy @ ww[0][0]) @ ww[1][0]
        ys = odeint_adjoint(dyn, y0, T, params=w, rtol=1e-4, atol=1e-4,
                            options={"fuse": True,
                                     "dot_precision": "mixed"})
        return jnp.sum(ys ** 2)

    with pytest.raises(ValueError, match="serving"):
        jax.grad(loss)(weights[:2])
