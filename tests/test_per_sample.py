"""Per-lane adaptive stepping (`options={'per_sample': True}`).

The capability README markets (torchode's motivation: one stiff sample
must not throttle the batch), previously delivered only as
jax.vmap(solve) on the generic engine. Round 4 moves it into the
whole-solve Pallas kernel (`ops/pallas_kernels._make_perlane_kernel`):
every batch lane carries its own controller state; these tests pin the
semantics against per-sample generic solves (the exact oracle).
"""

import warnings

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tfdiffeq_tpu import solve
from tfdiffeq_tpu.fast import MLPSpec, solve_mlp_spec


B = 8
KS = jnp.asarray(np.logspace(0, 2, B), jnp.float32)      # 1 .. 100x


def stiff_f(tt, yy):
    # Batch-coupled dynamics: per-sample decay rates close over a [B]
    # const (a 'batch' const in the bridge plan).
    return -KS[:, None] * yy


def per_sample_oracle(t, rtol=1e-6, atol=1e-8, **opts):
    """Exact oracle: one independent generic solve per sample."""
    y0 = jnp.ones((B, 1), jnp.float32)
    ys, nfe, status = [], [], []
    for i in range(B):
        res = solve(lambda tt, yy, kk=float(KS[i]): -kk * yy, y0[i:i + 1],
                    t, rtol=rtol, atol=atol,
                    options={"loop": "while", **opts})
        ys.append(res.ys[:, 0])
        nfe.append(int(res.stats.nfe))
        status.append(int(res.stats.status))
    return jnp.stack(ys, axis=1), nfe, status


def test_per_lane_kernel_matches_per_sample_generic():
    t = jnp.linspace(0.0, 1.0, 5, dtype=jnp.float32)
    y0 = jnp.ones((B, 1), jnp.float32)
    with warnings.catch_warnings():
        warnings.simplefilter("error")       # a fallback warning = FAIL
        r = solve(stiff_f, y0, t, rtol=1e-6, atol=1e-8,
                  options={"fuse": True, "per_sample": True})
    ys_ref, nfe_ref, _ = per_sample_oracle(t)
    assert int(r.stats.status) == 0
    assert float(jnp.max(jnp.abs(r.ys - ys_ref))) < 2e-6
    lane_nfe = [int(x) for x in r.lane_stats.nfe]
    # Per-lane adaptivity: the stiffest lane takes >5x the mildest's steps
    assert lane_nfe[-1] > 5 * lane_nfe[0]
    # and each lane's count is near its independent-solve count (dt0 is
    # the batched-probe HNW variant, so small deviations are expected).
    for a, b in zip(lane_nfe, nfe_ref):
        assert abs(a - b) <= max(8, 0.15 * b), (lane_nfe, nfe_ref)
    assert int(r.stats.nfe) == sum(lane_nfe)


def test_per_lane_reverse_time():
    # Short span: backward decay grows as e^(k*span); 0.2 keeps the k=100
    # lane at e^20 (f32-representable) instead of overflowing.
    t = jnp.linspace(0.2, 0.0, 5, dtype=jnp.float32)
    y0 = jnp.ones((B, 1), jnp.float32)
    r = solve(stiff_f, y0, t, rtol=1e-6, atol=1e-8,
              options={"fuse": True, "per_sample": True})
    ys_ref, _, _ = per_sample_oracle(t)
    assert int(r.stats.status) == 0
    rel = float(jnp.max(jnp.abs(r.ys - ys_ref) / (jnp.abs(ys_ref) + 1.0)))
    assert rel < 2e-5


def test_per_lane_mlp_spec_path():
    rng = np.random.RandomState(0)
    w = [(jnp.asarray(rng.randn(2, 16) * 0.3, jnp.float32),
          jnp.zeros(16, jnp.float32)),
         (jnp.asarray(rng.randn(16, 2) * 0.3, jnp.float32),
          jnp.zeros(2, jnp.float32))]
    spec = MLPSpec(activation="tanh", input_power=3)
    # Spread of initial magnitudes -> spread of local stiffness.
    y0 = jnp.asarray(rng.randn(16, 2), jnp.float32) * jnp.linspace(
        0.2, 2.0, 16)[:, None]
    t = jnp.linspace(0.0, 2.0, 7, dtype=jnp.float32)
    r = solve_mlp_spec(spec, w, y0, t, rtol=1e-6, atol=1e-8,
                       per_sample=True)
    assert int(r.stats.status) == 0
    assert r.lane_stats is not None and r.lane_stats.nfe.shape == (16,)
    # Oracle: per-sample generic solves of the same MLP.
    from tfdiffeq_tpu.fast import mlp_apply
    for i in (0, 7, 15):
        res = solve(lambda tt, yy: mlp_apply(spec, w, yy, tt),
                    y0[i:i + 1], t, rtol=1e-6, atol=1e-8,
                    options={"loop": "while"})
        d = float(jnp.max(jnp.abs(r.ys[:, i] - res.ys[:, 0])))
        assert d < 5e-6, (i, d)


def test_per_lane_max_steps_status_is_per_lane():
    t = jnp.linspace(0.0, 1.0, 3, dtype=jnp.float32)
    y0 = jnp.ones((B, 1), jnp.float32)
    r = solve(stiff_f, y0, t, rtol=1e-8, atol=1e-10,
              options={"fuse": True, "per_sample": True,
                       "max_num_steps": 40, "first_step": 0.05})
    st = [int(x) for x in r.lane_stats.status]
    # Mild lanes finish inside the budget; the stiffest cannot.
    assert st[0] == 0
    assert st[-1] == 1
    assert int(r.stats.status) == 1          # scalar status = max


def test_per_sample_without_fuse_takes_vmap_route():
    t = jnp.linspace(0.0, 1.0, 5, dtype=jnp.float32)
    y0 = jnp.ones((4, 1), jnp.float32)
    r = solve(lambda tt, yy: -yy * jnp.abs(yy), y0 * jnp.asarray(
        [0.5, 1.0, 2.0, 4.0])[:, None], t, rtol=1e-6, atol=1e-8,
        options={"per_sample": True})
    assert r.lane_stats is not None
    assert r.lane_stats.nfe.shape == (4,)
    assert int(jnp.max(r.lane_stats.status)) == 0


def test_per_sample_unfusable_falls_back_to_vmap():
    t = jnp.linspace(0.0, 1.0, 4, dtype=jnp.float32)
    y0 = jnp.abs(jnp.asarray(np.random.RandomState(1).randn(4, 3),
                             jnp.float32))

    def f(tt, yy):                       # sort: outside the bridge ISA
        return -jnp.sort(yy, axis=1)

    with pytest.warns(UserWarning, match="vmap of the generic"):
        r = solve(f, y0, t, rtol=1e-5, atol=1e-7,
                  options={"fuse": True, "per_sample": True})
    assert r.lane_stats is not None and r.lane_stats.nfe.shape == (4,)
    rg = solve(f, y0, t, rtol=1e-5, atol=1e-7,
               options={"loop": "while"})
    assert float(jnp.max(jnp.abs(r.ys - rg.ys))) < 1e-4


def test_per_sample_rejects_non_adaptive():
    t = jnp.linspace(0.0, 1.0, 4, dtype=jnp.float32)
    y0 = jnp.ones((4, 2), jnp.float32)
    # Fixed-grid methods reject it at the option allowlist (no controller
    # to make per-sample).
    with pytest.raises((ValueError, TypeError),
                       match="per_sample|adaptive"):
        solve(lambda tt, yy: -yy, y0, t, method="rk4",
              options={"per_sample": True})


def test_per_lane_past_vmem_budget_grid_blocks(monkeypatch):
    """Round-4 verdict item 3 (forward): per-lane controllers are
    independent, so batches past the VMEM budget run as sequential
    lane-block grid programs with BIT-identical results (forced by
    shrinking the budget)."""
    import tfdiffeq_tpu.fast as fast

    t = jnp.linspace(0.0, 1.0, 5, dtype=jnp.float32)
    y0 = jnp.asarray(np.linspace(0.2, 2.0, 4096)[:, None], jnp.float32)

    def stiff2(tt, yy):
        return -(1.0 + 30.0 * yy * yy) * yy

    with warnings.catch_warnings():
        warnings.simplefilter("error")
        r1 = solve(stiff2, y0, t, rtol=1e-6, atol=1e-8,
                   options={"fuse": True, "per_sample": True})
    monkeypatch.setattr(fast, "_VMEM_BUDGET", 1_000_000)
    with warnings.catch_warnings():
        warnings.simplefilter("error")          # no fallback allowed
        r2 = solve(stiff2, y0, t, rtol=1e-6, atol=1e-8,
                   options={"fuse": True, "per_sample": True})
    np.testing.assert_array_equal(np.asarray(r2.ys), np.asarray(r1.ys))
    assert bool(jnp.all(r2.lane_stats.nfe == r1.lane_stats.nfe))
    assert int(r2.stats.nfe) == int(r1.stats.nfe)
