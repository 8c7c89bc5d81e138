"""Compile-DURATION budget guards (VERDICT round 1 'what's weak' #5).

The bounded-mode engine is a chunked scan whose compile cost scales with
max_steps/chunk_size; the round-1 default-budget cut (4096 -> 1024,
commit 70707a5) took the CNF suite from 366s to 140s. These tests pin the
wall-clock of a cold lower+compile for the standard configs on this
machine (measured 1-5s each; ceilings are ~10x to stay robust under CI
load while still catching a return to minutes-long compiles).

Complements the retrace-discipline tests (tests/test_parallel.py), which
check trace COUNTS, not compile duration.
"""

import time

import jax
import jax.numpy as jnp

from tfdiffeq_tpu import solve


def _f(t, y):
    return jnp.tanh(y) * jnp.sin(t) - 0.5 * y


Y0 = jnp.ones((16, 4))
T = jnp.linspace(0.0, 2.0, 8)


def _compile_seconds(fn, *args):
    t0 = time.perf_counter()
    jax.jit(fn).lower(*args).compile()
    return time.perf_counter() - t0


def test_default_bounded_forward_compiles_fast():
    def fwd(y0, t):
        return solve(_f, y0, t, method="dopri5",
                     options={"loop": "bounded"}).ys

    assert _compile_seconds(fwd, Y0, T) < 30.0


def test_grad_through_bounded_compiles_fast():
    def loss(y0):
        res = solve(_f, y0, T, method="dopri5",
                    options={"loop": "bounded"})
        return jnp.sum(res.ys[-1])

    assert _compile_seconds(jax.grad(loss), Y0) < 60.0


def test_dense_output_compile_overhead_bounded():
    def fwd(y0, t):
        return solve(_f, y0, t, method="dopri5",
                     options={"loop": "bounded", "dense_output": True}).ys

    assert _compile_seconds(fwd, Y0, T) < 30.0
