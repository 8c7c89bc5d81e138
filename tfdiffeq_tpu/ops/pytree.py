"""Pytree state handling.

The reference library (tfdiffeq) supports state as a single tensor or a tuple of
tensors (see SURVEY.md §2 "Input checking": `_check_inputs` tensor-vs-tuple
normalization, upstream `tfdiffeq/misc.py`). The TPU-native design generalizes
this to arbitrary JAX pytrees, flattened ONCE per solve into a single flat
``[N]`` vector so that every solver operation is one fused element-wise pass
(VPU-friendly, Pallas-fusable) instead of a Python loop over tuple entries.
"""

from __future__ import annotations

from typing import Any, Callable, Tuple

import jax
import jax.numpy as jnp
from jax.flatten_util import ravel_pytree

Array = jax.Array


def flatten_state(y0: Any) -> Tuple[Array, Callable[[Array], Any]]:
    """Ravel a pytree state into a flat 1-D vector.

    Returns ``(flat, unravel)`` where ``unravel`` maps a flat vector back to
    the original pytree structure (with original shapes/dtypes).
    """
    flat, unravel = ravel_pytree(y0)
    if flat.ndim != 1:
        flat = flat.reshape(-1)
    return flat, unravel


def flat_ode_func(func: Callable, unravel: Callable[[Array], Any],
                  dtype) -> Callable[[Array, Array], Array]:
    """Wrap a user ODE function ``func(t, y_pytree) -> dy_pytree`` so it maps
    flat vectors to flat vectors.

    Mirrors the tuple-wrapping the reference does in ``_check_inputs``
    (upstream `tfdiffeq/misc.py`), but for general pytrees and exactly once
    per solve (no per-step Python overhead: everything traces into the
    compiled loop).
    """

    def f(t: Array, y_flat: Array) -> Array:
        dy = func(t, unravel(y_flat))
        dy_flat, _ = ravel_pytree(dy)
        return dy_flat.astype(dtype)

    return f


def unravel_trajectory(unravel: Callable[[Array], Any], out: Array) -> Any:
    """Map a stacked flat trajectory ``[T, N]`` back to a pytree whose leaves
    have a new leading time axis ``[T, ...]``."""
    return jax.vmap(unravel)(out)


def where_tree(pred: Array, a: Any, b: Any) -> Any:
    """`jnp.where` broadcast over a pytree (scalar predicate)."""
    return jax.tree_util.tree_map(lambda x, y: jnp.where(pred, x, y), a, b)
