"""Phase-portrait / vector-field visualization.

Capability parity with upstream `tfdiffeq/viz_utils.py` (SURVEY.md §2):
`plot_vector_field` and `plot_phase_portrait` of a dynamics function over a
2-D grid, via matplotlib. Evaluation of the dynamics over the grid is one
batched (vmapped) device call rather than a Python double loop.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np


def _grid_dynamics(func: Callable, t: float, lim: float, n: int):
    xs = np.linspace(-lim, lim, n)
    X, Y = np.meshgrid(xs, xs)
    pts = jnp.asarray(np.stack([X.ravel(), Y.ravel()], axis=-1),
                      jnp.float32)
    dydt = np.asarray(jax.vmap(lambda y: func(jnp.asarray(t, jnp.float32),
                                              y))(pts))
    U = dydt[:, 0].reshape(n, n)
    V = dydt[:, 1].reshape(n, n)
    return X, Y, U, V


def plot_vector_field(func: Callable, t: float = 0.0, lim: float = 2.0,
                      n: int = 21, ax=None, normalize: bool = True,
                      **quiver_kwargs):
    """Quiver plot of a 2-D dynamics func(t, y[2]) -> dy[2]."""
    import matplotlib.pyplot as plt

    if ax is None:
        _, ax = plt.subplots(figsize=(6, 6))
    X, Y, U, V = _grid_dynamics(func, t, lim, n)
    if normalize:
        mag = np.sqrt(U ** 2 + V ** 2) + 1e-12
        U, V = U / mag, V / mag
    ax.quiver(X, Y, U, V, **quiver_kwargs)
    ax.set_xlim(-lim, lim)
    ax.set_ylim(-lim, lim)
    return ax


def plot_phase_portrait(func: Callable, t: float = 0.0, lim: float = 2.0,
                        n: int = 200, ax=None, trajectories=None,
                        density: float = 1.2, **stream_kwargs):
    """Streamline phase portrait of a 2-D dynamics; optionally overlays
    trajectories (array [T, 2] or sequence thereof)."""
    import matplotlib.pyplot as plt

    if ax is None:
        _, ax = plt.subplots(figsize=(6, 6))
    X, Y, U, V = _grid_dynamics(func, t, lim, n)
    ax.streamplot(X, Y, U, V, density=density, **stream_kwargs)
    if trajectories is not None:
        if hasattr(trajectories, "ndim") and trajectories.ndim == 2:
            trajectories = [trajectories]
        for traj in trajectories:
            traj = np.asarray(traj)
            ax.plot(traj[:, 0], traj[:, 1], lw=2)
    ax.set_xlim(-lim, lim)
    ax.set_ylim(-lim, lim)
    return ax
