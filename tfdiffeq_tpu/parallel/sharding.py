"""Multi-device scale-out via jax.sharding.

The reference is strictly single-device: its only "parallelism" is implicit
broadcasting over a leading batch axis, and its "GPU support" is TF eager op
placement (SURVEY.md §2, §5 — no DP/TP/PP/SP/EP, no NCCL/MPI). The
TPU-native scale-out story is therefore *additive*, not ported:

- batch ("data") parallelism: shard the leading batch axis of the state over
  a mesh axis; the solver's element-wise arithmetic and the user dynamics
  then run fully sharded, with XLA inserting the (few) collectives — e.g.
  the error-norm reduction becomes a tiny all-reduce over ICI, and gradient
  aggregation in a training step becomes a psum.
- model ("tensor") parallelism for the dynamics net: shard hidden dimensions
  of the MLP weights over a second mesh axis.

No pipeline/sequence/expert parallelism applies to this workload: an ODE
solve is sequential in time (step n+1 depends on step n), the state has no
sequence axis, and there are no experts. The scalable axes are batch and
state width, both handled here.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

Array = jax.Array


def make_mesh(shape: Optional[Tuple[int, ...]] = None,
              axis_names: Sequence[str] = ("data", "model"),
              devices: Optional[Sequence[jax.Device]] = None) -> Mesh:
    """Build a device mesh. Default: all devices on axis 'data'.

    make_mesh() -> 1-D data mesh over all devices;
    make_mesh((4, 2)) -> 4-way data x 2-way model.
    """
    devices = list(devices if devices is not None else jax.devices())
    if shape is None:
        shape = (len(devices),)
    axis_names = tuple(axis_names)
    if len(axis_names) > len(shape):
        axis_names = axis_names[: len(shape)]
    elif len(axis_names) < len(shape):
        axis_names = axis_names + tuple(
            f"ax{i}" for i in range(len(axis_names), len(shape)))
    n = int(np.prod(shape))
    if n != len(devices):
        raise ValueError(f"mesh shape {shape} needs {n} devices, "
                         f"have {len(devices)}")
    dev_array = np.asarray(devices).reshape(shape)
    return Mesh(dev_array, axis_names)


def shard_batch(tree: Any, mesh: Mesh, axis: str = "data") -> Any:
    """Place a pytree with its leading (batch) axis sharded over `axis`."""
    def put(x):
        if jnp.ndim(x) == 0:          # scalar leaves: replicate
            return jax.device_put(x, NamedSharding(mesh, P()))
        spec = P(axis, *([None] * (jnp.ndim(x) - 1)))
        return jax.device_put(x, NamedSharding(mesh, spec))
    return jax.tree_util.tree_map(put, tree)


def replicate(tree: Any, mesh: Mesh) -> Any:
    """Replicate a pytree (e.g. model parameters) across the mesh."""
    def put(x):
        return jax.device_put(x, NamedSharding(mesh, P()))
    return jax.tree_util.tree_map(put, tree)


def batch_sharding(mesh: Mesh, ndim: int, axis: str = "data") -> NamedSharding:
    return NamedSharding(mesh, P(axis, *([None] * (ndim - 1))))
