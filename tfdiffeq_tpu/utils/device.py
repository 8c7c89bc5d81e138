"""Device/dtype convenience helpers.

Capability parity with the tfdiffeq-specific helpers in upstream
`tfdiffeq/misc.py`: `move_to_device(x, device)`, `cast_double(x)`,
`@func_cast_double` (SURVEY.md §2 "Device/dtype helpers").

JAX-native semantics: `move_to_device` is `jax.device_put` with a friendly
device spec (a `jax.Device`, a `jax.sharding.Sharding`, or a string like
'tpu:0' / 'cpu:0' / 'gpu' / the reference's TF-style '/gpu:0'); `cast_double`
casts pytree leaves to float64 when x64 is enabled, else to the widest
available float (float32 on TPU) with a one-time warning.
"""

from __future__ import annotations

import functools
import warnings
from typing import Any, Optional, Union

import jax
import jax.numpy as jnp


def _parse_device(device: Union[str, "jax.Device", None]):
    if device is None or not isinstance(device, str):
        return device
    spec = device.lower().strip().lstrip("/").replace("device:", "")
    if ":" in spec:
        kind, _, idx = spec.partition(":")
        idx = int(idx)
    else:
        kind, idx = spec, 0
    kind = {"gpu": "gpu", "cuda": "gpu", "tpu": "tpu", "cpu": "cpu"}.get(
        kind, kind)
    devs = [d for d in jax.devices() if d.platform == kind]
    if not devs:
        # Fall back across backends (e.g. asking for cpu while on TPU).
        try:
            devs = jax.devices(kind)
        except RuntimeError as e:
            raise ValueError(f"No devices of kind {kind!r} available") from e
    return devs[idx]


def move_to_device(x: Any, device: Union[str, "jax.Device", None]) -> Any:
    """Place a pytree of arrays onto a device (reference: `move_to_device`)."""
    d = _parse_device(device)
    if d is None:
        return x
    return jax.device_put(x, d)


def cast_double(x: Any) -> Any:
    """Cast floating leaves of a pytree to the widest enabled float dtype."""
    target = jnp.float64 if jax.config.jax_enable_x64 else jnp.float32
    if not jax.config.jax_enable_x64:
        warnings.warn(
            "cast_double: jax_enable_x64 is off (TPUs run float32); casting "
            "to float32. Enable x64 on CPU for true double precision.",
            stacklevel=2)

    def cast(leaf):
        if hasattr(leaf, "dtype") and jnp.issubdtype(leaf.dtype, jnp.floating):
            return leaf.astype(target)
        return leaf

    return jax.tree_util.tree_map(cast, x)


def func_cast_double(func):
    """Decorator: cast all array arguments to double before calling
    (reference: `@func_cast_double`)."""

    @functools.wraps(func)
    def wrapper(*args, **kwargs):
        args = cast_double(args)
        kwargs = cast_double(kwargs)
        return func(*args, **kwargs)

    return wrapper
