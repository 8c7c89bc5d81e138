"""Host-side NFE observability for adjoint training loops.

Capability parity with the reference's NFE logging: upstream
`examples/odenet_mnist.py` wraps the dynamics in a counter attribute and
logs forward AND backward NFE per step (SURVEY.md §2 "Example: ODE-Net
MNIST", §5 "Tracing / profiling"). Under jit a Python-side counter attribute
cannot work, so the solver carries NFE on-device (`SolverStats`) and — for
the backward pass, whose stats are produced inside `jax.custom_vjp`'s
backward rule where they cannot be returned to user code — streams them to
the host through `jax.experimental.io_callback`.

Usage::

    meter = NFEMeter()
    ys = odeint_adjoint(f, y0, t, params=p, nfe_meter=meter)
    # ... run training steps ...
    print(meter.f_nfe, meter.b_nfe)   # cumulative forward/backward NFE

The callbacks are unordered (no synchronization with the compiled program
beyond completion), add four scalar transfers per solve, and fire on every
execution including inside jit/grad/scan.
"""

from __future__ import annotations

import threading

import jax
import numpy as np

__all__ = ["NFEMeter"]


class NFEMeter:
    """Accumulates forward/backward solver stats streamed from device.

    Attributes (host ints, cumulative until `reset()`):
      f_nfe / b_nfe: function evaluations in forward / backward solves.
      f_steps / b_steps: accepted steps.
      f_calls / b_calls: number of solves recorded.
      last_f_nfe / last_b_nfe: most recent single-solve values.
    """

    def __init__(self):
        self._lock = threading.Lock()
        self.disabled_reason = None   # set when the backend can't stream
        # Probe callback support NOW (eagerly, at construction — inside a
        # jit trace the probe would be inlined into the user's program
        # instead of executing, defeating the try/except).
        if not _callbacks_supported():
            self.disabled_reason = (
                "backend %r does not support host callbacks; NFE streaming "
                "disabled (forward NFE is still available via return_stats)"
                % jax.default_backend())
        self.reset()

    def reset(self) -> None:
        with getattr(self, "_lock", threading.Lock()):
            self.f_nfe = 0
            self.b_nfe = 0
            self.f_steps = 0
            self.b_steps = 0
            self.f_calls = 0
            self.b_calls = 0
            self.last_f_nfe = 0
            self.last_b_nfe = 0

    # Device->host sinks (wired up by adjoint.py via io_callback). They
    # receive int32 scalars; io_callback delivers numpy values.
    def _record_fwd(self, nfe, n_acc) -> None:
        with self._lock:
            self.f_nfe += int(np.asarray(nfe))
            self.f_steps += int(np.asarray(n_acc))
            self.f_calls += 1
            self.last_f_nfe = int(np.asarray(nfe))

    def _record_bwd(self, nfe, n_acc) -> None:
        with self._lock:
            self.b_nfe += int(np.asarray(nfe))
            self.b_steps += int(np.asarray(n_acc))
            self.b_calls += 1
            self.last_b_nfe = int(np.asarray(nfe))

    def snapshot(self) -> dict:
        """Consistent copy of all counters (for periodic logging)."""
        with self._lock:
            return {
                "f_nfe": self.f_nfe, "b_nfe": self.b_nfe,
                "f_steps": self.f_steps, "b_steps": self.b_steps,
                "f_calls": self.f_calls, "b_calls": self.b_calls,
            }


_CB_SUPPORTED: dict = {}


def _callbacks_supported() -> bool:
    # Some PJRT plugins (e.g. the experimental axon single-chip TPU tunnel,
    # which reports platform 'tpu') reject host send/recv callbacks at RUN
    # time ("UNIMPLEMENTED: axon_pjrt does not support host send/recv
    # callbacks"), which cannot be caught from inside a compiled program —
    # so probe once per backend with a throwaway callback and cache.
    try:
        backend = jax.default_backend()
    except Exception:
        return True
    if backend not in _CB_SUPPORTED:
        import jax.numpy as jnp

        def _probe(x):
            jax.experimental.io_callback(lambda v: None, None, x,
                                         ordered=False)
            return x

        try:
            jax.block_until_ready(
                jax.jit(_probe)(jnp.zeros((), jnp.int32)))
            _CB_SUPPORTED[backend] = True
        except Exception:
            _CB_SUPPORTED[backend] = False
    return _CB_SUPPORTED[backend]


def _gate(meter) -> bool:
    return meter is not None and meter.disabled_reason is None


def emit_fwd(meter, nfe, n_acc) -> None:
    """Stream forward-solve stats to `meter` from inside a compiled program.

    No-op when meter is None or the backend lacks host callbacks (the
    meter's `disabled_reason` is set so callers can tell silence from
    zero). Unordered: safe under jit/scan/grad.
    """
    if _gate(meter):
        jax.experimental.io_callback(meter._record_fwd, None, nfe, n_acc,
                                     ordered=False)


def emit_bwd(meter, nfe, n_acc) -> None:
    """Stream backward-solve stats to `meter` (see `emit_fwd`)."""
    if _gate(meter):
        jax.experimental.io_callback(meter._record_bwd, None, nfe, n_acc,
                                     ordered=False)
