"""tfdiffeq_tpu — TPU-native JAX ODE solvers.

A ground-up rebuild of the capabilities of `titu1994/tfdiffeq` (the TF port
of torchdiffeq; see SURVEY.md) designed for TPU/XLA: solver loops compile to
single on-device `lax.while_loop`/`lax.scan` programs, state is an arbitrary
pytree flattened once per solve, stage arithmetic fuses (optionally into
Pallas kernels), and gradients come either from plain `jax.grad` through the
solver (direct / discretize-then-optimize) or from `odeint_adjoint`
(O(1)-memory continuous adjoint).
"""

from .odeint import SOLVERS, odeint, solve
from .solvers.base import SolveResult, SolverStats, Status

# Register the Adams family into SOLVERS (import side effect).
from .solvers import fixed_adams as _fixed_adams  # noqa: F401
from .solvers import adams as _adams  # noqa: F401
from .solvers import hyper as _hyper  # noqa: F401

from .adjoint import odeint_adjoint
from .ops.doublefloat import (odeint_adjoint_df, odeint_df,
                              solve_df)
from .utils.device import cast_double, func_cast_double, move_to_device
from .utils.nfe import NFEMeter
from .utils.viz import plot_phase_portrait, plot_vector_field

__version__ = "0.1.0"

__all__ = [
    "odeint",
    "odeint_adjoint",
    "odeint_adjoint_df",
    "odeint_df",
    "solve",
    "solve_df",
    "SOLVERS",
    "SolveResult",
    "SolverStats",
    "Status",
    "NFEMeter",
    "move_to_device",
    "cast_double",
    "func_cast_double",
    "plot_phase_portrait",
    "plot_vector_field",
]
