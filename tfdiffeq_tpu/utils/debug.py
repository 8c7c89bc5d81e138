"""Failure surfacing for on-device solves.

The reference raises Python exceptions from its host-side loop (e.g. on
`max_num_steps`); exceptions cannot cross `lax.while_loop`, so solvers here
carry an integer status out of the compiled loop (SURVEY.md §5 "Failure
detection"). This module converts those statuses back into host-side errors
at the jit boundary, and provides a checkify-based in-jit variant.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..solvers.base import SolveResult, Status


class SolverFailure(RuntimeError):
    def __init__(self, status: int, stats):
        self.status = Status(status)
        self.stats = stats
        super().__init__(
            f"ODE solve failed with status {self.status.name} "
            f"(nfe={int(stats.nfe)}, accepted={int(stats.n_accepted)}, "
            f"rejected={int(stats.n_rejected)}). "
            + {
                Status.MAX_STEPS_REACHED:
                    "Increase max_num_steps/max_steps or loosen tolerances.",
                Status.DT_UNDERFLOW:
                    "Step size collapsed — the dynamics likely produced "
                    "non-finite values or the problem is too stiff for an "
                    "explicit method at this tolerance.",
            }.get(self.status, ""))


def raise_on_failure(result: SolveResult) -> SolveResult:
    """Host-side: raise `SolverFailure` if the solve did not finish cleanly.

    Call OUTSIDE jit (it materializes the status scalar). Inside jit, use
    `checkify_solve` or branch on `result.stats.status` yourself.
    """
    status = int(result.stats.status)
    if status != int(Status.OK):
        raise SolverFailure(status, jax.tree_util.tree_map(
            lambda x: jnp.asarray(x), result.stats))
    return result


def checkify_solve(solve_fn):
    """Wrap a jittable function returning a SolveResult so solver failures
    become `checkify` errors: `err, res = checked(...); err.throw()`."""
    from jax.experimental import checkify

    def inner(*args, **kwargs):
        res = solve_fn(*args, **kwargs)
        checkify.check(res.stats.status == int(Status.OK),
                       "ODE solve failed with status {s}",
                       s=res.stats.status)
        return res

    return checkify.checkify(inner)
