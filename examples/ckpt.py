"""Orbax checkpoint/resume helpers shared by the example trainers.

The reference's examples at most saved Keras weights (SURVEY.md §5
"Checkpoint / resume": library stays stateless, checkpointing lives in the
example trainers). TPU-native equivalent: Orbax `CheckpointManager` saving
the full training state (params + optimizer state + step) so interrupted
runs resume exactly.
"""

from __future__ import annotations

import os
from typing import Any, Optional, Tuple

import jax


def make_manager(train_dir: str, max_to_keep: int = 2):
    """CheckpointManager rooted at `train_dir` (created if missing)."""
    import orbax.checkpoint as ocp

    path = os.path.abspath(train_dir)
    os.makedirs(path, exist_ok=True)
    return ocp.CheckpointManager(
        path, options=ocp.CheckpointManagerOptions(max_to_keep=max_to_keep))


def save(mngr, step: int, state: Any) -> None:
    """Save a training-state pytree at `step` (async; see `finish`)."""
    import orbax.checkpoint as ocp

    mngr.save(step, args=ocp.args.StandardSave(state))


def restore_latest(mngr, state_template: Any) -> Tuple[Optional[int], Any]:
    """Restore the newest checkpoint into the template's structure.

    Returns (step, state); (None, state_template) when no checkpoint
    exists. The template supplies shapes/dtypes/sharding — pass the
    freshly-initialized training state.
    """
    import orbax.checkpoint as ocp

    step = mngr.latest_step()
    if step is None:
        return None, state_template
    tmpl = jax.tree_util.tree_map(ocp.utils.to_shape_dtype_struct,
                                  state_template)
    restored = mngr.restore(step, args=ocp.args.StandardRestore(tmpl))
    return step, restored


def finish(mngr) -> None:
    """Block until async saves land (call before process exit)."""
    mngr.wait_until_finished()
