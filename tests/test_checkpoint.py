"""Checkpoint/resume smoke tests for the example trainers (SURVEY.md §5
"Checkpoint / resume": Orbax in example trainers, library stays stateless).
"""

import os
import sys
import pytest

import jax
import numpy as np

_EXAMPLES = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "examples")
if _EXAMPLES not in sys.path:
    sys.path.insert(0, _EXAMPLES)


def _tiny_args(train_dir, niters):
    return ["--nspiral", "4", "--ntimes", "40", "--nsample", "8",
            "--latent_dim", "3", "--nhidden", "8", "--rnn_nhidden", "8",
            "--niters", str(niters), "--save_every", "2",
            "--train_dir", train_dir]


def test_latent_ode_checkpoint_resume(tmp_path, capsys):
    import latent_ode

    d = str(tmp_path / "ckpt")
    state1 = latent_ode.main(_tiny_args(d, 4))

    # Second invocation finds the iter-4 checkpoint: zero new iterations,
    # returned state identical to what run 1 saved.
    state2 = latent_ode.main(_tiny_args(d, 4))
    out = capsys.readouterr().out
    assert "resumed" in out and "at iter 4" in out
    for a, b in zip(jax.tree_util.tree_leaves(state1.params),
                    jax.tree_util.tree_leaves(state2.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for a, b in zip(jax.tree_util.tree_leaves(state1.opt_state),
                    jax.tree_util.tree_leaves(state2.opt_state)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # Extending the run resumes from 4 and trains onward (params change).
    state3 = latent_ode.main(_tiny_args(d, 6))
    changed = any(
        not np.array_equal(np.asarray(a), np.asarray(b))
        for a, b in zip(jax.tree_util.tree_leaves(state1.params),
                        jax.tree_util.tree_leaves(state3.params)))
    assert changed


@pytest.mark.slow
def test_odenet_mnist_checkpoint_resume(tmp_path, capsys):
    import odenet_mnist

    d = str(tmp_path / "ckpt_mnist")
    argv = ["--synthetic", "--nepochs", "1", "--batch_size", "64",
            "--limit_batches", "1", "--tol", "1e-1",
            "--train_dir", d]
    odenet_mnist.main(argv)
    # Re-run with one more epoch: must resume at epoch 1.
    odenet_mnist.main(["--synthetic", "--nepochs", "2", "--batch_size",
                       "64", "--limit_batches", "1", "--tol", "1e-1",
                       "--train_dir", d])
    out = capsys.readouterr().out
    assert "resumed" in out and "at epoch 1" in out
