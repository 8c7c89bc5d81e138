"""Visualization smoke tests (parity: upstream viz_utils, SURVEY.md §2)."""

import matplotlib
matplotlib.use("Agg")

import jax.numpy as jnp
import numpy as np

from tfdiffeq_tpu.utils.viz import plot_phase_portrait, plot_vector_field


def _f(t, y):
    A = jnp.asarray([[-0.1, 2.0], [-2.0, -0.1]])
    return y @ A.T


def test_plot_vector_field(tmp_path):
    ax = plot_vector_field(_f, n=8)
    fig = ax.get_figure()
    out = tmp_path / "vf.png"
    fig.savefig(out)
    assert out.stat().st_size > 1000


def test_plot_phase_portrait(tmp_path):
    ax = plot_phase_portrait(_f, n=6)
    fig = ax.get_figure()
    out = tmp_path / "pp.png"
    fig.savefig(out)
    assert out.stat().st_size > 1000
