"""utils.plotting smoke: each figure helper renders from rollout-shaped
arrays without a display."""

import matplotlib

matplotlib.use("Agg")

import numpy as np

from pdecontrolgym_tpu.utils import ns_fields, spacetime_1d, surface_1d


def test_surface_1d_renders():
    h = np.sin(np.linspace(0, 6, 500)[:, None] + np.linspace(0, 3, 64)[None, :])
    ax = surface_1d(h, T=5.0, X=1.0)
    assert ax.name == "3d"
    assert len(ax.collections) == 1  # the surface
    ax.figure.canvas.draw()


def test_spacetime_1d_renders():
    h = np.random.default_rng(0).normal(size=(240, 32))
    ax = spacetime_1d(h, T=240.0, X=500.0, label="density")
    assert ax.get_title() == "density"
    assert len(ax.images) == 1
    ax.figure.canvas.draw()


def test_ns_fields_renders_both_layouts():
    rng = np.random.default_rng(0)
    u, v = rng.normal(size=(2, 21, 21))
    ax = ns_fields((u, v), X=1.0, Y=1.0)
    assert len(ax.collections) >= 2  # contourf + quiver
    stacked = np.stack([u, v], axis=-1)
    ax2 = ns_fields(stacked, X=1.0, Y=1.0)
    ax2.figure.canvas.draw()
