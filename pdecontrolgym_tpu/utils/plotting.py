"""Figure utilities for the PDE families (the reference does this plotting
inline in every example script/notebook — e.g. the styled 3D space-time
surface at ``examples/transportPDE/transport1Dbackstepping.py:100-131`` and
``reactionDiffusion1DBackstepping.py:120-135``; here it is one importable
function).

All functions take plain arrays (device or NumPy — they are converted on
entry), import matplotlib lazily, and return the created ``Axes`` so callers
can restyle. Nothing here runs on the accelerator hot path.
"""

from __future__ import annotations

import numpy as np

__all__ = ["surface_1d", "spacetime_1d", "ns_fields"]


def _require_pyplot():
    import matplotlib

    if matplotlib.get_backend().lower() not in ("agg", "module://matplotlib_inline.backend_inline"):
        try:  # headless images: fall back silently
            import matplotlib.pyplot  # noqa: F401
        except Exception:  # pragma: no cover
            matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    return plt


def surface_1d(history, T, X, ax=None, stride_t=None, x0=0.0, **surface_kw):
    """The reference's signature space-time surface plot of ``u(x, t)``.

    ``history``: array ``(nt, nx)`` of state rows over an episode (e.g. the
    stacked ``obs`` from a ``lax.scan`` rollout). ``stride_t`` subsamples the
    time axis (the reference uses ``rstride`` for the same purpose); default
    keeps ≤200 time rows. Returns the 3D ``Axes``.
    """
    u = np.asarray(history)
    if stride_t is None:
        stride_t = max(1, u.shape[0] // 200)
    u = u[::stride_t]
    plt = _require_pyplot()
    if ax is None:
        fig = plt.figure(figsize=(7, 4))
        ax = fig.add_subplot(projection="3d")
    spatial = np.linspace(x0, X, u.shape[1])
    temporal = np.linspace(0, T, u.shape[0])
    xx, tt = np.meshgrid(spatial, temporal)
    kw = dict(edgecolor="black", lw=0.2, alpha=1, color="white", shade=False,
              rasterized=True, antialiased=True)
    kw.update(surface_kw)
    ax.plot_surface(xx, tt, u, **kw)
    ax.view_init(10, 15)
    ax.set_xlabel("x")
    ax.set_ylabel("Time")
    ax.set_zlabel(r"$u(x, t)$", rotation=90)
    ax.zaxis.set_rotate_label(False)
    return ax


def spacetime_1d(history, T, X, ax=None, cmap="RdYlGn_r", label=None):
    """2D space-time heatmap of a 1D field (the traffic notebooks' view).

    ``history``: ``(nt, nx)``. Returns the ``Axes`` (colorbar attached when a
    new figure is created).
    """
    h = np.asarray(history)
    plt = _require_pyplot()
    new_fig = ax is None
    if new_fig:
        _, ax = plt.subplots(figsize=(6, 3.2))
    im = ax.imshow(h.T, aspect="auto", origin="lower", extent=[0, T, 0, X],
                   cmap=cmap)
    ax.set_xlabel("t")
    ax.set_ylabel("x")
    if label:
        ax.set_title(label)
    if new_fig:
        ax.figure.colorbar(im, ax=ax)
    return ax


def ns_fields(U, X, Y, ax=None, density=1, cmap="viridis"):
    """Speed contour + velocity quiver of a 2D NS field.

    ``U``: ``(ny, nx, 2)`` or a tuple ``(u, v)`` of ``(ny, nx)`` arrays (the
    env state layout, envs/navier_stokes.py). ``density`` subsamples the
    quiver arrows. Returns the ``Axes``.
    """
    if isinstance(U, (tuple, list)):
        u, v = (np.asarray(c) for c in U)
    else:
        U = np.asarray(U)
        u, v = U[..., 0], U[..., 1]
    plt = _require_pyplot()
    new_fig = ax is None
    if new_fig:
        _, ax = plt.subplots(figsize=(5, 4.2))
    ny, nx = u.shape
    xs = np.linspace(0, X, nx)
    ys = np.linspace(0, Y, ny)
    speed = np.hypot(u, v)
    cf = ax.contourf(xs, ys, speed, levels=24, cmap=cmap)
    s = max(1, int(density))
    step = max(1, nx // (16 * s))
    ax.quiver(xs[::step], ys[::step], u[::step, ::step], v[::step, ::step],
              color="white", scale_units="xy")
    ax.set_xlabel("x")
    ax.set_ylabel("y")
    if new_fig:
        ax.figure.colorbar(cf, ax=ax, label="|u|")
    return ax
