"""Static sensing / actuation dispatch for the 1D boundary-control envs.

The reference resolves its sensing/control variant ONCE at construction into
lambdas (the "lambda matrix" at ``hyperbolic.py:66-124`` and
``parabolic.py:64-122``). That is exactly jit static specialization: here each
variant becomes a small pure function selected at trace time, so the compiled
step contains only the chosen branch.

Spelling note: the reference spells Dirichlet as ``"Dirchilet"`` throughout its
public API. Both spellings are accepted here; the canonical form is resolved
via :func:`_canon`.
"""

from __future__ import annotations

from typing import Callable


DIRICHLET = "dirichlet"
NEUMANN = "neumann"

_SPELLINGS = {
    "dirchilet": DIRICHLET,  # reference spelling (hyperbolic.py:29)
    "dirichlet": DIRICHLET,
    "neumann": NEUMANN,
}


def _canon(kind: str, what: str) -> str:
    if kind is None:
        return None
    k = _SPELLINGS.get(str(kind).lower())
    if k is None:
        raise ValueError(
            f"Invalid {what} parameter {kind!r}. Use 'Neumann' or 'Dirchilet'."
        )
    return k


def is_neumann(control_type: str) -> bool:
    return _canon(control_type, "control_type") == NEUMANN


def make_control_fn(
    control_type: str, normalize: bool, max_control_value: float, dx: float
) -> Callable:
    """Return ``fn(control, state_neighbor) -> boundary_value``.

    Mirrors ``control_update`` selection (``hyperbolic.py:66-95``): Dirichlet
    control writes the action itself at the boundary; Neumann writes
    ``control*dx + u[neighbor]``. The reference then passes the result through
    its ``normalize`` lambda (``base_env_1d.py:36-39``), which maps [-1, 1]
    actions onto [-max, max]; note the reference normalizes the *combined*
    control_update output, replicated here for parity.
    """
    ct = _canon(control_type, "control_type")

    if ct == NEUMANN:
        update = lambda control, state: control * dx + state
    else:
        update = lambda control, state: control

    if normalize:
        return lambda control, state: (
            (update(control, state) + 1.0) * max_control_value - max_control_value
        )
    return update


def make_sensing_fn(
    sensing_loc: str,
    control_type: str,
    sensing_type: str,
    dx: float,
    left_dirichlet_fixed_zero: bool = False,
) -> tuple[Callable, int]:
    """Return ``(fn(u) -> obs, obs_dim)`` for a 1D state row ``u``.

    Static dispatch over the reference's sensing matrix
    (``hyperbolic.py:48-124``):

    - ``full``: the whole row.
    - ``collocated``: the boundary at the control side (x=X). Dirichlet control
      senses the Neumann trace ``(u[-1]-u[-2])/dx``; Neumann control senses the
      Dirichlet trace ``u[-1]``.
    - ``opposite``: the x=0 side, Dirichlet ``u[0]`` or Neumann
      ``(u[1]-u[0])/dx`` per ``sensing_type``.

    ``left_dirichlet_fixed_zero`` reproduces the parabolic env's refusal of
    Dirichlet sensing at x=0 where u(0,t)=0 identically (``parabolic.py:85,114``).

    ``obs_dim`` is -1 for full sensing (caller knows the row length), else 1.
    """
    loc = str(sensing_loc).lower()
    _canon(control_type, "control_type")

    if loc == "full":
        return (lambda u: u), -1

    if loc == "collocated":
        if _canon(control_type, "control_type") == NEUMANN:
            return (lambda u: u[..., -1:]), 1
        return (lambda u: (u[..., -1:] - u[..., -2:-1]) / dx), 1

    if loc == "opposite":
        st = _canon(sensing_type, "sensing_type")
        if st == NEUMANN:
            return (lambda u: (u[..., 1:2] - u[..., 0:1]) / dx), 1
        if left_dirichlet_fixed_zero:
            raise ValueError(
                "In the parabolic PDE system, u(0, t)=0 and so Dirichlet sensing "
                "at u(0, t) is not viable."
            )
        return (lambda u: u[..., 0:1]), 1

    raise ValueError(
        f"Invalid sensing_loc parameter {sensing_loc!r}. "
        "Use 'full', 'collocated', or 'opposite'."
    )
