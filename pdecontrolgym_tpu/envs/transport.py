"""1D transport (linear hyperbolic) PDE with boundary control.

PDE: ``u_t = u_x + β(x) u(0, t)`` on x ∈ [0, X], controlled at x = X.

Scheme parity with ``src/environments1d/hyperbolic.py:140-156``:

- first-order explicit upwind: the new interior row (indices 0..nx-2) is
  ``u + dt·((u⁺ − u)/dx + u[0]·β)`` evaluated on the *previous* row,
- the boundary (index nx-1) is written from the control *before* the interior
  update, so Neumann control reads the new row's ``[-2]`` entry while it is
  still zero (``hyperbolic.py:143-145``) — i.e. the Neumann neighbor term is
  identically 0. Replicated for trajectory parity.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from pdecontrolgym_tpu.envs.common import Boundary1DConfig, Boundary1DEnv

TransportConfig = Boundary1DConfig


class TransportEnv(Boundary1DEnv):
    def _pallas_auto(self) -> bool:
        # crossover sweep with the transposed kernel (docs/PERFORMANCE.md):
        # Pallas wins from nx=128 up (full-episode 2.53B vs XLA's 2.19B at
        # 128; 884M vs 466M at 256, widening as the XLA carry spills: 140M vs
        # 36M at 2048; 88.6M vs 6.5M at 4096; 45.0M vs 3.0M at 8192; 22.6M vs
        # 1.5M at 16384 — the round-2 VMEM cliff is gone: the column blocks
        # single-buffer for D >= 3072 and the kernel claims the full VMEM
        # ceiling, ops/pallas1d). XLA still wins only for tiny states (1.18B
        # vs 1.07B at nx=64); above the largest measured size stay on XLA
        # (compile time grows superlinearly: 170 s at 16384).
        import jax

        return 128 <= self.state_dim <= 16384 and jax.default_backend() != "cpu"

    def _advance(self, u_prev, beta, control):
        c = self.config
        dt = c.dtype(c.dt)
        dtdx = c.dtype(c.dt / c.dx)
        # Neumann neighbor is the NEW row's [-2], still zero at write time.
        boundary = self._control_fn(control, jnp.zeros((), c.dtype))
        # folded association (dt/dx pre-divided, beta pre-scaled by dt —
        # loop-invariant, XLA hoists it out of the sub-step scan): 12% faster
        # than dt*((up-u)/dx + u0*beta) in the Pallas body and bitwise-matched
        # by transport_update_t. Differs from the reference's association by
        # ~1 ulp/sub-step; parity suites are tolerance-based and pass.
        interior = (
            u_prev[:-1]
            + dtdx * (u_prev[1:] - u_prev[:-1])
            + u_prev[0] * (dt * beta[:-1])
        )
        u_new = jnp.concatenate([interior, boundary[None]])
        return u_new, boundary

    def _pallas_spec(self):
        from pdecontrolgym_tpu.ops.pallas1d import transport_update_t

        c = self.config
        # the boundary value is constant over the interval for BOTH control
        # types (the Neumann neighbor reads the new row's still-zero [-2])
        zero = jnp.zeros((), c.dtype)
        return (
            transport_update_t(c.dt, c.dx, self.state_dim),
            lambda control: self._control_fn(control, zero),
        )

    def default_ic(self, key):
        """Mirrors the benchmark example's samplers: a flat IC of height
        U(1, 10) and the Chebyshev recirculation β(x) = 5·cos(7.35·acos x)
        (``examples/transportPDE/transport1Dbackstepping.py:39-45``)."""
        c = self.config
        height = jax.random.uniform(key, (), c.dtype, 1.0, 10.0)
        u0 = jnp.full((self.state_dim,), height, c.dtype)
        beta = chebyshev_beta(self.state_dim, 7.35, 5.0, c.dtype)
        return u0, beta


def chebyshev_beta(nx: int, gamma: float = 7.35, scale: float = 5.0, dtype=jnp.float32):
    """β(x) = scale·cos(γ·acos x) on a uniform [0, 1] grid of nx points."""
    x = jnp.linspace(0.0, 1.0, nx)
    return (scale * jnp.cos(gamma * jnp.arccos(x))).astype(dtype)
