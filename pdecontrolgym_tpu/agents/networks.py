"""Policy / value networks for the on-device agents.

The reference trains SB3 ``MlpPolicy`` (64x64 tanh MLPs) on CPU
(``transport1Dppo.py:88``). Here the same-capacity actor-critic is a flax
module evaluated in the rollout scan itself — observations never leave the
device. Hidden widths default to multiples of 128 so the matmuls tile cleanly
onto the MXU; compute runs in float32 (params) with optional bfloat16 matmuls.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn


class ActorCritic(nn.Module):
    action_dim: int
    hidden: Sequence[int] = (128, 128)
    log_std_init: float = 0.0
    action_low: float = -1.0
    action_high: float = 1.0

    @nn.compact
    def __call__(self, obs):
        x = obs
        for h in self.hidden:
            x = nn.tanh(nn.Dense(h)(x))
        mean = nn.Dense(self.action_dim)(x)
        log_std = self.param(
            "log_std", nn.initializers.constant(self.log_std_init),
            (self.action_dim,), jnp.float32,  # explicit: x64 mode would f64 it
        )

        v = obs
        for h in self.hidden:
            v = nn.tanh(nn.Dense(h)(v))
        value = nn.Dense(1)(v)
        return mean, log_std, value.squeeze(-1)


def sample_action(mean, log_std, key):
    std = jnp.exp(log_std)
    noise = jax.random.normal(key, mean.shape, mean.dtype)
    action = mean + std * noise
    logp = gaussian_logp(action, mean, log_std)
    return action, logp


def gaussian_logp(action, mean, log_std):
    std = jnp.exp(log_std)
    z = (action - mean) / std
    return jnp.sum(
        -0.5 * z**2 - log_std - 0.5 * jnp.log(2.0 * jnp.pi), axis=-1
    )


def entropy(log_std):
    return jnp.sum(log_std + 0.5 * jnp.log(2.0 * jnp.pi * jnp.e), axis=-1)
