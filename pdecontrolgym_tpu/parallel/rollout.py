"""Batched lockstep rollout engine: vmap over an env axis, scan over time.

The reference steps ONE Python env object per process (SB3 usage at
``examples/transportPDE/transport1Dppo.py:88-90``). Here thousands of envs run
in lockstep inside a single jitted program: done envs autoreset in-kernel from
the IC sampler, so the batch never stalls — the TPU-native replacement for
vectorized env wrappers.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp


def batch_init(env, num_envs: int):
    """Returns ``init(key) -> (state, obs)`` for a batch of envs."""

    def init(key):
        keys = jax.random.split(key, num_envs)
        return jax.vmap(env.init)(keys)

    return init


def batch_step(env, autoreset: bool = True):
    """Returns ``step(state, actions, key) -> (state, StepOut)`` (batched)."""

    if autoreset:
        def step(state, actions, key):
            n = jax.tree_util.tree_leaves(state)[0].shape[0]
            keys = jax.random.split(key, n)
            return jax.vmap(env.autoreset_step)(state, actions, keys)
    else:
        def step(state, actions, key):
            return jax.vmap(env.step)(state, actions)

    return step


def rollout(
    env,
    policy_fn: Callable,
    num_envs: int,
    num_steps: int,
    key: jax.Array,
    autoreset: bool = True,
):
    """Collect a ``(num_steps, num_envs, ...)`` trajectory under ``policy_fn``.

    ``policy_fn(obs, key) -> actions`` is any pure mapping (a backstepping
    controller, an MLP policy, random actions). Returns final carry and
    stacked StepOut pytree.
    """
    init = batch_init(env, num_envs)
    step = batch_step(env, autoreset)
    key, init_key = jax.random.split(key)
    state, obs = init(init_key)

    def body(carry, step_key):
        state, obs = carry
        act_key, env_key = jax.random.split(step_key)
        actions = policy_fn(obs, act_key)
        state, out = step(state, actions, env_key)
        return (state, out.obs), out

    keys = jax.random.split(key, num_steps)
    (state, obs), outs = jax.lax.scan(body, (state, obs), keys)
    return (state, obs), outs
