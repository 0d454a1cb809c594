"""Evaluation harness — the reference's ``testAlgorithm`` scripts, batched.

``examples/transportPDE/transport1DtestAlgorithm.py:78-152`` runs N episodes
sequentially per controller and compares average total rewards (backstepping
vs PPO vs SAC). Here the N episodes run as one vmapped lockstep batch inside a
single jitted scan; finished episodes stop accumulating via an alive mask.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp


def episode_returns(
    env,
    policy_fn: Callable,
    num_episodes: int,
    key: jax.Array,
    max_steps: int,
):
    """Total reward per episode for ``num_episodes`` independent rollouts.

    ``policy_fn(obs, key) -> actions`` (batched over the leading axis).
    Returns ``(returns, lengths)`` with shapes ``(num_episodes,)``.
    """
    key, init_key = jax.random.split(key)
    state, obs = jax.vmap(env.init)(jax.random.split(init_key, num_episodes))

    step_batch = getattr(env, "step_batch", None)

    def body(carry, step_key):
        state, obs, alive, total, length = carry
        actions = policy_fn(obs, step_key)
        if step_batch is not None:
            state, out = step_batch(state, actions)
        else:
            state, out = jax.vmap(env.step)(state, actions)
        total = total + jnp.where(alive, out.reward, 0.0)
        length = length + alive.astype(jnp.int32)
        done = jnp.logical_or(out.terminated, out.truncated)
        alive = jnp.logical_and(alive, ~done)
        return (state, out.obs, alive, total, length), None

    alive = jnp.ones((num_episodes,), jnp.bool_)
    total = jnp.zeros((num_episodes,))
    length = jnp.zeros((num_episodes,), jnp.int32)
    keys = jax.random.split(key, max_steps)
    (state, obs, alive, total, length), _ = jax.lax.scan(
        body, (state, obs, alive, total, length), keys
    )
    return total, length


def compare_controllers(
    env,
    controllers: dict,
    num_episodes: int = 50,
    key: Optional[jax.Array] = None,
    max_steps: int = 1000,
):
    """Average return per controller over ``num_episodes`` (the notebook
    tables, e.g. backstepping 243.06 in ``HyperbolicPDEExample.ipynb``)."""
    key = key if key is not None else jax.random.key(0)
    results = {}
    for name, policy_fn in controllers.items():
        returns, lengths = episode_returns(
            env, policy_fn, num_episodes, key, max_steps
        )
        results[name] = {
            "mean_return": float(returns.mean()),
            "std_return": float(returns.std()),
            "mean_length": float(lengths.mean()),
        }
    return results
