"""Return/advantage computations as lax.scan recursions.

TD(λ) matches the reference ``compute_td_returns``
(`/root/reference/utils/algorithms/common.py:893-923`) exactly (Ai/Bi/lam
recursion with done and episode-done masks); GAE matches SB3's rollout
buffer computation used by the reference PPO.
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from jax import Array


def compute_td_returns(
    rewards: Array,  # (H, N)
    dones: Array,  # (H, N) bool
    next_values: Array,  # (H, N)
    episode_dones: Array,  # (H, N) bool
    gamma: float = 0.99,
    lam: float = 0.95,
) -> Array:
    """(H, N) TD(λ) targets — the reference recursion verbatim."""
    h, n = rewards.shape
    a0 = jnp.zeros((n,), rewards.dtype)
    lam0 = jnp.ones((n,), rewards.dtype)
    b0 = next_values[-1] * (~dones[-1])

    def body(carry, xs):
        ai, bi, lam_t = carry
        r, done, nv, ep_done = xs
        active = (~done).astype(rewards.dtype)
        done_f = done.astype(rewards.dtype)
        ep_active = (~ep_done).astype(rewards.dtype)
        lam_t = lam_t * lam * active + done_f
        ai = active * (lam * gamma * ai + gamma * nv + ((1.0 - lam_t) / (1.0 - lam)) * r)
        bi = gamma * (nv * done_f * ep_active + bi * active) + r
        ret = (1.0 - lam) * ai + lam_t * bi
        return (ai, bi, lam_t), ret

    _, returns = jax.lax.scan(
        body, (a0, b0, lam0),
        (rewards, dones, next_values, episode_dones),
        reverse=True,
    )
    return returns


def compute_gae(
    rewards: Array,  # (H, N)
    values: Array,  # (H, N)
    dones: Array,  # (H, N) bool — done AFTER this step
    last_value: Array,  # (N,)
    last_done: Array,  # (N,) bool
    gamma: float = 0.99,
    gae_lambda: float = 0.95,
) -> Tuple[Array, Array]:
    """SB3-style GAE. Returns (advantages, returns) each (H, N).

    ``dones[t]`` marks an episode ending AT step t — it gates the bootstrap
    from V(s_{t+1})."""
    del last_done  # terminality of the final step is dones[-1]

    def body(carry, xs):
        next_adv, next_value = carry
        r, v, done = xs
        nonterminal = (~done).astype(r.dtype)
        delta = r + gamma * next_value * nonterminal - v
        adv = delta + gamma * gae_lambda * nonterminal * next_adv
        return (adv, v), adv

    init = (jnp.zeros_like(last_value), last_value)
    _, advantages = jax.lax.scan(body, init, (rewards, values, dones), reverse=True)
    return advantages, advantages + values
