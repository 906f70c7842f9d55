"""Actor / critic networks (flax.linen).

Functional counterparts of the reference policy classes:
* ``Actor`` — squashed diagonal Gaussian with clamped log-std
  (`/root/reference/utils/policies/td_policies.py:36-250`).
* ``ContinuousCritic`` — n Q(s,a) heads (`td_policies.py:253-360`).
* ``StateCritic`` — V(s) heads (`dm_policies.py:16-189`).
* ``ActorCriticPolicy`` — PPO-style shared-extractor pi/vf network
  (`policies.py:18-343`).
"""
from __future__ import annotations

from typing import Any, Dict, Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
from jax import Array

from .extractors import MLP, MultiInputExtractor

LOG_STD_MIN, LOG_STD_MAX = -10.0, 2.0  # (`td_policies.py` clamp)


class Actor(nn.Module):
    """Gaussian actor with tanh squash. ``deterministic=True`` returns the
    squashed mean (reference ``actor(obs, deterministic=True)``)."""

    action_dim: int = 4
    net_arch: Optional[Dict[str, dict]] = None
    latent_dim: Sequence[int] = (256, 256)
    activation: Any = "relu"
    layer_norm: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, obs: Dict[str, Array], key: Optional[Array] = None,
                 deterministic: bool = False):
        feat = MultiInputExtractor(self.net_arch, self.activation,
                                   self.layer_norm, self.dtype,
                                   name="extractor")(obs)
        h = MLP(self.latent_dim, self.activation, self.layer_norm,
                dtype=self.dtype, name="latent")(feat)
        mean = nn.Dense(self.action_dim, dtype=self.dtype, name="mu")(h)
        log_std = nn.Dense(self.action_dim, dtype=self.dtype, name="log_std")(h)
        log_std = jnp.clip(log_std, LOG_STD_MIN, LOG_STD_MAX)

        if deterministic or key is None:
            action = jnp.tanh(mean)
            return action, None

        std = jnp.exp(log_std)
        noise = jax.random.normal(key, mean.shape, dtype=mean.dtype)
        pre_tanh = mean + std * noise  # reparameterised sample
        action = jnp.tanh(pre_tanh)
        # tanh-corrected log-prob (SAC-style)
        log_prob = (
            -0.5 * (noise**2 + 2 * log_std + jnp.log(2 * jnp.pi))
        ).sum(-1) - jnp.log(1 - action**2 + 1e-6).sum(-1)
        return action, log_prob


class RecurrentActor(nn.Module):
    """GRU-recurrent Gaussian actor — extractor features feed a GRU whose
    hidden state persists across the rollout (the reference's recurrent
    extractor hook, `extractors.py:452-461` + recurrent option in
    `policies.py`). Hidden state is carried explicitly and must be zeroed at
    episode boundaries by the caller."""

    action_dim: int = 4
    hidden_dim: int = 128
    net_arch: Optional[Dict[str, dict]] = None
    latent_dim: Sequence[int] = (128,)
    activation: Any = "relu"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, obs: Dict[str, Array], hidden: Array,
                 key: Optional[Array] = None, deterministic: bool = False):
        feat = MultiInputExtractor(self.net_arch, self.activation,
                                   dtype=self.dtype, name="extractor")(obs)
        hidden, _ = nn.GRUCell(features=self.hidden_dim, dtype=self.dtype,
                               name="gru")(hidden, feat)
        h = MLP(self.latent_dim, self.activation, dtype=self.dtype,
                name="latent")(hidden)
        mean = nn.Dense(self.action_dim, dtype=self.dtype, name="mu")(h)
        log_std = jnp.clip(
            nn.Dense(self.action_dim, dtype=self.dtype, name="log_std")(h),
            LOG_STD_MIN, LOG_STD_MAX,
        )
        if deterministic or key is None:
            return jnp.tanh(mean), None, hidden
        std = jnp.exp(log_std)
        noise = jax.random.normal(key, mean.shape, dtype=mean.dtype)
        pre = mean + std * noise
        action = jnp.tanh(pre)
        log_prob = (
            -0.5 * (noise**2 + 2 * log_std + jnp.log(2 * jnp.pi))
        ).sum(-1) - jnp.log(1 - action**2 + 1e-6).sum(-1)
        return action, log_prob, hidden

    def initial_hidden(self, batch: int) -> Array:
        return jnp.zeros((batch, self.hidden_dim), self.dtype)


class QCritic(nn.Module):
    """n_critics Q(s, a) heads (`td_policies.py:253-360`)."""

    n_critics: int = 2
    net_arch: Optional[Dict[str, dict]] = None
    latent_dim: Sequence[int] = (256, 256)
    activation: Any = "relu"
    layer_norm: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, obs: Dict[str, Array], action: Array) -> Array:
        feat = MultiInputExtractor(self.net_arch, self.activation,
                                   self.layer_norm, self.dtype,
                                   name="extractor")(obs)
        x = jnp.concatenate([feat, action.astype(feat.dtype)], axis=-1)
        qs = []
        for i in range(self.n_critics):
            h = MLP(self.latent_dim, self.activation, self.layer_norm,
                    dtype=self.dtype, name=f"qf{i}")(x)
            qs.append(nn.Dense(1, dtype=self.dtype, name=f"qf{i}_out")(h))
        return jnp.concatenate(qs, axis=-1)  # (N, n_critics)


class StateCritic(nn.Module):
    """n_critics V(s) heads (`dm_policies.py` NoActorContinuousCritic)."""

    n_critics: int = 2
    net_arch: Optional[Dict[str, dict]] = None
    latent_dim: Sequence[int] = (256, 256)
    activation: Any = "relu"
    layer_norm: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, obs: Dict[str, Array]) -> Array:
        feat = MultiInputExtractor(self.net_arch, self.activation,
                                   self.layer_norm, self.dtype,
                                   name="extractor")(obs)
        vs = []
        for i in range(self.n_critics):
            h = MLP(self.latent_dim, self.activation, self.layer_norm,
                    dtype=self.dtype, name=f"vf{i}")(feat)
            vs.append(nn.Dense(1, dtype=self.dtype, name=f"vf{i}_out")(h))
        return jnp.concatenate(vs, axis=-1)


class ActorCriticPolicy(nn.Module):
    """PPO policy: shared-or-separate extractor, Gaussian head with a state-
    independent log-std parameter, value head
    (`CustomMultiInputActorCriticPolicy`, `policies.py:18-343`)."""

    action_dim: int = 4
    net_arch: Optional[Dict[str, dict]] = None
    pi_layers: Sequence[int] = (64, 64)
    vf_layers: Sequence[int] = (64, 64)
    activation: Any = "relu"
    layer_norm: bool = False
    squash: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, obs: Dict[str, Array]):
        feat = MultiInputExtractor(self.net_arch, self.activation,
                                   self.layer_norm, self.dtype,
                                   name="extractor")(obs)
        pi_h = MLP(self.pi_layers, self.activation, self.layer_norm,
                   dtype=self.dtype, name="mlp_pi")(feat)
        vf_h = MLP(self.vf_layers, self.activation, self.layer_norm,
                   dtype=self.dtype, name="mlp_vf")(feat)
        mean = nn.Dense(self.action_dim, dtype=self.dtype, name="mu")(pi_h)
        log_std = self.param("log_std", nn.initializers.zeros, (self.action_dim,))
        value = nn.Dense(1, dtype=self.dtype, name="value")(vf_h)[..., 0]
        return mean, jnp.broadcast_to(log_std, mean.shape), value


class RecurrentActorCriticPolicy(nn.Module):
    """PPO policy with a GRU trunk shared by the pi/vf heads — the recurrent
    hook of the reference PPO policy (`CustomMultiInputActorCriticPolicy`,
    `policies.py:18-343`, recurrent extractor `extractors.py:452-461`),
    realised sb3-contrib-RecurrentPPO style: the hidden state is carried
    explicitly by the trainer and zeroed at episode boundaries."""

    action_dim: int = 4
    hidden_dim: int = 128
    net_arch: Optional[Dict[str, dict]] = None
    pi_layers: Sequence[int] = (64,)
    vf_layers: Sequence[int] = (64,)
    activation: Any = "relu"
    layer_norm: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, obs: Dict[str, Array], hidden: Array):
        feat = MultiInputExtractor(self.net_arch, self.activation,
                                   self.layer_norm, self.dtype,
                                   name="extractor")(obs)
        hidden, _ = nn.GRUCell(features=self.hidden_dim, dtype=self.dtype,
                               name="gru")(hidden, feat)
        pi_h = MLP(self.pi_layers, self.activation, self.layer_norm,
                   dtype=self.dtype, name="mlp_pi")(hidden)
        vf_h = MLP(self.vf_layers, self.activation, self.layer_norm,
                   dtype=self.dtype, name="mlp_vf")(hidden)
        mean = nn.Dense(self.action_dim, dtype=self.dtype, name="mu")(pi_h)
        log_std = self.param("log_std", nn.initializers.zeros, (self.action_dim,))
        value = nn.Dense(1, dtype=self.dtype, name="value")(vf_h)[..., 0]
        return mean, jnp.broadcast_to(log_std, mean.shape), value, hidden

    def initial_hidden(self, batch: int) -> Array:
        return jnp.zeros((batch, self.hidden_dim), self.dtype)


def gaussian_log_prob(mean: Array, log_std: Array, action: Array) -> Array:
    var = jnp.exp(2 * log_std)
    return (
        -0.5 * ((action - mean) ** 2 / var + 2 * log_std + jnp.log(2 * jnp.pi))
    ).sum(-1)


def gaussian_entropy(log_std: Array) -> Array:
    return (log_std + 0.5 * jnp.log(2 * jnp.pi * jnp.e)).sum(-1)
