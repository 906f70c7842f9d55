"""Recurrent world model (RSSM) — the latent-state machinery behind the
reference's dreamer-style hooks.

The reference env exposes ``initialize_latent``/``update_latent`` and
``deter``/``stoch`` observation keys driven by an external world model with
``sequence_model`` / ``encoder`` / ``decoder`` components
(`/root/reference/envs/base/droneGymEnv.py:147-160,221-236,277-284,357-418`).
This module provides those components natively (flax) plus a functional
latent-state update mirroring the reference call pattern.
"""
from __future__ import annotations

from typing import Any, Dict, NamedTuple, Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
from jax import Array

from .extractors import MLP, MultiInputExtractor


class SequenceModel(nn.Module):
    """Deterministic GRU core + stochastic prior head:
    (action, stoch, deter) → (stoch_prior, deter')."""

    deter_dim: int = 128
    stoch_dim: int = 32
    hidden: int = 128

    @nn.compact
    def __call__(self, action: Array, stoch: Array, deter: Array,
                 key: Optional[Array] = None, deterministic: bool = False):
        x = jnp.concatenate([action, stoch], axis=-1)
        x = nn.relu(nn.Dense(self.hidden)(x))
        deter, _ = nn.GRUCell(features=self.deter_dim)(deter, x)
        h = nn.relu(nn.Dense(self.hidden)(deter))
        mean = nn.Dense(self.stoch_dim)(h)
        log_std = jnp.clip(nn.Dense(self.stoch_dim)(h), -5.0, 2.0)
        if deterministic or key is None:
            stoch_prior = mean
        else:
            stoch_prior = mean + jnp.exp(log_std) * jax.random.normal(
                key, mean.shape
            )
        return stoch_prior, deter

    def initial(self, batch: int) -> Dict[str, Array]:
        return {
            "deter": jnp.zeros((batch, self.deter_dim)),
            "stoch": jnp.zeros((batch, self.stoch_dim)),
        }


class Encoder(nn.Module):
    """Posterior: (observation, deter) → stoch."""

    stoch_dim: int = 32
    hidden: int = 128
    net_arch: Optional[Dict[str, dict]] = None

    @nn.compact
    def __call__(self, observation: Dict[str, Array], deter: Array,
                 key: Optional[Array] = None, deterministic: bool = False):
        feat = MultiInputExtractor(self.net_arch, name="obs_extractor")(observation)
        h = jnp.concatenate([feat, deter], axis=-1)
        h = nn.relu(nn.Dense(self.hidden)(h))
        mean = nn.Dense(self.stoch_dim)(h)
        log_std = jnp.clip(nn.Dense(self.stoch_dim)(h), -5.0, 2.0)
        if deterministic or key is None:
            return mean
        return mean + jnp.exp(log_std) * jax.random.normal(key, mean.shape)


class Decoder(nn.Module):
    """Features → flat observation reconstruction (state vector)."""

    out_dim: int = 13
    hidden: Sequence[int] = (128, 128)

    @nn.compact
    def __call__(self, features: Array) -> Array:
        h = MLP(self.hidden, name="mlp")(features)
        return nn.Dense(self.out_dim)(h)


class WorldModel(NamedTuple):
    """Bundle mirroring the reference's ``world`` object surface."""

    sequence_model: SequenceModel
    encoder: Encoder
    decoder: Decoder
    params: Any

    def get_features(self, deter: Array, stoch: Array) -> Array:
        return jnp.concatenate([deter, stoch], axis=-1)

    def step(self, action, stoch, deter, next_observation, key=None,
             deterministic: bool = False):
        """Posterior latent update (reference ``world.step`` called from
        ``update_latent``, `droneGymEnv.py:221-236`)."""
        k1, k2 = (None, None) if key is None else jax.random.split(key)
        _prior, next_deter = self.sequence_model.apply(
            self.params["sequence"], action, stoch, deter, k1, deterministic
        )
        next_stoch_post = self.encoder.apply(
            self.params["encoder"], next_observation, next_deter, k2, deterministic
        )
        return next_stoch_post, next_deter

    def imagine(self, action, stoch, deter, key=None, deterministic=False):
        """Prior rollout (used by train_env without posterior access,
        `droneGymEnv.py:153-160`)."""
        return self.sequence_model.apply(
            self.params["sequence"], action, stoch, deter, key, deterministic
        )

    def decode(self, deter, stoch):
        return self.decoder.apply(
            self.params["decoder"], self.get_features(deter, stoch)
        )


def create_world_model(
    obs_example: Dict[str, Array],
    action_dim: int = 4,
    deter_dim: int = 128,
    stoch_dim: int = 32,
    decode_key: str = "state",
    key: Optional[Array] = None,
) -> WorldModel:
    key = jax.random.PRNGKey(0) if key is None else key
    k1, k2, k3 = jax.random.split(key, 3)
    n = next(iter(obs_example.values())).shape[0]
    seq = SequenceModel(deter_dim, stoch_dim)
    enc = Encoder(stoch_dim)
    dec = Decoder(out_dim=obs_example[decode_key].shape[-1])
    deter0 = jnp.zeros((n, deter_dim))
    stoch0 = jnp.zeros((n, stoch_dim))
    a0 = jnp.zeros((n, action_dim))
    params = {
        "sequence": seq.init(k1, a0, stoch0, deter0),
        "encoder": enc.init(k2, obs_example, deter0),
        "decoder": dec.init(k3, jnp.concatenate([deter0, stoch0], -1)),
    }
    return WorldModel(seq, enc, dec, params)
