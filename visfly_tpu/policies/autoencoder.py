"""Depth-image convolutional autoencoder (+ trainer).

Counterpart of `/root/reference/utils/tools/train_encoder.py` (a torch conv
autoencoder trained on collected depth images, checkpointed as
``depth_autoencoder*.pth`` and importable by envs): a flax encoder/decoder
pair with an optax training loop over depth frames collected from any env.
"""
from __future__ import annotations

from typing import Any, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import optax
from jax import Array


class DepthEncoder(nn.Module):
    latent_dim: int = 64
    channels: Sequence[int] = (16, 32, 64)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        if x.ndim == 4 and x.shape[1] == 1:
            x = jnp.transpose(x, (0, 2, 3, 1))
        h = x.astype(self.dtype)
        for c in self.channels:
            h = nn.relu(nn.Conv(c, (3, 3), strides=(2, 2), dtype=self.dtype)(h))
        h = h.reshape(h.shape[0], -1)
        return nn.Dense(self.latent_dim, dtype=self.dtype)(h)


class DepthDecoder(nn.Module):
    out_hw: Tuple[int, int] = (64, 64)
    channels: Sequence[int] = (64, 32, 16)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, z: Array) -> Array:
        h0 = self.out_hw[0] // (2 ** len(self.channels))
        w0 = self.out_hw[1] // (2 ** len(self.channels))
        h = nn.Dense(h0 * w0 * self.channels[0], dtype=self.dtype)(z)
        h = nn.relu(h.reshape(-1, h0, w0, self.channels[0]))
        for c in self.channels[1:]:
            h = nn.relu(
                nn.ConvTranspose(c, (3, 3), strides=(2, 2), dtype=self.dtype)(h)
            )
        h = nn.ConvTranspose(1, (3, 3), strides=(2, 2), dtype=self.dtype)(h)
        return jnp.transpose(h, (0, 3, 1, 2))  # (N, 1, H, W)


class DepthAutoencoder(nn.Module):
    latent_dim: int = 64
    out_hw: Tuple[int, int] = (64, 64)

    def setup(self):
        self.encoder = DepthEncoder(self.latent_dim)
        self.decoder = DepthDecoder(self.out_hw)

    def __call__(self, x: Array) -> Array:
        return self.decoder(self.encoder(x))

    def encode(self, x: Array) -> Array:
        return self.encoder(x)


def train_autoencoder(
    frames: Array,  # (M, 1, H, W) depth in [0, 1]
    latent_dim: int = 64,
    batch_size: int = 128,
    n_steps: int = 2000,
    learning_rate: float = 1e-3,
    seed: int = 0,
    log_interval: int = 200,
):
    """Train on collected depth frames (the reference collects via
    ``utils/tools/depth_collect.py``). Returns (model, params)."""
    model = DepthAutoencoder(latent_dim, tuple(frames.shape[-2:]))
    key = jax.random.PRNGKey(seed)
    params = model.init(key, frames[:2])
    tx = optax.adam(learning_rate)
    opt = tx.init(params)

    @jax.jit
    def step(params, opt, key):
        idx = jax.random.randint(key, (batch_size,), 0, frames.shape[0])
        batch = frames[idx]

        def loss_fn(p):
            recon = model.apply(p, batch)
            return jnp.mean((recon - batch) ** 2)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        upd, opt = tx.update(grads, opt, params)
        return optax.apply_updates(params, upd), opt, loss

    for i in range(n_steps):
        key, k = jax.random.split(key)
        params, opt, loss = step(params, opt, k)
        if log_interval and i % log_interval == 0:
            print(f"[autoencoder] step {i} mse={float(loss):.5f}", flush=True)
    return model, params


def collect_depth_frames(env, n_frames: int = 1024, key=None) -> Array:
    """Roll random actions and harvest normalised depth observations
    (counterpart of ``utils/tools/depth_collect.py``)."""
    key = jax.random.PRNGKey(0) if key is None else key
    state, obs = env.reset(key)
    step = jax.jit(env.step)
    frames = []
    total = 0
    while total < n_frames:
        key, k = jax.random.split(key)
        a = jax.random.uniform(k, (env.num_envs, 4), minval=-0.5, maxval=0.5)
        state, out = step(state, a)
        d = out.obs.get("depth")
        if d is None:
            raise ValueError("env has no depth sensor")
        frames.append(jnp.clip(d / 20.0, 0.0, 1.0))
        total += d.shape[0]
    return jnp.concatenate(frames)[:n_frames]
