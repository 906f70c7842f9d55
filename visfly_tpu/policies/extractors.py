"""Multi-input feature extractors (flax.linen).

TPU-native counterpart of the reference extractor family
(`/root/reference/utils/policies/extractors.py`): a dict observation is
routed through per-key sub-extractors (MLP for vectors, CNN for images) whose
features are concatenated on the last dim (`extractors.py:34-90`).

Design notes (TPU): images are NCHW in the reference; here NHWC (XLA's
preferred conv layout). All dense/conv work maps onto the MXU; bfloat16
compute with float32 params is supported via the ``dtype`` attribute.
"""
from __future__ import annotations

from typing import Any, Callable, Dict, Optional, Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp
from jax import Array

ACTIVATIONS: Dict[str, Callable] = {
    "relu": nn.relu,
    "leakyrelu": nn.leaky_relu,
    "tanh": nn.tanh,
    "elu": nn.elu,
    "silu": nn.silu,
    "gelu": nn.gelu,
}


def resolve_activation(act) -> Callable:
    if callable(act):
        return act
    return ACTIVATIONS[str(act).lower()]


class MLP(nn.Module):
    """Dense stack mirroring ``create_mlp`` (`extractors.py:376-449`):
    optional layer norm, configurable activation, optional squash output."""

    features: Sequence[int]
    activation: Any = "relu"
    layer_norm: bool = False
    squash_output: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        act = resolve_activation(self.activation)
        h = x.astype(self.dtype)
        for i, f in enumerate(self.features):
            h = nn.Dense(f, dtype=self.dtype, name=f"dense_{i}")(h)
            if i < len(self.features) - 1 or not self.squash_output:
                if self.layer_norm:
                    h = nn.LayerNorm(dtype=self.dtype)(h)
                h = act(h)
        if self.squash_output:
            h = nn.tanh(h)
        return h


class ImageCNN(nn.Module):
    """Compact CNN for 64×64-ish depth/RGB sensors, the analogue of
    ``create_cnn`` (`extractors.py:312-373`). Strided convs (no pooling) keep
    the MXU busy; final dense projects to ``out_features``."""

    out_features: int = 128
    channels: Sequence[int] = (16, 32, 64)
    kernel: int = 3
    activation: Any = "relu"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        act = resolve_activation(self.activation)
        # accept NCHW (reference layout) or NHWC; normalise to NHWC
        if x.ndim == 4 and x.shape[1] in (1, 3) and x.shape[-1] not in (1, 3):
            x = jnp.transpose(x, (0, 2, 3, 1))
        if x.ndim == 3:
            x = x[..., None]
        h = x.astype(self.dtype)
        for i, c in enumerate(self.channels):
            h = nn.Conv(c, (self.kernel, self.kernel), strides=(2, 2),
                        dtype=self.dtype, name=f"conv_{i}")(h)
            h = act(h)
        h = h.reshape((h.shape[0], -1))
        h = nn.Dense(self.out_features, dtype=self.dtype, name="proj")(h)
        return act(h)


DEFAULT_KEY_EXTRACTORS = {
    # vector keys → identity-ish MLP; image keys → CNN
    "state": {"mlp": [128, 64]},
    "target": {"mlp": [64]},
    "collision_vector": {"mlp": [64]},
    "swarm": {"mlp": [128]},
    "depth": {"cnn": 128},
    "color": {"cnn": 128},
    "semantic": {"cnn": 128},
}


class MultiInputExtractor(nn.Module):
    """Dispatch per-key sub-extractors and concat features
    (`CustomBaseFeaturesExtractor`, `extractors.py:34-90`).

    ``net_arch``: {obs_key: {"mlp": [sizes]} | {"cnn": out_features}}. Keys
    present in the observation but absent from ``net_arch`` fall back to
    defaults; 5-D image batches are flattened into the batch dim as in the
    reference (`extractors.py:60-66`).
    """

    net_arch: Optional[Dict[str, dict]] = None
    activation: Any = "relu"
    layer_norm: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, obs: Dict[str, Array]) -> Array:
        arch = dict(self.net_arch or {})
        feats = []
        for key in sorted(obs.keys()):
            x = obs[key]
            spec = arch.get(key) or DEFAULT_KEY_EXTRACTORS.get(key) or (
                {"cnn": 128} if x.ndim >= 3 else {"mlp": [64]}
            )
            if "cnn" in spec:
                f = ImageCNN(out_features=spec["cnn"], activation=self.activation,
                             dtype=self.dtype, name=f"{key}_extractor")(x)
            else:
                f = MLP(spec["mlp"], activation=self.activation,
                        layer_norm=self.layer_norm, dtype=self.dtype,
                        name=f"{key}_extractor")(x)
            feats.append(f)
        return jnp.concatenate(feats, axis=-1)
