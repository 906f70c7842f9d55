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


class ResNetBlock(nn.Module):
    """Basic residual block for the backbone CNN options (the reference maps
    aliases resnet18/34/… to torchvision backbones, `extractors.py:501-552`;
    here a compact from-scratch flax ResNet — no pretrained weights in a
    TPU-native stack, noted as a documented deviation)."""

    channels: int
    strides: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        residual = x
        h = nn.Conv(self.channels, (3, 3), strides=(self.strides, self.strides),
                    dtype=self.dtype)(x)
        h = nn.relu(nn.GroupNorm(num_groups=8, dtype=self.dtype)(h))
        h = nn.Conv(self.channels, (3, 3), dtype=self.dtype)(h)
        h = nn.GroupNorm(num_groups=8, dtype=self.dtype)(h)
        if residual.shape != h.shape:
            residual = nn.Conv(self.channels, (1, 1),
                               strides=(self.strides, self.strides),
                               dtype=self.dtype)(residual)
        return nn.relu(h + residual)


class ResNetCNN(nn.Module):
    """Small ResNet image extractor (alias targets resnet10/resnet18)."""

    out_features: int = 128
    stage_sizes: Sequence[int] = (1, 1, 1, 1)
    width: int = 16
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        if x.ndim == 4 and x.shape[1] in (1, 3) and x.shape[-1] not in (1, 3):
            x = jnp.transpose(x, (0, 2, 3, 1))
        h = x.astype(self.dtype)
        h = nn.Conv(self.width, (5, 5), strides=(2, 2), dtype=self.dtype)(h)
        h = nn.relu(h)
        for stage, blocks in enumerate(self.stage_sizes):
            ch = self.width * (2**stage)
            for b in range(blocks):
                h = ResNetBlock(ch, strides=2 if b == 0 else 1,
                                dtype=self.dtype)(h)
        h = h.mean(axis=(1, 2))  # global average pool
        return nn.relu(nn.Dense(self.out_features, dtype=self.dtype)(h))


class TransCNN(nn.Module):
    """Configurable transposed-conv stack, the analogue of
    ``create_trans_cnn`` (`extractors.py:248-309`), with torch output-size
    semantics ``out = (in-1)*s + k - 2p + op``. flax's ``ConvTranspose``
    pads additively (``out = (in-1)*s + 2 - k + lo + hi``), so each layer
    maps torch ``(k, s, p, op)`` to explicit flax padding
    ``(k-1-p, k-1-p+op)``. Input/output are NHWC."""

    channels: Sequence[int]  # per-layer output channels
    kernel_sizes: Any = 3  # int or per-layer list
    strides: Any = 2
    paddings: Any = 0
    output_paddings: Any = 0
    output_channel: Optional[int] = None  # extra final layer (last k/s/p)
    activation: Any = "relu"
    layer_norm: bool = False
    squash_output: bool = False
    dtype: Any = jnp.float32

    @staticmethod
    def _per_layer(v, n: int) -> Sequence[int]:
        return [v] * n if isinstance(v, int) else list(v)

    def layer_cfgs(self) -> Sequence[Tuple[int, int, int, int, int]]:
        """(out_ch, k, s, p, op) per layer, incl. the output layer."""
        chans = list(self.channels)
        if self.output_channel is not None:
            chans = chans + [self.output_channel]
        n = len(chans)
        ks = self._per_layer(self.kernel_sizes, n)
        ss = self._per_layer(self.strides, n)
        ps = self._per_layer(self.paddings, n)
        ops = self._per_layer(self.output_paddings, n)
        return list(zip(chans, ks, ss, ps, ops))

    @nn.compact
    def __call__(self, x: Array) -> Array:
        act = resolve_activation(self.activation)
        h = x.astype(self.dtype)
        cfgs = self.layer_cfgs()
        for i, (c, k, s, p, op) in enumerate(cfgs):
            lo, hi = k - 1 - p, k - 1 - p + op
            if lo < 0 or hi < 0:
                raise ValueError(f"padding {p} too large for kernel {k}")
            h = nn.ConvTranspose(c, (k, k), strides=(s, s),
                                 padding=[(lo, hi), (lo, hi)],
                                 dtype=self.dtype, name=f"deconv_{i}")(h)
            is_last = i == len(cfgs) - 1
            if not is_last:
                if self.layer_norm:
                    h = nn.LayerNorm(dtype=self.dtype)(h)
                h = act(h)
        if self.squash_output:
            h = nn.tanh(h)
        return h


def required_input_shape(layer_cfgs, target_hw: Tuple[int, int]
                         ) -> Tuple[int, int]:
    """Invert a trans-CNN's size arithmetic: the (H, W) input that produces
    ``target_hw`` at the output (`extractors.py:109-148`,
    ``calc_required_input_dim``: ``in = (out + 2p - k)//s + 1``)."""
    h, w = target_hw
    for _, k, s, p, op in reversed(list(layer_cfgs)):
        h = (h + 2 * p - k - op) // s + 1
        w = (w + 2 * p - k - op) // s + 1
        if h < 1 or w < 1:
            raise ValueError(f"target {target_hw} unreachable: need {h}x{w}")
    return h, w


class DecoderHead(nn.Module):
    """Feature vector → image decoder: Dense to the trans-CNN's required
    input shape, reshape, deconv stack — the analogue of
    ``set_trans_cnn_feature_extractor`` (`extractors.py:489-499`), used to
    attach ``<key>_decoder`` heads for world-model/autoencoder training.
    Returns NCHW to match the sensor-observation layout."""

    target_shape: Tuple[int, int, int]  # (C, H, W) of the decoded image
    channels: Sequence[int] = (64, 32)
    kernel_sizes: Any = 4
    strides: Any = 2
    paddings: Any = 1
    activation: Any = "relu"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, z: Array) -> Array:
        c, th_, tw = self.target_shape
        net = TransCNN(channels=self.channels, kernel_sizes=self.kernel_sizes,
                       strides=self.strides, paddings=self.paddings,
                       output_channel=c, activation=self.activation,
                       dtype=self.dtype)
        h0, w0 = required_input_shape(net.layer_cfgs(), (th_, tw))
        c0 = self.channels[0]
        h = nn.Dense(h0 * w0 * c0, dtype=self.dtype, name="proj")(z)
        h = h.reshape((-1, h0, w0, c0))
        img = net(h)
        if img.shape[1:3] != (th_, tw):
            raise ValueError(
                f"decoder produced {img.shape[1:3]}, wanted {(th_, tw)}")
        return jnp.transpose(img, (0, 3, 1, 2))


class GRUCell(nn.Module):
    """Recurrent feature wrapper (`extractors.py:452-461` wraps extractor
    outputs in a GRU); call with (features (N, F), hidden (N, H))."""

    hidden_dim: int = 128
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array, h: Array):
        new_h, _ = nn.GRUCell(features=self.hidden_dim, dtype=self.dtype)(h, x)
        return new_h


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
            if x.ndim == 5:
                # 5-D image batches flatten into the batch dim and re-merge
                # features (`extractors.py:60-66`)
                b, k = x.shape[:2]
                x = x.reshape((b * k,) + x.shape[2:])
                restack = (b, k)
            else:
                restack = None
            if "backbone" in spec:
                # torchvision-layout backbones with optional offline
                # pretrained import (the reference's backbone_alias table,
                # `extractors.py:501-512`): resnet18/34/50/101 →
                # policies/torch_backbones.py; mobilenet_s/l +
                # efficientnet_s/m/l → policies/compact_backbones.py
                from .compact_backbones import COMPACT_BACKBONES
                from .torch_backbones import TorchResNet

                bb = spec["backbone"]
                if bb in COMPACT_BACKBONES:
                    cls, bb_kw = COMPACT_BACKBONES[bb]
                    f = cls(dtype=self.dtype, name=f"{key}_extractor",
                            **bb_kw)(x)
                else:
                    f = TorchResNet(arch=bb, dtype=self.dtype,
                                    name=f"{key}_extractor")(x)
                if spec.get("out"):
                    f = nn.relu(nn.Dense(spec["out"], dtype=self.dtype,
                                         name=f"{key}_proj")(f))
            elif "resnet" in spec:
                f = ResNetCNN(out_features=spec["resnet"], dtype=self.dtype,
                              name=f"{key}_extractor")(x)
            elif "cnn" in spec:
                f = ImageCNN(out_features=spec["cnn"], activation=self.activation,
                             dtype=self.dtype, name=f"{key}_extractor")(x)
            else:
                if x.ndim > 2:
                    x = x.reshape(x.shape[0], -1)
                f = MLP(spec["mlp"], activation=self.activation,
                        layer_norm=self.layer_norm, dtype=self.dtype,
                        name=f"{key}_extractor")(x)
            if restack is not None:
                f = f.reshape(restack[0], -1)
            feats.append(f)
        return jnp.concatenate(feats, axis=-1)


# -- named extractor family (`extractors.py:555-799` + alias loader `:854-871`)
# In the reference these are distinct classes wiring specific obs keys to
# specific sub-networks; here they are net_arch presets for
# MultiInputExtractor.

EXTRACTOR_ALIASES: Dict[str, Dict[str, dict]] = {
    "StateExtractor": {"state": {"mlp": [128, 64]}},
    "TargetExtractor": {"target": {"mlp": [64]}},
    "ImageExtractor": {"depth": {"cnn": 128}},
    "StateTargetExtractor": {
        "state": {"mlp": [128, 64]}, "target": {"mlp": [64]},
    },
    "StateImageExtractor": {
        "state": {"mlp": [128, 64]}, "depth": {"cnn": 128},
    },
    "StateTargetImageExtractor": {
        "state": {"mlp": [128, 64]}, "target": {"mlp": [64]},
        "depth": {"cnn": 128},
    },
    "SwarmStateTargetImageExtractor": {
        "state": {"mlp": [128, 64]}, "target": {"mlp": [64]},
        "depth": {"cnn": 128}, "swarm": {"mlp": [128]},
    },
    "StateGateExtractor": {
        "state": {"mlp": [128, 64]}, "gate": {"mlp": [32]},
    },
    "FlexibleExtractor": {},  # per-key defaults
    "EmptyExtractor": {},
    # dreamer-style latent keys injected by env latent hooks
    # (reference extractors.py LatentCombineExtractor)
    "LatentCombineExtractor": {
        "state": {"mlp": [128, 64]}, "deter": {"mlp": [128]},
        "stoch": {"mlp": [64]},
    },
}


def resolve_extractor(name_or_arch) -> Optional[Dict[str, dict]]:
    """String alias → net_arch preset (`extractors.py:854-871`)."""
    if isinstance(name_or_arch, str):
        return EXTRACTOR_ALIASES[name_or_arch]
    return name_or_arch
