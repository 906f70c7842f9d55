"""Torchvision-layout ResNet backbones + offline torch→flax weight import.

The reference aliases resnet18/34/50, efficientnet, mobilenet to torchvision
models with ImageNet weights (`/root/reference/utils/policies/extractors.py:501-552`).
A TPU-native stack cannot ship torch modules in the hot path, and this
environment has no torchvision and no egress — so the capability is closed
the deployment way:

* :class:`TorchResNet` is a flax re-implementation of torchvision's
  resnet18/34 BasicBlock and resnet50/101 Bottleneck graphs (7×7/2 stem →
  maxpool → 4 stages → global average pool). BatchNorm is FOLDED into the
  adjacent convolution at
  conversion time (inference-frozen statistics — the standard fine-tuning
  setup, and what SB3 policies see in eval mode), so the flax module is
  pure convs+biases: plain trainable params, no batch_stats collection
  threading through the trainers.
* :func:`convert_torch_resnet` maps a torchvision ``state_dict`` (a local
  ``.pth`` the user provides — e.g. dumped once with
  ``torch.save(torchvision.models.resnet18(weights=...).state_dict(), p)``)
  onto the flax param tree, verified numerically against a pure-torch
  forward in ``tests/test_aux_subsystems.py``.
* :func:`apply_pretrained` swaps converted weights into an initialized
  policy param tree (by extractor name), preserving everything else.
"""
from __future__ import annotations

from typing import Any, Dict, Sequence

import flax.linen as nn
import jax.numpy as jnp
import numpy as np
from jax import Array

ARCH_STAGES = {"resnet18": (2, 2, 2, 2), "resnet34": (3, 4, 6, 3),
               "resnet50": (3, 4, 6, 3), "resnet101": (3, 4, 23, 3)}
# torchvision Bottleneck archs (1×1 → 3×3 → 1×1·expansion residual blocks)
BOTTLENECK_ARCHS = frozenset({"resnet50", "resnet101"})
BOTTLENECK_EXPANSION = 4


class _FoldedBlock(nn.Module):
    """torchvision BasicBlock with BN folded: conv3x3+b → relu → conv3x3+b,
    plus a 1×1 downsample conv on the residual when shape changes."""

    channels: int
    strides: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        residual = x
        # explicit symmetric padding: torch pads (1,1) regardless of stride,
        # while flax 'SAME' pads asymmetrically for stride 2
        h = nn.Conv(self.channels, (3, 3), strides=(self.strides,) * 2,
                    padding=[(1, 1), (1, 1)], use_bias=True,
                    dtype=self.dtype, name="conv1")(x)
        h = nn.relu(h)
        h = nn.Conv(self.channels, (3, 3), padding=[(1, 1), (1, 1)],
                    use_bias=True, dtype=self.dtype, name="conv2")(h)
        if residual.shape[-1] != self.channels or self.strides != 1:
            residual = nn.Conv(self.channels, (1, 1),
                               strides=(self.strides,) * 2, use_bias=True,
                               dtype=self.dtype, name="downsample")(residual)
        return nn.relu(h + residual)


class _FoldedBottleneck(nn.Module):
    """torchvision Bottleneck (ResNet v1.5: stride on the 3×3) with BN
    folded: conv1×1(c) → relu → conv3×3(c, stride) → relu → conv1×1(4c),
    plus a strided 1×1 downsample conv on the residual when shape changes."""

    channels: int
    strides: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        out_ch = self.channels * BOTTLENECK_EXPANSION
        residual = x
        h = nn.Conv(self.channels, (1, 1), use_bias=True, dtype=self.dtype,
                    name="conv1")(x)
        h = nn.relu(h)
        h = nn.Conv(self.channels, (3, 3), strides=(self.strides,) * 2,
                    padding=[(1, 1), (1, 1)], use_bias=True,
                    dtype=self.dtype, name="conv2")(h)
        h = nn.relu(h)
        h = nn.Conv(out_ch, (1, 1), use_bias=True, dtype=self.dtype,
                    name="conv3")(h)
        if residual.shape[-1] != out_ch or self.strides != 1:
            residual = nn.Conv(out_ch, (1, 1),
                               strides=(self.strides,) * 2, use_bias=True,
                               dtype=self.dtype, name="downsample")(residual)
        return nn.relu(h + residual)


class TorchResNet(nn.Module):
    """torchvision resnet18/34/50/101 feature extractor (fc head dropped);
    returns the pooled features (512-d BasicBlock / 2048-d Bottleneck).
    Accepts NCHW or NHWC; 1-channel inputs are tiled to 3 (the reference
    feeds depth to RGB backbones the same way)."""

    arch: str = "resnet18"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        if x.ndim == 4 and x.shape[1] in (1, 3) and x.shape[-1] not in (1, 3):
            x = jnp.transpose(x, (0, 2, 3, 1))
        if x.shape[-1] == 1:
            x = jnp.tile(x, (1, 1, 1, 3))
        h = x.astype(self.dtype)
        h = nn.Conv(64, (7, 7), strides=(2, 2), padding=[(3, 3), (3, 3)],
                    use_bias=True, dtype=self.dtype, name="conv1")(h)
        h = nn.relu(h)
        h = nn.max_pool(h, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)])
        stages: Sequence[int] = ARCH_STAGES[self.arch]
        block = (_FoldedBottleneck if self.arch in BOTTLENECK_ARCHS
                 else _FoldedBlock)
        for stage, blocks in enumerate(stages):
            ch = 64 * (2 ** stage)
            for b in range(blocks):
                strides = 2 if (b == 0 and stage > 0) else 1
                h = block(ch, strides=strides, dtype=self.dtype,
                          name=f"layer{stage + 1}_{b}")(h)
        return h.mean(axis=(1, 2))  # (N, 512) / (N, 2048) bottleneck


def _fold_bn(w: np.ndarray, b, bn_gamma, bn_beta, bn_mean, bn_var,
             eps: float = 1e-5):
    """Fold BatchNorm(affine, running stats) into the preceding conv:
    W' = W·γ/σ (per out-channel), b' = β − γ·μ/σ (conv bias assumed 0,
    torchvision convs are bias-free)."""
    scale = bn_gamma / np.sqrt(bn_var + eps)
    w2 = w * scale[:, None, None, None]  # torch layout (out, in, kh, kw)
    b2 = bn_beta - bn_mean * scale
    return w2, b2


def _conv_to_flax(w: np.ndarray) -> np.ndarray:
    """torch (out, in, kh, kw) → flax (kh, kw, in, out)."""
    return np.transpose(w, (2, 3, 1, 0))


def convert_torch_resnet(state_dict: Dict[str, Any],
                         arch: str = "resnet18") -> Dict[str, Any]:
    """torchvision ``resnet{18,34,50,101}`` state_dict → :class:`TorchResNet`
    flax params (BN folded). ``state_dict`` values may be torch tensors or
    numpy arrays; the fc head is ignored."""
    sd = {k: np.asarray(getattr(v, "detach", lambda: v)().cpu().numpy()
                        if hasattr(v, "detach") else v)
          for k, v in state_dict.items()}

    def folded(prefix_conv, prefix_bn):
        w, b = _fold_bn(sd[f"{prefix_conv}.weight"], None,
                        sd[f"{prefix_bn}.weight"], sd[f"{prefix_bn}.bias"],
                        sd[f"{prefix_bn}.running_mean"],
                        sd[f"{prefix_bn}.running_var"])
        return {"kernel": jnp.asarray(_conv_to_flax(w)),
                "bias": jnp.asarray(b)}

    params: Dict[str, Any] = {"conv1": folded("conv1", "bn1")}
    for stage, blocks in enumerate(ARCH_STAGES[arch]):
        for b in range(blocks):
            tp = f"layer{stage + 1}.{b}"
            blk = {
                "conv1": folded(f"{tp}.conv1", f"{tp}.bn1"),
                "conv2": folded(f"{tp}.conv2", f"{tp}.bn2"),
            }
            if f"{tp}.conv3.weight" in sd:  # Bottleneck (resnet50/101)
                blk["conv3"] = folded(f"{tp}.conv3", f"{tp}.bn3")
            if f"{tp}.downsample.0.weight" in sd:
                blk["downsample"] = folded(f"{tp}.downsample.0",
                                           f"{tp}.downsample.1")
            params[f"layer{stage + 1}_{b}"] = blk
    return params


def load_torch_resnet(path_or_dict, arch: str = "resnet18"):
    """Load a torchvision resnet ``.pth``/state_dict and convert. The file
    is whatever the user saved offline — no torchvision import needed."""
    if isinstance(path_or_dict, (str, bytes)):
        import torch

        path_or_dict = torch.load(path_or_dict, map_location="cpu",
                                  weights_only=True)
    return convert_torch_resnet(path_or_dict, arch=arch)


def apply_pretrained(params: Dict[str, Any], pretrained: Dict[str, Any],
                     arch: str = "resnet18") -> Dict[str, Any]:
    """Swap converted backbone weights into an initialized param tree.

    ``pretrained`` maps extractor module names (e.g. ``"depth_extractor"``,
    as created by ``MultiInputExtractor`` for a ``{"backbone": ...}`` spec)
    to a ``.pth`` path or state_dict. Returns a NEW param pytree."""
    import flax

    flat = flax.traverse_util.flatten_dict(params)
    for name, src in pretrained.items():
        converted = flax.traverse_util.flatten_dict(
            load_torch_resnet(src, arch=arch))
        hits = 0
        for path in list(flat):
            for i, part in enumerate(path):
                if part == name:
                    sub = path[i + 1:]
                    if sub in converted:
                        if flat[path].shape != converted[sub].shape:
                            raise ValueError(
                                f"shape mismatch at {path}: "
                                f"{flat[path].shape} vs {converted[sub].shape}")
                        flat[path] = converted[sub]
                        hits += 1
                    break
        if hits == 0:
            raise KeyError(f"no params found under module name {name!r}")
    return flax.traverse_util.unflatten_dict(flat)
