"""Compact torchvision-layout backbones: MobileNetV3 + EfficientNetV2.

Closes the reference's remaining backbone aliases
(`/root/reference/utils/policies/extractors.py:501-552`):
``mobilenet_s``/``mobilenet_l`` → torchvision ``mobilenet_v3_small/large``
and ``efficientnet_s``/``_m``/``_l`` → ``efficientnet_v2_s/m/l``.

Same deployment design as :mod:`torch_backbones`: flax re-implementations of
the torchvision block graphs with BatchNorm FOLDED into the adjacent
convolution at conversion time (inference-frozen statistics), so the flax
modules are pure convs+biases — no batch_stats collections in the trainers.
``convert_torch_mobilenet_v3`` / ``convert_torch_efficientnet_v2`` map a
locally-provided torchvision ``state_dict`` onto the flax param trees
(verified numerically against pure-torch functional forwards in
``tests/test_aux_subsystems.py``).
"""
from __future__ import annotations

from typing import Any, Dict, List, Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp
import numpy as np
from jax import Array

from .torch_backbones import _conv_to_flax, _fold_bn


def _make_divisible(v: float, divisor: int = 8) -> int:
    """torchvision's channel rounding rule."""
    new_v = max(divisor, int(v + divisor / 2) // divisor * divisor)
    if new_v < 0.9 * v:
        new_v += divisor
    return new_v


def hardswish(x: Array) -> Array:
    return x * jnp.clip(x + 3.0, 0.0, 6.0) / 6.0


def hardsigmoid(x: Array) -> Array:
    return jnp.clip(x + 3.0, 0.0, 6.0) / 6.0


def silu(x: Array) -> Array:
    return x * nn.sigmoid(x)


_ACT = {"RE": nn.relu, "HS": hardswish, "SI": silu}

# MobileNetV3 block rows: (kernel, exp, out, use_se, act, stride)
# (torchvision mobilenetv3._mobilenet_v3_conf)
MOBILENET_V3 = {
    "small": {
        "stem": 16,
        "blocks": [
            (3, 16, 16, True, "RE", 2),
            (3, 72, 24, False, "RE", 2),
            (3, 88, 24, False, "RE", 1),
            (5, 96, 40, True, "HS", 2),
            (5, 240, 40, True, "HS", 1),
            (5, 240, 40, True, "HS", 1),
            (5, 120, 48, True, "HS", 1),
            (5, 144, 48, True, "HS", 1),
            (5, 288, 96, True, "HS", 2),
            (5, 576, 96, True, "HS", 1),
            (5, 576, 96, True, "HS", 1),
        ],
        "head": 576,
    },
    "large": {
        "stem": 16,
        "blocks": [
            (3, 16, 16, False, "RE", 1),
            (3, 64, 24, False, "RE", 2),
            (3, 72, 24, False, "RE", 1),
            (5, 72, 40, True, "RE", 2),
            (5, 120, 40, True, "RE", 1),
            (5, 120, 40, True, "RE", 1),
            (3, 240, 80, False, "HS", 2),
            (3, 200, 80, False, "HS", 1),
            (3, 184, 80, False, "HS", 1),
            (3, 184, 80, False, "HS", 1),
            (3, 480, 112, True, "HS", 1),
            (3, 672, 112, True, "HS", 1),
            (5, 672, 160, True, "HS", 2),
            (5, 960, 160, True, "HS", 1),
            (5, 960, 160, True, "HS", 1),
        ],
        "head": 960,
    },
}

# EfficientNetV2 stage rows: (block_type, expand, kernel, stride, out, layers)
# (torchvision efficientnet._efficientnet_conf, v2 variants)
EFFICIENTNET_V2 = {
    "s": {"stem": 24, "head": 1280, "stages": [
        ("fused", 1, 3, 1, 24, 2),
        ("fused", 4, 3, 2, 48, 4),
        ("fused", 4, 3, 2, 64, 4),
        ("mb", 4, 3, 2, 128, 6),
        ("mb", 6, 3, 1, 160, 9),
        ("mb", 6, 3, 2, 256, 15),
    ]},
    "m": {"stem": 24, "head": 1280, "stages": [
        ("fused", 1, 3, 1, 24, 3),
        ("fused", 4, 3, 2, 48, 5),
        ("fused", 4, 3, 2, 80, 5),
        ("mb", 4, 3, 2, 160, 7),
        ("mb", 6, 3, 1, 176, 14),
        ("mb", 6, 3, 2, 304, 18),
        ("mb", 6, 3, 1, 512, 5),
    ]},
    "l": {"stem": 32, "head": 1280, "stages": [
        ("fused", 1, 3, 1, 32, 4),
        ("fused", 4, 3, 2, 64, 7),
        ("fused", 4, 3, 2, 96, 7),
        ("mb", 4, 3, 2, 192, 10),
        ("mb", 6, 3, 1, 224, 19),
        ("mb", 6, 3, 2, 384, 25),
        ("mb", 6, 3, 1, 640, 7),
    ]},
}


def _normalize_input(x: Array) -> Array:
    """NCHW→NHWC + tile 1-channel (depth) inputs to 3, matching
    :class:`torch_backbones.TorchResNet`."""
    if x.ndim == 4 and x.shape[1] in (1, 3) and x.shape[-1] not in (1, 3):
        x = jnp.transpose(x, (0, 2, 3, 1))
    if x.shape[-1] == 1:
        x = jnp.tile(x, (1, 1, 1, 3))
    return x


def _conv(x, ch, k, s, name, dtype, groups=1):
    return nn.Conv(ch, (k, k), strides=(s, s),
                   padding=[(k // 2, k // 2)] * 2, use_bias=True,
                   feature_group_count=groups, dtype=dtype, name=name)(x)


class MobileNetV3(nn.Module):
    """torchvision MobileNetV3 feature trunk (BN folded), NHWC in, global
    average-pooled feature vector out (576 for small / 960 for large)."""

    arch: str = "small"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        cfg = MOBILENET_V3[self.arch]
        x = _normalize_input(x).astype(self.dtype)
        h = hardswish(_conv(x, cfg["stem"], 3, 2, "stem", self.dtype))
        cin = cfg["stem"]
        for i, (k, exp, out, use_se, act_name, s) in enumerate(cfg["blocks"]):
            act = _ACT[act_name]
            inp = h
            if exp != cin:
                h = act(_conv(h, exp, 1, 1, f"b{i}_expand", self.dtype))
            h = act(_conv(h, exp, k, s, f"b{i}_dw", self.dtype, groups=exp))
            if use_se:
                sq = _make_divisible(exp // 4)
                w = jnp.mean(h, axis=(1, 2), keepdims=True)
                w = nn.relu(_conv(w, sq, 1, 1, f"b{i}_se_fc1", self.dtype))
                w = hardsigmoid(_conv(w, exp, 1, 1, f"b{i}_se_fc2",
                                      self.dtype))
                h = h * w
            h = _conv(h, out, 1, 1, f"b{i}_project", self.dtype)
            if s == 1 and cin == out:
                h = h + inp
            cin = out
        h = hardswish(_conv(h, cfg["head"], 1, 1, "head", self.dtype))
        return jnp.mean(h, axis=(1, 2))


class EfficientNetV2(nn.Module):
    """torchvision EfficientNetV2 feature trunk (BN folded), NHWC in,
    global average-pooled 1280-d feature vector out."""

    arch: str = "s"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        cfg = EFFICIENTNET_V2[self.arch]
        x = _normalize_input(x).astype(self.dtype)
        h = silu(_conv(x, cfg["stem"], 3, 2, "stem", self.dtype))
        cin = cfg["stem"]
        bi = 0
        for (btype, e, k, s0, out, layers) in cfg["stages"]:
            for li in range(layers):
                s = s0 if li == 0 else 1
                inp = h
                if btype == "fused":
                    if e == 1:
                        h = silu(_conv(h, out, k, s, f"b{bi}_fused",
                                       self.dtype))
                    else:
                        h = silu(_conv(h, cin * e, k, s, f"b{bi}_expand",
                                       self.dtype))
                        h = _conv(h, out, 1, 1, f"b{bi}_project", self.dtype)
                else:
                    exp = cin * e
                    h = silu(_conv(h, exp, 1, 1, f"b{bi}_expand", self.dtype))
                    h = silu(_conv(h, exp, k, s, f"b{bi}_dw", self.dtype,
                                   groups=exp))
                    sq = max(1, cin // 4)
                    w = jnp.mean(h, axis=(1, 2), keepdims=True)
                    w = silu(_conv(w, sq, 1, 1, f"b{bi}_se_fc1", self.dtype))
                    w = nn.sigmoid(_conv(w, exp, 1, 1, f"b{bi}_se_fc2",
                                         self.dtype))
                    h = h * w
                    h = _conv(h, out, 1, 1, f"b{bi}_project", self.dtype)
                if s == 1 and cin == out:
                    h = h + inp
                cin = out
                bi += 1
        h = silu(_conv(h, cfg["head"], 1, 1, "head", self.dtype))
        return jnp.mean(h, axis=(1, 2))


# ---------------------------------------------------------------------------
# torchvision state_dict → folded flax params
# ---------------------------------------------------------------------------


def _folded(sd: Dict[str, Any], conv_key: str, bn_key: str) -> Dict[str, Any]:
    w, b = _fold_bn(
        np.asarray(sd[f"{conv_key}.weight"]),
        np.asarray(sd.get(f"{conv_key}.bias", 0.0)),
        np.asarray(sd[f"{bn_key}.weight"]),
        np.asarray(sd[f"{bn_key}.bias"]),
        np.asarray(sd[f"{bn_key}.running_mean"]),
        np.asarray(sd[f"{bn_key}.running_var"]),
    )
    return {"kernel": _conv_to_flax(w), "bias": b}


def _plain(sd: Dict[str, Any], conv_key: str) -> Dict[str, Any]:
    return {"kernel": _conv_to_flax(np.asarray(sd[f"{conv_key}.weight"])),
            "bias": np.asarray(sd[f"{conv_key}.bias"])}


def convert_torch_mobilenet_v3(state_dict: Dict[str, Any],
                               arch: str = "small") -> Dict[str, Any]:
    """torchvision ``mobilenet_v3_{small,large}`` state_dict → flax params
    for :class:`MobileNetV3` (BN folded; classifier ignored)."""
    sd = state_dict
    cfg = MOBILENET_V3[arch]
    params: Dict[str, Any] = {"stem": _folded(sd, "features.0.0",
                                              "features.0.1")}
    cin = cfg["stem"]
    for i, (k, exp, out, use_se, _act, s) in enumerate(cfg["blocks"]):
        f = f"features.{i + 1}.block"
        j = 0
        if exp != cin:
            params[f"b{i}_expand"] = _folded(sd, f"{f}.{j}.0", f"{f}.{j}.1")
            j += 1
        params[f"b{i}_dw"] = _folded(sd, f"{f}.{j}.0", f"{f}.{j}.1")
        j += 1
        if use_se:
            params[f"b{i}_se_fc1"] = _plain(sd, f"{f}.{j}.fc1")
            params[f"b{i}_se_fc2"] = _plain(sd, f"{f}.{j}.fc2")
            j += 1
        params[f"b{i}_project"] = _folded(sd, f"{f}.{j}.0", f"{f}.{j}.1")
        cin = out
    n_feat = len(cfg["blocks"]) + 1
    params["head"] = _folded(sd, f"features.{n_feat}.0", f"features.{n_feat}.1")
    return params


def convert_torch_efficientnet_v2(state_dict: Dict[str, Any],
                                  arch: str = "s") -> Dict[str, Any]:
    """torchvision ``efficientnet_v2_{s,m,l}`` state_dict → flax params for
    :class:`EfficientNetV2` (BN folded; classifier ignored)."""
    sd = state_dict
    cfg = EFFICIENTNET_V2[arch]
    params: Dict[str, Any] = {"stem": _folded(sd, "features.0.0",
                                              "features.0.1")}
    cin = cfg["stem"]
    bi = 0
    for si, (btype, e, k, s0, out, layers) in enumerate(cfg["stages"]):
        for li in range(layers):
            f = f"features.{si + 1}.{li}.block"
            if btype == "fused":
                if e == 1:
                    params[f"b{bi}_fused"] = _folded(sd, f"{f}.0.0",
                                                     f"{f}.0.1")
                else:
                    params[f"b{bi}_expand"] = _folded(sd, f"{f}.0.0",
                                                      f"{f}.0.1")
                    params[f"b{bi}_project"] = _folded(sd, f"{f}.1.0",
                                                       f"{f}.1.1")
            else:
                params[f"b{bi}_expand"] = _folded(sd, f"{f}.0.0", f"{f}.0.1")
                params[f"b{bi}_dw"] = _folded(sd, f"{f}.1.0", f"{f}.1.1")
                params[f"b{bi}_se_fc1"] = _plain(sd, f"{f}.2.fc1")
                params[f"b{bi}_se_fc2"] = _plain(sd, f"{f}.2.fc2")
                params[f"b{bi}_project"] = _folded(sd, f"{f}.3.0", f"{f}.3.1")
            cin = out
            bi += 1
    n_feat = len(cfg["stages"]) + 1
    params["head"] = _folded(sd, f"features.{n_feat}.0", f"features.{n_feat}.1")
    return params


# alias table matching the reference's backbone_alias keys
# (`extractors.py:502-512`); resnets live in torch_backbones.py
COMPACT_BACKBONES = {
    "mobilenet_s": (MobileNetV3, {"arch": "small"}),
    "mobilenet_l": (MobileNetV3, {"arch": "large"}),
    "efficientnet_s": (EfficientNetV2, {"arch": "s"}),
    "efficientnet_m": (EfficientNetV2, {"arch": "m"}),
    "efficientnet_l": (EfficientNetV2, {"arch": "l"}),
}
