"""Weight-initialisation helpers.

Counterpart of `/root/reference/utils/policies/common.py:1-44`
(``init_model_weights`` with kaiming/xavier/orthogonal/normal options) —
expressed as flax initializer factories passed through ``Dense``/``Conv``
``kernel_init``.
"""
from __future__ import annotations

from typing import Callable

import flax.linen as nn

INITIALIZERS: dict = {
    "kaiming": lambda: nn.initializers.kaiming_normal(),
    "kaiming_uniform": lambda: nn.initializers.kaiming_uniform(),
    "xavier": lambda: nn.initializers.xavier_normal(),
    "xavier_uniform": lambda: nn.initializers.xavier_uniform(),
    "orthogonal": lambda scale=1.0: nn.initializers.orthogonal(scale),
    "normal": lambda stddev=0.01: nn.initializers.normal(stddev),
    "zeros": lambda: nn.initializers.zeros_init(),
}


def get_initializer(name: str, **kwargs) -> Callable:
    return INITIALIZERS[name](**kwargs)
