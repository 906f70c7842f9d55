"""Shared utilities: config loading, seeding, image helpers.

Counterpart of `/root/reference/utils/common.py` — minus the habitat↔ENU
coordinate permutations (`common.py:89-179`), which this framework does not
need (everything is ENU end to end).
"""
from __future__ import annotations

import copy
import os
import random
from typing import Dict

import numpy as np


def deep_merge(origin: Dict, target: Dict) -> Dict:
    """Recursive dict merge, target wins (`common.py:214-230`)."""
    result = copy.deepcopy(origin)
    for key, tv in target.items():
        ov = result.get(key)
        if isinstance(ov, dict) and isinstance(tv, dict):
            result[key] = deep_merge(ov, tv)
        else:
            result[key] = copy.deepcopy(tv)
    return result


def load_yaml_config(path: str) -> Dict:
    """YAML experiment config; ``eval_env`` inherits ``env``
    (`common.py:232-237`)."""
    import yaml

    with open(path, "r") as f:
        config = yaml.safe_load(f)
    if "env" in config and "eval_env" in config:
        config["eval_env"] = deep_merge(origin=config["env"], target=config["eval_env"])
    elif "env" in config:
        config["eval_env"] = copy.deepcopy(config["env"])
    return config


def set_seed(seed: int) -> None:
    """Seed every host RNG (`common.py:182-195`). JAX randomness is explicit
    via keys, so this covers numpy/python used by host-side scene gen."""
    os.environ["PYTHONHASHSEED"] = str(seed)
    random.seed(seed)
    np.random.seed(seed)


def depth2rgb(depth: np.ndarray, max_depth: float = 20.0) -> np.ndarray:
    """Depth (H, W) → uint8 heat image (for video export, `common.py`)."""
    d = np.clip(np.asarray(depth, np.float32) / max_depth, 0, 1)
    r = np.clip(1.5 - np.abs(2.0 * d - 1.0) * 2.0, 0, 1)
    g = np.clip(1.5 - np.abs(2.0 * d - 0.5) * 2.0, 0, 1)
    b = np.clip(1.5 - np.abs(2.0 * d) * 2.0, 0, 1)
    return (np.stack([r, g, b], -1) * 255).astype(np.uint8)


def rgba2rgb(img: np.ndarray) -> np.ndarray:
    return img[..., :3]


def obs_list2array(obs_list, *shape):
    return np.stack([np.asarray(o) for o in obs_list]).reshape(*shape)


def setup_compile_cache(verbose: bool = True) -> None:
    """Enable the repo-local persistent XLA compile cache and SAY whether
    it is warm. Identical programs measured 5.5 s (warm) vs ~42 s compile
    — and up to 449 s end-to-end on a slow remote-compile lane — so a
    silent first call looks like a hang. The reference pays no compile
    (eager torch + prebuilt habitat); being loud about ours is the
    TPU-native next-best thing."""
    import jax

    d = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__)))), ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", d)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    if not verbose:
        return
    try:
        n = len([f for f in os.listdir(d) if not f.startswith(".")])
    except OSError:
        n = 0
    if n:
        print(f"compile cache: WARM ({n} entries) — first step in seconds",
              flush=True)
    else:
        print("compile cache: COLD — expect ~40 s program compile (slow "
              "remote-compile lanes can stretch the first call to several "
              "minutes); later runs hit the cache.", flush=True)
