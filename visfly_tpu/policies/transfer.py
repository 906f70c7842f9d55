"""Cross-algorithm policy warm-starting.

The analytic-gradient trainers (BPTT/SHAC/APG/SAC) and PPO share the same
multi-input extractor; their actors differ only in head layout
(``Actor``: extractor → ``latent`` MLP → ``mu``/``log_std`` heads,
tanh-squashed; ``ActorCriticPolicy``: extractor → ``mlp_pi`` → ``mu`` with
a state-independent ``log_std`` parameter — `networks.py:25-60,153-179`).
That makes a measured hybrid recipe possible that the reference's stack
(SB3 PPO vs hand-rolled BPTT, disjoint policy classes) does not support:
pretrain with analytic gradients where exploration is the bottleneck, then
fine-tune with PPO where the reward is non-differentiable (sparse bonuses,
boolean image thresholds). See DEVIATIONS "PPO on visual landing" for the
motivating experiment.

The transplanted PPO policy emits ``clip(mean)`` where the Actor emitted
``tanh(mean)`` — identical in saturation and within a few percent mid-range
— so behaviour carries over; ``mlp_vf``/``value`` stay freshly initialised
(use ``target_kl`` during early fine-tuning to protect the warm start while
the critic calibrates).
"""
from __future__ import annotations

from typing import Any, Dict, Optional

import jax.numpy as jnp


def _tree_shapes_match(a, b, path: str) -> None:
    ka, kb = set(a), set(b)
    if ka != kb:
        raise ValueError(
            f"{path}: structure mismatch — actor has {sorted(ka - kb)} "
            f"extra, policy has {sorted(kb - ka)} extra. Build both with "
            "the same net_arch, and Actor latent_dim == PPO pi_layers.")
    for k in ka:
        va, vb = a[k], b[k]
        if isinstance(va, dict) != isinstance(vb, dict):
            raise ValueError(f"{path}/{k}: leaf/subtree mismatch")
        if isinstance(va, dict):
            _tree_shapes_match(va, vb, f"{path}/{k}")
        elif getattr(va, "shape", None) != getattr(vb, "shape", None):
            raise ValueError(
                f"{path}/{k}: shape {getattr(va, 'shape', None)} vs "
                f"{getattr(vb, 'shape', None)} — Actor latent_dim must "
                "equal PPO pi_layers (and net_arch must match).")


def actor_to_policy_params(
    actor_params: Dict[str, Any],
    policy_params: Dict[str, Any],
    log_std: Optional[float] = -0.7,
) -> Dict[str, Any]:
    """Transplant a trained ``Actor`` (BPTT/SHAC/APG/SAC) into an
    ``ActorCriticPolicy`` (PPO) param tree.

    Maps ``extractor`` → ``extractor``, ``latent`` → ``mlp_pi`` and
    ``mu`` → ``mu``; the value branch keeps the policy's fresh init.
    ``log_std`` sets the PPO exploration std around the transplanted mean
    (default σ≈0.5); pass ``None`` to keep the policy's own init.

    Both arguments are the full flax variable dicts (``{"params": {...}}``)
    as stored in ``BPTTState.params`` / ``PPOState.params``. Returns a new
    policy variable dict; inputs are not mutated.
    """
    ap = actor_params["params"]
    pp = dict(policy_params["params"])
    for src, dst in (("extractor", "extractor"), ("latent", "mlp_pi"),
                     ("mu", "mu")):
        if src not in ap:
            raise ValueError(f"actor params have no {src!r} module")
        if dst not in pp:
            raise ValueError(f"policy params have no {dst!r} module")
        _tree_shapes_match(ap[src], pp[dst], dst)
        pp[dst] = ap[src]
    if log_std is not None:
        pp["log_std"] = jnp.full_like(pp["log_std"], float(log_std))
    out = dict(policy_params)
    out["params"] = pp
    return out
