"""Shared trainer plumbing: metric logging and periodic evaluation.

Counterpart of the reference training loops' logging/eval scaffolding
(tqdm + SB3 logger + deepcopy eval env, `shac.py:116-133,282-320`,
`PPO.py:116-175`): trainers mix this in to get CSV/TensorBoard metric dumps
and deterministic-policy evaluation rollouts between updates.
"""
from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np


class TrainerMixin:
    """Requires: self.env, self.predict(st, obs)."""

    @staticmethod
    def _require_grad_env(env) -> None:
        """Analytic-gradient trainers need a differentiable env. The
        reference flips the flag inside the algorithm (`shac.py:120-124`
        sets ``env.requires_grad = True`` in ``_build``); mirrored here, and
        (the Pallas renderer stays the default — the trainers' remat
        policy saves its outputs so grad+remat never replays the kernel,
        `envs/base.py`). Safe pre-trace: ``step`` reads the flag at trace
        time."""
        if not env.requires_grad:
            env.requires_grad = True

    def make_logger(self, log_dir: Optional[str] = None,
                    formats=("stdout", "csv", "tensorboard")):
        from ..utils.logger import Logger

        return Logger(log_dir, formats) if log_dir else None

    def evaluate(self, st, eval_env=None, max_steps: int = 1024,
                 key=None) -> Dict[str, float]:
        """Deterministic rollout until all agents finish (the reference's
        periodic eval loop, `shac.py:282-302`); returns episode stats."""
        env = eval_env if eval_env is not None else self.env
        key = jax.random.PRNGKey(1234) if key is None else key
        env_state, obs = env.reset(key)
        step = jax.jit(lambda s, a: env.step(s, a, is_test=True))

        n = env.num_envs
        all_done = np.zeros(n, bool)
        returns = np.zeros(n)
        lengths = np.zeros(n, np.int32)
        success = np.zeros(n, bool)
        carry = self.init_predict_carry(obs)
        for _ in range(max_steps):
            action, carry = self.predict_step(st, obs, carry)
            env_state, out = step(env_state, action)
            obs = out.obs
            carry = self.mask_predict_carry(carry, out.done)
            active = ~all_done
            returns += np.asarray(out.reward) * active
            lengths += active.astype(np.int32)
            success |= np.asarray(out.info["is_success"]) & active
            all_done |= np.asarray(out.done)
            if all_done.all():
                break
        return {
            "eval/ep_rew_mean": float(returns.mean()),
            "eval/ep_len_mean": float(lengths.mean()),
            "eval/success_rate": float(success.mean()),
        }

    # recurrent-policy hooks: trainers with a stateful policy (GRU hidden)
    # override these so evaluation threads the hidden state through the
    # rollout instead of re-using a frozen one.
    def init_predict_carry(self, obs):
        return ()

    def predict_step(self, st, obs, carry):
        return self.predict(st, obs), carry

    def mask_predict_carry(self, carry, done):
        return carry

    # -- exact-resume checkpointing ------------------------------------------
    # Full training-state save/load (params + optimizer moments + env state +
    # RNG key + step counter …) so `-w` resume continues bit-for-bit — the
    # counterpart of the reference's SB3 zips carrying the optimizer
    # (`PPO.py:418-431,433-572`). Loading into a differently-shaped env (the
    # eval flow) silently keeps the template's env fields and restores the
    # rest.
    def save(self, st, path: str):
        from ..utils.checkpoint import save_train_state

        save_train_state(path, st)

    def load(self, st, path: str):
        from ..utils.checkpoint import load_train_state

        new_st, skipped = load_train_state(path, st)
        if skipped:
            print(f"[{type(self).__name__}] checkpoint fields kept from the "
                  f"fresh init (shape/structure mismatch): {skipped}",
                  flush=True)
        return new_st

    def save_interrupt_cache(self, st, log_dir: Optional[str] = None) -> str:
        """Ctrl-C checkpoint (the reference saves a cache on
        KeyboardInterrupt, `dl_algorithm.py:180-182`, and exits the PPO
        loop cleanly, `PPO.py:171-173`). Returns the saved path."""
        import os

        folder = log_dir or os.path.join(os.getcwd(), "saved")
        os.makedirs(folder, exist_ok=True)
        path = os.path.join(
            folder, f"{type(self).__name__.lower()}_interrupt_cache"
        )
        self.save(st, path)
        print(f"[{type(self).__name__}] interrupted — checkpoint saved to "
              f"{path}", flush=True)
        return path

    def log_metrics(self, logger, metrics: Dict[str, Any], step: int,
                    prefix: str = "train/"):
        if logger is None:
            return
        for k, v in metrics.items():
            key = k if "/" in k else prefix + k
            logger.record(key, float(v) if hasattr(v, "item") else v)
        logger.dump(step)
