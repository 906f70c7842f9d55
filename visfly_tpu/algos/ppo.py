"""PPO — clipped-surrogate on-policy RL, fully jitted.

TPU-native re-design of the reference PPO (an SB3 subclass,
`/root/reference/utils/algorithms/PPO.py:59-572`): rollout collection
(n_steps × N envs), GAE, and n_epochs × minibatch SGD compile into one XLA
program per update. No replay of SB3's host-side loops — the rollout is a
``lax.scan`` over the env step, and the epoch/minibatch loops are scans over
permuted index blocks.

Matches the reference training semantics: clipped surrogate with advantage
normalisation, value loss (optionally clipped), entropy bonus, grad-norm
clip; episode-stat logging; periodic scene rotation (`PPO.py:102-115`) is
exposed as ``scene_freq`` via host-side scene reload between updates.
"""
from __future__ import annotations

import time
from typing import Any, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from jax import Array

from ..envs.base import DroneGymEnv, EnvState
from .common import TrainerMixin
from .lr_scheduler import transfer_schedule
from ..policies.networks import (
    ActorCriticPolicy,
    gaussian_entropy,
    gaussian_log_prob,
)
from .returns import compute_gae


class PPOState(NamedTuple):
    params: Any
    opt_state: Any
    env_state: EnvState
    obs: Dict[str, Array]
    key: Array
    global_step: Array


class PPO(TrainerMixin):
    def __init__(
        self,
        env: DroneGymEnv,
        policy: str = "MultiInputPolicy",
        policy_kwargs: Optional[dict] = None,
        learning_rate: float = 3e-4,
        n_steps: int = 256,
        batch_size: int = 0,  # 0 → one minibatch per epoch (full batch)
        n_epochs: int = 10,
        gamma: float = 0.99,
        gae_lambda: float = 0.95,
        clip_range: float = 0.2,
        ent_coef: float = 0.0,
        vf_coef: float = 0.5,
        max_grad_norm: float = 0.5,
        normalize_advantage: bool = True,
        bootstrap_truncated: bool = True,
        scene_freq: Optional[int] = None,
        seed: int = 42,
        comment: Optional[str] = None,
        save_path: Optional[str] = None,
        **_ignored,
    ):
        self.env = env
        self.n_steps = int(n_steps)
        self.n_epochs = int(n_epochs)
        self.gamma = float(gamma)
        self.gae_lambda = float(gae_lambda)
        self.clip_range = float(clip_range)
        self.ent_coef = float(ent_coef)
        self.vf_coef = float(vf_coef)
        self.normalize_advantage = normalize_advantage
        # SB3 semantics (reference PPO via collect_rollouts +
        # `droneGymEnv.py:256-267`): TimeLimit truncation is NOT terminal —
        # the reward is augmented with γ·V(terminal_observation). Requires
        # the env to surface the pre-reset observation (static env flag;
        # costs an extra render per step on visual envs).
        self.bootstrap_truncated = bool(bootstrap_truncated)
        if self.bootstrap_truncated:
            env.terminal_obs_in_info = True
        self.scene_freq = scene_freq
        self.seed = seed
        self.comment = comment
        self.save_path = save_path

        total = self.n_steps * env.num_envs
        self.batch_size = int(batch_size) if batch_size else total
        self.n_minibatches = max(1, total // self.batch_size)

        pk = dict(policy_kwargs or {})
        self.policy = ActorCriticPolicy(
            action_dim=env.action_size,
            net_arch=pk.get("net_arch"),
            pi_layers=tuple(pk.get("pi_layers", (64, 64))),
            vf_layers=tuple(pk.get("vf_layers", (64, 64))),
            activation=pk.get("activation", "relu"),
        )
        self.tx = optax.chain(
            optax.clip_by_global_norm(max_grad_norm), optax.adam(transfer_schedule(learning_rate))
        )
        self._update = jax.jit(self._update_impl)

    def init(self, key: Optional[Array] = None) -> PPOState:
        key = jax.random.PRNGKey(self.seed) if key is None else key
        k_env, k_pi, k_run = jax.random.split(key, 3)
        env_state, obs = self.env.reset(k_env)
        params = self.policy.init(k_pi, obs)
        return PPOState(
            params=params,
            opt_state=self.tx.init(params),
            env_state=env_state,
            obs=obs,
            key=k_run,
            global_step=jnp.asarray(0, jnp.int32),
        )

    # -- one fully-jitted update ------------------------------------------------

    def _collect(self, params, env_state, obs, key):
        env = self.env

        def body(carry, _):
            env_state, obs, key = carry
            key, k = jax.random.split(key)
            mean, log_std, value = self.policy.apply(params, obs)
            action = mean + jnp.exp(log_std) * jax.random.normal(k, mean.shape)
            logp = gaussian_log_prob(mean, log_std, action)
            clipped = jnp.clip(action, -1.0, 1.0)
            env_state, out = env.step(env_state, clipped)
            reward = out.reward
            if self.bootstrap_truncated:
                # SB3 truncation handling: r += γ·V(s_terminal) on timeout
                _, _, term_value = self.policy.apply(
                    params, out.info["terminal_observation"]
                )
                truncated = out.info["TimeLimit.truncated"]
                reward = reward + self.gamma * term_value * truncated
            tape = (obs, action, logp, value, reward, out.reward, out.done,
                    out.info["is_success"], out.info["episode_return"],
                    out.info["episode_length"])
            return (env_state, out.obs, key), tape

        (env_state, obs, key), tape = jax.lax.scan(
            body, (env_state, obs, key), None, length=self.n_steps
        )
        return env_state, obs, key, tape

    def _update_impl(self, st: PPOState) -> Tuple[PPOState, Dict[str, Array]]:
        env_state, obs, key, tape = self._collect(
            st.params, st.env_state, st.obs, st.key
        )
        (b_obs, b_act, b_logp, b_val, b_rew, b_raw_rew, b_done, b_succ,
         b_ret_info, b_len_info) = tape

        _, _, last_value = self.policy.apply(st.params, obs)
        advantages, returns = compute_gae(
            b_rew, b_val, b_done, last_value, b_done[-1],
            gamma=self.gamma, gae_lambda=self.gae_lambda,
        )

        total = self.n_steps * self.env.num_envs
        flat = lambda x: x.reshape((total,) + x.shape[2:])
        f_obs = jax.tree_util.tree_map(flat, b_obs)
        f_act, f_logp, f_adv, f_ret, f_val = (
            flat(b_act), flat(b_logp), flat(advantages), flat(returns), flat(b_val)
        )

        mb = total // self.n_minibatches

        def epoch(carry, _):
            params, opt_state, key = carry
            key, k = jax.random.split(key)
            perm = jax.random.permutation(k, total)

            def minibatch(carry, idx_block):
                params, opt_state = carry
                mb_obs = jax.tree_util.tree_map(lambda x: x[idx_block], f_obs)
                mb_act, mb_logp, mb_adv, mb_ret = (
                    f_act[idx_block], f_logp[idx_block],
                    f_adv[idx_block], f_ret[idx_block],
                )
                if self.normalize_advantage:
                    mb_adv = (mb_adv - mb_adv.mean()) / (mb_adv.std() + 1e-8)

                def loss_fn(p):
                    mean, log_std, value = self.policy.apply(p, mb_obs)
                    logp = gaussian_log_prob(mean, log_std, mb_act)
                    ratio = jnp.exp(logp - mb_logp)
                    pg1 = mb_adv * ratio
                    pg2 = mb_adv * jnp.clip(
                        ratio, 1.0 - self.clip_range, 1.0 + self.clip_range
                    )
                    pg_loss = -jnp.minimum(pg1, pg2).mean()
                    v_loss = jnp.mean((mb_ret - value) ** 2)
                    ent = gaussian_entropy(log_std).mean()
                    loss = pg_loss + self.vf_coef * v_loss - self.ent_coef * ent
                    return loss, (pg_loss, v_loss, ent,
                                  jnp.mean(jnp.abs(ratio - 1.0) > self.clip_range))

                (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
                upd, opt_state = self.tx.update(grads, opt_state, params)
                params = optax.apply_updates(params, upd)
                return (params, opt_state), (loss, *aux)

            blocks = perm[: self.n_minibatches * mb].reshape(self.n_minibatches, mb)
            (params, opt_state), stats = jax.lax.scan(
                minibatch, (params, opt_state), blocks
            )
            return (params, opt_state, key), stats

        (params, opt_state, key), stats = jax.lax.scan(
            epoch, (st.params, st.opt_state, key), None, length=self.n_epochs
        )
        loss, pg_loss, v_loss, ent, clip_frac = (s.mean() for s in stats)

        # episode stats from completed episodes in this rollout
        done_mask = b_done
        n_done = jnp.maximum(done_mask.sum(), 1)
        ep_rew = jnp.where(done_mask, b_ret_info, 0.0).sum() / n_done
        ep_len = jnp.where(done_mask, b_len_info, 0).sum() / n_done
        succ_rate = jnp.where(done_mask, b_succ, False).sum() / n_done

        metrics = {
            "loss": loss,
            "pg_loss": pg_loss,
            "value_loss": v_loss,
            "entropy": ent,
            "clip_fraction": clip_frac,
            "ep_rew_mean": ep_rew,
            "ep_len_mean": ep_len,
            "success_rate": succ_rate,
            "reward_mean": b_raw_rew.mean(),
        }
        st = PPOState(
            params=params,
            opt_state=opt_state,
            env_state=env_state,
            obs=obs,
            key=key,
            global_step=st.global_step + total,
        )
        return st, metrics

    def update(self, st: PPOState):
        return self._update(st)

    def learn(self, total_timesteps: int, state: Optional[PPOState] = None,
              log_interval: int = 1, log_dir: Optional[str] = None,
              eval_env=None, eval_interval: int = 0) -> PPOState:
        st = self.init() if state is None else state
        logger = self.make_logger(log_dir)
        per = self.n_steps * self.env.num_envs
        n_updates = max(1, int(total_timesteps) // per)
        t0 = time.time()
        try:
            for i in range(n_updates):
                if self.scene_freq and i and i % self.scene_freq == 0:
                    st = self.rotate_scenes(st)
                st, m = self.update(st)
                if log_interval and (i % log_interval == 0 or i == n_updates - 1):
                    m = jax.device_get(m)
                    fps = (i + 1) * per / max(time.time() - t0, 1e-9)
                    print(
                        f"[PPO] update {i + 1}/{n_updates} "
                        f"ep_rew={m['ep_rew_mean']:.3f} ep_len={m['ep_len_mean']:.1f} "
                        f"success={m['success_rate']:.2%} loss={m['loss']:.4f} "
                        f"fps={fps:.0f}",
                        flush=True,
                    )
                    m["time/fps"] = fps
                    if eval_interval and i % eval_interval == 0:
                        m.update(self.evaluate(st, eval_env))
                    self.log_metrics(logger, m, int(st.global_step))

        except KeyboardInterrupt:
            self.save_interrupt_cache(st, log_dir)
        if logger:
            logger.close()
        return st

    def rotate_scenes(self, st: PPOState) -> PPOState:
        """Scene rotation between updates (`PPO.py:102-115`): regenerate the
        procedural scenes with fresh seeds and inject the new arrays into the
        carried env state (scene data is a runtime operand of the compiled
        update, so shapes unchanged → no recompilation)."""
        if self.env.scene is None:
            return st
        env_state = self.env.reset_scenes(st.env_state)
        return st._replace(env_state=env_state)

    def predict(self, st: PPOState, obs, deterministic: bool = True) -> Array:
        mean, log_std, _ = self.policy.apply(st.params, obs)
        return jnp.clip(mean, -1.0, 1.0)

    # checkpointing: full-state save/load from TrainerMixin (exact resume)
