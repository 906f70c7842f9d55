"""SAC — soft actor-critic, off-policy, fully on-device.

TPU-native counterpart of the reference SAC (an SB3 subclass,
`/root/reference/utils/algorithms/SAC.py:20-146`): environment stepping,
replay insertion, batch sampling and all three updates (critic, actor,
entropy coefficient) run in one jitted program over a HBM-resident ring
buffer. Standard SAC semantics (twin Q, target entropy −|A|, polyak τ).
"""
from __future__ import annotations

import time
from typing import Any, Dict, NamedTuple, Optional

import jax
import jax.numpy as jnp
import optax
from jax import Array

from ..envs.base import DroneGymEnv, EnvState
from .common import TrainerMixin
from .lr_scheduler import transfer_schedule
from ..policies.networks import Actor, QCritic
from . import buffers


class SACState(NamedTuple):
    actor_params: Any
    actor_opt: Any
    critic_params: Any
    critic_opt: Any
    critic_target_params: Any
    log_alpha: Array
    alpha_opt: Any
    buffer: buffers.ReplayBuffer
    env_state: EnvState
    obs: Dict[str, Array]
    key: Array
    global_step: Array


class SAC(TrainerMixin):
    def __init__(
        self,
        env: DroneGymEnv,
        policy: str = "MultiInputPolicy",
        policy_kwargs: Optional[dict] = None,
        learning_rate: float = 3e-4,
        buffer_size: int = 100_000,
        batch_size: int = 256,
        tau: float = 0.005,
        gamma: float = 0.99,
        train_freq: int = 1,
        gradient_steps: int = 1,
        learning_starts: int = 1000,
        ent_coef: str = "auto",
        seed: int = 42,
        **_ignored,
    ):
        self.env = env
        self.buffer_size = int(buffer_size)
        self.batch_size = int(batch_size)
        self.tau = float(tau)
        self.gamma = float(gamma)
        self.train_freq = int(train_freq)
        # SB3 gradient_steps semantics (`off_policy_algorithm.py`): -1 means
        # "as many gradient steps as env steps collected" (here: num_envs per
        # train call), 0 means collect-only (skip training)
        gs = int(gradient_steps)
        if gs < -1:
            raise ValueError(f"gradient_steps must be >= -1, got {gs}")
        self.gradient_steps = env.num_envs if gs == -1 else gs
        self.learning_starts = int(learning_starts)
        self.auto_ent = ent_coef == "auto"
        self.target_entropy = -float(env.action_size)
        self.seed = seed
        # SB3 _store_transition semantics: for done transitions the stored
        # next_obs must be the pre-reset terminal observation, not the
        # respawned one — otherwise truncated (timeout) transitions bootstrap
        # V from the wrong state. Static env flag, set before tracing.
        env.terminal_obs_in_info = True

        pk = dict(policy_kwargs or {})
        latent = tuple(pk.get("latent_dim", (256, 256)))
        self.actor = Actor(action_dim=env.action_size, net_arch=pk.get("net_arch"),
                           latent_dim=latent)
        self.critic = QCritic(n_critics=2, net_arch=pk.get("net_arch"),
                              latent_dim=latent)
        self.actor_tx = optax.adam(transfer_schedule(learning_rate))
        self.critic_tx = optax.adam(transfer_schedule(learning_rate))
        self.alpha_tx = optax.adam(transfer_schedule(learning_rate))
        # `train` selects between two compiled programs (collect-only vs
        # collect+update) — static so the branch is resolved at trace time
        self._step_and_train = jax.jit(self._step_and_train_impl, static_argnums=1)

    def init(self, key: Optional[Array] = None) -> SACState:
        key = jax.random.PRNGKey(self.seed) if key is None else key
        k_env, k_a, k_c, k_run = jax.random.split(key, 4)
        env_state, obs = self.env.reset(k_env)
        a0 = jnp.zeros((self.env.num_envs, self.env.action_size))
        actor_params = self.actor.init(k_a, obs, k_run)
        critic_params = self.critic.init(k_c, obs, a0)
        buf = buffers.create(self.buffer_size, obs, self.env.action_size)
        return SACState(
            actor_params=actor_params,
            actor_opt=self.actor_tx.init(actor_params),
            critic_params=critic_params,
            critic_opt=self.critic_tx.init(critic_params),
            critic_target_params=critic_params,
            log_alpha=jnp.asarray(0.0),
            alpha_opt=self.alpha_tx.init(jnp.asarray(0.0)),
            buffer=buf,
            env_state=env_state,
            obs=obs,
            key=k_run,
            global_step=jnp.asarray(0, jnp.int32),
        )

    def _step_and_train_impl(self, st: SACState, train: bool):
        key, k_act, k_samp, k_next, k_pi = jax.random.split(st.key, 5)

        action, _ = self.actor.apply(st.actor_params, st.obs, k_act)
        action = jnp.clip(action, -1.0, 1.0)
        env_state, out = self.env.step(st.env_state, action)
        # SB3 convention: don't mark timeout truncations as terminal
        terminal = out.done & ~out.info["TimeLimit.truncated"]
        # done rows store the pre-reset terminal observation as next_obs
        # (SB3's terminal_observation substitution in _store_transition)
        term_obs = out.info["terminal_observation"]
        next_obs = jax.tree_util.tree_map(
            lambda post, pre: jnp.where(
                out.done.reshape((-1,) + (1,) * (post.ndim - 1)), pre, post
            ),
            out.obs, term_obs,
        )
        buf = buffers.insert(st.buffer, st.obs, next_obs, action, out.reward, terminal)

        metrics = {"reward_mean": out.reward.mean(),
                   "critic_loss": jnp.asarray(0.0),
                   "actor_loss": jnp.asarray(0.0),
                   "alpha": jnp.exp(st.log_alpha)}

        actor_params, actor_opt = st.actor_params, st.actor_opt
        critic_params, critic_opt = st.critic_params, st.critic_opt
        critic_target, log_alpha, alpha_opt = (
            st.critic_target_params, st.log_alpha, st.alpha_opt
        )

        if train and self.gradient_steps > 0:
            # ``gradient_steps`` SGD steps per environment step batch,
            # each on a fresh replay sample (SB3's gradient_steps loop,
            # `SAC.py:120-146`) — scanned so the program stays one jit
            def gstep(carry, k):
                (actor_params, actor_opt, critic_params, critic_opt,
                 critic_target, log_alpha, alpha_opt) = carry
                k_samp, k_next, k_pi = jax.random.split(k, 3)
                b_obs, b_next, b_act, b_rew, b_done = buffers.sample(
                    buf, k_samp, self.batch_size
                )
                alpha = jnp.exp(log_alpha)

                next_a, next_logp = self.actor.apply(actor_params, b_next,
                                                     k_next)
                q_next = self.critic.apply(critic_target, b_next, next_a)
                target_q = b_rew + self.gamma * (~b_done) * (
                    jnp.min(q_next, -1) - alpha * next_logp
                )

                def critic_loss_fn(p):
                    q = self.critic.apply(p, b_obs, b_act)
                    return jnp.mean((q - target_q[:, None]) ** 2)

                c_loss, c_grads = jax.value_and_grad(critic_loss_fn)(
                    critic_params)
                c_upd, critic_opt = self.critic_tx.update(
                    c_grads, critic_opt, critic_params)
                critic_params = optax.apply_updates(critic_params, c_upd)

                def actor_loss_fn(p):
                    a, logp = self.actor.apply(p, b_obs, k_pi)
                    q = self.critic.apply(critic_params, b_obs, a)
                    return jnp.mean(alpha * logp - jnp.min(q, -1)), logp

                (a_loss, logp), a_grads = jax.value_and_grad(
                    actor_loss_fn, has_aux=True
                )(actor_params)
                a_upd, actor_opt = self.actor_tx.update(
                    a_grads, actor_opt, actor_params)
                actor_params = optax.apply_updates(actor_params, a_upd)

                if self.auto_ent:
                    def alpha_loss_fn(la):
                        return -jnp.mean(
                            la * jax.lax.stop_gradient(
                                logp + self.target_entropy)
                        )

                    al_grads = jax.grad(alpha_loss_fn)(log_alpha)
                    al_upd, alpha_opt = self.alpha_tx.update(
                        al_grads, alpha_opt, log_alpha)
                    log_alpha = optax.apply_updates(log_alpha, al_upd)

                critic_target = jax.tree_util.tree_map(
                    lambda t, s: (1 - self.tau) * t + self.tau * s,
                    critic_target, critic_params,
                )
                return (actor_params, actor_opt, critic_params, critic_opt,
                        critic_target, log_alpha, alpha_opt), (c_loss,
                                                               a_loss)

            carry0 = (actor_params, actor_opt, critic_params, critic_opt,
                      critic_target, log_alpha, alpha_opt)
            keys = jax.random.split(
                jax.random.fold_in(k_samp, 1), self.gradient_steps)
            (actor_params, actor_opt, critic_params, critic_opt,
             critic_target, log_alpha, alpha_opt), (c_losses, a_losses) = \
                jax.lax.scan(gstep, carry0, keys)
            metrics["critic_loss"] = c_losses[-1]
            metrics["actor_loss"] = a_losses[-1]
            metrics["alpha"] = jnp.exp(log_alpha)

        st = SACState(
            actor_params=actor_params, actor_opt=actor_opt,
            critic_params=critic_params, critic_opt=critic_opt,
            critic_target_params=critic_target,
            log_alpha=log_alpha, alpha_opt=alpha_opt,
            buffer=buf, env_state=env_state, obs=out.obs, key=key,
            global_step=st.global_step + self.env.num_envs,
        )
        return st, metrics

    def learn(self, total_timesteps: int, state: Optional[SACState] = None,
              log_interval: int = 500) -> SACState:
        st = self.init() if state is None else state
        n_steps = max(1, int(total_timesteps) // self.env.num_envs)
        t0 = time.time()
        try:
            for i in range(n_steps):
                train = (i * self.env.num_envs) >= self.learning_starts and (
                    i % self.train_freq == 0
                )
                st, m = self._step_and_train(st, train)
                if log_interval and (i % log_interval == 0 or i == n_steps - 1):
                    m = jax.device_get(m)
                    fps = (i + 1) * self.env.num_envs / max(time.time() - t0, 1e-9)
                    print(
                        f"[SAC] step {i + 1}/{n_steps} r̄={m['reward_mean']:.4f} "
                        f"c_loss={m['critic_loss']:.4f} α={m['alpha']:.3f} fps={fps:.0f}",
                        flush=True,
                    )

        except KeyboardInterrupt:
            self.save_interrupt_cache(st, None)
        return st

    def predict(self, st: SACState, obs) -> Array:
        action, _ = self.actor.apply(st.actor_params, obs, deterministic=True)
        return jnp.clip(action, -1.0, 1.0)

    # checkpointing: full-state save/load from TrainerMixin (exact resume —
    # includes the replay buffer; size the buffer accordingly or prune
    # before saving if disk is a concern)
