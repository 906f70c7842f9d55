"""SHAC — short-horizon actor-critic on the differentiable simulator.

TPU-native re-design of the reference ``TemporalDifferBase`` (aliased
``shac``, `/root/reference/utils/algorithms/shac.py:43-390`): the H-step
differentiable rollout, terminal critic bootstrap, TD(λ) critic regression
and polyak target update all fuse into one jitted update.

Semantics replicated:
* actor loss ``Σ −r·d`` plus bootstrapped min-Q of the target critic at
  horizon truncation / non-terminal dones (`shac.py:240-246`)
* discount reset on done (`shac.py:246`)
* TD(λ) targets via the exact Ai/Bi/lam recursion (`common.py:893-923`)
* ``gradient_steps`` critic epochs + polyak(τ) target update
  (`shac.py:268-278`)
* env state detached between updates (`shac.py:265`)
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
from ..policies.networks import Actor, QCritic
from .returns import compute_td_returns


class SHACState(NamedTuple):
    actor_params: Any
    actor_opt: Any
    critic_params: Any
    critic_opt: Any
    critic_target_params: Any
    env_state: EnvState
    obs: Dict[str, Array]
    key: Array
    global_step: Array


class SHAC(TrainerMixin):
    def __init__(
        self,
        env: DroneGymEnv,
        policy: str = "MultiInputPolicy",
        policy_kwargs: Optional[dict] = None,
        learning_rate: float = 1e-3,
        horizon: int = 32,
        tau: float = 0.005,
        gamma: float = 0.99,
        gradient_steps: int = 5,
        max_grad_norm: float = 0.5,
        seed: int = 42,
        remat: bool = True,
        train: bool = True,
        **_ignored,
    ):
        self.env = env
        if train:
            self._require_grad_env(env)
        self.H = int(horizon)
        self.gamma = float(gamma)
        self.tau = float(tau)
        self.gradient_steps = int(gradient_steps)
        self.seed = seed
        self.remat = remat

        pk = dict(policy_kwargs or {})
        latent = tuple(pk.get("latent_dim", (256, 256)))
        self.actor = Actor(action_dim=env.action_size, net_arch=pk.get("net_arch"),
                           latent_dim=latent, activation=pk.get("activation", "relu"))
        self.critic = QCritic(n_critics=pk.get("n_critics", 2),
                              net_arch=pk.get("net_arch"), latent_dim=latent,
                              activation=pk.get("activation", "relu"))
        self.actor_tx = optax.chain(
            optax.clip_by_global_norm(max_grad_norm), optax.adam(transfer_schedule(learning_rate))
        )
        self.critic_tx = optax.chain(
            optax.clip_by_global_norm(max_grad_norm), optax.adam(transfer_schedule(learning_rate))
        )
        self._update = jax.jit(self._update_impl)

    def init(self, key: Optional[Array] = None) -> SHACState:
        key = jax.random.PRNGKey(self.seed) if key is None else key
        k_env, k_a, k_c, k_run = jax.random.split(key, 4)
        env_state, obs = self.env.reset(k_env)
        a0 = jnp.zeros((self.env.num_envs, self.env.action_size))
        actor_params = self.actor.init(k_a, obs, k_run)
        critic_params = self.critic.init(k_c, obs, a0)
        return SHACState(
            actor_params=actor_params,
            actor_opt=self.actor_tx.init(actor_params),
            critic_params=critic_params,
            critic_opt=self.critic_tx.init(critic_params),
            critic_target_params=critic_params,
            env_state=env_state,
            obs=obs,
            key=k_run,
            global_step=jnp.asarray(0, jnp.int32),
        )

    # -- rollout + actor loss ---------------------------------------------------

    def _rollout(self, actor_params, critic_target_params, env_state, obs, key):
        env = self.env
        n = env.num_envs
        H = self.H

        def body(carry, step_i):
            env_state, obs, discount, key, loss = carry
            key, k_act, k_next = jax.random.split(key, 3)
            action, _ = self.actor.apply(actor_params, obs, k_act)
            action = jnp.clip(action, -1.0, 1.0)
            env_state, out = env.step(env_state, action)
            done = out.done
            episode_done = out.info["episode_done"]

            next_action, _ = self.actor.apply(actor_params, out.obs, k_next)
            next_action = jnp.clip(next_action, -1.0, 1.0)
            q = self.critic.apply(
                critic_target_params,
                jax.lax.stop_gradient(out.obs),
                jax.lax.stop_gradient(next_action),
            )
            next_values = jnp.min(q, axis=-1)

            loss = loss - out.reward * discount
            # bootstrap at horizon truncation / non-terminal dones
            # (`shac.py:243-245`)
            dbnee = (done | (step_i == H - 1)) & ~episode_done
            loss = loss - next_values * discount * self.gamma * dbnee
            done_f = done.astype(loss.dtype)
            discount = discount * self.gamma * (1.0 - done_f) + done_f

            tape = (obs, action, out.reward, done, episode_done,
                    jax.lax.stop_gradient(next_values), out.info["is_success"])
            return (env_state, out.obs, discount, key, loss), tape

        if self.remat:
            # save (don't replay) the named Pallas-kernel outputs: the
            # rematerialised backward pass must never contain the Mosaic
            # kernel forward (pathological Mosaic compile under grad+remat;
            # XLA-rendered and non-visual envs have no such names — policy
            # is then equivalent to the default save-nothing remat)
            body = jax.checkpoint(
                body, prevent_cse=False,
                policy=jax.checkpoint_policies.save_only_these_names(
                    "pallas_render"))

        carry0 = (
            env_state, obs,
            jnp.ones((n,), jnp.float32),
            key,
            jnp.zeros((n,), jnp.float32),
        )
        (env_state, obs, _d, key, loss), tape = jax.lax.scan(
            body, carry0, jnp.arange(H)
        )
        return loss.mean(), (env_state, obs, key, tape)

    def _update_impl(self, st: SHACState) -> Tuple[SHACState, Dict[str, Array]]:
        (actor_loss, (env_state, obs, key, tape)), grads = jax.value_and_grad(
            self._rollout, has_aux=True
        )(st.actor_params, st.critic_target_params, st.env_state, st.obs, st.key)

        updates, actor_opt = self.actor_tx.update(grads, st.actor_opt, st.actor_params)
        actor_params = optax.apply_updates(st.actor_params, updates)

        env_state = jax.lax.stop_gradient(env_state)
        obs = jax.lax.stop_gradient(obs)

        b_obs, b_act, b_rew, b_done, b_epdone, b_val, b_succ = jax.lax.stop_gradient(tape)
        returns = compute_td_returns(
            b_rew, b_done, b_val, b_epdone, gamma=self.gamma
        )
        flat_obs = jax.tree_util.tree_map(
            lambda x: x.reshape((-1,) + x.shape[2:]), b_obs
        )
        flat_act = b_act.reshape(-1, b_act.shape[-1])
        flat_ret = returns.reshape(-1)

        def critic_loss_fn(params):
            q = self.critic.apply(params, flat_obs, flat_act)
            values = jnp.min(q, axis=-1)
            return jnp.mean((flat_ret - values) ** 2)

        critic_params, critic_opt, critic_target = (
            st.critic_params, st.critic_opt, st.critic_target_params
        )
        critic_loss = jnp.asarray(0.0)
        for _ in range(self.gradient_steps):
            critic_loss, cgrads = jax.value_and_grad(critic_loss_fn)(critic_params)
            cupd, critic_opt = self.critic_tx.update(cgrads, critic_opt, critic_params)
            critic_params = optax.apply_updates(critic_params, cupd)
            critic_target = jax.tree_util.tree_map(
                lambda t, s: (1.0 - self.tau) * t + self.tau * s,
                critic_target, critic_params,
            )

        metrics = {
            "actor_loss": actor_loss,
            "critic_loss": critic_loss,
            "reward_mean": b_rew.mean(),
            "success_rate": b_succ.mean(),
            "grad_norm": optax.global_norm(grads),
        }
        st = SHACState(
            actor_params=actor_params,
            actor_opt=actor_opt,
            critic_params=critic_params,
            critic_opt=critic_opt,
            critic_target_params=critic_target,
            env_state=env_state,
            obs=obs,
            key=key,
            global_step=st.global_step + self.H * self.env.num_envs,
        )
        return st, metrics

    def update(self, st: SHACState):
        return self._update(st)

    def learn(self, total_timesteps: int, state: Optional[SHACState] = None,
              log_interval: int = 10) -> SHACState:
        st = self.init() if state is None else state
        per = self.H * self.env.num_envs
        n_updates = max(1, int(total_timesteps) // per)
        t0 = time.time()
        try:
            for i in range(n_updates):
                st, m = self.update(st)
                if log_interval and (i % log_interval == 0 or i == n_updates - 1):
                    m = jax.device_get(m)
                    fps = (i + 1) * per / max(time.time() - t0, 1e-9)
                    print(
                        f"[SHAC] update {i + 1}/{n_updates} "
                        f"a_loss={m['actor_loss']:.4f} c_loss={m['critic_loss']:.4f} "
                        f"r̄={m['reward_mean']:.4f} fps={fps:.0f}",
                        flush=True,
                    )

        except KeyboardInterrupt:
            self.save_interrupt_cache(st, None)
        return st

    def predict(self, st: SHACState, obs) -> Array:
        action, _ = self.actor.apply(st.actor_params, obs, deterministic=True)
        return jnp.clip(action, -1.0, 1.0)

    # checkpointing: full-state save/load from TrainerMixin (exact resume)
