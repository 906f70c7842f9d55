"""APG — analytic policy gradient with a deterministic actor.

TPU-native counterpart of the reference ``ApgBase``
(`/root/reference/utils/algorithms/dl_algorithm.py:21-234`): deterministic
policy, H-step differentiable rollout, ``loss = −mean(rewards)``. The
reference breaks the Python rollout loop when any agent is done
(`dl_algorithm.py:105-184`); in the fused scan we mask each agent's reward
accumulation after its own done instead (strictly tighter credit
assignment — documented deviation).
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
from ..policies.networks import Actor


class APGState(NamedTuple):
    params: Any
    opt_state: Any
    env_state: EnvState
    obs: Dict[str, Array]
    key: Array
    global_step: Array


class APG(TrainerMixin):
    def __init__(
        self,
        env: DroneGymEnv,
        policy: str = "MultiInputPolicy",
        policy_kwargs: Optional[dict] = None,
        learning_rate: float = 1e-3,
        horizon: int = 32,
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
        self.seed = seed
        self.remat = remat
        pk = dict(policy_kwargs or {})
        self.actor = Actor(action_dim=env.action_size, net_arch=pk.get("net_arch"),
                           latent_dim=tuple(pk.get("latent_dim", (256, 256))))
        self.tx = optax.chain(
            optax.clip_by_global_norm(max_grad_norm), optax.adam(transfer_schedule(learning_rate))
        )
        self._update = jax.jit(self._update_impl)

    def init(self, key: Optional[Array] = None) -> APGState:
        key = jax.random.PRNGKey(self.seed) if key is None else key
        k_env, k_a = jax.random.split(key)
        env_state, obs = self.env.reset(k_env)
        params = self.actor.init(k_a, obs, deterministic=True)
        return APGState(params=params, opt_state=self.tx.init(params),
                        env_state=env_state, obs=obs, key=key,
                        global_step=jnp.asarray(0, jnp.int32))

    def _loss(self, params, env_state, obs, key):
        env = self.env
        n = env.num_envs

        def body(carry, _):
            env_state, obs, alive, total = carry
            action, _ = self.actor.apply(params, obs, deterministic=True)
            action = jnp.clip(action, -1.0, 1.0)
            env_state, out = env.step(env_state, action)
            total = total + out.reward * alive
            alive = alive * (1.0 - out.done.astype(total.dtype))
            return (env_state, out.obs, alive, total), out.reward

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
        (env_state, obs, _a, total), rewards = jax.lax.scan(
            body, (env_state, obs, jnp.ones((n,)), jnp.zeros((n,))), None,
            length=self.H,
        )
        return -total.mean(), (env_state, obs, rewards)

    def _update_impl(self, st: APGState):
        key, k = jax.random.split(st.key)
        (loss, (env_state, obs, rewards)), grads = jax.value_and_grad(
            self._loss, has_aux=True
        )(st.params, st.env_state, st.obs, k)
        upd, opt_state = self.tx.update(grads, st.opt_state, st.params)
        params = optax.apply_updates(st.params, upd)
        env_state = jax.lax.stop_gradient(env_state)
        obs = jax.lax.stop_gradient(obs)
        metrics = {"loss": loss, "reward_mean": rewards.mean(),
                   "grad_norm": optax.global_norm(grads)}
        return APGState(params, opt_state, env_state, obs, key,
                        st.global_step + self.H * self.env.num_envs), metrics

    def update(self, st: APGState):
        return self._update(st)

    def learn(self, total_timesteps: int, state: Optional[APGState] = None,
              log_interval: int = 10) -> APGState:
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
                    print(f"[APG] update {i + 1}/{n_updates} loss={m['loss']:.4f} "
                          f"r̄={m['reward_mean']:.4f} fps={fps:.0f}", flush=True)

        except KeyboardInterrupt:
            self.save_interrupt_cache(st, None)
        return st

    def predict(self, st: APGState, obs) -> Array:
        action, _ = self.actor.apply(st.params, obs, deterministic=True)
        return jnp.clip(action, -1.0, 1.0)

    # checkpointing: full-state save/load from TrainerMixin (exact resume)
