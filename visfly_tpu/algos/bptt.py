"""BPTT — analytic policy gradients through the differentiable simulator.

TPU-native re-design of the reference BPTT trainer
(`/root/reference/utils/algorithms/BPTT.py:77-180`): the H-step rollout that
the reference unrolls eagerly in Python becomes ONE jitted ``lax.scan``
containing policy, dynamics, reward and auto-reset; the whole update
(rollout → backprop-through-time → clipped Adam step) is a single XLA
program that never leaves the device.

Semantics replicated:
* stochastic actor actions clipped to the action space (`BPTT.py:112-115`)
* actor loss ``Σ −r·d`` with the discount resetting on done:
  ``d ← d·γ·(1−done) + done`` (`BPTT.py:123-124`)
* grad-norm clip 0.5 + Adam (`BPTT.py:127-133`)
* graph truncation between updates: ``env.detach()`` (`BPTT.py:134`) becomes
  ``stop_gradient`` on the carried env state.
* ``jax.checkpoint`` over the scan body rematerialises the substep chain in
  the backward pass — the lax.scan equivalent of the horizon-memory concern
  (SURVEY §5 long-context note).
"""
from __future__ import annotations

import time
from typing import Any, Callable, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from jax import Array

from ..envs.base import DroneGymEnv, EnvState
from .common import TrainerMixin
from .lr_scheduler import transfer_schedule
from ..policies.networks import Actor, RecurrentActor


class BPTTState(NamedTuple):
    params: Any
    opt_state: Any
    env_state: EnvState
    obs: Dict[str, Array]
    key: Array
    global_step: Array  # () int32
    hidden: Any = ()  # GRU hidden state when recurrent


class BPTT(TrainerMixin):
    """Analytic-gradient trainer. ``learn()`` runs the host loop; the
    per-update computation is one jitted program."""

    def __init__(
        self,
        env: DroneGymEnv,
        policy: str = "MultiInputPolicy",  # accepted for reference parity
        policy_kwargs: Optional[dict] = None,
        learning_rate: float = 1e-3,
        horizon: int = 32,
        gamma: float = 0.99,
        max_grad_norm: float = 0.5,
        seed: int = 42,
        remat: bool = True,
        train: bool = True,
        comment: Optional[str] = None,
        save_path: Optional[str] = None,
        **_ignored,
    ):
        self.env = env
        if train:
            self._require_grad_env(env)
        self.H = int(horizon)
        self.gamma = float(gamma)
        self.seed = seed
        self.remat = remat
        self.comment = comment
        self.save_path = save_path

        pk = dict(policy_kwargs or {})
        pk.setdefault("net_arch", None)
        self.recurrent = bool(pk.get("recurrent", False))
        if self.recurrent:
            self.actor = RecurrentActor(
                action_dim=env.action_size,
                hidden_dim=pk.get("hidden_dim", 128),
                net_arch=pk.get("net_arch"),
                latent_dim=tuple(pk.get("latent_dim", (128,))),
                activation=pk.get("activation", "relu"),
            )
        else:
            self.actor = Actor(
                action_dim=env.action_size,
                net_arch=pk.get("net_arch"),
                latent_dim=tuple(pk.get("latent_dim", (256, 256))),
                activation=pk.get("activation", "relu"),
                layer_norm=pk.get("layer_norm", False),
            )
        self.tx = optax.chain(
            optax.clip_by_global_norm(max_grad_norm),
            optax.adam(transfer_schedule(learning_rate)),
        )
        self._update = jax.jit(self._update_impl)

    # -- setup ---------------------------------------------------------------

    def init(self, key: Optional[Array] = None) -> BPTTState:
        key = jax.random.PRNGKey(self.seed) if key is None else key
        k_env, k_actor, k_run = jax.random.split(key, 3)
        env_state, obs = self.env.reset(k_env)
        if self.recurrent:
            hidden = self.actor.initial_hidden(self.env.num_envs)
            params = self.actor.init(k_actor, obs, hidden, k_run)
        else:
            hidden = ()
            params = self.actor.init(k_actor, obs, k_run)
        return BPTTState(
            params=params,
            opt_state=self.tx.init(params),
            env_state=env_state,
            obs=obs,
            key=k_run,
            global_step=jnp.asarray(0, jnp.int32),
            hidden=hidden,
        )

    # -- one fully-jitted update ----------------------------------------------

    def _rollout_loss(self, params, env_state, obs, key, hidden):
        env = self.env
        n = env.num_envs

        def body(carry, _):
            env_state, obs, discount, key, loss, hidden = carry
            key, k_act = jax.random.split(key)
            if self.recurrent:
                action, _logp, hidden = self.actor.apply(params, obs, hidden, k_act)
            else:
                action, _logp = self.actor.apply(params, obs, k_act)
            action = jnp.clip(action, -1.0, 1.0)
            env_state, out = env.step(env_state, action)
            done = out.done.astype(loss.dtype)
            if self.recurrent:
                # hidden state resets with the episode (auto-reset boundary)
                hidden = hidden * (1.0 - done)[:, None]
            loss = loss - out.reward * discount
            discount = discount * self.gamma * (1.0 - done) + done
            metrics = (out.reward, out.done, out.info["is_success"])
            return (env_state, out.obs, discount, key, loss, hidden), metrics

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

        discount0 = jnp.ones((n,), jnp.float32)
        loss0 = jnp.zeros((n,), jnp.float32)
        (env_state, obs, _d, key, loss, hidden), metrics = jax.lax.scan(
            body, (env_state, obs, discount0, key, loss0, hidden), None,
            length=self.H,
        )
        return loss.mean(), (env_state, obs, key, hidden, metrics)

    def _update_impl(self, st: BPTTState) -> Tuple[BPTTState, Dict[str, Array]]:
        (loss, (env_state, obs, key, hidden, metrics)), grads = jax.value_and_grad(
            self._rollout_loss, has_aux=True
        )(st.params, st.env_state, st.obs, st.key, st.hidden)

        updates, opt_state = self.tx.update(grads, st.opt_state, st.params)
        params = optax.apply_updates(st.params, updates)

        # env.detach(): truncate BPTT between updates (`BPTT.py:134`)
        env_state = jax.lax.stop_gradient(env_state)
        obs = jax.lax.stop_gradient(obs)
        hidden = jax.lax.stop_gradient(hidden)

        rewards, dones, succ = metrics
        out_metrics = {
            "actor_loss": loss,
            "reward_mean": rewards.mean(),
            "done_rate": dones.mean(),
            "success_rate": succ.mean(),
            "grad_norm": optax.global_norm(grads),
        }
        st = BPTTState(
            params=params,
            opt_state=opt_state,
            env_state=env_state,
            obs=obs,
            key=key,
            global_step=st.global_step + self.H * self.env.num_envs,
            hidden=hidden,
        )
        return st, out_metrics

    def update(self, st: BPTTState) -> Tuple[BPTTState, Dict[str, Array]]:
        return self._update(st)

    # -- host training loop -----------------------------------------------------

    def learn(
        self,
        total_timesteps: int,
        state: Optional[BPTTState] = None,
        log_interval: int = 10,
        callback: Optional[Callable] = None,
        log_dir: Optional[str] = None,
        eval_env=None,
        eval_interval: int = 0,
    ) -> BPTTState:
        st = self.init() if state is None else state
        logger = self.make_logger(log_dir)
        steps_per_update = self.H * self.env.num_envs
        n_updates = max(1, int(total_timesteps) // steps_per_update)
        t0 = time.time()
        try:
            for i in range(n_updates):
                st, metrics = self.update(st)
                if callback is not None:
                    callback(i, st, metrics)
                if log_interval and (i % log_interval == 0 or i == n_updates - 1):
                    m = jax.device_get(metrics)
                    fps = (i + 1) * steps_per_update / max(time.time() - t0, 1e-9)
                    print(
                        f"[BPTT] update {i + 1}/{n_updates} "
                        f"loss={m['actor_loss']:.4f} r̄={m['reward_mean']:.4f} "
                        f"success={m['success_rate']:.2%} fps={fps:.0f}",
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

    # checkpointing: full-state save/load from TrainerMixin (exact resume)

    def predict(self, st: BPTTState, obs: Dict[str, Array],
                hidden: Any = None) -> Array:
        """Deterministic action. For recurrent actors pass (and thread) the
        hidden state via :meth:`predict_step`; bare predict falls back to the
        trainer-carried hidden (or zeros) — note the GRU update is discarded
        here, so rollouts must use predict_step."""
        if self.recurrent:
            if hidden is None:
                # st.hidden is a plain array when recurrent, the () sentinel
                # otherwise — test by type (arrays don't compare to tuples)
                hidden = (st.hidden if not isinstance(st.hidden, tuple)
                          else self.actor.initial_hidden(
                              next(iter(obs.values())).shape[0]))
            action, _, _ = self.actor.apply(st.params, obs, hidden,
                                            deterministic=True)
        else:
            action, _ = self.actor.apply(st.params, obs, deterministic=True)
        return jnp.clip(action, -1.0, 1.0)

    # recurrent evaluation hooks (TrainerMixin.evaluate threads the GRU
    # hidden through the rollout and resets it at episode boundaries)
    def init_predict_carry(self, obs):
        if not self.recurrent:
            return ()
        return self.actor.initial_hidden(next(iter(obs.values())).shape[0])

    def predict_step(self, st: BPTTState, obs, carry):
        if not self.recurrent:
            return self.predict(st, obs), carry
        action, _, hidden = self.actor.apply(st.params, obs, carry,
                                             deterministic=True)
        return jnp.clip(action, -1.0, 1.0), hidden

    def mask_predict_carry(self, carry, done):
        if not self.recurrent:
            return carry
        keep = 1.0 - jnp.asarray(done, carry.dtype)
        return carry * keep[:, None]
