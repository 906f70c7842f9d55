"""PPO — clipped-surrogate on-policy RL, fully jitted.

TPU-native re-design of the reference PPO (an SB3 subclass,
`/root/reference/utils/algorithms/PPO.py:59-572`): rollout collection
(n_steps × N envs), GAE, and n_epochs × minibatch SGD compile into one XLA
program per update. No replay of SB3's host-side loops — the rollout is a
``lax.scan`` over the env step, and the epoch/minibatch loops are scans over
permuted index blocks.

Matches the reference training semantics: clipped surrogate with advantage
normalisation, value loss with optional clipping (``clip_range_vf``,
`PPO.py:188-244`), entropy bonus, grad-norm clip, ``target_kl`` early stop
(`PPO.py:276` — realised as masked updates inside the jitted epoch scan so
shapes stay static), SB3's γ·V(terminal_obs) bootstrap on TimeLimit
truncation, a 100-episode running stats window (SB3 ``ep_info_buffer``
semantics), and an optional GRU-recurrent policy (the reference policy's
recurrent hook, `utils/policies/policies.py:18-343`) trained
RecurrentPPO-style on whole sequences. Periodic scene rotation
(`PPO.py:102-115`) is exposed as ``scene_freq`` via host-side scene reload
between updates.
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
    RecurrentActorCriticPolicy,
    gaussian_entropy,
    gaussian_log_prob,
)
from .returns import compute_gae

EP_WINDOW = 100  # SB3 ep_info_buffer maxlen


class EpisodeStats(NamedTuple):
    """Running 100-episode window of completed-episode stats — the SB3
    ``ep_info_buffer`` deque as a fixed-size on-device ring."""

    returns: Array  # (EP_WINDOW,)
    lengths: Array  # (EP_WINDOW,)
    success: Array  # (EP_WINDOW,)
    pos: Array  # () int32 — next write slot
    count: Array  # () int32 — episodes seen, saturates at EP_WINDOW


def init_episode_stats(dtype=jnp.float32) -> EpisodeStats:
    z = jnp.zeros((EP_WINDOW,), dtype)
    return EpisodeStats(returns=z, lengths=z, success=z,
                        pos=jnp.asarray(0, jnp.int32),
                        count=jnp.asarray(0, jnp.int32))


def push_episode_stats(stats: EpisodeStats, done: Array, ep_return: Array,
                       ep_length: Array, ep_success: Array) -> EpisodeStats:
    """Scatter this step's completed episodes into the ring (variable count
    per step handled with a cumsum slot assignment + drop-mode scatter)."""
    offs = jnp.cumsum(done.astype(jnp.int32)) - 1  # slot offset per done agent
    slot = (stats.pos + offs) % EP_WINDOW
    n_done_now = jnp.sum(done.astype(jnp.int32))
    # if more than EP_WINDOW episodes finish in one step, keep only the
    # LAST EP_WINDOW of them — slots stay unique, so the scatter is
    # deterministic (duplicate indices in a scatter-set have unspecified
    # order) and matches the deque semantics of "the most recent 100"
    keep = done & (offs >= n_done_now - EP_WINDOW)
    idx = jnp.where(keep, slot, EP_WINDOW)  # out-of-range rows are dropped
    dt = stats.returns.dtype
    returns = stats.returns.at[idx].set(ep_return.astype(dt), mode="drop")
    lengths = stats.lengths.at[idx].set(ep_length.astype(dt), mode="drop")
    success = stats.success.at[idx].set(ep_success.astype(dt), mode="drop")
    n_done = done.sum().astype(jnp.int32)
    return EpisodeStats(
        returns=returns, lengths=lengths, success=success,
        pos=(stats.pos + n_done) % EP_WINDOW,
        count=jnp.minimum(stats.count + n_done, EP_WINDOW),
    )


def episode_stats_means(stats: EpisodeStats) -> Tuple[Array, Array, Array]:
    valid = (jnp.arange(EP_WINDOW) < stats.count).astype(stats.returns.dtype)
    n = jnp.maximum(stats.count.astype(stats.returns.dtype), 1.0)
    return ((stats.returns * valid).sum() / n,
            (stats.lengths * valid).sum() / n,
            (stats.success * valid).sum() / n)


class PPOState(NamedTuple):
    params: Any
    opt_state: Any
    env_state: EnvState
    obs: Dict[str, Array]
    key: Array
    global_step: Array
    ep_stats: EpisodeStats
    hidden: Any = ()  # GRU hidden when recurrent


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
        clip_range_vf: Optional[float] = None,
        ent_coef: float = 0.0,
        vf_coef: float = 0.5,
        max_grad_norm: float = 0.5,
        normalize_advantage: bool = True,
        target_kl: Optional[float] = None,
        weight_decay: float = 0.0,
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
        self.clip_range_vf = None if clip_range_vf is None else float(clip_range_vf)
        self.ent_coef = float(ent_coef)
        self.vf_coef = float(vf_coef)
        self.normalize_advantage = normalize_advantage
        self.target_kl = None if target_kl is None else float(target_kl)
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

        pk = dict(policy_kwargs or {})
        self.recurrent = bool(pk.get("recurrent", False))
        if self.recurrent:
            self.policy = RecurrentActorCriticPolicy(
                action_dim=env.action_size,
                hidden_dim=int(pk.get("hidden_dim", 128)),
                net_arch=pk.get("net_arch"),
                pi_layers=tuple(pk.get("pi_layers", (64,))),
                vf_layers=tuple(pk.get("vf_layers", (64,))),
                activation=pk.get("activation", "relu"),
            )
            # recurrent minibatches are whole sequences over the agent axis
            n_env = env.num_envs
            mb_agents = max(1, min(n_env, int(batch_size) // self.n_steps)
                            ) if batch_size else n_env
            while n_env % mb_agents:
                mb_agents -= 1
            self.n_minibatches = n_env // mb_agents
            self.batch_size = mb_agents * self.n_steps
        else:
            self.policy = ActorCriticPolicy(
                action_dim=env.action_size,
                net_arch=pk.get("net_arch"),
                pi_layers=tuple(pk.get("pi_layers", (64, 64))),
                vf_layers=tuple(pk.get("vf_layers", (64, 64))),
                activation=pk.get("activation", "relu"),
            )
            total = self.n_steps * env.num_envs
            self.batch_size = int(batch_size) if batch_size else total
            self.n_minibatches = max(1, total // self.batch_size)
        # the reference passes optimizer_kwargs={'weight_decay': …} to torch
        # Adam (alg_cfgs/*/PPO.yaml); Adam-with-L2 == optax.adamw's decoupled
        # decay only at wd=0, but at the reference's 1e-5 the difference is
        # far below training noise — adamw keeps the update one fused op
        opt = (optax.adamw(transfer_schedule(learning_rate),
                           weight_decay=float(weight_decay))
               if weight_decay else optax.adam(transfer_schedule(learning_rate)))
        self.tx = optax.chain(optax.clip_by_global_norm(max_grad_norm), opt)
        self._update = jax.jit(self._update_impl)

    def init(self, key: Optional[Array] = None) -> PPOState:
        key = jax.random.PRNGKey(self.seed) if key is None else key
        k_env, k_pi, k_run = jax.random.split(key, 3)
        env_state, obs = self.env.reset(k_env)
        if self.recurrent:
            hidden = self.policy.initial_hidden(self.env.num_envs)
            params = self.policy.init(k_pi, obs, hidden)
        else:
            hidden = ()
            params = self.policy.init(k_pi, obs)
        return PPOState(
            params=params,
            opt_state=self.tx.init(params),
            env_state=env_state,
            obs=obs,
            key=k_run,
            global_step=jnp.asarray(0, jnp.int32),
            ep_stats=init_episode_stats(),
            hidden=hidden,
        )

    # -- one fully-jitted update ------------------------------------------------

    def _policy_fwd(self, params, obs, hidden):
        """(mean, log_std, value, new_hidden) for either policy flavour."""
        if self.recurrent:
            return self.policy.apply(params, obs, hidden)
        mean, log_std, value = self.policy.apply(params, obs)
        return mean, log_std, value, hidden

    def _collect(self, params, env_state, obs, key, ep_stats, hidden):
        env = self.env

        def body(carry, _):
            env_state, obs, key, ep_stats, hidden = carry
            key, k = jax.random.split(key)
            mean, log_std, value, new_hidden = self._policy_fwd(
                params, obs, hidden
            )
            action = mean + jnp.exp(log_std) * jax.random.normal(k, mean.shape)
            logp = gaussian_log_prob(mean, log_std, action)
            clipped = jnp.clip(action, -1.0, 1.0)
            env_state, out = env.step(env_state, clipped)
            reward = out.reward
            if self.bootstrap_truncated:
                # SB3 truncation handling: r += γ·V(s_terminal) on timeout
                _, _, term_value, _ = self._policy_fwd(
                    params, out.info["terminal_observation"], new_hidden
                )
                truncated = out.info["TimeLimit.truncated"]
                reward = reward + self.gamma * term_value * truncated
            ep_stats = push_episode_stats(
                ep_stats, out.done, out.info["episode_return"],
                out.info["episode_length"], out.info["is_success"],
            )
            if self.recurrent:
                # hidden resets with the episode (matches the env auto-reset)
                new_hidden = new_hidden * (1.0 - out.done.astype(
                    new_hidden.dtype))[:, None]
            tape = (obs, action, logp, value, reward, out.reward, out.done)
            return (env_state, out.obs, key, ep_stats, new_hidden), tape

        (env_state, obs, key, ep_stats, hidden), tape = jax.lax.scan(
            body, (env_state, obs, key, ep_stats, hidden), None,
            length=self.n_steps,
        )
        return env_state, obs, key, ep_stats, hidden, tape

    def _ppo_losses(self, mean, log_std, value, old_logp, old_value, action,
                    adv, ret):
        """Element-wise PPO loss terms given policy outputs; shapes are
        whatever the caller batched (flat minibatch or (H, mb))."""
        logp = gaussian_log_prob(mean, log_std, action)
        log_ratio = logp - old_logp
        ratio = jnp.exp(log_ratio)
        pg1 = adv * ratio
        pg2 = adv * jnp.clip(ratio, 1.0 - self.clip_range, 1.0 + self.clip_range)
        pg_loss = -jnp.minimum(pg1, pg2).mean()
        if self.clip_range_vf is not None:
            # reference value clipping (`PPO.py:188-244` / SB3): predictions
            # move at most clip_range_vf away from the rollout-time values
            value = old_value + jnp.clip(
                value - old_value, -self.clip_range_vf, self.clip_range_vf
            )
        v_loss = jnp.mean((ret - value) ** 2)
        ent = gaussian_entropy(log_std).mean()
        loss = pg_loss + self.vf_coef * v_loss - self.ent_coef * ent
        # SB3's approx_kl estimator (Schulman's unbiased k3)
        approx_kl = jnp.mean(ratio - 1.0 - log_ratio)
        clip_frac = jnp.mean(jnp.abs(ratio - 1.0) > self.clip_range)
        return loss, (pg_loss, v_loss, ent, clip_frac, approx_kl)

    def _masked_apply(self, params, opt_state, grads, apply: Array):
        """Optimizer step that is an identity when ``apply`` is False — the
        static-shape realisation of SB3's target_kl early ``break``."""
        upd, new_opt = self.tx.update(grads, opt_state, params)
        new_params = optax.apply_updates(params, upd)
        pick = lambda new, old: jax.tree_util.tree_map(
            lambda a, b: jnp.where(apply, a, b), new, old
        )
        return pick(new_params, params), pick(new_opt, opt_state)

    def _update_impl(self, st: PPOState) -> Tuple[PPOState, Dict[str, Array]]:
        rollout_hidden = st.hidden  # window-start hidden for sequence replay
        env_state, obs, key, ep_stats, hidden, tape = self._collect(
            st.params, st.env_state, st.obs, st.key, st.ep_stats, st.hidden
        )
        (b_obs, b_act, b_logp, b_val, b_rew, b_raw_rew, b_done) = tape

        _, _, last_value, _ = self._policy_fwd(st.params, obs, hidden)
        advantages, returns = compute_gae(
            b_rew, b_val, b_done, last_value, b_done[-1],
            gamma=self.gamma, gae_lambda=self.gae_lambda,
        )

        if self.recurrent:
            params, opt_state, key, stats = self._train_recurrent(
                st, rollout_hidden, b_obs, b_act, b_logp, b_val, b_done,
                advantages, returns, key,
            )
        else:
            params, opt_state, key, stats = self._train_flat(
                st, b_obs, b_act, b_logp, b_val, advantages, returns, key
            )
        loss, pg_loss, v_loss, ent, clip_frac, approx_kl, applied = (
            s.mean() for s in stats
        )

        ep_rew, ep_len, succ_rate = episode_stats_means(ep_stats)
        metrics = {
            "loss": loss,
            "pg_loss": pg_loss,
            "value_loss": v_loss,
            "entropy": ent,
            "clip_fraction": clip_frac,
            "approx_kl": approx_kl,
            "update_fraction": applied,  # < 1 when target_kl stopped early
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
            global_step=st.global_step + self.n_steps * self.env.num_envs,
            ep_stats=ep_stats,
            hidden=jax.lax.stop_gradient(hidden),
        )
        return st, metrics

    def _continue_from_kl(self, cont: Array, approx_kl: Array) -> Array:
        """SB3: stop ALL further updates once approx_kl > 1.5·target_kl
        (checked before applying the offending minibatch, `PPO.py:276`)."""
        if self.target_kl is None:
            return cont
        return cont & (approx_kl <= 1.5 * self.target_kl)

    def _train_flat(self, st, b_obs, b_act, b_logp, b_val, advantages,
                    returns, key):
        total = self.n_steps * self.env.num_envs
        flat = lambda x: x.reshape((total,) + x.shape[2:])
        f_obs = jax.tree_util.tree_map(flat, b_obs)
        f_act, f_logp, f_adv, f_ret, f_val = (
            flat(b_act), flat(b_logp), flat(advantages), flat(returns),
            flat(b_val),
        )
        mb = total // self.n_minibatches

        def epoch(carry, _):
            params, opt_state, key, cont = carry
            key, k = jax.random.split(key)
            perm = jax.random.permutation(k, total)

            def minibatch(carry, idx_block):
                params, opt_state, cont = carry
                mb_obs = jax.tree_util.tree_map(lambda x: x[idx_block], f_obs)
                mb_act, mb_logp, mb_adv, mb_ret, mb_val = (
                    f_act[idx_block], f_logp[idx_block],
                    f_adv[idx_block], f_ret[idx_block], f_val[idx_block],
                )
                if self.normalize_advantage:
                    mb_adv = (mb_adv - mb_adv.mean()) / (mb_adv.std() + 1e-8)

                def loss_fn(p):
                    mean, log_std, value = self.policy.apply(p, mb_obs)
                    return self._ppo_losses(mean, log_std, value, mb_logp,
                                            mb_val, mb_act, mb_adv, mb_ret)

                (loss, aux), grads = jax.value_and_grad(
                    loss_fn, has_aux=True
                )(params)
                cont = self._continue_from_kl(cont, aux[-1])
                params, opt_state = self._masked_apply(
                    params, opt_state, grads, cont
                )
                return (params, opt_state, cont), (
                    loss, *aux, cont.astype(loss.dtype)
                )

            blocks = perm[: self.n_minibatches * mb].reshape(
                self.n_minibatches, mb
            )
            (params, opt_state, cont), stats = jax.lax.scan(
                minibatch, (params, opt_state, cont), blocks
            )
            return (params, opt_state, key, cont), stats

        cont0 = jnp.asarray(True)
        (params, opt_state, key, _), stats = jax.lax.scan(
            epoch, (st.params, st.opt_state, key, cont0), None,
            length=self.n_epochs,
        )
        return params, opt_state, key, stats

    def _train_recurrent(self, st, h0, b_obs, b_act, b_logp, b_val, b_done,
                         advantages, returns, key):
        """RecurrentPPO-style training: minibatches are whole sequences over
        the agent axis; each epoch replays the GRU from the stored
        window-start hidden, resetting at the recorded episode boundaries."""
        n_env = self.env.num_envs
        mb_agents = n_env // self.n_minibatches

        def epoch(carry, _):
            params, opt_state, key, cont = carry
            key, k = jax.random.split(key)
            perm = jax.random.permutation(k, n_env)

            def minibatch(carry, idx_block):
                params, opt_state, cont = carry
                mb_obs = jax.tree_util.tree_map(
                    lambda x: x[:, idx_block], b_obs
                )
                mb_act, mb_logp, mb_adv, mb_ret, mb_val, mb_done = (
                    b_act[:, idx_block], b_logp[:, idx_block],
                    advantages[:, idx_block], returns[:, idx_block],
                    b_val[:, idx_block], b_done[:, idx_block],
                )
                mb_h0 = h0[idx_block]
                if self.normalize_advantage:
                    mb_adv = (mb_adv - mb_adv.mean()) / (mb_adv.std() + 1e-8)

                def loss_fn(p):
                    def gru_step(h, xs):
                        obs_t, done_t = xs
                        mean, log_std, value, h = self.policy.apply(
                            p, obs_t, h
                        )
                        h = h * (1.0 - done_t.astype(h.dtype))[:, None]
                        return h, (mean, log_std, value)

                    _, (mean, log_std, value) = jax.lax.scan(
                        gru_step, mb_h0, (mb_obs, mb_done)
                    )
                    return self._ppo_losses(mean, log_std, value, mb_logp,
                                            mb_val, mb_act, mb_adv, mb_ret)

                (loss, aux), grads = jax.value_and_grad(
                    loss_fn, has_aux=True
                )(params)
                cont = self._continue_from_kl(cont, aux[-1])
                params, opt_state = self._masked_apply(
                    params, opt_state, grads, cont
                )
                return (params, opt_state, cont), (
                    loss, *aux, cont.astype(loss.dtype)
                )

            blocks = perm[: self.n_minibatches * mb_agents].reshape(
                self.n_minibatches, mb_agents
            )
            (params, opt_state, cont), stats = jax.lax.scan(
                minibatch, (params, opt_state, cont), blocks
            )
            return (params, opt_state, key, cont), stats

        cont0 = jnp.asarray(True)
        (params, opt_state, key, _), stats = jax.lax.scan(
            epoch, (st.params, st.opt_state, key, cont0), None,
            length=self.n_epochs,
        )
        return params, opt_state, key, stats

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
                        f"kl={m['approx_kl']:.4f} fps={fps:.0f}",
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
        if self.recurrent:
            hidden = (st.hidden if not isinstance(st.hidden, tuple)
                      else self.policy.initial_hidden(
                          next(iter(obs.values())).shape[0]))
            mean, _, _, _ = self.policy.apply(st.params, obs, hidden)
        else:
            mean, _, _ = self.policy.apply(st.params, obs)
        return jnp.clip(mean, -1.0, 1.0)

    # recurrent evaluation hooks (TrainerMixin.evaluate)
    def init_predict_carry(self, obs):
        if not self.recurrent:
            return ()
        return self.policy.initial_hidden(next(iter(obs.values())).shape[0])

    def predict_step(self, st: PPOState, obs, carry):
        if not self.recurrent:
            return self.predict(st, obs), carry
        mean, _, _, hidden = self.policy.apply(st.params, obs, carry)
        return jnp.clip(mean, -1.0, 1.0), hidden

    def mask_predict_carry(self, carry, done):
        if not self.recurrent:
            return carry
        return carry * (1.0 - jnp.asarray(done, carry.dtype))[:, None]

    # checkpointing: full-state save/load from TrainerMixin (exact resume)
