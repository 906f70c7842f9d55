"""End-to-end BPTT slice: hover training must improve within a few updates
(the SURVEY §7 minimum end-to-end slice; reference `BPTT.py:77-180`)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from visfly_tpu.algos import BPTT
from visfly_tpu.envs import HoverEnv


def make_trainer(**kw):
    env = HoverEnv(
        num_agent_per_scene=32,
        visual=False,
        requires_grad=True,
        dynamics_kwargs={"dt": 0.03, "ctrl_dt": 0.03, "action_type": "bodyrate"},
        max_episode_steps=64,
    )
    kw.setdefault("horizon", 16)
    kw.setdefault("learning_rate", 1e-3)
    return BPTT(env, policy_kwargs={"latent_dim": (64, 64)}, **kw)


def test_update_runs_and_is_finite():
    tr = make_trainer()
    st = tr.init(jax.random.PRNGKey(0))
    st, metrics = tr.update(st)
    m = jax.device_get(metrics)
    assert np.isfinite(m["actor_loss"])
    assert np.isfinite(m["grad_norm"]) and m["grad_norm"] > 0
    assert int(st.global_step) == 16 * 32


@pytest.mark.slow
def test_training_improves_reward():
    tr = make_trainer()
    st = tr.init(jax.random.PRNGKey(1))
    first = None
    rewards = []
    for i in range(40):
        st, metrics = tr.update(st)
        rewards.append(float(metrics["reward_mean"]))
    early = np.mean(rewards[:5])
    late = np.mean(rewards[-5:])
    assert late > early, f"no improvement: early={early:.4f} late={late:.4f}"


def test_state_detached_between_updates():
    tr = make_trainer()
    st = tr.init(jax.random.PRNGKey(2))
    st, _ = tr.update(st)
    # carried env state must be concrete (no residual trace/grad machinery)
    leaf = jax.tree_util.tree_leaves(st.env_state)[0]
    assert isinstance(leaf, jax.Array)


def test_predict_deterministic():
    tr = make_trainer()
    st = tr.init(jax.random.PRNGKey(3))
    _, obs = tr.env.reset(jax.random.PRNGKey(4))
    a1 = tr.predict(st, obs)
    a2 = tr.predict(st, obs)
    np.testing.assert_array_equal(np.asarray(a1), np.asarray(a2))
    assert np.abs(np.asarray(a1)).max() <= 1.0


@pytest.mark.slow
def test_recurrent_bptt_learns():
    from visfly_tpu.envs import HoverEnv
    env = HoverEnv(
        num_agent_per_scene=32, visual=False, requires_grad=True,
        dynamics_kwargs={"dt": 0.03, "ctrl_dt": 0.03}, max_episode_steps=64,
    )
    tr = BPTT(env, horizon=16, learning_rate=1e-3,
              policy_kwargs={"recurrent": True, "hidden_dim": 64,
                             "latent_dim": (64,)})
    st = tr.init(jax.random.PRNGKey(0))
    assert st.hidden.shape == (32, 64)
    rewards = []
    for _ in range(30):
        st, m = tr.update(st)
        rewards.append(float(m["reward_mean"]))
    assert np.isfinite(rewards).all()
    assert np.mean(rewards[-5:]) > np.mean(rewards[:5])
    # hidden state evolves (GRU is in the loop)
    assert float(jnp.abs(st.hidden).max()) > 0

    # predict on a recurrent policy must not crash (hidden is an array, not
    # the () sentinel) and evaluation must thread the GRU hidden through the
    # rollout rather than freezing it
    obs = st.obs
    a = tr.predict(st, obs)
    assert a.shape == (32, 4)
    carry = tr.init_predict_carry(obs)
    a1, carry1 = tr.predict_step(st, obs, carry)
    assert float(jnp.abs(carry1).max()) > 0  # hidden actually updated
    a2, carry2 = tr.predict_step(st, obs, carry1)
    assert not np.allclose(np.asarray(carry1), np.asarray(carry2))
    # done agents' hidden resets
    done = jnp.ones((32,), bool)
    assert float(jnp.abs(tr.mask_predict_carry(carry2, done)).max()) == 0.0
    stats = tr.evaluate(st, max_steps=8)
    assert np.isfinite(stats["eval/ep_rew_mean"])


def test_recurrent_bptt_predict_hooks():
    """Fast coverage of the recurrent path: one update, predict without a
    crash (hidden is an array, not the () sentinel), and evaluation hooks
    that thread + reset the GRU hidden."""
    env = HoverEnv(
        num_agent_per_scene=8, visual=False, requires_grad=True,
        dynamics_kwargs={"dt": 0.03, "ctrl_dt": 0.03}, max_episode_steps=16,
    )
    tr = BPTT(env, horizon=4,
              policy_kwargs={"recurrent": True, "hidden_dim": 16,
                             "latent_dim": (16,)})
    st = tr.init(jax.random.PRNGKey(0))
    st, m = tr.update(st)
    assert np.isfinite(float(m["actor_loss"]))

    obs = st.obs
    a = tr.predict(st, obs)
    assert a.shape == (8, 4)
    carry = tr.init_predict_carry(obs)
    a1, carry1 = tr.predict_step(st, obs, carry)
    assert float(jnp.abs(carry1).max()) > 0  # hidden actually updated
    _, carry2 = tr.predict_step(st, obs, carry1)
    assert not np.allclose(np.asarray(carry1), np.asarray(carry2))
    done = jnp.ones((8,), bool)
    assert float(jnp.abs(tr.mask_predict_carry(carry2, done)).max()) == 0.0
    stats = tr.evaluate(st, max_steps=4)
    assert np.isfinite(stats["eval/ep_rew_mean"])


@pytest.mark.slow
def test_bptt_navigation_learns():
    """Differentiable-sim navigation (the reference manuscript's headline
    path): BPTT on NavigationEnv2 in the cluttered garage reaches real eval
    success within ~80 updates (~250k env steps). Full budget (150 updates)
    measures ~70% eval success."""
    from visfly_tpu.envs import NavigationEnv2

    env = NavigationEnv2(
        num_agent_per_scene=96, visual=True, requires_grad=True,
        scene_kwargs={"path": "garage_simple_l_medium"},
        dynamics_kwargs={"dt": 0.03, "ctrl_dt": 0.03,
                         "action_type": "bodyrate"},
        max_episode_steps=256,
    )
    tr = BPTT(env, horizon=32, learning_rate=1e-3,
              policy_kwargs={"latent_dim": (128, 128)})
    st = tr.init(jax.random.PRNGKey(0))
    rewards = []
    for _ in range(80):
        st, m = tr.update(st)
        rewards.append(float(m["reward_mean"]))
    assert np.isfinite(rewards).all()
    assert np.mean(rewards[-10:]) > np.mean(rewards[:10])
    stats = tr.evaluate(st, max_steps=256)
    assert stats["eval/success_rate"] > 0.05, stats


def test_trainer_forces_requires_grad():
    """Analytic-gradient trainers flip env.requires_grad (the reference sets
    it inside the algorithm, `shac.py:120-124`) and apply the XLA render
    backend the env constructor would have chosen."""
    from visfly_tpu.envs import NavigationEnv

    env = NavigationEnv(
        num_agent_per_scene=2, visual=True,
        scene_kwargs={"path": "garage_simple_l_medium"},
        sensor_kwargs=[{"sensor_type": "depth", "uuid": "depth",
                        "resolution": [16, 16]}],
    )
    assert not env.requires_grad
    BPTT(env, horizon=4, policy_kwargs={"latent_dim": (16,)})
    assert env.requires_grad
    # pallas renderer default is kept (remat policy fix, round 3)
    assert "render_backend" not in env.sensor_kwargs[0]
