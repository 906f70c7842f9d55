"""Env core tests: reset/step semantics, auto-reset, bbox collision,
jit/scan compatibility, gradient flow (BPTT viability)."""
import jax
import jax.numpy as jnp
import numpy as np

from visfly_tpu.envs import HoverEnv, NavigationEnv2


def make_env(**kw):
    kw.setdefault("num_agent_per_scene", 8)
    kw.setdefault("visual", False)
    kw.setdefault("dynamics_kwargs", {"dt": 0.03, "ctrl_dt": 0.03})
    return HoverEnv(**kw)


def test_reset_shapes():
    env = make_env()
    state, obs = env.reset(jax.random.PRNGKey(0))
    assert obs["state"].shape == (8, 13)
    assert state.dyn.pos.shape == (8, 3)
    # spawn box: mean [1,0,1.5], half [1,1,0.5] (full range = half)
    p = np.asarray(state.dyn.pos)
    assert (p[:, 2] > 0.9).all() and (p[:, 2] < 2.1).all()


def test_step_advances_and_rewards():
    env = make_env()
    state, _ = env.reset(jax.random.PRNGKey(0))
    a = jnp.zeros((8, 4))
    state, out = env.step(state, a)
    assert out.reward.shape == (8,)
    assert bool(jnp.all(state.step_count == 1))
    assert np.isfinite(np.asarray(out.reward)).all()
    # hover reward is bounded above by base_r
    assert (np.asarray(out.reward) <= 0.1 + 1e-6).all()


def test_timeout_truncation_and_autoreset():
    env = make_env(max_episode_steps=5)
    state, _ = env.reset(jax.random.PRNGKey(0))
    step = jax.jit(env.step)
    a = jnp.zeros((8, 4))
    for i in range(5):
        state, out = step(state, a)
    assert bool(out.done.all())
    assert bool(out.info["TimeLimit.truncated"].all())
    # auto-reset already happened: counters are back to 0
    assert bool((state.step_count == 0).all())
    state, out = step(state, a)
    assert not bool(out.done.any())


def test_terminal_observation_is_pre_reset():
    """With `terminal_obs_in_info` set, step info carries the pre-reset
    observation (SB3's `terminal_observation`, `droneGymEnv.py:256-267`):
    on done steps it differs from the returned post-reset obs; on live
    steps the two coincide."""
    env = make_env(max_episode_steps=3)
    env.terminal_obs_in_info = True
    state, _ = env.reset(jax.random.PRNGKey(0))
    step = jax.jit(env.step)
    a = jnp.zeros((8, 4))
    for _ in range(3):
        state, out = step(state, a)
    assert bool(out.done.all())
    term = np.asarray(out.info["terminal_observation"]["state"])
    post = np.asarray(out.obs["state"])
    # respawned agents describe a different state than the one they died in
    assert not np.allclose(term[:, :3], post[:, :3])
    assert np.isfinite(term).all()
    # next step nobody is done: terminal obs == returned obs
    state, out = step(state, a)
    assert not bool(out.done.any())
    np.testing.assert_allclose(
        np.asarray(out.info["terminal_observation"]["state"]),
        np.asarray(out.obs["state"]), atol=1e-6,
    )


def test_bbox_collision_info():
    env = make_env()
    state, _ = env.reset(jax.random.PRNGKey(0))
    # nearest bbox face from spawn (z≈1.5) is the floor z=0
    dis = np.asarray(state.collision.dis)
    pos = np.asarray(state.dyn.pos)
    expected = np.minimum(pos[:, 2], np.minimum(30 - np.abs(pos[:, 0]), 30 - np.abs(pos[:, 1])))
    np.testing.assert_allclose(dis, expected, atol=1e-5)
    assert not bool(state.collision.is_collision.any())


def test_scan_rollout_jits_once():
    env = make_env()
    state, _ = env.reset(jax.random.PRNGKey(0))

    @jax.jit
    def rollout(state, actions):
        def body(s, a):
            s, out = env.step(s, a)
            return s, out.reward

        return jax.lax.scan(body, state, actions)

    actions = jnp.zeros((20, 8, 4))
    state, rewards = rollout(state, actions)
    assert rewards.shape == (20, 8)
    assert np.isfinite(np.asarray(rewards)).all()


def test_bptt_gradient_through_env():
    env = make_env(requires_grad=True)
    env_state, _ = env.reset(jax.random.PRNGKey(0))

    def loss(actions):
        def body(s, a):
            s, out = env.step(s, jnp.tanh(a))
            return s, out.reward

        _, rewards = jax.lax.scan(body, env_state, actions)
        return -jnp.mean(jnp.sum(rewards, 0))

    g = jax.grad(loss)(jnp.zeros((10, 8, 4)))
    g = np.asarray(g)
    assert np.isfinite(g).all() and np.abs(g).max() > 0


def test_navigation_env2_success_and_failure():
    env = NavigationEnv2(num_agent_per_scene=4, visual=False,
                         dynamics_kwargs={"dt": 0.03, "ctrl_dt": 0.03})
    state, obs = env.reset(jax.random.PRNGKey(1))
    assert obs["state"].shape == (4, 13)
    assert obs["collision_vector"].shape == (4, 3)
    state, out = env.step(state, jnp.zeros((4, 4)))
    assert np.isfinite(np.asarray(out.reward)).all()


def test_imu_noise_applied():
    env = make_env(random_kwargs={
        "state_generator": {"class": "Uniform", "kwargs": [
            {"position": {"mean": [1.0, 0.0, 1.5], "half": [0.0, 0.0, 0.0]}}]},
        "noise_kwargs": {"IMU": {"model": "UniformNoiseModel",
                                 "kwargs": {"mean": np.zeros(13),
                                            "half": np.full(13, 0.1)}}},
    })
    state, obs = env.reset(jax.random.PRNGKey(0))
    s = np.asarray(obs["state"])
    # quaternion part re-normalised despite noise
    np.testing.assert_allclose(np.linalg.norm(s[:, 3:7], axis=-1), 1.0, atol=1e-5)
    # noise makes observed position differ from true position
    assert np.abs(s[:, :3] - np.asarray(state.dyn.pos)).max() > 1e-4


def test_catch_env_ballistics_and_training():
    """CatchEnv (the reference ships a skeleton; ours is trainable): the
    ball falls ballistically, grounded latches below z=0.1, and a BPTT
    update produces finite loss and nonzero gradients."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from visfly_tpu.algos import BPTT
    from visfly_tpu.envs import CatchEnv

    env = CatchEnv(num_agent_per_scene=8, requires_grad=True,
                   dynamics_kwargs={"dt": 0.03, "ctrl_dt": 0.03},
                   max_episode_steps=32)
    state, obs = env.reset(jax.random.PRNGKey(0))
    z0 = np.asarray(state.aux.pos[:, 2])
    v0 = np.asarray(state.aux.vel[:, 2])
    a = jnp.zeros((8, 4))
    state, out = env.step(state, a)
    # one ballistic step at ball_dt granularity: z += vz*dt, vz -= g*dt
    np.testing.assert_allclose(np.asarray(state.aux.pos[:, 2]),
                               z0 + v0 * env.ball_dt, atol=1e-5)
    np.testing.assert_allclose(np.asarray(state.aux.vel[:, 2]),
                               v0 - 9.8 * env.ball_dt, atol=1e-5)
    for _ in range(10):
        state, out = env.step(state, a)
    assert np.isfinite(np.asarray(out.reward)).all()

    tr = BPTT(env, horizon=4, policy_kwargs={"latent_dim": (16,)})
    st = tr.init(jax.random.PRNGKey(1))
    st, m = tr.update(st)
    assert np.isfinite(float(m["actor_loss"]))
    assert float(m["grad_norm"]) > 0


def test_navigation_indiv_reward_telemetry():
    """indiv_reward=True returns the reward as named terms; the base env
    logs them as info['extra_*'] and they sum to the scalar reward
    (the reference's _indiv_rewards accounting, droneGymEnv.py:177-185)."""
    import jax
    import jax.numpy as jnp

    from visfly_tpu.envs import NavigationEnv

    env = NavigationEnv(
        num_agent_per_scene=4, visual=False, indiv_reward=True,
        random_kwargs={"state_generator": {"class": "Uniform", "kwargs": [
            {"position": {"mean": [1.0, 0.0, 1.5], "half": [0.0, 1.0, 0.5]}}
        ]}},
        max_episode_steps=8)
    st, _ = env.reset(jax.random.PRNGKey(0))
    st, out = env.step(st, jnp.zeros((4, 4)))
    extras = {k: np.asarray(v) for k, v in out.info.items()
              if k.startswith("extra_")}
    assert {"extra_approach", "extra_col_dis", "extra_success"} <= set(extras)
    np.testing.assert_allclose(np.asarray(out.reward),
                               sum(extras.values()), rtol=1e-5)


def test_grad_collision_flag_enables_position_gradient():
    """`grad_collision=True` keeps the closest-point query differentiable
    in position (possible because the query is native jnp — the
    reference's CGAL query is a black box); default False matches the
    reference's gradient-free collision values."""
    import jax

    from visfly_tpu.envs import NavigationEnv

    def col_dis_grad(flag):
        env = NavigationEnv(
            num_agent_per_scene=4, visual=True,
            grad_collision=flag,
            scene_kwargs={"path": "garage_simple_l_medium"},
            sensor_kwargs=[{"sensor_type": "depth", "uuid": "depth",
                            "resolution": [16, 16]}],
            random_kwargs={"state_generator": {"class": "Uniform",
                           "kwargs": [{"position": {"mean": [1.0, 0.0, 1.5],
                                       "half": [0.3, 0.3, 0.3]}}]}},
        )
        state, _ = env.reset(jax.random.PRNGKey(0))

        def f(pos):
            dyn = state.dyn._replace(pos=pos)
            info, _ = env._update_collision(dyn, state.collision.is_out_bounds)
            return info.dis.sum()

        return np.abs(np.asarray(jax.grad(f)(state.dyn.pos))).sum()

    assert col_dis_grad(False) == 0.0
    assert col_dis_grad(True) > 1e-3
