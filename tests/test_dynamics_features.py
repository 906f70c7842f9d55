"""Dynamics feature coverage: euler output, wind (const/string), drag
randomisation."""
import jax
import jax.numpy as jnp
import numpy as np

from visfly_tpu.envs import HoverEnv


def test_euler_orientation_output():
    env = HoverEnv(num_agent_per_scene=4, visual=False,
                   dynamics_kwargs={"dt": 0.03, "ctrl_dt": 0.03,
                                    "ori_output_type": "euler"})
    state, obs = env.reset(jax.random.PRNGKey(0))
    assert obs["state"].shape == (4, 12)  # 3 pos + 3 euler + 3 vel + 3 ω


def test_const_wind_advects_position():
    env = HoverEnv(num_agent_per_scene=4, visual=False,
                   dynamics_kwargs={"dt": 0.03, "ctrl_dt": 0.03,
                                    "wind_settings": [2.0, 0.0, 0.0]})
    state, _ = env.reset(jax.random.PRNGKey(0))
    x0 = np.asarray(state.dyn.pos[:, 0]).copy()
    for _ in range(20):
        state, out = env.step(state, jnp.tile(jnp.asarray([-0.333, 0, 0, 0.0]), (4, 1)))
    dx = np.asarray(state.dyn.pos[:, 0]) - x0
    # 20 steps × 0.03 s × 2 m/s ≈ 1.2 m of pure wind drift
    assert (dx > 0.8).all()
    # observed velocity includes wind (`dynamics.py:750-752`)
    assert (np.asarray(out.obs["state"][:, 7]) > 1.5).all()


def test_string_wind_functions():
    env = HoverEnv(num_agent_per_scene=4, visual=False,
                   dynamics_kwargs={"dt": 0.03, "ctrl_dt": 0.03,
                                    "wind_settings": ["1.5 + 0*y", "0*x", "0*x"]})
    state, _ = env.reset(jax.random.PRNGKey(0))
    state, _ = env.step(state, jnp.zeros((4, 4)))
    np.testing.assert_allclose(np.asarray(state.dyn.wind),
                               np.tile([1.5, 0, 0], (4, 1)), atol=1e-6)


def test_drag_random_per_agent():
    env = HoverEnv(num_agent_per_scene=8, visual=False,
                   dynamics_kwargs={"dt": 0.03, "ctrl_dt": 0.03,
                                    "drag_random": 0.3})
    state, _ = env.reset(jax.random.PRNGKey(0))
    # force a masked reset so coefficients randomise
    state = env.reset_agents(state, jnp.ones(8, bool))
    ld = np.asarray(state.dyn.linear_drag)
    assert ld.shape == (8, 3)
    # coefficients differ across agents and stay within ±50% of the mean
    mean = np.asarray([0.005, 0.005, 0.00575])
    assert np.abs(ld / mean - 1).max() <= 0.5 + 1e-6
    assert np.std(ld[:, 0]) > 1e-5
