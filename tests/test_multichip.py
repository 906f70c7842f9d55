"""Multi-device sharding tests on the 8-virtual-CPU mesh (conftest).

Covers the SURVEY §2.3 data-parallel component end-to-end: the BPTT dryrun
the driver gate runs, a sharded PPO update checked against the unsharded
run, and sharding survival across carried env state.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from visfly_tpu.algos import BPTT, PPO
from visfly_tpu.envs import HoverEnv
from visfly_tpu.parallel import make_mesh, shard_train_state

N_DEV = 8


@pytest.fixture(autouse=True)
def _need_devices():
    if len(jax.devices()) < N_DEV:
        pytest.skip(f"need {N_DEV} devices, have {len(jax.devices())}")


def make_hover(num_agent, **kw):
    kw.setdefault("visual", False)
    kw.setdefault("dynamics_kwargs", {"dt": 0.02, "ctrl_dt": 0.02,
                                      "action_type": "bodyrate"})
    kw.setdefault("max_episode_steps", 16)
    return HoverEnv(num_agent_per_scene=num_agent, **kw)


def test_bptt_sharded_update():
    """The driver's dryrun contract: full BPTT training step over an
    8-device mesh — loss finite, gradient psum'd, env state stays sharded."""
    num_agent = 4 * N_DEV
    env = make_hover(num_agent, requires_grad=True)
    trainer = BPTT(env, horizon=4, policy_kwargs={"latent_dim": (32, 32)})
    st = trainer.init(jax.random.PRNGKey(0))

    mesh = make_mesh(N_DEV)
    st = shard_train_state(st, mesh, num_agent)
    with mesh:
        st, metrics = trainer.update(st)
        jax.block_until_ready(metrics)

    assert np.isfinite(float(metrics["actor_loss"]))
    assert float(metrics["grad_norm"]) > 0
    assert not st.env_state.dyn.pos.sharding.is_fully_replicated
    # params stay replicated (pure data parallelism)
    leaf = jax.tree_util.tree_leaves(st.params)[0]
    assert leaf.sharding.is_fully_replicated


def test_bptt_sharded_matches_unsharded():
    """Same seed, same update — the sharded program must compute the same
    numbers as the single-device one (XLA collectives are exact sums here
    up to float reassociation)."""
    num_agent = 2 * N_DEV
    results = {}
    for sharded in (False, True):
        env = make_hover(num_agent, requires_grad=True)
        trainer = BPTT(env, horizon=4, policy_kwargs={"latent_dim": (16, 16)})
        st = trainer.init(jax.random.PRNGKey(7))
        if sharded:
            mesh = make_mesh(N_DEV)
            st = shard_train_state(st, mesh, num_agent)
            with mesh:
                for _ in range(3):
                    st, m = trainer.update(st)
        else:
            for _ in range(3):
                st, m = trainer.update(st)
        results[sharded] = (
            float(m["actor_loss"]),
            np.asarray(jax.device_get(st.env_state.dyn.pos)),
        )
    loss_u, pos_u = results[False]
    loss_s, pos_s = results[True]
    assert np.isclose(loss_s, loss_u, rtol=1e-4), (loss_s, loss_u)
    np.testing.assert_allclose(pos_s, pos_u, rtol=1e-4, atol=1e-5)


def test_ppo_sharded_update_matches_unsharded():
    """One sharded PPO update (rollout + GAE + minibatch SGD) on the mesh:
    metrics match the unsharded run with the same seed, and the carried env
    state keeps its sharding through the update."""
    num_agent = 2 * N_DEV
    results = {}
    for sharded in (False, True):
        env = make_hover(num_agent)
        trainer = PPO(env, n_steps=8, n_epochs=2, batch_size=0,
                      policy_kwargs={"pi_layers": (32, 32),
                                     "vf_layers": (32, 32)})
        st = trainer.init(jax.random.PRNGKey(3))
        if sharded:
            mesh = make_mesh(N_DEV)
            st = shard_train_state(st, mesh, num_agent)
            with mesh:
                st, m = trainer.update(st)
                st, m = trainer.update(st)
            assert not st.env_state.dyn.pos.sharding.is_fully_replicated, (
                "env state lost its sharding across the PPO update"
            )
        else:
            st, m = trainer.update(st)
            st, m = trainer.update(st)
        results[sharded] = {k: float(v) for k, v in m.items()}
    for k in ("loss", "ep_rew_mean", "reward_mean"):
        assert np.isclose(results[True][k], results[False][k],
                          rtol=1e-4, atol=1e-6), (k, results)
