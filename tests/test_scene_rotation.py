"""Scene iteration / rotation and reset-from-buffer flows."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from visfly_tpu.envs import HoverEnv, NavigationEnv


def make_visual_env(**kw):
    kw.setdefault("num_agent_per_scene", 4)
    return NavigationEnv(
        visual=True,
        scene_kwargs={"path": "garage_crossing", **kw.pop("scene_kwargs", {})},
        sensor_kwargs=[{"sensor_type": "depth", "uuid": "depth",
                        "resolution": [16, 16]}],
        random_kwargs={"state_generator": {"class": "Uniform", "kwargs": [
            {"position": {"mean": [0.0, 0.0, 2.0], "half": [1.0, 1.0, 0.5]}}]}},
        dynamics_kwargs={"dt": 0.03, "ctrl_dt": 0.03}, **kw,
    )


@pytest.mark.slow
def test_scene_rotation_changes_observations_without_recompile():
    env = make_visual_env()
    state, obs0 = env.reset(jax.random.PRNGKey(0))
    step = jax.jit(env.step)
    state, out = step(state, jnp.zeros((4, 4)))
    d_before = np.asarray(out.obs["depth"])
    params_before = np.asarray(env.scene.params).copy()

    state = env.reset_scenes(state)  # new assets injected into the state
    assert np.abs(np.asarray(env.scene.params) - params_before).max() > 0.01
    # the SAME compiled step must now see the new scene
    state, out = step(state, jnp.zeros((4, 4)))
    d_after = np.asarray(out.obs["depth"])
    assert np.isfinite(d_after).all()
    assert np.abs(d_after - d_before).max() > 0.05


def test_scene_dataset_roundtrip(tmp_path):
    from visfly_tpu.scene import make_scene
    from visfly_tpu.scene.scene import (
        generate_scene_dataset, load_scene_spec, save_scene_spec,
    )

    paths = generate_scene_dataset(str(tmp_path), "garage_crossing", 3, seed=7)
    assert len(paths) == 3
    spec = load_scene_spec(paths[0])
    orig = make_scene("garage_crossing", seed=7)
    assert len(spec.primitives) == len(orig.primitives)
    np.testing.assert_allclose(spec.bounds_min, orig.bounds_min)

    # a directory of scene JSONs drives the env's scene iteration
    env = make_visual_env(scene_kwargs={"path": str(tmp_path)})
    state, obs = env.reset(jax.random.PRNGKey(0))
    assert obs["depth"].shape == (4, 1, 16, 16)


def test_reset_from_full_state():
    from visfly_tpu.dynamics import full_state as dyn_full_state

    env = HoverEnv(num_agent_per_scene=4, visual=False,
                   dynamics_kwargs={"dt": 0.03, "ctrl_dt": 0.03})
    state, _ = env.reset(jax.random.PRNGKey(0))
    for _ in range(10):
        state, _ = env.step(state, jnp.full((4, 4), 0.2))
    snapshot = dyn_full_state(state.dyn)  # (4, 22)

    # keep stepping, then restore agents 0 and 2 from the snapshot
    for _ in range(5):
        state, _ = env.step(state, jnp.full((4, 4), 0.2))
    mask = jnp.asarray([True, False, True, False])
    restored = env.reset_agents_from_state(state, mask, snapshot)
    np.testing.assert_allclose(np.asarray(restored.dyn.pos[0]),
                               np.asarray(snapshot[0, :3]), atol=1e-5)
    np.testing.assert_allclose(np.asarray(restored.dyn.motor_omega[2]),
                               np.asarray(snapshot[2, 13:17]), atol=1e-2)
    # unmasked agents keep their current state
    np.testing.assert_allclose(np.asarray(restored.dyn.pos[1]),
                               np.asarray(state.dyn.pos[1]), atol=1e-6)
    assert int(restored.step_count[0]) == 0 and int(restored.step_count[1]) == 15


def test_replay_buffer_full_state_storage():
    from visfly_tpu.algos import buffers

    obs = {"state": jnp.zeros((4, 13))}
    buf = buffers.create(64, obs, 4, store_full_state=True)
    fs = jnp.arange(4 * 22, dtype=jnp.float32).reshape(4, 22)
    buf = buffers.insert(buf, obs, obs, jnp.zeros((4, 4)), jnp.zeros(4),
                         jnp.zeros(4, bool), full_state=fs)
    sampled = buffers.sample_full_states(buf, jax.random.PRNGKey(0), 8)
    assert sampled.shape == (8, 22)
    # all sampled rows must be copies of inserted rows
    assert np.isin(np.asarray(sampled[:, 0]), np.asarray(fs[:, 0])).all()


def test_meshgrid_eval_spawns():
    from visfly_tpu.envs.randomization import RandomizerSpec, meshgrid_sample

    spec = RandomizerSpec.uniform(
        position={"mean": [1.0, 0.0, 1.5], "half": [2.0, 2.0, 0.5]})
    pos, q, vel, omega = meshgrid_sample(
        spec, jax.random.PRNGKey(0), 4, index=0, xyz_num=(2, 2, 1),
        xyz_half=(0.0, 0.0, 0.0))
    p = np.asarray(pos)
    # corners of the spawn box (half-range semantics: ±half)
    np.testing.assert_allclose(sorted(p[:, 0]), [-1.0, -1.0, 3.0, 3.0], atol=1e-5)


def test_reset_env_by_id_swaps_single_scene():
    """Per-scene reset (`droneGymEnv.py:329-337`): swapping scene 0 changes
    its assets and respawns only its agents; scene 1's assets, agents and
    observations are untouched; the compiled step does not retrace."""
    env = make_visual_env(num_scene=2, num_agent_per_scene=2)
    state, _ = env.reset(jax.random.PRNGKey(0))
    step = jax.jit(env.step)
    state, out = step(state, jnp.zeros((4, 4)))
    compiles_before = step._cache_size()
    step_count_before = np.asarray(state.step_count)
    pos_before = np.asarray(state.dyn.pos)
    # render at FIXED poses before/after the swap to isolate the asset change
    depth_before = np.asarray(env.sensor_observations(state)["depth"])

    state2 = env.reset_env_by_id(state, 0)

    # scene-0 assets changed, scene-1 assets bit-identical
    new_scene = env.scene
    depth_fixed = np.asarray(
        env.sensor_observations(state._replace(scene=new_scene))["depth"]
    )
    assert np.abs(depth_fixed[:2] - depth_before[:2]).max() > 0.05, (
        "scene 0's observations did not change"
    )
    np.testing.assert_allclose(depth_fixed[2:], depth_before[2:], atol=1e-6)

    # only scene-0 agents respawned
    assert (np.asarray(state2.step_count)[:2] == 0).all()
    np.testing.assert_array_equal(np.asarray(state2.step_count)[2:],
                                  step_count_before[2:])
    np.testing.assert_allclose(np.asarray(state2.dyn.pos)[2:], pos_before[2:],
                               atol=1e-6)

    # the already-compiled step keeps working without a retrace
    state2, out2 = step(state2, jnp.zeros((4, 4)))
    assert step._cache_size() == compiles_before
    assert np.isfinite(np.asarray(out2.obs["depth"])).all()


def test_obstacle_scale_keeps_packed_shapes():
    """obstacle_scale shrinks obstacle cross-sections without changing the
    primitive count — difficulty curricula stay zero-recompile (packed
    shapes identical, values differ)."""
    from visfly_tpu.scene import make_scene, pack_scenes

    a = pack_scenes([make_scene("garage_simple_l_medium", seed=3,
                                obstacle_scale=0.3)])
    b = pack_scenes([make_scene("garage_simple_l_medium", seed=3,
                                obstacle_scale=1.0)])
    assert a.params.shape == b.params.shape
    assert a.boxes.shape == b.boxes.shape
    assert a.capsules.shape == b.capsules.shape
    assert not np.allclose(np.asarray(a.params), np.asarray(b.params))
    # scaled radii are strictly smaller
    import numpy as _np
    ra = _np.asarray(a.capsules)[0, :, 6]
    rb = _np.asarray(b.capsules)[0, :, 6]
    live = rb > 0
    assert (ra[live] < rb[live]).all()
