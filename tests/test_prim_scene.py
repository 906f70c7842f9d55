"""Packed-primitive scene backend: SDF accuracy vs analytic formulas, parity
with the grid backend, gather-free render path, dynamic objects, env zoo."""
import jax
import jax.numpy as jnp
import numpy as np

from visfly_tpu.scene import make_scene, pack_scenes
from visfly_tpu.scene.prim_scene import prim_sdf, scene_sdf_grouped
from visfly_tpu.render import render_camera


def scene_with_sphere():
    spec = make_scene("box15_wall_empty")
    spec.primitives.append(
        {"type": "sphere", "center": np.asarray([5.0, 0.0, 2.0], np.float32),
         "radius": 1.0, "color": np.asarray([200, 30, 30], np.uint8), "semantic": 7}
    )
    return pack_scenes([spec])


def test_prim_sdf_exact():
    scene = scene_with_sphere()
    p = jnp.asarray([[[0.0, 0.0, 2.0], [5.0, 0.0, 4.5], [3.0, 0.0, 2.0]]])
    d = np.asarray(scene_sdf_grouped(scene, p))[0]
    np.testing.assert_allclose(d, [2.0, 1.5, 1.0], atol=1e-5)


def test_gate_sdf():
    spec = make_scene("racing")
    scene = pack_scenes([spec])
    # gate at (6,0,2) facing +x after yaw π/2... ray through the opening
    center = jnp.asarray([[[6.0, 0.0, 2.0]]])
    d = np.asarray(scene_sdf_grouped(scene, center))[0, 0]
    assert d > 0.5  # opening is clear


def test_cylinder_as_capsule():
    spec = make_scene("forest", seed=3)
    scene = pack_scenes([spec])
    # distance from a point 1m beside some column must be ~1-r
    p = jnp.asarray([[[0.0, 0.0, 3.0]]])
    d = np.asarray(scene_sdf_grouped(scene, p))[0, 0]
    assert 0.0 < d < 3.0  # inside forest, near some column


def test_depth_render_prim_vs_geometry():
    scene = scene_with_sphere()
    pos = jnp.asarray([[0.0, 0.0, 2.0]])
    q = jnp.asarray([[1.0, 0.0, 0.0, 0.0]])
    spec = {"uuid": "depth", "sensor_type": "depth", "resolution": [64, 64]}
    out = render_camera(scene, jnp.zeros(1, jnp.int32), pos, q, spec, n_steps=64)
    depth = np.asarray(out["depth"])
    assert depth.shape == (1, 1, 64, 64)
    np.testing.assert_allclose(depth[0, 0, 32, 32], 4.0, atol=0.03)
    assert (depth <= 20.0).all() and np.isfinite(depth).all()


def test_color_semantic_prim():
    scene = scene_with_sphere()
    pos = jnp.asarray([[2.5, 0.0, 2.0]])
    q = jnp.asarray([[1.0, 0.0, 0.0, 0.0]])
    sid = jnp.zeros(1, jnp.int32)
    col = render_camera(scene, sid, pos, q,
                        {"sensor_type": "color", "resolution": [32, 32]})["color"]
    sem = render_camera(scene, sid, pos, q,
                        {"sensor_type": "semantic", "resolution": [32, 32]})["semantic"]
    col, sem = np.asarray(col), np.asarray(sem)
    assert sem[0, 0, 16, 16] == 7
    assert col[0, 0, 16, 16] > col[0, 1, 16, 16]


def test_depth_gradient_flows_to_pose():
    scene = scene_with_sphere()
    spec = {"sensor_type": "depth", "resolution": [16, 16]}

    def loss(pos):
        out = render_camera(scene, jnp.zeros(1, jnp.int32), pos,
                            jnp.asarray([[1.0, 0.0, 0.0, 0.0]]), spec, n_steps=32)
        return jnp.mean(out["depth"])

    g = jax.grad(loss)(jnp.asarray([[0.0, 0.0, 2.0]]))
    assert np.isfinite(np.asarray(g)).all()
    # moving toward the sphere reduces mean depth
    assert float(g[0, 0]) < 0


def test_racing_env_gate_progression():
    from visfly_tpu.envs.racing import RacingEnv

    env = RacingEnv(num_agent_per_scene=4, visual=False,
                    dynamics_kwargs={"dt": 0.03, "ctrl_dt": 0.03})
    state, obs = env.reset(jax.random.PRNGKey(0))
    assert obs["gate"].shape == (4, 1)
    # quadrant rule: spawn at [2,2,1] (x-4<0, y>0) → gate 0
    gates = np.asarray(state.aux.next_target_i)
    pos = np.asarray(state.dyn.pos)
    for g, p in zip(gates, pos):
        rel = p - np.asarray([4.0, 0.0, 1.0])
        if rel[0] < 0:
            assert g == (0 if rel[1] > 0 else 3)
    # teleport an agent onto its gate → pass detection on next step
    target = env.targets[state.aux.next_target_i[0]]
    dyn = state.dyn._replace(pos=state.dyn.pos.at[0].set(target))
    state = state._replace(dyn=dyn)
    state2, out = env.step(state, jnp.zeros((4, 4)), is_test=True)
    assert bool(state2.aux.is_pass_next[0])
    assert int(state2.aux.past_targets[0]) == 1
    assert float(out.reward[0]) > 10  # pass bonus


def test_tracking_env_waypoints():
    from visfly_tpu.envs.tracking import TrackEnv

    env = TrackEnv(num_agent_per_scene=4, visual=False,
                   dynamics_kwargs={"dt": 0.03, "ctrl_dt": 0.03})
    state, obs = env.reset(jax.random.PRNGKey(0))
    assert obs["state"].shape == (4, 30 + 10)
    wp = np.asarray(env.waypoints(state.dyn.t))
    assert wp.shape == (4, 10, 3)
    np.testing.assert_allclose(
        np.linalg.norm(wp[:, :, :2] - np.asarray([2.0, 0.0]), axis=-1), 2.0, atol=1e-5
    )


def test_landing_env2_descent_reward():
    from visfly_tpu.envs.landing import LandingEnv2

    env = LandingEnv2(num_agent_per_scene=4, visual=False,
                      dynamics_kwargs={"dt": 0.03, "ctrl_dt": 0.03})
    state, obs = env.reset(jax.random.PRNGKey(0))
    assert obs["state"].shape == (4, 13)
    state, out = env.step(state, jnp.zeros((4, 4)))
    assert np.isfinite(np.asarray(out.reward)).all()


def test_multi_navigation_swarm_obs():
    from visfly_tpu.envs.multi import MultiNavigationEnv

    env = MultiNavigationEnv(num_agent_per_scene=3, num_scene=2, visual=False,
                             dynamics_kwargs={"dt": 0.03, "ctrl_dt": 0.03},
                             random_kwargs={"state_generator": {"class": "Uniform", "kwargs": [
                                 {"position": {"mean": [1.0, 0.0, 1.5], "half": [1.0, 2.0, 0.5]}}]}})
    state, obs = env.reset(jax.random.PRNGKey(0))
    assert obs["swarm"].shape == (6, 2, 13)
    # swarm rows must be other agents of the same scene
    s = np.asarray(obs["state"])
    sw = np.asarray(obs["swarm"])
    np.testing.assert_allclose(sw[0, 0], s[1], atol=1e-6)
    np.testing.assert_allclose(sw[3, 0], s[4], atol=1e-6)
    state, out = env.step(state, jnp.zeros((6, 4)))
    # per-scene aggregation: done identical within a scene
    d = np.asarray(out.done).reshape(2, 3)
    assert (d == d[:, :1]).all()


def test_dynamic_objects_step():
    from visfly_tpu.scene.objects import (
        build_objects, init_objects_state, step_objects,
    )

    settings = [
        {"name": "mover", "path": {"class": "circle",
                                   "kwargs": {"radius": 2.0, "center": [0, 0, 2]}},
         "velocity": 1.0, "radius": 0.3},
        {"name": "patrol", "path": {"class": "polygon",
                                    "kwargs": {"points": [[0, 0, 1], [4, 0, 1], [4, 4, 1]]}},
         "velocity": 2.0},
    ]
    objs = build_objects(settings, num_scene=2, seed=0)
    assert objs.num_objects == 4  # 2 settings × 2 scenes
    st = init_objects_state(objs, 2)
    positions = [np.asarray(st.pos)]
    for _ in range(50):
        st = step_objects(objs, st, 0.1)
        positions.append(np.asarray(st.pos))
    traj = np.stack(positions)
    # circle object stays at radius 2 around center
    r = np.linalg.norm(traj[:, 0, :2], axis=-1)
    np.testing.assert_allclose(r, 2.0, atol=0.05)
    # speed ≈ 1 m/s for the circle mover
    spd = np.linalg.norm(np.diff(traj[:, 0], axis=0), axis=-1) / 0.1
    np.testing.assert_allclose(spd.mean(), 1.0, atol=0.1)


def test_dyn_env_with_objects():
    from visfly_tpu.envs.dynamic import DynEnv

    env = DynEnv(
        num_agent_per_scene=4, visual=True,
        scene_kwargs={
            "path": "box15_wall_empty",
            "obj_settings": [
                {"name": "mover",
                 "path": {"class": "circle", "kwargs": {"radius": 2.0, "center": [1, 0, 1.5]}},
                 "velocity": 1.5, "radius": 0.4},
            ],
        },
        sensor_kwargs=[{"sensor_type": "depth", "uuid": "depth", "resolution": [32, 32]}],
        random_kwargs={"state_generator": {"class": "Uniform", "kwargs": [
            {"position": {"mean": [1.0, 0.0, 1.5], "half": [0.5, 0.5, 0.3]}}]}},
        dynamics_kwargs={"dt": 0.03, "ctrl_dt": 0.03},
    )
    state, obs = env.reset(jax.random.PRNGKey(0))
    step = jax.jit(env.step)
    d0 = np.asarray(obs["depth"])
    for _ in range(10):
        state, out = step(state, jnp.zeros((4, 4)))
    d1 = np.asarray(out.obs["depth"])
    # the moving obstacle changes the depth image over time
    assert np.abs(d0 - d1).max() > 0.05
    assert np.isfinite(np.asarray(out.reward)).all()


def test_prim_normal_single_matches_grad():
    """Closed-form per-primitive normals (the RGB shading path) equal the
    autodiff gradient of prim_distances for boxes (interior/exterior/
    rounded/yawed/inverted rooms) and capsules."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from visfly_tpu.scene.prim_scene import (prim_distances,
                                             prim_normal_single)

    rng = np.random.default_rng(3)
    rows, pts = [], []
    for i in range(60):
        fam = i % 2
        c = rng.uniform(-3, 3, 3)
        he = rng.uniform(0.3, 2.0, 3)
        yaw = rng.uniform(0, 6.28)
        r = 0.0 if fam == 0 else rng.uniform(0.1, 0.5)
        sign = -1.0 if (fam == 0 and i % 10 == 0) else 1.0
        rows.append([*c, *he, r, np.cos(yaw), np.sin(yaw), sign, fam, 1.0])
        pts.append(rng.uniform(-5, 5, 3))
    # deterministic interior-box / room-wall cases
    rows += [[0, 0, 0, 2, 1, 1, 0, 1, 0, 1, 0, 1],
             [0, 0, 0, 8, 8, 4, 0, 1, 0, -1, 0, 1]]
    pts += [[0.5, 0.2, -0.1], [7.5, 0.0, 1.0]]
    rows = jnp.asarray(rows, jnp.float32)
    pts = jnp.asarray(pts, jnp.float32)

    def d_single(p, row):
        return prim_distances(row[None], p)[..., 0]

    g = jax.vmap(jax.grad(d_single))(pts, rows)
    g = g / (jnp.linalg.norm(g, axis=-1, keepdims=True) + 1e-9)
    n = prim_normal_single(rows, pts)
    np.testing.assert_allclose(np.asarray(g), np.asarray(n), atol=1e-4)


def test_landing_visual_touchdown_success_reachable():
    """A controlled slow descent over the pad must fire ``is_success`` — the
    pad top (z=0.1) + collision radius (0.1) overlap the success window
    (z ≤ 0.2, |v| ≤ 0.3, `LandingEnv.py:94-100`), so success and floor
    contact evaluate on the same post-step state and success must win in
    the info dict (the reference computes ``_success`` before ``_done``).
    Guards the touchdown semantics behind the landing training results."""
    from visfly_tpu.dynamics import dynamics as dyn
    from visfly_tpu.envs.landing import LandingEnv

    env = LandingEnv(num_agent_per_scene=2,
                     dynamics_kwargs={"dt": 0.03, "ctrl_dt": 0.03,
                                      "action_type": "bodyrate",
                                      "ctrl_delay": True},
                     max_episode_steps=256)
    state, _ = env.reset(jax.random.PRNGKey(0))
    n = 2
    d = state.dyn._replace(
        pos=jnp.tile(jnp.asarray([[2.0, 0.0, 0.4]]), (n, 1)),
        vel=jnp.zeros((n, 3)),
        q=jnp.tile(jnp.asarray([[1.0, 0.0, 0.0, 0.0]]), (n, 1)),
        omega=jnp.zeros((n, 3)))
    state = state._replace(dyn=d)

    succ = False
    for _ in range(60):
        vz = float(np.asarray(dyn.velocity(state.dyn))[0, 2])
        cmd = jnp.tile(jnp.asarray([[9.6 + 4.0 * (-0.15 - vz), 0, 0, 0]]),
                       (n, 1))
        a = dyn.normalize_command(env.dyn_config, env.params, cmd)
        state, out = env.step(state, a, is_test=True)
        if bool(np.asarray(out.info["is_success"])[0]):
            succ = True
            break
        # a collision that precedes success would be a threshold regression
        assert not bool(np.asarray(state.collision.is_collision)[0])
    assert succ, "controlled flare descent never fired is_success"


def test_multi_navigation_path_hints():
    """`MultiNavigationEnv.py:56-75`: scene_kwargs={"is_find_path": True}
    plans a PRM waypoint path per agent at reset, exposed as `.path`;
    waypoints must be collision-free in a cluttered scene and per-scene
    resets recompute only that scene's entries."""
    from visfly_tpu.envs.multi import MultiNavigationEnv
    from visfly_tpu.scene import point_is_collision

    env = MultiNavigationEnv(
        num_agent_per_scene=2, num_scene=1, visual=True,
        sensor_kwargs=[{"sensor_type": "depth", "uuid": "depth",
                        "resolution": [16, 16]}],
        scene_kwargs={"path": "garage_simple_l_medium", "is_find_path": True},
        random_kwargs={"state_generator": {"class": "Uniform", "kwargs": [
            {"position": {"mean": [2.0, 0.0, 1.5], "half": [0.5, 1.0, 0.3]}}]}},
    )
    assert env.is_find_path
    state, _ = env.reset(jax.random.PRNGKey(1))
    assert len(env.path) == env.num_envs
    pos = np.asarray(state.dyn.pos)
    tgt = np.asarray(env.target)
    for i, p in enumerate(env.path):
        assert p is not None, f"agent {i}: no path found"
        assert p.shape[-1] == 3 and p.shape[0] >= 2
        np.testing.assert_allclose(p[0], pos[i], atol=1e-5)
        np.testing.assert_allclose(p[-1], tgt[i], atol=1e-5)
        # interior waypoints clear the scene by the planner margin
        col = np.asarray(point_is_collision(
            env.scene, jnp.asarray(p[1:-1]), radius=env.uav_radius))
        assert not col.any(), f"agent {i}: waypoint in collision"
    old = list(env.path)
    st2 = env.reset_env_by_id(state, 0)
    assert len(env.path) == env.num_envs
    assert st2 is not None

    # off by default: no planning work, .path stays None
    env2 = MultiNavigationEnv(num_agent_per_scene=2, num_scene=1,
                              visual=False)
    env2.reset(jax.random.PRNGKey(0))
    assert env2.path == [None, None]
    del old
