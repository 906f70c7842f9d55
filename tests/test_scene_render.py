"""Scene/SDF engine + sphere-trace renderer tests: analytic-SDF accuracy,
collision queries, depth correctness against geometry, color/semantic
rendering, and the visual env integration."""
import jax
import jax.numpy as jnp
import numpy as np

from visfly_tpu.scene import (
    bake_scenes,
    closest_point_query,
    make_scene,
    point_is_collision,
    sample_sdf,
    sdf_normal,
)
from visfly_tpu.render import render_camera, trace_rays


def simple_scene(spacing=0.05):
    spec = make_scene("box15_wall_empty")
    # add a known sphere obstacle at (5, 0, 2) r=1
    spec.primitives.append(
        {
            "type": "sphere",
            "center": np.asarray([5.0, 0.0, 2.0], np.float32),
            "radius": 1.0,
            "color": np.asarray([200, 30, 30], np.uint8),
            "semantic": 7,
        }
    )
    return bake_scenes([spec], spacing=0.25)


def test_sdf_grid_accuracy():
    data = simple_scene()
    sid = jnp.zeros(3, jnp.int32)
    p = jnp.asarray([[0.0, 0.0, 2.0], [5.0, 0.0, 4.5], [3.0, 0.0, 2.0]])
    d = np.asarray(sample_sdf(data, sid, p))
    # analytic: dist to sphere surface vs walls
    np.testing.assert_allclose(d[1], 1.5, atol=0.08)  # above sphere: 2.5-1
    np.testing.assert_allclose(d[2], 1.0, atol=0.08)  # 2m from center -1
    assert d[0] > 1.5  # far from everything but floor/ceiling: min(2, 6) = 2
    np.testing.assert_allclose(d[0], 2.0, atol=0.08)


def test_closest_point_and_collision():
    data = simple_scene()
    sid = jnp.zeros(2, jnp.int32)
    p = jnp.asarray([[3.0, 0.0, 2.0], [5.0, 0.0, 3.05]])
    point, dis, out = closest_point_query(data, sid, p)
    point, dis = np.asarray(point), np.asarray(dis)
    # closest point from (3,0,2) is sphere surface at (4,0,2)
    np.testing.assert_allclose(point[0], [4.0, 0.0, 2.0], atol=0.15)
    np.testing.assert_allclose(dis[1], 0.05, atol=0.05)
    assert not np.asarray(out).any()
    col = np.asarray(point_is_collision(data, p, radius=0.1))
    assert not col[0] and col[1]


def test_normals_point_outward():
    data = simple_scene()
    sid = jnp.zeros(1, jnp.int32)
    n = np.asarray(sdf_normal(data, sid, jnp.asarray([[3.0, 0.0, 2.0]])))[0]
    # gradient of distance-to-sphere at (3,0,2) points away from center (-x)
    np.testing.assert_allclose(n, [-1.0, 0.0, 0.0], atol=0.1)


def test_trace_depth_matches_geometry():
    data = simple_scene()
    # ray from (0,0,2) toward +x hits sphere at x=4 → t=4
    o = jnp.asarray([[0.0, 0.0, 2.0]])
    d = jnp.asarray([[1.0, 0.0, 0.0]])
    t, hit = trace_rays(data, jnp.zeros(1, jnp.int32), o, d, n_steps=64)
    assert bool(hit[0])
    np.testing.assert_allclose(float(t[0]), 4.0, atol=0.15)


def test_render_depth_image():
    data = simple_scene()
    pos = jnp.asarray([[0.0, 0.0, 2.0]])
    q = jnp.asarray([[1.0, 0.0, 0.0, 0.0]])  # facing +x
    spec = {"uuid": "depth", "sensor_type": "depth", "resolution": [64, 64]}
    out = render_camera(data, jnp.zeros(1, jnp.int32), pos, q, spec, n_steps=64)
    depth = np.asarray(out["depth"])
    assert depth.shape == (1, 1, 64, 64)
    # center pixel looks straight at the sphere → planar depth ≈ 4
    np.testing.assert_allclose(depth[0, 0, 32, 32], 4.0, atol=0.2)
    # corner rays miss the sphere; with 90° fov they hit side walls/ceiling
    assert depth[0, 0, 32, 0] > 4.5
    assert np.isfinite(depth).all() and (depth <= 20.0).all()


def test_render_color_and_semantic():
    data = simple_scene()
    pos = jnp.asarray([[2.5, 0.0, 2.0]])
    q = jnp.asarray([[1.0, 0.0, 0.0, 0.0]])
    sid = jnp.zeros(1, jnp.int32)
    col = render_camera(data, sid, pos, q,
                        {"uuid": "color", "sensor_type": "color",
                         "resolution": [32, 32]})["color"]
    sem = render_camera(data, sid, pos, q,
                        {"uuid": "semantic", "sensor_type": "semantic",
                         "resolution": [32, 32]})["semantic"]
    col, sem = np.asarray(col), np.asarray(sem)
    assert col.shape == (1, 3, 32, 32) and col.dtype == np.uint8
    assert sem.shape == (1, 1, 32, 32) and sem.dtype == np.uint8
    # center of view: the red sphere (semantic id 7)
    assert sem[0, 0, 16, 16] == 7
    assert col[0, 0, 16, 16] > col[0, 1, 16, 16]  # red-dominant


def test_visual_env_end_to_end():
    from visfly_tpu.envs import NavigationEnv

    env = NavigationEnv(
        num_agent_per_scene=4,
        visual=True,
        scene_kwargs={"path": "datasets/visfly-beta/configs/scenes/garage_simple_l_medium",
                      "sdf_spacing": 0.15},
        sensor_kwargs=[{"uuid": "depth", "sensor_type": "depth",
                        "resolution": [64, 64]}],
        random_kwargs={"state_generator": {"class": "Uniform", "kwargs": [
            {"position": {"mean": [1.0, 0.0, 1.5], "half": [0.0, 2.0, 1.0]}}]}},
        dynamics_kwargs={"dt": 0.03, "ctrl_dt": 0.03},
    )
    state, obs = env.reset(jax.random.PRNGKey(0))
    assert obs["depth"].shape == (4, 1, 64, 64)
    step = jax.jit(env.step)
    state, out = step(state, jnp.zeros((4, 4)))
    d = np.asarray(out.obs["depth"])
    assert np.isfinite(d).all() and d.min() >= 0 and d.max() <= 20.0
    # depth must actually see obstacles (not all background)
    assert d.min() < 5.0
    # collision distance must come from the scene SDF, not the default bbox
    assert np.asarray(state.collision.dis).max() < 6.0


def test_multi_scene_batching():
    from visfly_tpu.scene import load_scenes_for_env
    from visfly_tpu.envs import NavigationEnv

    env = NavigationEnv(
        num_agent_per_scene=2, num_scene=3, visual=True,
        scene_kwargs={"path": "garage_crossing", "sdf_spacing": 0.2},
        sensor_kwargs=[{"uuid": "depth", "sensor_type": "depth",
                        "resolution": [32, 32]}],
        random_kwargs={"state_generator": {"class": "Uniform", "kwargs": [
            {"position": {"mean": [0.0, 0.0, 2.0], "half": [2.0, 2.0, 1.0]}}]}},
        dynamics_kwargs={"dt": 0.03, "ctrl_dt": 0.03},
    )
    assert env.scene.num_scene == 3
    state, obs = env.reset(jax.random.PRNGKey(1))
    assert obs["depth"].shape == (6, 1, 32, 32)
    # different scenes have different obstacle layouts → depth images differ
    d = np.asarray(obs["depth"])
    assert np.abs(d[0] - d[2]).max() > 0.1


def test_camera_noise_model_statistics():
    """TPU-native sensor noise models (`SceneManager.py:1030-1033` hookup):
    statistical sanity per model, determinism under a fixed key."""
    import jax
    import jax.numpy as jnp

    from visfly_tpu.render import noise as nz

    key = jax.random.PRNGKey(0)
    rgb = jnp.full((4, 3, 32, 32), 128, jnp.uint8)

    g = nz.gaussian(key, rgb, intensity_constant=0.1)
    gf = np.asarray(g, np.float32)
    assert g.dtype == jnp.uint8
    assert 5.0 < gf.std() < 40.0  # σ ≈ 25.5 before clipping
    assert abs(gf.mean() - 128.0) < 2.0

    sp = nz.salt_and_pepper(key, rgb, amount=0.1)
    spf = np.asarray(sp)
    frac_salt = (spf == 255).mean()
    frac_pepper = (spf == 0).mean()
    assert 0.03 < frac_salt < 0.07 and 0.03 < frac_pepper < 0.07

    po = nz.poisson(key, rgb)
    pof = np.asarray(po, np.float32)
    assert 5.0 < pof.std() < 20.0  # sqrt(128) ≈ 11.3
    assert abs(pof.mean() - 128.0) < 2.0

    sk = nz.speckle(key, rgb, sigma=0.05)
    skf = np.asarray(sk, np.float32)
    assert 3.0 < skf.std() < 15.0

    depth = jnp.full((4, 1, 32, 32), 3.0, jnp.float32)
    rd = nz.redwood_depth(key, depth, lateral_prob=0.5, dropout_scale=0.25)
    rdf = np.asarray(rd)
    valid = rdf[rdf > 0]
    assert abs(valid.mean() - 3.0) < 0.1  # unbiased where not dropped
    assert valid.std() > 0  # axial noise + quantization
    # a step edge must trigger dropout
    edge = depth.at[..., 16:].set(10.0)
    rde = np.asarray(nz.redwood_depth(key, edge, lateral_prob=0.0,
                                      dropout_scale=0.25))
    assert (rde == 0.0).any()
    # determinism under the same key
    np.testing.assert_array_equal(
        np.asarray(nz.redwood_depth(key, depth)),
        np.asarray(nz.redwood_depth(key, depth)))


def test_env_applies_sensor_noise():
    """noise_kwargs entries keyed by sensor uuid reach the renderer: the
    depth observation is perturbed vs the noiseless env, and changes from
    step to step (per-step PRNG)."""
    import jax
    import jax.numpy as jnp

    from visfly_tpu.envs import NavigationEnv

    def mkenv(noise):
        rk = {"state_generator": {"class": "Uniform", "kwargs": [
            {"position": {"mean": [1.0, 0.0, 1.5], "half": [0.1, 0.1, 0.1]}}]}}
        if noise:
            rk["noise_kwargs"] = {"depth": {
                "model": "RedwoodDepthNoiseModel",
                "kwargs": {"noise_multiplier": 1.0, "lateral_prob": 0.5}}}
        return NavigationEnv(
            num_agent_per_scene=2, visual=True,
            scene_kwargs={"path": "garage_simple_l_medium"},
            sensor_kwargs=[{"sensor_type": "depth", "uuid": "depth",
                            "resolution": [16, 16]}],
            random_kwargs=rk,
            dynamics_kwargs={"dt": 0.03, "ctrl_dt": 0.03},
            max_episode_steps=32)

    env_clean, env_noisy = mkenv(False), mkenv(True)
    st_c, obs_c = env_clean.reset(jax.random.PRNGKey(0))
    st_n, obs_n = env_noisy.reset(jax.random.PRNGKey(0))
    d_c, d_n = np.asarray(obs_c["depth"]), np.asarray(obs_n["depth"])
    assert d_c.shape == d_n.shape == (2, 1, 16, 16)
    assert not np.allclose(d_c, d_n)
    # noise is fresh each step (keyed on the stepped PRNG)
    a = jnp.zeros((2, 4))
    st_n1, out1 = env_noisy.step(st_n, a)
    st_n2, out2 = env_noisy.step(st_n1, a)
    assert not np.allclose(np.asarray(out1.obs["depth"]),
                           np.asarray(out2.obs["depth"]))


def test_requires_grad_keeps_pallas_render_backend():
    """Differentiated envs keep the Pallas renderer default (the round-2
    Mosaic-under-grad hang is fixed by the trainers' remat save policy —
    kernel outputs named 'pallas_render' are saved, never replayed);
    explicit render_backend always wins."""
    from visfly_tpu.envs import NavigationEnv

    kw = dict(num_agent_per_scene=2, visual=True,
              scene_kwargs={"path": "garage_simple_l_medium"},
              sensor_kwargs=[{"sensor_type": "depth", "uuid": "depth",
                              "resolution": [16, 16]}])
    assert "render_backend" not in NavigationEnv(
        requires_grad=True, **kw).sensor_kwargs[0]
    assert "render_backend" not in NavigationEnv(**kw).sensor_kwargs[0]
    kw["sensor_kwargs"] = [{"sensor_type": "depth", "uuid": "depth",
                            "resolution": [16, 16],
                            "render_backend": "pallas"}]
    assert NavigationEnv(requires_grad=True,
                         **kw).sensor_kwargs[0]["render_backend"] == "pallas"


def test_lighting_config_moves_shading():
    """Habitat lighting setups (`datasets.py:90-167` write per-scene
    lighting configs): scene_kwargs={"lighting": ...} drives an N-light
    Lambertian — moving the directional light changes pixel shading, a
    point light falls off with distance, and lighting=None reproduces the
    historic fixed-light image exactly."""
    from visfly_tpu.render.sphere_trace import bake_lighting

    data = simple_scene()
    pos = jnp.asarray([[2.5, 0.0, 2.0]])
    q = jnp.asarray([[1.0, 0.0, 0.0, 0.0]])
    sid = jnp.zeros(1, jnp.int32)
    spec = {"uuid": "color", "sensor_type": "color", "resolution": [32, 32]}

    base = np.asarray(render_camera(data, sid, pos, q, spec)["color"])
    same = np.asarray(render_camera(data, sid, pos, q, spec,
                                    lighting=None)["color"])
    np.testing.assert_array_equal(base, same)

    def lit(cfg):
        return np.asarray(render_camera(
            data, sid, pos, q, spec, lighting=bake_lighting(cfg))["color"])

    above = lit({"ambient": 0.2, "lights": [
        {"type": "directional", "direction": [0, 0, -1], "intensity": 0.8}]})
    below = lit({"ambient": 0.2, "lights": [
        {"type": "directional", "direction": [0, 0, 1], "intensity": 0.8}]})
    # moving the light moves the shading
    assert (above != below).any()
    hit = base.sum(1) > 0
    assert np.abs(above.astype(int) - below.astype(int))[
        :, :, hit[0]].mean() > 2.0

    near = lit({"ambient": 0.0, "attenuation": 0.3, "lights": [
        {"type": "point", "position": [3.5, 0.0, 2.0], "intensity": 1.5}]})
    far = lit({"ambient": 0.0, "attenuation": 0.3, "lights": [
        {"type": "point", "position": [14.0, 0.0, 2.0], "intensity": 1.5}]})
    # point light: intensity falls off with distance
    assert near[:, :, hit[0]].astype(int).sum() > \
        far[:, :, hit[0]].astype(int).sum() * 1.3

    # colored light tints the image
    red = lit({"ambient": 0.1, "lights": [
        {"type": "directional", "direction": [0, 0, -1],
         "color": [1.0, 0.1, 0.1], "intensity": 1.0}]})
    g_idx = 1
    white_ratio = above[0, 0][hit[0]].mean() / max(
        above[0, g_idx][hit[0]].mean(), 1e-6)
    red_ratio = red[0, 0][hit[0]].mean() / max(
        red[0, g_idx][hit[0]].mean(), 1e-6)
    assert red_ratio > white_ratio * 1.5


def test_lighting_config_end_to_end_env():
    """scene_kwargs plumbing: an env constructed with a lighting config
    renders color through it (image differs from the default light)."""
    from visfly_tpu.envs import NavigationEnv

    cfg = {"ambient": 0.1, "lights": [
        {"type": "point", "position": [2.0, 0.0, 4.0], "intensity": 2.0}]}
    mk = dict(num_agent_per_scene=1, visual=True,
              sensor_kwargs=[{"sensor_type": "color", "uuid": "color",
                              "resolution": [16, 16]}],
              max_episode_steps=32)
    env = NavigationEnv(scene_kwargs={"path": "box15_wall_empty",
                                      "lighting": cfg}, **mk)
    st, _ = env.reset(jax.random.PRNGKey(0))
    img = np.asarray(env.sensor_observations(st)["color"])
    env2 = NavigationEnv(scene_kwargs={"path": "box15_wall_empty"}, **mk)
    st2, _ = env2.reset(jax.random.PRNGKey(0))
    img2 = np.asarray(env2.sensor_observations(st2)["color"])
    assert img.shape == img2.shape and (img != img2).any()


def test_shadow_rays_exact_tri_backend(tmp_path):
    """Opt-in shadow rays on the exact-triangle backend (habitat GL
    shadow-maps the same geometry): a blocker quad between the light and a
    wall darkens exactly the occluded wall pixels; no pixel ever gets
    BRIGHTER from enabling shadows; a point light placed nearer than the
    blocker casts none."""
    from visfly_tpu.render.sphere_trace import (bake_lighting, render_camera,
                                                shadow_visibility)
    from visfly_tpu.scene.mesh import bake_mesh_scene

    # unit test on the visibility query itself ---------------------------
    # one floor triangle at z=0 plus a 1×1 blocker quad at z=2
    tri = jnp.asarray([[
        [-9, -9, 0, 9, -9, 0, 0, 9, 0],            # floor
        [-.5, -.5, 2, .5, -.5, 2, -.5, .5, 2],     # blocker half 1
        [.5, -.5, 2, .5, .5, 2, -.5, .5, 2],       # blocker half 2
    ]], jnp.float32)
    p = jnp.asarray([[[0.0, 0.0, 0.0], [4.0, 0.0, 0.0]]])   # on the floor
    nrm = jnp.asarray([[[0.0, 0.0, 1.0], [0.0, 0.0, 1.0]]])
    lit = bake_lighting({"shadows": True, "lights": [
        {"type": "directional", "direction": [0, 0, -1]},   # from above
        {"type": "point", "position": [0.0, 0.0, 1.0]},     # BELOW blocker
    ]})
    vis = np.asarray(shadow_visibility(tri, p, nrm, lit))   # (1, 2, L)
    assert vis[0, 0, 0] == 0.0   # under the blocker, sun occluded
    assert vis[0, 1, 0] == 1.0   # off to the side: lit
    assert vis[0, 0, 1] == 1.0   # point light nearer than the blocker
    assert vis[0, 1, 1] == 1.0

    # end-to-end through the tri RGB path --------------------------------
    # wall at x=5 (viewed face) + small blocker; light tilted so the
    # blocker sits outside the shadowed pixels' view rays
    v = np.asarray([
        [5, -6, -6], [5, 6, -6], [5, 6, 6], [5, -6, 6],      # wall
        [2.5, -2.8, -0.4], [2.5, -2.0, -0.4],
        [2.5, -2.0, 0.4], [2.5, -2.8, 0.4],                  # blocker
    ], np.float32)
    f = np.asarray([[0, 1, 2], [0, 2, 3], [4, 5, 6], [4, 6, 7]], np.int32)
    obj = tmp_path / "wall.obj"
    with open(obj, "w") as fo:
        for vv in v:
            fo.write(f"v {vv[0]} {vv[1]} {vv[2]}\n")
        for t in f:
            fo.write(f"f {t[0]+1} {t[1]+1} {t[2]+1}\n")
    data = bake_mesh_scene(str(obj), spacing=0.25, margin=1.0)

    pos = jnp.asarray([[0.0, 0.0, 0.0]])
    q = jnp.asarray([[1.0, 0.0, 0.0, 0.0]])
    sid = jnp.zeros(1, jnp.int32)
    spec = {"uuid": "color", "sensor_type": "color", "resolution": [32, 32]}
    cfg = {"ambient": 0.15, "lights": [
        {"type": "directional", "direction": [1.0, 1.0, 0.0],
         "intensity": 1.2}]}
    plain = np.asarray(render_camera(
        data, sid, pos, q, spec,
        lighting=bake_lighting(cfg))["color"]).astype(int)
    shad = np.asarray(render_camera(
        data, sid, pos, q, spec,
        lighting=bake_lighting({**cfg, "shadows": True}))["color"]
    ).astype(int)
    # shadows only ever remove light
    assert (shad <= plain + 1).all()
    # and some wall pixels are actually darkened by the blocker
    darkened = (plain - shad) > 20
    assert darkened.any(), "no shadowed pixels found"
