"""True-geometry dynamic objects and drone bodies in the camera tracers.

The reference inserts object GLBs (`model_path`) and per-agent DJI-Mavic
drone bodies into every habitat scene graph so cameras see real geometry
(`/root/reference/utils/SceneManager.py:247-255,853-866`). Here the
tracers instance low-poly triangle templates at each object's pose;
sphere-only objects keep the analytic fallback.
"""
import jax
import jax.numpy as jnp
import numpy as np

from visfly_tpu.core import quaternion as quat
from visfly_tpu.render.sphere_trace import (_object_mesh_hits,
                                            _object_sphere_hits)
from visfly_tpu.scene.templates import (decimate_tris, drone_template,
                                        human_template, object_template,
                                        pad_templates, sphere_template)


def _ortho_rays(n=48, extent=1.4, dist=5.0):
    """Parallel +x rays on a (z, y) grid — an orthographic silhouette
    probe. Returns (o, d) shaped (1, n*n, 3)."""
    ys = np.linspace(-extent, extent, n)
    zs = np.linspace(-extent, extent, n)
    Y, Z = np.meshgrid(ys, zs, indexing="ij")
    o = np.stack([np.full(Y.size, -dist), Y.ravel(), Z.ravel()], -1)
    d = np.tile(np.asarray([[1.0, 0.0, 0.0]]), (Y.size, 1))
    return (jnp.asarray(o[None], jnp.float32),
            jnp.asarray(d[None], jnp.float32))


def _silhouette(hit, n=48):
    """hit (1, n*n) -> (width along y, height along z) in ray-grid cells."""
    img = np.asarray(hit).reshape(n, n)  # [y, z]
    ys, zs = np.where(img)
    if ys.size == 0:
        return 0, 0
    return np.ptp(ys) + 1, np.ptp(zs) + 1


def _objects(mesh, radius=1.0, pos=(0.0, 0.0, 0.0), q=None):
    p = jnp.asarray(pos, jnp.float32).reshape(1, 1, 3)
    objs = (p, jnp.full((1, 1), radius, jnp.float32),
            jnp.full((1, 1, 3), 110.0, jnp.float32))
    if mesh is not None:
        qq = (quat.identity((1, 1)) if q is None
              else jnp.asarray(q, jnp.float32).reshape(1, 1, 4))
        objs = objs + (jnp.asarray(mesh)[None, None], qq)
    return objs


def test_human_template_silhouette_taller_than_wide():
    o, d = _ortho_rays()
    mesh = object_template("human", radius=1.0)
    t, hit, n, col = _object_mesh_hits(_objects(mesh), o, d, 20.0)
    w, h = _silhouette(hit)
    assert h > 1.6 * w  # a standing figure, not a ball
    # normals face the viewer (rays travel +x)
    n = np.asarray(n)[np.asarray(hit)]
    assert (n[:, 0] <= 1e-6).all()
    # sphere of the same bounding radius: round silhouette
    t_s, hit_s, *_ = _object_sphere_hits(_objects(None), o, d, 20.0)
    ws, hs = _silhouette(hit_s)
    assert abs(ws - hs) <= 1


def test_drone_template_flat_and_rotates_with_airframe():
    o, d = _ortho_rays(extent=0.4)
    mesh = drone_template(0.25)
    t, hit, *_ = _object_mesh_hits(_objects(mesh, radius=0.25), o, d, 20.0)
    w_level, h_level = _silhouette(hit)
    assert w_level > 2.0 * h_level  # a quadrotor seen from the side is flat
    # 90° roll: the silhouette stands up — drone bodies pose with dyn.q
    q90 = quat.from_euler(jnp.asarray([np.pi / 2]), jnp.zeros(1),
                          jnp.zeros(1)).reshape(4)
    t2, hit2, *_ = _object_mesh_hits(
        _objects(mesh, radius=0.25, q=q90), o, d, 20.0)
    w_roll, h_roll = _silhouette(hit2)
    assert h_roll > 2.0 * w_roll
    # the template fits its declared bounding sphere
    assert float(np.linalg.norm(mesh.reshape(-1, 3), axis=-1).max()) <= 0.2501


def test_zero_template_falls_back_to_sphere_exactly():
    o, d = _ortho_rays()
    zero_mesh = np.zeros((8, 9), np.float32)
    got = _object_mesh_hits(_objects(zero_mesh, radius=0.8), o, d, 20.0)
    want = _object_sphere_hits(_objects(None, radius=0.8), o, d, 20.0)
    for g, w in zip(got, want):
        np.testing.assert_allclose(np.asarray(g), np.asarray(w), atol=1e-6)


def test_mesh_self_exclusion_origin_inside_bound():
    """A ray starting inside an object's bounding sphere ignores it — a
    drone never sees its own body (same rule as the sphere path)."""
    mesh = drone_template(0.3)
    o = jnp.zeros((1, 1, 3), jnp.float32)  # at the object center
    d = jnp.asarray([[[1.0, 0.0, 0.0]]], jnp.float32)
    t, hit, *_ = _object_mesh_hits(_objects(mesh, radius=0.3), o, d, 20.0)
    assert not bool(hit[0, 0])


def test_mixed_soup_mesh_and_sphere_objects():
    """pad_templates(None) rows render as spheres in the same scan."""
    human = object_template("human", radius=1.0)
    mesh = pad_templates([human, None])
    pos = jnp.asarray([[[0.0, -1.6, 0.0], [0.0, 1.6, 0.0]]], jnp.float32)
    objs = (pos, jnp.full((1, 2), 1.0, jnp.float32),
            jnp.asarray([[[200.0, 0.0, 0.0], [0.0, 200.0, 0.0]]]),
            jnp.asarray(mesh)[None], quat.identity((1, 2)))
    o, d = _ortho_rays(n=64, extent=3.2)
    t, hit, n, col = _object_mesh_hits(objs, o, d, 20.0)
    img = np.asarray(hit).reshape(64, 64)
    colr = np.asarray(col).reshape(64, 64, 3)
    ys = np.linspace(-3.2, 3.2, 64)
    left, right = img[ys < -0.5], img[ys > 0.5]
    # human (left, red) is sparse vs its bound; sphere (right, green) full
    assert 0 < left.sum() < 0.6 * right.sum()
    assert (colr[ys < -0.5][left][:, 0] == 200.0).all()
    assert (colr[ys > 0.5][right][:, 1] == 200.0).all()


def test_decimate_tris_budget_and_shape():
    dense = sphere_template(1.0, subdiv=2)  # 320 tris
    out = decimate_tris(dense, 64)
    assert 4 <= out.shape[0] <= 64
    # still roughly unit-radius geometry (vertex clustering snaps outward
    # by up to half a cell)
    r = np.linalg.norm(out.reshape(-1, 3), axis=-1)
    assert 0.5 < r.mean() < 1.5


def test_multi_drone_cameras_see_true_drone_geometry():
    """End-to-end: in a swarm env, the depth camera of one drone sees its
    neighbour as a flat quadrotor, not its bounding sphere (VERDICT r4 #4;
    reference `SceneManager.py:853-866`)."""
    from visfly_tpu.envs.multi import MultiNavigationEnv

    env = MultiNavigationEnv(
        num_scene=1, num_agent_per_scene=2, visual=True, uav_radius=0.25,
        scene_kwargs={"path": "box15_wall_empty"},
        sensor_kwargs=[{"sensor_type": "depth", "uuid": "depth",
                        "resolution": [64, 64]}],
        random_kwargs={"state_generator": {"class": "Uniform", "kwargs": [
            {"position": {"mean": [1.0, -1.0, 2.0], "half": [0, 0, 0]}},
            {"position": {"mean": [2.2, -1.0, 2.0], "half": [0, 0, 0]}},
        ]}},
        dynamics_kwargs={"dt": 0.03, "ctrl_dt": 0.03},
    )
    st, obs = env.reset(jax.random.PRNGKey(0))
    depth = np.asarray(obs["depth"])[0, 0]  # agent 0 looks +x at agent 1
    sil = depth < 1.7  # neighbour ~1.2 m ahead; walls are >= 10 m away
    assert sil.any()
    ys, xs = np.where(sil)
    w, h = np.ptp(xs) + 1, np.ptp(ys) + 1
    assert w > 1.5 * h  # flat cross, not a ball
    # sphere would fill its disc; the quad covers a small fraction
    assert sil.sum() < 0.5 * np.pi * (max(w, h) / 2.0) ** 2
