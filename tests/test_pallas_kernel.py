"""Pallas trace kernel: interpret-mode parity vs the XLA tracer, the
custom-VJP gradients vs the implicit-function theorem, and the family-split
packing."""
from unittest import mock

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental import pallas as pl

from visfly_tpu.scene import make_scene, pack_scenes
from visfly_tpu.render.pallas_trace import (
    TILE,
    pallas_trace,
    pallas_trace_diff,
    prepare_kernel_scene,
    _kernel_scene_sdf,
)
from visfly_tpu.render.sphere_trace import trace_grouped


@pytest.fixture
def interpret_pallas():
    orig = pl.pallas_call

    def patched(*a, **k):
        k.setdefault("interpret", True)
        return orig(*a, **k)

    with mock.patch.object(pl, "pallas_call", patched):
        yield


@pytest.fixture
def scene():
    return pack_scenes([make_scene("garage_simple", seed=1)])


def rays(n=TILE, seed=0):
    key = jax.random.PRNGKey(seed)
    o = jnp.asarray([1.0, 0.0, 1.5]) + jax.random.uniform(
        key, (1, n, 3), minval=-1, maxval=1
    ) * jnp.asarray([0.5, 2.0, 0.7])
    d = jax.random.normal(key, (1, n, 3))
    return o, d / jnp.linalg.norm(d, axis=-1, keepdims=True)


def test_kernel_matches_xla(interpret_pallas, scene):
    o, d = rays(2 * TILE)
    kscene = prepare_kernel_scene(scene)
    t_k, hit_k, _ = pallas_trace(kscene, o, d, n_steps=40)
    t_x, hit_x = trace_grouped(scene, o, d, n_steps=40,
                               compute_dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(t_k), np.asarray(t_x), atol=1e-4)
    assert (np.asarray(hit_k) == np.asarray(hit_x)).all()


def test_kernel_scene_sdf_matches_packed(scene):
    from visfly_tpu.scene.prim_scene import scene_sdf_grouped

    kscene = prepare_kernel_scene(scene)
    p = jnp.asarray([[[0.0, 0.0, 2.0], [5.0, 1.0, 1.0], [1.0, -2.0, 3.0]]])
    np.testing.assert_allclose(
        np.asarray(_kernel_scene_sdf(kscene, p)),
        np.asarray(scene_sdf_grouped(scene, p)),
        atol=1e-5,
    )


def test_custom_vjp_matches_ift(interpret_pallas, scene):
    """Gradient of depth w.r.t. origin must equal −n/(n·d) at the hit."""
    kscene = prepare_kernel_scene(scene)
    o, d = rays(TILE, seed=3)
    t0 = jnp.zeros((1, TILE))

    def mean_depth(origins):
        t, _, _ = pallas_trace_diff(kscene, origins, d, t0, 40, 20.0)
        return t.mean()

    g = jax.grad(mean_depth)(o)
    assert np.isfinite(np.asarray(g)).all()

    # finite-difference check along x for a single ray
    eps = 1e-3
    o_p = o.at[0, 0, 0].add(eps)
    o_m = o.at[0, 0, 0].add(-eps)
    t_p, _, _ = pallas_trace_diff(kscene, o_p, d, t0, 40, 20.0)
    t_m, _, _ = pallas_trace_diff(kscene, o_m, d, t0, 40, 20.0)
    fd = (t_p[0, 0] - t_m[0, 0]) / (2 * eps)
    an = g[0, 0, 0] * TILE  # undo the mean
    np.testing.assert_allclose(float(an), float(fd), atol=0.05)


def test_objects_append_as_capsules(interpret_pallas, scene):
    kscene_plain = prepare_kernel_scene(scene)
    obj_pos = jnp.asarray([[[2.0, 0.0, 1.5]]])  # (S=1, M=1, 3)
    obj_radius = jnp.asarray([[0.4]])
    kscene_obj = prepare_kernel_scene(scene, (obj_pos, obj_radius))
    assert kscene_obj.capsules.shape[1] == kscene_plain.capsules.shape[1] + 1
    # a ray toward the object must now hit it
    o = jnp.asarray([[[0.0, 0.0, 1.5]]] ) * jnp.ones((1, TILE, 1))
    d = jnp.zeros((1, TILE, 3)).at[:, :, 0].set(1.0)
    t_with, _, _ = pallas_trace(kscene_obj, o, d, n_steps=40)
    t_without, _, _ = pallas_trace(kscene_plain, o, d, n_steps=40)
    assert float(t_with[0, 0]) < float(t_without[0, 0])
    np.testing.assert_allclose(float(t_with[0, 0]), 1.6, atol=0.05)


def test_component_path_matches_packed(interpret_pallas, scene):
    """The transpose-free component entry (six (S,tiles,ROWS,LANES) inputs,
    pure reshapes) must produce the same march as the packed (N,3) entry."""
    from visfly_tpu.render.pallas_trace import pallas_trace_c

    kscene = prepare_kernel_scene(scene)
    o, d = rays(2 * TILE, seed=5)
    t_p, hit_p, _ = pallas_trace(kscene, o, d, n_steps=40)
    o_c = jnp.transpose(o, (2, 0, 1))  # (3, S, R)
    d_c = jnp.transpose(d, (2, 0, 1))
    t_c, hit_c, _ = pallas_trace_c(kscene, o_c, d_c, n_steps=40)
    np.testing.assert_allclose(np.asarray(t_c), np.asarray(t_p), atol=1e-6)
    assert (np.asarray(hit_c) == np.asarray(hit_p)).all()


def test_component_path_vjp(interpret_pallas, scene):
    """IFT custom VJP on the component entry: finite differences along x."""
    from visfly_tpu.render.pallas_trace import pallas_trace_diff_c

    kscene = prepare_kernel_scene(scene)
    o, d = rays(TILE, seed=7)
    o_c = jnp.transpose(o, (2, 0, 1))
    d_c = jnp.transpose(d, (2, 0, 1))
    t0 = jnp.zeros((1, TILE))

    def mean_depth(oc):
        t, _, _ = pallas_trace_diff_c(kscene, oc, d_c, t0, 40, 20.0)
        return t.mean()

    g = jax.grad(mean_depth)(o_c)
    assert np.isfinite(np.asarray(g)).all()
    eps = 1e-3
    t_p, _, _ = pallas_trace_diff_c(kscene, o_c.at[0, 0, 0].add(eps), d_c, t0, 40, 20.0)
    t_m, _, _ = pallas_trace_diff_c(kscene, o_c.at[0, 0, 0].add(-eps), d_c, t0, 40, 20.0)
    fd = (t_p[0, 0] - t_m[0, 0]) / (2 * eps)
    np.testing.assert_allclose(float(g[0, 0, 0] * TILE), float(fd), atol=0.05)


def test_overrelaxed_march_converges(interpret_pallas, scene):
    """omega>1 (safeguarded over-relaxation) must land on the same surfaces
    as the plain march for well-conditioned rays (p50 is sub-mm; only the
    grazing-ray tail needs the full plain step budget)."""
    from visfly_tpu.render.pallas_trace import pallas_trace_c

    kscene = prepare_kernel_scene(scene)
    o, d = rays(TILE, seed=11)
    o_c = jnp.transpose(o, (2, 0, 1))
    d_c = jnp.transpose(d, (2, 0, 1))
    t_p, hit_p, _ = pallas_trace_c(kscene, o_c, d_c, n_steps=60)
    t_o, hit_o, _ = pallas_trace_c(kscene, o_c, d_c, n_steps=60, omega=1.5)
    agree = np.asarray(hit_p) == np.asarray(hit_o)
    assert agree.mean() > 0.98
    err = np.abs(np.asarray(t_p) - np.asarray(t_o))[np.asarray(hit_p) & agree]
    assert np.median(err) < 1e-2


def test_family_split_padding(scene):
    assert scene.boxes.shape[1] % 4 == 0
    assert scene.capsules.shape[1] % 4 == 0


def test_visual_bptt_through_renderer():
    """End-to-end differentiation THROUGH the depth renderer: policy sees
    depth, gradient flows action → dynamics → pose → render (IFT custom
    VJP) → next depth → policy. The reference cannot do this at all
    (habitat's rasteriser is not differentiable)."""
    import jax

    from visfly_tpu.algos import BPTT
    from visfly_tpu.envs import NavigationEnv2

    env = NavigationEnv2(
        num_agent_per_scene=4, visual=True, requires_grad=True,
        scene_kwargs={"path": "garage_simple_l_medium", "trace_steps": 16},
        sensor_kwargs=[{"sensor_type": "depth", "uuid": "depth",
                        "resolution": [16, 16], "render_backend": "xla"}],
        random_kwargs={"state_generator": {"class": "Uniform", "kwargs": [
            {"position": {"mean": [1.0, 0.0, 1.5], "half": [0.5, 1.0, 0.5]}}]}},
        dynamics_kwargs={"dt": 0.03, "ctrl_dt": 0.03}, max_episode_steps=32,
    )
    tr = BPTT(env, horizon=4, policy_kwargs={
        "net_arch": {"depth": {"cnn": 32}, "state": {"mlp": [32]},
                     "collision_vector": {"mlp": [16]}},
        "latent_dim": (32,),
    })
    st = tr.init(jax.random.PRNGKey(0))
    st, m = tr.update(st)
    gn = float(m["grad_norm"])
    assert np.isfinite(float(m["actor_loss"]))
    assert np.isfinite(gn) and gn > 0


def test_culled_kernel_matches_unculled(interpret_pallas, scene):
    """Per-tile primitive culling (dual static path) must not change the
    image: converged rays agree exactly; budget-exhausted rays report a
    lower bound at least as tight (the culled march steps farther through
    regions whose primitives were culled)."""
    from visfly_tpu.render.pallas_trace import pallas_trace_c

    kscene = prepare_kernel_scene(scene)
    o, d = rays(2 * TILE, seed=11)
    o_c = jnp.transpose(o, (2, 0, 1))
    d_c = jnp.transpose(d, (2, 0, 1))
    t_u, hit_u, _ = pallas_trace_c(kscene, o_c, d_c, n_steps=60, cull=False)
    t_c, hit_c, _ = pallas_trace_c(kscene, o_c, d_c, n_steps=60, cull=True)
    both = np.asarray(hit_u) & np.asarray(hit_c)
    np.testing.assert_allclose(np.asarray(t_c)[both], np.asarray(t_u)[both],
                               atol=1e-3)
    # lower-bound property everywhere
    assert (np.asarray(t_c) >= np.asarray(t_u) - 1e-3).all()
    assert both.mean() > 0.5  # the scene is cluttered; most rays hit


def test_frustum_cull_camera_tiles(interpret_pallas, scene):
    """Camera-grid rays with one tile per camera enable the exact
    frustum-plane cull (img_w) — image must match the unculled trace, and
    the prepass must actually cull (fewer actives than the full set)."""
    from visfly_tpu.core import quaternion as quat
    from visfly_tpu.render.camera import camera_rays_components
    from visfly_tpu.render.pallas_trace import cull_compact, pallas_trace_c

    kscene = prepare_kernel_scene(scene)
    spec = {"sensor_type": "depth", "resolution": [16, 64]}  # 1024 = 1 tile
    pos = jnp.asarray([[1.0, 0.0, 1.5], [2.0, 1.0, 1.0]])
    yaw = jnp.asarray([0.3, 2.2])
    q = quat.from_euler(jnp.zeros(2), jnp.zeros(2), yaw)
    o_c, d_c, _ = camera_rays_components(spec, pos, q)
    o_full = jnp.broadcast_to(o_c[:, :, None], (3, 2, 1024)).reshape(3, 1, 2048)
    d_full = d_c.reshape(3, 1, 2048)

    _, nb, _, nc = cull_compact(kscene, o_full, d_full, 20.0, img_w=64)
    kb, kc = kscene.boxes.shape[1], kscene.capsules.shape[1]
    assert int(np.asarray(nb).max()) <= kb
    assert int(np.asarray(nb).sum() + np.asarray(nc).sum()) < 2 * (kb + kc), (
        "frustum cull removed nothing"
    )

    t_u, hit_u, _ = pallas_trace_c(kscene, o_full, d_full, n_steps=60,
                                   cull=False)
    t_c, hit_c, _ = pallas_trace_c(kscene, o_full, d_full, n_steps=60,
                                   cull=True, img_w=64)
    both = np.asarray(hit_u) & np.asarray(hit_c)
    np.testing.assert_allclose(np.asarray(t_c)[both], np.asarray(t_u)[both],
                               atol=1e-3)
    assert (np.asarray(t_c) >= np.asarray(t_u) - 1e-3).all()


# ---------------------------------------------------------------------------
# analytic ray-intersection path
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("preset", ["garage_simple", "box_random", "forest"])
def test_analytic_matches_ground_truth(preset):
    """Analytic candidates vs dense SDF sampling along each ray (the only
    unbiased oracle — the eps-march dilates silhouettes)."""
    from visfly_tpu.scene.prim_scene import prim_sdf

    sc = pack_scenes([make_scene(preset, seed=2)])
    o, d = rays(512, seed=3)
    t_an, hit_an = trace_grouped(sc, o, d, mode="analytic")
    t_an, hit_an = np.asarray(t_an)[0], np.asarray(hit_an)[0]

    ts = np.linspace(0.0, 20.0, 2001, dtype=np.float32)  # 1 cm sampling
    params = sc.params[0]
    on, dn = np.asarray(o)[0], np.asarray(d)[0]
    for i in range(0, 512, 7):
        pts = on[i] + dn[i] * ts[:, None]
        sd = np.asarray(prim_sdf(params, jnp.asarray(pts)))
        below = np.where(sd < 0.0)[0]
        t_true = ts[below[0]] if len(below) else 20.0
        if len(below) and below[0] > 0:
            # first crossing lies in the sample gap before the sign flip
            t_true = ts[below[0] - 1]
        assert abs(t_an[i] - t_true) < 0.02 + 0.01 * t_true, (
            preset, i, t_an[i], t_true)


@pytest.mark.parametrize("n_refine", [0, 2])
def test_analytic_kernel_matches_xla(interpret_pallas, scene, n_refine):
    """Pallas analytic tile (both cull paths, with and without the residual
    refine+final eval) ≡ the XLA analytic tracer."""
    from visfly_tpu.render.pallas_trace import pallas_trace_c

    o, d = rays(2 * TILE)
    t_x, hit_x = trace_grouped(scene, o, d, mode="analytic",
                               refine_steps=n_refine)
    ks = prepare_kernel_scene(scene)
    oc = jnp.transpose(o, (2, 0, 1))
    dc = jnp.transpose(d, (2, 0, 1))
    for cull in (False, True):
        t_k, hit_k, kid_k = pallas_trace_c(ks, oc, dc, None, analytic=True,
                                           n_refine=n_refine, cull=cull)
        np.testing.assert_array_equal(np.asarray(hit_x), np.asarray(hit_k))
        np.testing.assert_allclose(np.asarray(t_x), np.asarray(t_k),
                                   atol=1e-3)


def test_analytic_rounded_box_fallback():
    """General rounded box (he>0 AND radius>0): the slab candidate is a
    lower bound; the residual refine must converge it."""
    from visfly_tpu.scene.prim_scene import PrimitiveScene, pack_scenes
    from visfly_tpu.scene.scene import SceneSpec

    spec = SceneSpec(
        np.asarray([-5.0, -5.0, 0.0]), np.asarray([5.0, 5.0, 4.0]),
        [{"type": "room", "bounds_min": [-5, -5, 0], "bounds_max": [5, 5, 4],
          "color": [128, 128, 128], "semantic": 1}],
        "unit",
    )
    sc = pack_scenes([spec])
    params = np.asarray(sc.params)
    # hand-round a box: he=(1,1,1), radius=0.4 at the origin
    rounded = np.zeros((1, 1, 12), np.float32)
    rounded[0, 0, 0:3] = [0.0, 0.0, 1.5]
    rounded[0, 0, 3:6] = [1.0, 1.0, 1.0]
    rounded[0, 0, 6] = 0.4
    rounded[0, 0, 7] = 1.0  # cos yaw
    rounded[0, 0, 9] = 1.0  # sign
    rounded[0, 0, 11] = 1.0  # active
    params = np.concatenate([params, rounded], axis=1)
    sc = PrimitiveScene(
        params=jnp.asarray(params), colors=jnp.zeros((1, params.shape[1], 3)),
        semantic=jnp.zeros((1, params.shape[1]), jnp.int32),
        bbox=sc.bbox, eps=sc.eps,
        boxes=(), capsules=(),  # force legacy family split
    )
    o, d = rays(512, seed=5)
    t_march, _ = trace_grouped(sc, o, d, n_steps=256,
                               compute_dtype=jnp.float32)
    t_an, _ = trace_grouped(sc, o, d, mode="analytic", refine_steps=8)
    err = np.abs(np.asarray(t_march) - np.asarray(t_an))
    assert np.percentile(err, 95) < 0.05, np.percentile(err, 95)


def test_analytic_render_gradients_flow(scene):
    """Depth gradients flow into drone pose through the analytic XLA path
    (the refine + final residual carry the surface-normal gradient)."""
    from visfly_tpu.render.sphere_trace import render_camera

    spec = {"sensor_type": "depth", "resolution": [16, 16],
            "trace_mode": "analytic"}
    q = jnp.asarray([[1.0, 0.0, 0.0, 0.0]])

    def loss(pos):
        out = render_camera(scene, jnp.zeros(1, jnp.int32), pos, q, spec)
        return jnp.sum(jnp.where(out["depth"] < 19.0, out["depth"], 0.0))

    g = jax.grad(loss)(jnp.asarray([[1.0, 0.0, 1.5]]))
    assert np.isfinite(np.asarray(g)).all()
    assert np.abs(np.asarray(g)).max() > 1e-3


def test_analytic_kernel_reports_winning_primitive(interpret_pallas, scene):
    """kid output: at every hit pixel the reported id must be the primitive
    whose surface distance at the hit point is (near-)zero — i.e. the XLA
    argmin winner; misses report −1."""
    from visfly_tpu.render.pallas_trace import pallas_trace_c
    from visfly_tpu.scene.prim_scene import prim_distances

    ks = prepare_kernel_scene(scene)
    o, d = rays(2 * TILE, seed=13)
    oc = jnp.transpose(o, (2, 0, 1))
    dc = jnp.transpose(d, (2, 0, 1))
    for cull in (False, True):
        t_k, hit_k, kid_k = pallas_trace_c(ks, oc, dc, None, analytic=True,
                                           n_refine=0, cull=cull)
        t_k, hit_k, kid_k = (np.asarray(t_k)[0], np.asarray(hit_k)[0],
                             np.asarray(kid_k)[0].astype(int))
        p_hit = np.asarray(o)[0] + np.asarray(d)[0] * t_k[:, None]
        dists = np.asarray(prim_distances(scene.params[0],
                                          jnp.asarray(p_hit)))  # (R, K)
        assert (kid_k[~hit_k] == -1).all()
        hits = np.where(hit_k)[0]
        assert len(hits) > 50
        # winner's distance at the hit point ≈ 0 (within the march epsilon
        # + candidate tolerance); ids in range
        assert (kid_k[hits] >= 0).all()
        assert (kid_k[hits] < dists.shape[1]).all()
        sel = np.abs(dists[hits, kid_k[hits]])
        assert np.percentile(sel, 99) < 0.05, np.percentile(sel, 99)


def test_indexed_shading_matches_argmin_shading(interpret_pallas, scene):
    """Color/semantic via the kernel-reported winner ≡ the all-K argmin
    shading path on every hit pixel (edge ties aside)."""
    from visfly_tpu.render.pallas_trace import pallas_trace_c
    from visfly_tpu.render.sphere_trace import (_shade_primitive,
                                                _shade_primitive_indexed)

    ks = prepare_kernel_scene(scene)
    o, d = rays(2 * TILE, seed=17)
    oc = jnp.transpose(o, (2, 0, 1))
    dc = jnp.transpose(d, (2, 0, 1))
    t, hit, kid = pallas_trace_c(ks, oc, dc, None, analytic=True,
                                 n_refine=0, cull=True)
    p_hit = o + d * t[..., None]
    for want in ("color", "semantic"):
        a = np.asarray(_shade_primitive(scene, p_hit, hit, want))
        b = np.asarray(_shade_primitive_indexed(scene, p_hit, hit, kid, want))
        match = np.isclose(a, b, atol=1e-3).all(axis=-1) if want == "color" \
            else np.isclose(a, b, atol=1e-3)
        assert match.mean() > 0.98, (want, match.mean())
