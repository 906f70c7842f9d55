"""Scratch probe: instrument the soup kernel with a chunks-executed counter.

Not part of the package — measures occlusion-early-out effectiveness on the
dense garage meshes to guide kernel optimisation. Run directly.
"""
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(__file__))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import jax
import jax.numpy as jnp
import numpy as np
from jax import Array
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(__file__), "..", ".jax_cache"))

import visfly_tpu.render.tri_trace as tt
from tri_bench import camera_batch, load_garage
from visfly_tpu.render.camera import camera_rays_components

TILE, ROWS, LANES, BIG = tt.TILE, tt.ROWS, tt.LANES, tt.BIG


def _probe_kernel(nch_ref, lb_ref, cid_ref, tri_ref,
                  ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref,
                  t_ref, hit_ref, cnt_ref,
                  *, chunk, n_chunks, max_depth):
    si, ti, ci = pl.program_id(0), pl.program_id(1), pl.program_id(2)

    @pl.when(ci == 0)
    def _init():
        t_ref[0, 0] = jnp.full((ROWS, LANES), BIG, jnp.float32)
        cnt_ref[0, 0] = jnp.zeros((ROWS, LANES), jnp.float32)

    worst = jnp.minimum(jnp.max(t_ref[0, 0]), max_depth)

    @pl.when((ci < nch_ref[si, ti])
             & (lb_ref[si, ti * n_chunks + ci] < worst))
    def _body():
        cnt_ref[0, 0] += 1.0 / (ROWS * LANES)
        dx, dy, dz = dx_ref[0, 0], dy_ref[0, 0], dz_ref[0, 0]
        ox, oy, oz = ox_ref[0, 0], oy_ref[0, 0], oz_ref[0, 0]
        tbest = t_ref[0, 0]
        for j in range(chunk):
            def Tr(c):
                return tri_ref[0, 0, 0, j, c]
            ax, ay, az = Tr(0), Tr(1), Tr(2)
            e1x, e1y, e1z = Tr(3) - ax, Tr(4) - ay, Tr(5) - az
            e2x, e2y, e2z = Tr(6) - ax, Tr(7) - ay, Tr(8) - az
            px = dy * e2z - dz * e2y
            py = dz * e2x - dx * e2z
            pz = dx * e2y - dy * e2x
            det = e1x * px + e1y * py + e1z * pz
            inv = 1.0 / jnp.where(jnp.abs(det) > 1e-9, det, 1.0)
            okd = (jnp.abs(det) > 1e-9).astype(jnp.float32)
            tx, ty, tz = ox - ax, oy - ay, oz - az
            u = (tx * px + ty * py + tz * pz) * inv
            qx = ty * e1z - tz * e1y
            qy = tz * e1x - tx * e1z
            qz = tx * e1y - ty * e1x
            vv = (dx * qx + dy * qy + dz * qz) * inv
            tk = (e2x * qx + e2y * qy + e2z * qz) * inv
            ok = (okd * (u >= 0.0).astype(jnp.float32)
                  * (vv >= 0.0).astype(jnp.float32)
                  * (u + vv <= 1.0).astype(jnp.float32)
                  * (tk > 1e-4).astype(jnp.float32))
            tk = jnp.where(ok > 0.5, tk, BIG)
            tbest = jnp.minimum(tbest, tk)
        t_ref[0, 0] = tbest

    @pl.when(ci == n_chunks - 1)
    def _fin():
        t = jnp.clip(t_ref[0, 0], 0.0, max_depth)
        t_ref[0, 0] = t
        hit_ref[0, 0] = (t < max_depth).astype(jnp.float32)


def probe(tris, origins_c, dirs_c, max_depth, cap, img_w, exact_aabb=False):
    _, S, R = origins_c.shape
    T = tris.shape[1]
    tiles = R // TILE
    sg = jax.lax.stop_gradient
    cids, counts, lb_c, cluster = tt._cluster_ids_prepass(
        tris, sg(origins_c), sg(dirs_c), max_depth, cap, img_w)
    if exact_aabb:
        # replace lb with exact point-to-AABB distance from the tile apex
        C = T // cluster
        v = tris.reshape(S, C, cluster, 3, 3)
        clo, chi = v.min((2, 3)), v.max((2, 3))
        apex, spread = tt._apex_spread(sg(origins_c), S, tiles)
        cen, half = (clo + chi) * 0.5, (chi - clo) * 0.5
        dd = jnp.maximum(
            jnp.abs(cen[:, None] - apex[:, :, None]) - half[:, None], 0.0)
        lb_all = jnp.sqrt(jnp.sum(dd * dd, -1)) - spread[..., None]
        lb_all = jnp.maximum(lb_all, 0.0)
        lb_c = jnp.take_along_axis(lb_all, cids, axis=-1)
        # re-sort cluster ids by the exact bound
        order = jnp.argsort(lb_c, axis=-1, stable=True)
        lb_c = jnp.take_along_axis(lb_c, order, -1)
        cids = jnp.take_along_axis(cids, order, -1)
    n_chunks = cids.shape[2]
    nch = jnp.clip(counts, 1, n_chunks).astype(jnp.int32)
    soup = tris.reshape(S, T // cluster, 1, cluster, 9)

    def comp(x, c):
        return x[c].reshape(S, tiles, ROWS, LANES)

    ray_spec = pl.BlockSpec((1, 1, ROWS, LANES),
                            lambda s, i, c, nch, lbc, cid: (s, i, 0, 0),
                            memory_space=pltpu.VMEM)
    tri_spec = pl.BlockSpec(
        (1, 1, 1, cluster, 9),
        lambda s, i, c, nch, lbc, cid: (
            s, cid[s, i * n_chunks + jnp.minimum(c, nch[s, i] - 1)], 0, 0, 0),
        memory_space=pltpu.SMEM)
    out_sds = jax.ShapeDtypeStruct((S, tiles, ROWS, LANES), jnp.float32)
    kernel = functools.partial(_probe_kernel, chunk=cluster,
                               n_chunks=n_chunks, max_depth=max_depth)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(S, tiles, n_chunks),
        in_specs=[tri_spec] + [ray_spec] * 6,
        out_specs=[ray_spec] * 3,
    )
    t, hit, cnt = pl.pallas_call(kernel, grid_spec=grid_spec,
                                 out_shape=[out_sds] * 3)(
        nch, lb_c.reshape(S, tiles * n_chunks),
        cids.reshape(S, tiles * n_chunks), soup,
        comp(origins_c, 0), comp(origins_c, 1), comp(origins_c, 2),
        comp(dirs_c, 0), comp(dirs_c, 1), comp(dirs_c, 2))
    return (t.reshape(S, R), hit.reshape(S, R),
            cnt.reshape(S, tiles, -1).sum(-1), counts, n_chunks)


def main():
    import argparse
    p = argparse.ArgumentParser()
    p.add_argument("--level", type=int, default=3)
    p.add_argument("--cams", type=int, default=256)
    p.add_argument("--cap", type=int, default=0)
    p.add_argument("--blocks", action="store_true", help="32x32 ray blocks")
    p.add_argument("--exact-aabb", action="store_true")
    args = p.parse_args()

    spec = {"sensor_type": "depth", "resolution": [64, 64]}
    pos, q = camera_batch(args.cams)
    o_c, d_c, _ = camera_rays_components(spec, pos, q)
    HW = 4096
    o_full = jnp.broadcast_to(o_c[:, :, None],
                              (3, args.cams, HW)).reshape(3, 1, -1)
    if args.blocks:
        d_full = d_c.reshape(3, args.cams, 2, 32, 2, 32).transpose(
            0, 1, 2, 4, 3, 5).reshape(3, 1, -1)
        img_w = 32
    else:
        d_full = d_c.reshape(3, 1, -1)
        img_w = 64

    v, f = load_garage(args.level)
    packed = tt.pack_triangles(v, f)
    tris = jnp.asarray(packed[None])
    T = packed.shape[0]
    cap = args.cap or T  # default: FULL cap (exact)

    fn = jax.jit(functools.partial(probe, max_depth=20.0, cap=cap,
                                   img_w=img_w,
                                   exact_aabb=args.exact_aabb))
    t, hit, cnt, counts, n_chunks = fn(tris, o_full, d_full)
    jax.block_until_ready((t, hit, cnt))
    t0 = time.time()
    outs = [fn(tris, o_full, d_full) for _ in range(10)]
    jax.block_until_ready(outs)
    dt = (time.time() - t0) / 10
    c = np.asarray(cnt)
    vis = np.asarray(counts)
    print(f"T={T} cap_c={n_chunks} hit_frac={float(hit.mean()):.4f}")
    print(f"chunks EXECUTED/tile: mean {c.mean():.1f} p50 "
          f"{np.percentile(c, 50):.0f} p90 {np.percentile(c, 90):.0f} "
          f"max {c.max():.0f}   (visible: mean {vis.mean():.1f})")
    print(f"time {dt * 1e3:.2f} ms/frame-batch = {args.cams / dt:,.0f} cam-fps")


if __name__ == "__main__":
    main()
