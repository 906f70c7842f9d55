"""Cull-tightness + occlusion-headroom stats for the camsoup dense path.

For each tile (square-repacked, exactly as `_tri_trace_pallas_camsoup`
consumes them) reports:
  nch       — chunks the static cull schedules (what the grid pays for)
  exec_min  — chunks with lb < min(max final ray t, max_depth): the
              early-out MUST execute at least these even with a perfect
              transient (lower bound on dynamic work)
  useful    — distinct clusters owning a winning triangle (irreducible)
The gaps nch→exec_min and exec_min→useful say whether the next 2-3x
comes from occlusion-aware scheduling, tighter culling, or neither
(i.e. the per-test vector cost itself). CPU-runnable (pure XLA prepass +
brute-force oracle on few cams). Scratch probe for round-5 perf work.

Usage: python examples/_cull_stats.py [--levels 3] [--cams 16] [--backface]
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.dirname(__file__))

import jax

jax.config.update("jax_platforms", "cpu")  # axon registers the TPU tunnel
import jax.numpy as jnp
import numpy as np

from tri_bench import camera_batch, load_garage  # noqa: E402

from visfly_tpu.render.camera import camera_rays_components  # noqa: E402
from visfly_tpu.render import tri_trace as tt  # noqa: E402


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--levels", type=int, nargs="+", default=[3])
    p.add_argument("--cams", type=int, default=16)
    p.add_argument("--res", type=int, default=64)
    p.add_argument("--backface", action="store_true")
    args = p.parse_args()

    spec = {"sensor_type": "depth", "resolution": [args.res, args.res]}
    pos, q = camera_batch(args.cams)
    o_c, d_c, _ = camera_rays_components(spec, pos, q)
    HW = args.res * args.res
    R = args.cams * HW
    o_full = jnp.broadcast_to(o_c[:, :, None],
                              (3, args.cams, HW)).reshape(3, 1, R)
    d_full = d_c.reshape(3, 1, R)

    # square 32x32 repack, as tri_trace_pallas does for img_w=64
    H, bw = args.res, 32
    bh = tt.TILE // bw
    cams, hb, wb = args.cams, H // bh, args.res // bw

    def fwd(x):
        x = x.reshape(3, 1, cams, hb, bh, wb, bw)
        return x.transpose(0, 1, 2, 3, 5, 4, 6).reshape(3, 1, R)

    o_r, d_r = fwd(o_full), fwd(d_full)
    max_depth = 20.0

    for lvl in args.levels:
        v, f = load_garage(lvl)
        packed = tt.pack_triangles(v, f)
        tris = jnp.asarray(packed[None])
        T = packed.shape[0]
        cap = tt.default_tri_cap(T)
        cids, counts, lb_c, cluster = jax.jit(
            lambda: tt._cluster_ids_prepass(
                tris, o_r, d_r, max_depth, cap, bw,
                backface=args.backface))()
        n_chunks = cids.shape[2]
        nch = np.asarray(jnp.clip(counts, 1, n_chunks))[0]  # (tiles,)
        lb = np.asarray(lb_c)[0]                            # (tiles, capc)

        o_t = jnp.transpose(o_r, (1, 2, 0)).reshape(-1, tt.TILE, 3)
        d_t = jnp.transpose(d_r, (1, 2, 0)).reshape(-1, tt.TILE, 3)

        def oracle(od):
            return tt.tri_trace_xla(tris, od[0][None], od[1][None],
                                    max_depth)

        t_x, hit_x, _n, gid = (
            x[:, 0] for x in jax.jit(lambda: jax.lax.map(
                oracle, (o_t, d_t)))())
        t_img = np.asarray(t_x).reshape(-1, tt.TILE)
        gid_img = np.asarray(gid).reshape(-1, tt.TILE)
        hit_img = np.asarray(hit_x).reshape(-1, tt.TILE)

        tiles = t_img.shape[0]
        worst = np.minimum(
            np.where(hit_img, t_img, max_depth).max(-1), max_depth)
        exec_min = (lb < worst[:, None]).sum(-1)
        useful = np.array([
            len(np.unique(gid_img[i][hit_img[i]] // cluster))
            for i in range(tiles)])

        # exact apex-AABB -> cluster-AABB distance as a tighter lb than
        # centroid - half-diagonal (what the kernel uses today)
        vtris = np.asarray(tris).reshape(1, T // cluster, cluster, 3, 3)
        clo = vtris.min((2, 3))[0]  # (C, 3)
        chi = vtris.max((2, 3))[0]
        o_np = np.asarray(o_r).reshape(3, -1, tt.TILE)  # (3, tiles, TILE)
        apex = o_np.mean(-1).T                          # (tiles, 3)
        spread = np.linalg.norm(
            o_np.transpose(1, 2, 0) - apex[:, None], axis=-1).max(-1)
        cid_np = np.asarray(cids)[0]                    # (tiles, capc)
        gap = np.maximum(clo[cid_np] - apex[:, None, :],
                         np.maximum(apex[:, None, :] - chi[cid_np], 0.0))
        lb_x = np.maximum(
            np.linalg.norm(np.maximum(gap, 0.0), axis=-1)
            - spread[:, None], 0.0)
        lb_x = np.where(lb < tt.BIG / 2, np.maximum(lb_x, lb), tt.BIG)
        exec_x = (lb_x < worst[:, None]).sum(-1)

        # per-ray exit headroom: chunks a ray-exit kernel would touch
        t_ray = np.where(hit_img, t_img, max_depth)     # (tiles, TILE)
        per_ray = (lb_x[:, None, :] < t_ray[..., None]).sum(-1)  # chunks/ray

        def row(name, x):
            print(f"  {name:9s} mean {x.mean():7.1f}  p50 {np.percentile(x, 50):5.0f}"
                  f"  p90 {np.percentile(x, 90):5.0f}  max {x.max():5.0f}")

        print(f"T={T} cluster={cluster} cap_c={n_chunks} tiles={tiles} "
              f"backface={args.backface}")
        row("nch", nch.astype(float))
        row("exec_min", exec_min.astype(float))
        row("exec_xlb", exec_x.astype(float))
        row("ray_need", per_ray.mean(-1).astype(float))
        row("useful", useful.astype(float))
        for g in (64, 32):
            u = np.array([
                len(np.unique(gid_img[i][hit_img[i]] // g))
                for i in range(tiles)])
            print(f"  useful@{g:3d} mean {u.mean():7.1f} "
                  f"(x{g} = {u.mean() * g:.0f} tris)")
        tested = nch.mean() * cluster
        print(f"  tris tested/tile if static: {tested:.0f} "
              f"(= {tested / T:.1%} of mesh); floor w/ exact-AABB lb: "
              f"{exec_x.mean() * cluster:.0f}; per-ray-exit floor: "
              f"{per_ray.mean() * cluster:.0f}; irreducible: "
              f"{useful.mean() * cluster:.0f}")


if __name__ == "__main__":
    main()
