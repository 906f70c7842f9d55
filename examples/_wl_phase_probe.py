"""Phase breakdown of the worklist dense-mesh path on-chip.

Times (a) cluster activity + top_k + count build, (b) worklist build +
page gather + signed-volume payload, (c) the full path, so (c)-(a)-(b)
approximates the kernel. Scratch probe for round-5 perf work.

Usage: python examples/_wl_phase_probe.py [--levels 3] [--backface]
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.dirname(__file__))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(__file__), "..", ".jax_cache"))

from tri_bench import camera_batch, load_garage  # noqa: E402

from visfly_tpu.render.camera import camera_rays_components  # noqa: E402
from visfly_tpu.render import tri_trace as tt  # noqa: E402


def timed(fn, args, iters=10, name=""):
    def step(carry, eps):
        out = fn(*args, eps)
        return carry + out, None

    run = jax.jit(lambda epss: jax.lax.scan(step, jnp.float32(0.0), epss)[0])
    epss = jnp.arange(1, iters + 1, dtype=jnp.float32) * 1e-4
    t0 = time.time()
    np.asarray(run(epss))
    compile_s = time.time() - t0
    t0 = time.time()
    np.asarray(run(epss + 0.05))
    dt = (time.time() - t0 - 0.030) / iters
    print(f"  {name:34s}: {dt * 1e3:8.2f} ms  (compile {compile_s:.0f}s)",
          flush=True)
    return dt


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--levels", type=int, nargs="+", default=[3])
    p.add_argument("--cams", type=int, default=256)
    p.add_argument("--res", type=int, default=64)
    p.add_argument("--iters", type=int, default=10)
    p.add_argument("--backface", action="store_true")
    args = p.parse_args()

    spec = {"sensor_type": "depth", "resolution": [args.res, args.res]}
    pos, q = camera_batch(args.cams)
    o_c, d_c, _ = camera_rays_components(spec, pos, q)
    HW = args.res * args.res
    o_full = jnp.broadcast_to(o_c[:, :, None],
                              (3, args.cams, HW)).reshape(3, 1, -1)
    d_full = d_c.reshape(3, 1, -1)

    for lvl in args.levels:
        v, f = load_garage(lvl)
        packed = tt.pack_triangles(v, f)
        tris = jnp.asarray(packed[None])
        T = packed.shape[0]
        cap = tt.default_tri_cap(T)
        print(f"T={T} cap={cap} backface={args.backface}", flush=True)

        S, R = 1, args.cams * HW
        cams, bw = args.cams, 32
        bh = tt.TILE // bw
        Hh = HW // args.res
        hb, wb = Hh // bh, args.res // bw

        def fwd(x):
            x = x.reshape(3, S, cams, hb, bh, wb, bw)
            return x.transpose(0, 1, 2, 3, 5, 4, 6).reshape(3, S, R)

        o_sq, d_sq = fwd(o_full), fwd(d_full)
        max_depth, img_w = 20.0, bw
        tiles = R // tt.TILE
        cluster = tt.WL_CLUSTER
        G = tt.WL_CHUNK // cluster
        C = T // cluster

        cap_c = max(1, min(cap, T) // cluster)
        cap_c = -(-cap_c // G) * G
        cap_c = min(cap_c, -(-C // G) * G)
        n_chunks = cap_c // G
        print(f"  tiles={tiles} C={C} cap_c={cap_c} n_chunks={n_chunks}")

        def activity(o, d, eps):
            o = o + eps
            o4 = o.reshape(3, S, tiles, tt.TILE)
            d4 = d.reshape(3, S, tiles, tt.TILE)
            lo = (o4.min(-1) + max_depth * jnp.minimum(d4.min(-1), 0.0)
                  ).transpose(1, 2, 0)
            hi = (o4.max(-1) + max_depth * jnp.maximum(d4.max(-1), 0.0)
                  ).transpose(1, 2, 0)
            active, dist, lb_all = tt._cluster_activity(
                tris, o, d, max_depth, lo, hi, img_w, cluster=cluster,
                backface=args.backface)
            return (active.sum().astype(jnp.float32) + dist.sum()
                    + lb_all.sum())

        def act_topk(o, d, eps):
            o = o + eps
            o4 = o.reshape(3, S, tiles, tt.TILE)
            d4 = d.reshape(3, S, tiles, tt.TILE)
            lo = (o4.min(-1) + max_depth * jnp.minimum(d4.min(-1), 0.0)
                  ).transpose(1, 2, 0)
            hi = (o4.max(-1) + max_depth * jnp.maximum(d4.max(-1), 0.0)
                  ).transpose(1, 2, 0)
            active, dist, lb_all = tt._cluster_activity(
                tris, o, d, max_depth, lo, hi, img_w, cluster=cluster,
                backface=args.backface)
            key = jnp.where(active, dist, jnp.inf)
            _nk, cids = jax.lax.top_k(-key, min(cap_c, C))
            counts = jnp.minimum(active.sum(-1), cap_c).astype(jnp.int32)
            return (cids.sum().astype(jnp.float32) + counts.sum())

        def full_wl(o, d, eps):
            t, hit, n, gid = tt._tri_trace_pallas_worklist(
                tris, o + eps, d, 20.0, cap, bw, HW, args.backface)
            return t[0, 0] + n[0, 0, 0]

        dt_act = timed(activity, (o_sq, d_sq), args.iters, "cluster activity")
        dt_topk = timed(act_topk, (o_sq, d_sq), args.iters,
                        "activity + top_k")
        dt_full = timed(full_wl, (o_sq, d_sq), args.iters, "worklist full")
        print(f"  top_k alone: {(dt_topk - dt_act) * 1e3:.2f} ms; "
              f"build+gather+kernel: {(dt_full - dt_topk) * 1e3:.2f} ms",
              flush=True)


if __name__ == "__main__":
    main()
