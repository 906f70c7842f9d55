"""Phase breakdown of the dense-mesh camsoup path on-chip.

Times (a) the cluster-IDs prepass, (b) the signed-volume page build,
(c) the Pallas kernel alone, and (d) the full trace, each inside one
scanned jit (the axon tunnel costs ~30 ms/dispatch). Scratch probe for
round-5 dispatch-wall work; not part of the library surface.

Usage: python examples/_tri_phase_bench.py [--levels 3 4] [--backface]
"""
import argparse
import functools
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


def timed(fn, args, iters=20, name=""):
    """Scan fn over jittered inputs; report per-iter ms."""
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
    print(f"  {name:30s}: {dt * 1e3:8.2f} ms  (compile {compile_s:.0f}s)",
          flush=True)
    return dt


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--levels", type=int, nargs="+", default=[3])
    p.add_argument("--cams", type=int, default=256)
    p.add_argument("--res", type=int, default=64)
    p.add_argument("--iters", type=int, default=20)
    p.add_argument("--backface", action="store_true")
    p.add_argument("--cluster", type=int, default=0)
    p.add_argument("--budgets", type=int, nargs="+", default=[0],
                   help="worklist work_budget values (0 = auto default)")
    p.add_argument("--worklist-only", action="store_true")
    args = p.parse_args()

    if args.cluster:
        tt._SOUP_CLUSTER_OVERRIDE = args.cluster

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

        # square-tile repack (what tri_trace_pallas does for 64-wide images)
        S, R = 1, args.cams * HW
        cams, bw = args.cams, 32
        bh = tt.TILE // bw
        Hh = HW // args.res
        hb, wb = Hh // bh, args.res // bw

        def fwd(x):
            x = x.reshape(3, S, cams, hb, bh, wb, bw)
            return x.transpose(0, 1, 2, 3, 5, 4, 6).reshape(3, S, R)

        o_sq, d_sq = fwd(o_full), fwd(d_full)

        def prepass(o, d, eps):
            cids, counts, lb_c, _cl = tt._cluster_ids_prepass(
                tris, o + eps, d, 20.0, cap, bw, args.backface)
            return (cids.sum() + counts.sum()).astype(jnp.float32) \
                + lb_c.sum()

        def pages(o, d, eps):
            cluster = tt._SOUP_CLUSTER_OVERRIDE or (2 * tt.CLUSTER)
            cam_o = (o + eps).reshape(3, S, cams, HW)[..., 0]
            pg = tt._sv_pages(tris, cam_o.transpose(1, 2, 0), cluster)
            return pg.sum()

        def full(o, d, eps):
            t, hit, n, gid = tt._tri_trace_pallas_camsoup(
                tris, o + eps, d, 20.0, cap, bw, HW, args.backface)
            return t[0, 0] + n[0, 0, 0]

        def full_v2(o, d, eps):
            t, hit, n, gid = tt._tri_trace_pallas_camsoup_v2(
                tris, o + eps, d, 20.0, cap, bw, HW, args.backface)
            return t[0, 0] + n[0, 0, 0]

        def full_wl(budget):
            def f(o, d, eps):
                t, hit, n, gid = tt._tri_trace_pallas_worklist(
                    tris, o + eps, d, 20.0, cap, bw, HW, args.backface,
                    work_budget=budget)
                return t[0, 0] + n[0, 0, 0]
            return f

        if args.worklist_only:
            for budget in args.budgets:
                timed(full_wl(budget or None), (o_sq, d_sq), args.iters,
                      f"worklist budget={budget or 'auto'}")
            continue

        dt_pre = timed(prepass, (o_sq, d_sq), args.iters, "cluster-ids prepass")
        dt_pg = timed(pages, (o_sq, d_sq), args.iters, "sv pages build")
        dt_full = timed(full, (o_sq, d_sq), args.iters, "camsoup full (v1)")
        dt_v2 = timed(full_v2, (o_sq, d_sq), args.iters, "camsoup full (v2 merged)")
        print(f"  kernel-ish v1 (full - pre - pages): "
              f"{(dt_full - dt_pre - dt_pg) * 1e3:.2f} ms", flush=True)
        print(f"  kernel-ish v2 (full - pre - pages): "
              f"{(dt_v2 - dt_pre - dt_pg) * 1e3:.2f} ms", flush=True)
        for budget in args.budgets:
            timed(full_wl(budget or None), (o_sq, d_sq), args.iters,
                  f"worklist budget={budget or 'auto'}")


if __name__ == "__main__":
    main()
