"""Dispatch-wall isolation experiments for the camsoup kernel (round 5).

Variants of the merged-operand camsoup call with pieces knocked out:
  null-body  — guard + page DMA intact, intersection math removed
  null-dma   — page index pinned to block 0 (one DMA total), math intact
  null-both  — both removed: the pure grid-step floor
Comparing against the full kernel splits the 63.7 ms at 23k triangles
into dispatch / page-DMA / vector-math components. Scratch probe, not
library surface.

Usage: python examples/_tri_kernel_exp.py [--levels 3] [--cluster 128]
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
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(__file__), "..", ".jax_cache"))

from tri_bench import camera_batch, load_garage  # noqa: E402

from visfly_tpu.render.camera import camera_rays_components  # noqa: E402
from visfly_tpu.render import tri_trace as tt  # noqa: E402

ROWS, LANES, TILE, BIG = tt.ROWS, tt.LANES, tt.TILE, tt.BIG


def make_kernel(body: bool, chunk: int, n_chunks: int, max_depth: float,
                cluster: int):
    def kernel(nch_ref, lb_ref, cid_ref, pg_ref, d_ref, out_ref):
        si, ti = pl.program_id(0), pl.program_id(1)
        ci = pl.program_id(2)

        @pl.when(ci == 0)
        def _init():
            out_ref[0, 0, 0] = jnp.full((ROWS, LANES), BIG, jnp.float32)
            out_ref[0, 0, 1] = jnp.zeros((ROWS, LANES), jnp.float32)

        worst = jnp.minimum(jnp.max(out_ref[0, 0, 0]), max_depth)

        @pl.when((ci < nch_ref[si, ti])
                 & (lb_ref[si, ti * n_chunks + ci] < worst))
        def _body():
            dx, dy, dz = d_ref[0, 0, 0], d_ref[0, 0, 1], d_ref[0, 0, 2]
            cid = cid_ref[si, ti * n_chunks + ci]
            base = (cid * cluster).astype(jnp.float32)
            tbest = out_ref[0, 0, 0]
            gbest = out_ref[0, 0, 1]
            if body:
                for j in range(chunk):
                    def Pg(c):
                        return pg_ref[0, 0, 0, j, c]

                    w0 = dx * Pg(0) + dy * Pg(1) + dz * Pg(2)
                    w1 = dx * Pg(3) + dy * Pg(4) + dz * Pg(5)
                    w2 = dx * Pg(6) + dy * Pg(7) + dz * Pg(8)
                    wsum = w0 + w1 + w2
                    ok = ((w0 * w1 >= 0.0) & (w0 * w2 >= 0.0)
                          & (w1 * w2 >= 0.0))
                    tk = Pg(9) * (1.0 / wsum)
                    ok = ok & (tk > 1e-4)
                    tk = jnp.where(ok, tk, BIG)
                    better = tk < tbest
                    gbest = jnp.where(better, base + float(j), gbest)
                    tbest = jnp.where(better, tk, tbest)
            else:
                # touch one page scalar so the DMA is live, skip the math
                tbest = jnp.minimum(tbest, BIG + pg_ref[0, 0, 0, 0, 0])
                gbest = gbest + 0.0 * base
            out_ref[0, 0, 0] = tbest
            out_ref[0, 0, 1] = gbest

        @pl.when(ci == n_chunks - 1)
        def _finalise():
            out_ref[0, 0, 0] = jnp.clip(out_ref[0, 0, 0], 0.0, max_depth)

    return kernel


def camsoup_exp(tris, origins_c, dirs_c, max_depth, cap, img_w, cam_rays,
                backface, body=True, dma=True):
    _, S, R = origins_c.shape
    tiles = R // TILE
    tpc = cam_rays // TILE
    sg = jax.lax.stop_gradient
    cids, counts, lb_c, cluster = tt._cluster_ids_prepass(
        tris, sg(origins_c), sg(dirs_c), max_depth, cap, img_w, backface)
    n_chunks = cids.shape[2]
    nch = jnp.clip(counts, 1, n_chunks).astype(jnp.int32)
    cams = R // cam_rays
    cam_o = sg(origins_c).reshape(3, S, cams, cam_rays)[..., 0]
    pages = tt._sv_pages(tris, cam_o.transpose(1, 2, 0), cluster)

    groups = 1
    while S * (tiles // groups) * n_chunks * 4 > 256 * 1024 \
            and groups < tiles // tpc:
        groups += 1
        while (tiles // tpc) % groups:
            groups += 1
    gt = tiles // groups
    gc = cams // groups

    d3 = dirs_c.reshape(3, S, tiles, ROWS, LANES).transpose(1, 2, 0, 3, 4)

    ray_spec = pl.BlockSpec((1, 1, 3, ROWS, LANES),
                            lambda s, i, c, nch, lbc, cid: (s, i, 0, 0, 0),
                            memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((1, 1, 2, ROWS, LANES),
                            lambda s, i, c, nch, lbc, cid: (s, i, 0, 0, 0),
                            memory_space=pltpu.VMEM)
    if dma:
        pg_index = lambda s, i, c, nch, lbc, cid: (
            s, i // tpc,
            cid[s, i * n_chunks + jnp.minimum(c, nch[s, i] - 1)], 0, 0)
    else:
        pg_index = lambda s, i, c, nch, lbc, cid: (s, i // tpc, 0, 0, 0)
    pg_spec = pl.BlockSpec((1, 1, 1, cluster, 10), pg_index,
                           memory_space=pltpu.SMEM)
    out_sds = jax.ShapeDtypeStruct((S, gt, 2, ROWS, LANES), jnp.float32)

    pages, nch, lb_c, cids = jax.lax.optimization_barrier(
        (pages, nch, lb_c, cids))
    kernel = make_kernel(body, cluster, n_chunks, max_depth, cluster)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(S, gt, n_chunks),
        in_specs=[pg_spec, ray_spec],
        out_specs=[out_spec],
    )
    call = pl.pallas_call(kernel, grid_spec=grid_spec, out_shape=[out_sds])
    parts = []
    for g in range(groups):
        tl = slice(g * gt, (g + 1) * gt)
        parts.append(call(
            nch[:, tl], lb_c[:, tl].reshape(S, gt * n_chunks),
            cids[:, tl].reshape(S, gt * n_chunks),
            pages[:, g * gc:(g + 1) * gc], d3[:, tl])[0])
    out = jnp.concatenate(parts, axis=1)
    return out[:, :, 0].reshape(S, R)


def timed(fn, args, iters=20, name=""):
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
        print(f"T={T} cap={cap} backface={args.backface} "
              f"cluster={args.cluster or 128}", flush=True)

        S, R = 1, args.cams * HW
        cams, bw = args.cams, 32
        bh = tt.TILE // bw
        Hh = HW // args.res
        hb, wb = Hh // bh, args.res // bw

        def fwd(x):
            x = x.reshape(3, S, cams, hb, bh, wb, bw)
            return x.transpose(0, 1, 2, 3, 5, 4, 6).reshape(3, S, R)

        o_sq, d_sq = fwd(o_full), fwd(d_full)

        def run(body, dma):
            def f(o, d, eps):
                t = camsoup_exp(tris, o + eps, d, 20.0, cap, bw, HW,
                                args.backface, body=body, dma=dma)
                return t[0, 0]
            return f

        timed(run(True, True), (o_sq, d_sq), args.iters, "full (body+dma)")
        timed(run(False, True), (o_sq, d_sq), args.iters, "null-body (dma only)")
        timed(run(True, False), (o_sq, d_sq), args.iters, "null-dma (body, pinned pg)")
        timed(run(False, False), (o_sq, d_sq), args.iters, "null-both (floor)")


if __name__ == "__main__":
    main()
