"""Exact-triangle rendering benchmark on dense stage meshes.

Reproduces the README dense-mesh rows: a subdivided garage OBJ at 360 /
5,760 / 23,040 / 92,160 triangles, 256 cameras at 64x64, one v5e. Reports
ms/frame-batch and cam-fps, plus a prepass-only timing so kernel vs cull
cost is visible. The reference rasterises ReplicaCAD-scale stages through
habitat's GL renderer (`/root/reference/utils/SceneManager.py:371-389`);
this measures the TPU-native exact path at the same workload.

Usage: python examples/tri_bench.py [--levels 0 2 3 4] [--cams 256]
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(__file__), "..", ".jax_cache"))

from mesh_assets import make_garage_obj  # noqa: E402


def subdivide(v, f, levels):
    """1:4 midpoint subdivision, `levels` times."""
    for _ in range(levels):
        tris = v[f.reshape(-1)].reshape(-1, 3, 3)
        a, b, c = tris[:, 0], tris[:, 1], tris[:, 2]
        ab, bc, ca = (a + b) / 2, (b + c) / 2, (c + a) / 2
        new = np.concatenate([
            np.stack([a, ab, ca], 1), np.stack([ab, b, bc], 1),
            np.stack([ca, bc, c], 1), np.stack([ab, bc, ca], 1)])
        v = new.reshape(-1, 3)
        f = np.arange(len(v), dtype=np.int32).reshape(-1, 3)
    return v, f


def load_garage(levels):
    import tempfile
    path = make_garage_obj(
        os.path.join(tempfile.gettempdir(), "tri_bench_garage.obj"),
        n_pillars=24)
    verts, faces = [], []
    with open(path) as fh:
        for line in fh:
            p = line.split()
            if not p:
                continue
            if p[0] == "v":
                verts.append([float(x) for x in p[1:4]])
            elif p[0] == "f":
                faces.append([int(x.split("/")[0]) - 1 for x in p[1:4]])
    v = np.asarray(verts, np.float32)
    f = np.asarray(faces, np.int32)
    return subdivide(v, f, levels)


def camera_batch(n, seed=0):
    from visfly_tpu.core import quaternion as quat
    rng = np.random.RandomState(seed)
    pos = np.stack([rng.uniform(2, 14, n), rng.uniform(-3, 3, n),
                    rng.uniform(0.8, 2.8, n)], -1).astype(np.float32)
    yaw = rng.uniform(-np.pi, np.pi, n).astype(np.float32)
    q = quat.from_euler(jnp.zeros(n), jnp.zeros(n), jnp.asarray(yaw))
    return jnp.asarray(pos), q


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--levels", type=int, nargs="+", default=[2, 3, 4])
    p.add_argument("--cams", type=int, default=256)
    p.add_argument("--res", type=int, default=64)
    p.add_argument("--iters", type=int, default=20)
    p.add_argument("--cap", type=int, default=0, help="override tri_cap")
    p.add_argument("--check", action="store_true",
                   help="verify exactness vs XLA brute force (slow)")
    p.add_argument("--cluster", type=int, default=0,
                   help="force the soup kernel block size")
    p.add_argument("--backface", action="store_true",
                   help="cull backfacing clusters (exact: closed mesh)")
    p.add_argument("--variant", choices=["mx", "merged", "scalar", "wl"],
                   default=None, help="force the dense camera kernel body")
    args = p.parse_args()

    from visfly_tpu.render.camera import camera_rays_components
    import visfly_tpu.render.tri_trace as tt
    if args.cluster:
        tt._SOUP_CLUSTER_OVERRIDE = args.cluster
    if args.variant:
        tt._CAMSOUP_VARIANT = args.variant
    from visfly_tpu.render.tri_trace import (default_tri_cap, pack_triangles,
                                             tri_trace_pallas, tri_trace_xla)

    spec = {"sensor_type": "depth", "resolution": [args.res, args.res]}
    pos, q = camera_batch(args.cams)
    o_c, d_c, _ = camera_rays_components(spec, pos, q)  # (3,N),(3,N,HW)
    HW = args.res * args.res
    o_full = jnp.broadcast_to(o_c[:, :, None],
                              (3, args.cams, HW)).reshape(3, 1, -1)
    d_full = d_c.reshape(3, 1, -1)

    for lvl in args.levels:
        v, f = load_garage(lvl)
        packed = pack_triangles(v, f)
        tris = jnp.asarray(packed[None])
        T = packed.shape[0]
        cap = args.cap or default_tri_cap(T)

        # iterate INSIDE one jit via lax.scan: the axon tunnel costs
        # ~30 ms fixed per dispatch (and memoizes identical calls —
        # same-input repeats report ~0 ms), so host-loop timing is
        # meaningless. Origins are jittered per scan step so XLA cannot
        # hoist the trace out of the loop; a scalar probe of each frame's
        # depth is carried out so no frame is dead code. This mirrors how
        # training consumes the renderer (frames inside a scanned rollout).
        def frame(carry, eps):
            t, hit, n, *_ = tri_trace_pallas(tris, o_full + eps, d_full,
                                         20.0, cap, args.res, cam_rays=HW,
                                         backface=args.backface)
            return carry + t[0, 0] + n[0, 0, 0], None

        iters = jax.jit(lambda epss: jax.lax.scan(
            frame, jnp.float32(0.0), epss)[0])
        epss = jnp.arange(1, args.iters + 1, dtype=jnp.float32) * 1e-4
        _ = np.asarray(iters(epss))  # warm up (compile)
        t0 = time.time()
        _ = np.asarray(iters(epss + 0.05))
        dt = (time.time() - t0 - 0.030) / args.iters  # subtract dispatch
        print(f"T={T:6d} cap={cap:6d}: {dt * 1e3:7.2f} ms/frame-batch = "
              f"{args.cams / dt:8,.0f} cam-fps "
              f"({args.cams * HW / dt / 1e6:.1f} Mray/s)")

        if args.check:
            # exactness on a subset of cameras (brute force is O(T*R))
            k = min(8, args.cams)
            o_s = o_full[:, :, :k * HW]
            d_s = d_full[:, :, :k * HW]
            t_p, hit_p, _ = fn(tris, o_s, d_s) if False else \
                tri_trace_pallas(tris, o_s, d_s, 20.0, cap, args.res)
            o_x = jnp.transpose(o_s, (1, 2, 0))
            d_x = jnp.transpose(d_s, (1, 2, 0))
            t_x, hit_x, _, *_ = tri_trace_xla(tris, o_x, d_x)
            bad_hit = int((np.asarray(hit_p) != np.asarray(hit_x)).sum())
            both = np.asarray(hit_p) & np.asarray(hit_x)
            derr = np.abs(np.asarray(t_p) - np.asarray(t_x))[both]
            print(f"   check ({k} cams): hit mismatches {bad_hit}"
                  f" / {k * HW}, depth err max "
                  f"{derr.max() if derr.size else 0:.2e}")


if __name__ == "__main__":
    main()
