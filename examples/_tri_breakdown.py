"""Scratch: prepass vs kernel timing + executed-chunk stats for the soup path."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(__file__))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(__file__), "..", ".jax_cache"))

import visfly_tpu.render.tri_trace as tt
from tri_bench import camera_batch, load_garage
from visfly_tpu.render.camera import camera_rays_components

CAMS, RES = 256, 64
HW = RES * RES
spec = {"sensor_type": "depth", "resolution": [RES, RES]}
pos, q = camera_batch(CAMS)
o_c, d_c, _ = camera_rays_components(spec, pos, q)
o_full = jnp.broadcast_to(o_c[:, :, None], (3, CAMS, HW)).reshape(3, 1, -1)
d_full = d_c.reshape(3, 1, -1)


def sync(x):
    leaves = jax.tree.leaves(x)
    jax.block_until_ready(leaves)
    _ = np.asarray(leaves[0].reshape(-1)[:1])


for lvl in [3, 4]:
    v, f = load_garage(lvl)
    packed = tt.pack_triangles(v, f)
    tris = jnp.asarray(packed[None])
    T = packed.shape[0]
    cap = tt.default_tri_cap(T)

    pre = jax.jit(lambda tr, o, d, eps: tt._cluster_ids_prepass(
        tr, o + eps, d, 20.0, cap, RES)[:3])
    out = pre(tris, o_full, d_full, jnp.float32(0.0))
    sync(out)
    t0 = time.time()
    outs = [pre(tris, o_full, d_full, jnp.float32(1e-4 * (i + 1)))
            for i in range(10)]
    for o in outs:
        sync(o)
    dt_pre = (time.time() - t0) / 10

    cids, counts, lb_c = out
    c = np.asarray(counts)
    n_chunks = cids.shape[2]
    # chunks that would actually execute per tile given count-skip only
    nch = np.clip(c, 1, n_chunks)
    print(f"T={T}: prepass {dt_pre*1e3:7.2f} ms | n_chunks={n_chunks} "
          f"| visible clusters/tile mean={c.mean():.1f} p50={np.percentile(c,50):.0f} "
          f"p99={np.percentile(c,99):.0f} max={c.max()} "
          f"| capped mean={nch.mean():.1f} total_steps={nch.sum()}")
