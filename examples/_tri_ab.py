"""Scratch A/B: old-soup vs camsoup kernel, strip vs square tiles, one process."""
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

CAMS, RES, HW, ITERS = 256, 64, 4096, 20
spec = {"sensor_type": "depth", "resolution": [RES, RES]}
pos, q = camera_batch(CAMS)
o_c, d_c, _ = camera_rays_components(spec, pos, q)
o_full = jnp.broadcast_to(o_c[:, :, None], (3, CAMS, HW)).reshape(3, 1, -1)
d_full = d_c.reshape(3, 1, -1)

lvl = int(sys.argv[1]) if len(sys.argv) > 1 else 3
v, f = load_garage(lvl)
packed = tt.pack_triangles(v, f)
tris = jnp.asarray(packed[None])
T = packed.shape[0]
cap = tt.default_tri_cap(T)


def blockify(x):
    xx = x.reshape(3, 1, CAMS, 2, 32, 2, 32)
    return xx.transpose(0, 1, 2, 3, 5, 4, 6).reshape(3, 1, -1)


def timed(name, fn, *args):
    def frame(carry, eps):
        t, hit, n, *_ = fn(*args, eps)
        return carry + t[0, 0] + n[0, 0, 0], None

    it = jax.jit(lambda epss: jax.lax.scan(frame, jnp.float32(0.0), epss)[0])
    epss = jnp.arange(1, ITERS + 1, dtype=jnp.float32) * 1e-4
    _ = np.asarray(it(epss))
    t0 = time.time()
    _ = np.asarray(it(epss + 0.05))
    dt = (time.time() - t0 - 0.030) / ITERS
    print(f"{name:28s}: {dt*1e3:7.2f} ms = {CAMS/dt:8,.0f} cam-fps",
          flush=True)


ob, db = blockify(o_full), blockify(d_full)
# 1. old soup, strips
timed("old-soup strips", lambda e: tt._tri_trace_pallas_soup(
    tris, o_full + e, d_full, 20.0, cap, RES))
# 2. old soup, square blocks
timed("old-soup blocks", lambda e: tt._tri_trace_pallas_soup(
    tris, ob + e, db, 20.0, cap, 32))
# 3. camsoup, strips
timed("camsoup strips", lambda e: tt._tri_trace_pallas_camsoup(
    tris, o_full + e, d_full, 20.0, cap, RES, HW))
# 4. camsoup, square blocks
timed("camsoup blocks", lambda e: tt._tri_trace_pallas_camsoup(
    tris, ob + e, db, 20.0, cap, 32, HW))
