"""Throughput benchmark in the reference's three configurations.

Counterpart of `/root/reference/debug/FPS_test.py:13-155`:
 1. physics-only     (HoverEnv2-style,      1 scene × 200 agents)
 2. physics + depth  (NavigationEnv2-style, 64×64 depth)
 3. physics + depth + dynamic objects (DynEnv)
 4. (--mesh) physics + depth in an IMPORTED triangle-mesh scene — the
    reference's habitat-GLB-stage case (`SceneManager.py:893-929`), here a
    synthesized garage OBJ run through mesh→SDF→box-decomposition

Usage: python examples/fps_test.py [--agents 200] [--steps 500] [--mesh]
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(__file__), "..", ".jax_cache"))


def measure(env, steps, label):
    state, _ = env.reset(jax.random.PRNGKey(0))
    n = env.num_envs

    @jax.jit
    def chunk(state, key):
        def body(carry, _):
            state, key = carry
            key, k = jax.random.split(key)
            a = jax.random.uniform(k, (n, 4), minval=-0.3, maxval=0.3)
            state, out = env.step(state, a)
            probe = sum(jnp.sum(v.astype(jnp.float32)) for v in out.obs.values())
            return (state, key), probe
        (state, key), ps = jax.lax.scan(body, (state, key), None, length=50)
        return state, key, ps.sum()

    key = jax.random.PRNGKey(1)
    state, key, _ = chunk(state, key)  # compile
    jax.block_until_ready(state.dyn.pos)
    t0 = time.time()
    done = 0
    while done < steps:
        state, key, _ = chunk(state, key)
        done += 50
    jax.block_until_ready(state.dyn.pos)
    fps = n * done / (time.time() - t0)
    print(f"{label}: {fps:,.0f} agent-steps/s ({n} agents)")
    return fps


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--agents", type=int, default=200)
    p.add_argument("--steps", type=int, default=500)
    p.add_argument("--mesh", action="store_true",
                   help="also bench an imported triangle-mesh (OBJ) scene")
    p.add_argument("--scenes", type=int, default=1,
                   help="batch the depth benchmark over S differently-seeded "
                        "scenes (agents split across them) — the reference's "
                        "multi-scene SceneManager case")
    args = p.parse_args()

    from visfly_tpu.envs import DynEnv, HoverEnv, NavigationEnv2

    measure(
        HoverEnv(num_agent_per_scene=args.agents, visual=False,
                 dynamics_kwargs={"dt": 0.0025, "ctrl_dt": 0.02}),
        args.steps, "physics-only",
    )
    measure(
        NavigationEnv2(
            num_agent_per_scene=args.agents, visual=True,
            scene_kwargs={"path": "garage_simple_l_medium"},
            sensor_kwargs=[{"sensor_type": "depth", "uuid": "depth",
                            "resolution": [64, 64]}],
            dynamics_kwargs={"dt": 0.03, "ctrl_dt": 0.03},
        ),
        args.steps, "physics + 64×64 depth",
    )
    if args.scenes > 1:
        measure(
            NavigationEnv2(
                num_agent_per_scene=max(1, args.agents // args.scenes),
                num_scene=args.scenes, visual=True,
                scene_kwargs={"path": "garage_simple_l_medium"},
                sensor_kwargs=[{"sensor_type": "depth", "uuid": "depth",
                                "resolution": [64, 64]}],
                dynamics_kwargs={"dt": 0.03, "ctrl_dt": 0.03},
            ),
            args.steps,
            f"physics + 64×64 depth, {args.scenes} batched scenes",
        )
    # cluttered scene (same primitive load as the depth benchmark) so the
    # dynamic-object cost is measured against a realistic static-geometry
    # baseline, mirroring the reference DynEnv config (`FPS_test.py:121-155`)
    measure(
        DynEnv(
            num_agent_per_scene=args.agents, visual=True,
            scene_kwargs={
                "path": "garage_simple_l_medium",
                "obj_settings": [
                    {"name": "mover", "velocity": 1.5, "radius": 0.4,
                     "path": {"class": "circle",
                              "kwargs": {"radius": 2.0, "center": [1, 0, 1.5]}}},
                    {"name": "patrol", "velocity": 2.0, "radius": 0.3,
                     "path": {"class": "polygon",
                              "kwargs": {"points": [[0, 0, 1], [4, 0, 1], [4, 4, 1]]}}},
                ],
            },
            sensor_kwargs=[{"sensor_type": "depth", "uuid": "depth",
                            "resolution": [64, 64]}],
            random_kwargs={"state_generator": {"class": "Uniform", "kwargs": [
                {"position": {"mean": [1.0, 0.0, 1.5], "half": [0.5, 0.5, 0.3]}}]}},
            dynamics_kwargs={"dt": 0.03, "ctrl_dt": 0.03},
        ),
        args.steps, "physics + depth + dynamic objects",
    )
    if args.mesh:
        import tempfile

        from mesh_assets import make_garage_obj

        obj = make_garage_obj(
            os.path.join(tempfile.gettempdir(), "visfly_garage_bench.obj"))
        measure(
            NavigationEnv2(
                num_agent_per_scene=args.agents, visual=True,
                scene_kwargs={"path": obj, "sdf_spacing": 0.1, "margin": 0.5,
                              "max_prims": 48},
                sensor_kwargs=[{"sensor_type": "depth", "uuid": "depth",
                                "resolution": [64, 64]}],
                random_kwargs={"state_generator": {"class": "Uniform", "kwargs": [
                    {"position": {"mean": [8.0, 0.0, 1.5],
                                  "half": [4.0, 2.0, 1.0]}}]}},
                dynamics_kwargs={"dt": 0.03, "ctrl_dt": 0.03},
            ),
            args.steps, "physics + 64×64 depth, imported OBJ scene",
        )


if __name__ == "__main__":
    main()
