"""End-to-end training in an IMPORTED triangle-mesh scene.

The reference trains inside habitat GLB stages; here a user OBJ/GLB imports
through the native C++ BVH → SDF-grid bake (`scene/mesh.py`), collision
queries run on the baked grid, and BPTT trains with analytic gradients.
Measured on 1× TPU v5e: 35.4% deterministic-eval success after 500k steps
(~72 s cold / ~12 s warm cache); the same recipe reaches 57% on the
procedural `garage_simple_l_medium` — the imported 24-pillar garage is the
denser task. (2M steps over-trains to ~23% at lr 1e-3 — stop at 500k or
decay.)

    python examples/train_imported_mesh.py [--obj path/to/scene.obj]
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.dirname(
                      os.path.abspath(__file__))), ".jax_cache"))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--obj", default=None, help="mesh file (default: the "
                   "generated 24-pillar garage OBJ)")
    p.add_argument("--timesteps", type=int, default=500_000)
    args = p.parse_args()

    from mesh_assets import make_garage_obj
    from visfly_tpu.algos import BPTT
    from visfly_tpu.envs import NavigationEnv2
    from visfly_tpu.utils.evaluate import TestBase

    obj = args.obj or make_garage_obj("/tmp/train_imported_garage.obj",
                                      n_pillars=24)
    kw = dict(
        num_agent_per_scene=96, visual=True, requires_grad=True,
        scene_kwargs={"path": obj, "backend": "grid", "sdf_spacing": 0.1,
                      "margin": 0.5},
        dynamics_kwargs={"dt": 0.03, "ctrl_dt": 0.03,
                         "action_type": "bodyrate", "ctrl_delay": True},
        max_episode_steps=256,
        target=[14.0, 0.0, 1.0],
    )
    env = NavigationEnv2(**kw)
    tr = BPTT(env, horizon=32, learning_rate=1e-3,
              policy_kwargs={"latent_dim": (128, 128)})
    st = tr.init(jax.random.PRNGKey(0))
    t0 = time.time()
    st = tr.learn(args.timesteps, state=st, log_interval=100)
    print(f"train wall {time.time() - t0:.0f}s", flush=True)
    tr.save(st, "saved/navigation2/BPTT_imported_mesh_1")

    ev = NavigationEnv2(**{**kw, "requires_grad": False,
                           "num_agent_per_scene": 48})
    TestBase(tr, ev, save_path="saved/navigation2/test",
             name="imported_mesh").test(state=st, max_steps=256)


if __name__ == "__main__":
    main()
