"""Observation visual check — render and save depth/color/semantic frames
plus the global debug view.

Counterpart of `/root/reference/debug/debug_obs.py` / `env_check.py`.
Usage: python examples/debug_obs.py [--scene garage_simple_l_medium]
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--scene", default="garage_simple_l_medium")
    p.add_argument("--out", default="/tmp/visfly_tpu_obs")
    args = p.parse_args()
    os.makedirs(args.out, exist_ok=True)

    from visfly_tpu.envs import NavigationEnv
    from visfly_tpu.utils.common import depth2rgb

    env = NavigationEnv(
        num_agent_per_scene=4, visual=True,
        scene_kwargs={"path": args.scene},
        sensor_kwargs=[
            {"sensor_type": "depth", "uuid": "depth", "resolution": [64, 64]},
            {"sensor_type": "color", "uuid": "color", "resolution": [64, 64]},
            {"sensor_type": "semantic", "uuid": "semantic", "resolution": [64, 64]},
        ],
        random_kwargs={"state_generator": {"class": "Uniform", "kwargs": [
            {"position": {"mean": [1.0, 0.0, 1.5], "half": [0.5, 2.0, 1.0]}}]}},
        dynamics_kwargs={"dt": 0.03, "ctrl_dt": 0.03},
    )
    state, obs = env.reset(jax.random.PRNGKey(0))
    hist = [np.asarray(state.dyn.pos)]
    step = jax.jit(env.step)
    for i in range(40):
        state, out = step(state, jnp.full((4, 4), 0.1))
        hist.append(np.asarray(state.dyn.pos))
    # raw sensor suite (the env's task observation may expose a subset)
    obs = env.sensor_observations(state)

    try:
        import imageio.v2 as imageio
    except Exception:
        print("imageio unavailable — printing stats only")
        imageio = None

    for agent in range(2):
        depth = np.asarray(obs["depth"][agent, 0])
        color = np.transpose(np.asarray(obs["color"][agent]), (1, 2, 0))
        sem = np.asarray(obs["semantic"][agent, 0])
        print(f"agent {agent}: depth [{depth.min():.2f}, {depth.max():.2f}] m, "
              f"color mean {color.mean():.0f}, semantic ids {np.unique(sem)}")
        if imageio:
            imageio.imwrite(f"{args.out}/a{agent}_depth.png", depth2rgb(depth))
            imageio.imwrite(f"{args.out}/a{agent}_color.png", color)
            imageio.imwrite(f"{args.out}/a{agent}_semantic.png",
                            (sem * 23 % 255).astype(np.uint8))

    img = env.render(state, traj_history=np.stack(hist), view="top",
                     resolution=[480, 640], trajectory=True, line_width=3.0)
    if imageio and img is not None:
        imageio.imwrite(f"{args.out}/global_top.png", img)
    print(f"frames written to {args.out}")


if __name__ == "__main__":
    main()
