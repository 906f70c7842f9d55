"""Sim-to-real dynamics alignment — replay real flight logs through the
simulator and compare trajectories.

Counterpart of `/root/reference/utils/PID_alignment.py` (which parses ROS
bags of real flights, replays the recorded actions through ``Dynamics`` and
overlays sim-vs-real trajectories for PID tuning). ROS is not a dependency
here: logs are plain CSV/NPZ with timestamped actions and ground-truth
states; the replay itself is one jitted scan.

Log format (CSV columns or NPZ arrays):
    t, a0..a3                      — normalized actions in [-1, 1]
    px, py, pz [, qw..qz, vx..vz]  — ground-truth state (optional except pos)
"""
from __future__ import annotations

import csv
import os
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..dynamics import (
    DroneConfig,
    full_state,
    init_state,
    make_drone_params,
    reset,
    step,
)


def load_flight_log(path: str) -> Dict[str, np.ndarray]:
    if path.endswith(".npz"):
        data = dict(np.load(path))
        return data
    rows = list(csv.DictReader(open(path)))
    keys = rows[0].keys()
    out = {k: np.asarray([float(r[k]) for r in rows], np.float32) for k in keys}
    return out


def replay_actions(
    actions: np.ndarray,  # (T, 4) normalized
    config: DroneConfig,
    init_pos: Optional[np.ndarray] = None,
    init_q: Optional[np.ndarray] = None,
    init_vel: Optional[np.ndarray] = None,
    init_omega: Optional[np.ndarray] = None,
) -> np.ndarray:
    """Replay a recorded action sequence through the dynamics; returns the
    (T, 22) full-state trajectory (`PID_alignment.py:30-77` flow)."""
    params = make_drone_params(config)
    st = init_state(config, params, 1)
    st = reset(
        config, params, st,
        pos=None if init_pos is None else jnp.asarray(init_pos).reshape(1, 3),
        ori=None if init_q is None else jnp.asarray(init_q).reshape(1, 4),
        vel=None if init_vel is None else jnp.asarray(init_vel).reshape(1, 3),
        ori_vel=None if init_omega is None else jnp.asarray(init_omega).reshape(1, 3),
    )

    @jax.jit
    def rollout(st, acts):
        def body(s, a):
            s = step(config, params, s, a[None])
            return s, full_state(s)[0]

        return jax.lax.scan(body, st, acts)

    _, traj = rollout(st, jnp.asarray(actions, jnp.float32))
    return np.asarray(traj)


def align(
    log: Dict[str, np.ndarray],
    config: DroneConfig,
    save_fig: Optional[str] = None,
) -> Dict[str, float]:
    """Replay a flight log and report per-axis position RMSE; optionally
    save the sim-vs-real overlay figure (the PID-tuning view)."""
    actions = np.stack([log[f"a{i}"] for i in range(4)], axis=-1)
    real_pos = np.stack([log["px"], log["py"], log["pz"]], axis=-1)
    init_q = (
        np.stack([log["qw"], log["qx"], log["qy"], log["qz"]], -1)[0]
        if "qw" in log else None
    )
    init_vel = (
        np.stack([log["vx"], log["vy"], log["vz"]], -1)[0] if "vx" in log else None
    )
    traj = replay_actions(actions, config, init_pos=real_pos[0],
                          init_q=init_q, init_vel=init_vel)
    sim_pos = traj[:, :3]
    n = min(len(sim_pos), len(real_pos))
    err = sim_pos[:n] - real_pos[:n]
    rmse = np.sqrt((err**2).mean(axis=0))

    if save_fig:
        try:
            import matplotlib

            matplotlib.use("Agg")
            import matplotlib.pyplot as plt

            from .figfashion import FigFon, colorsets

            FigFon.set_fashion("IEEE")
            _ = colorsets["Modern Scientific"]  # reference PID_alignment.py:27
            fig, axes = plt.subplots(3, 1, figsize=(9, 7), sharex=True)
            labels = "xyz"
            for i, ax in enumerate(axes):
                ax.plot(real_pos[:n, i], label="real", lw=1.2)
                ax.plot(sim_pos[:n, i], label="sim", lw=1.2, ls="--")
                ax.set_ylabel(labels[i])
                ax.grid(alpha=0.3)
            axes[0].legend()
            axes[0].set_title(
                "sim-vs-real replay  RMSE=["
                + ", ".join(f"{r:.3f}" for r in rmse) + "] m"
            )
            os.makedirs(os.path.dirname(os.path.abspath(save_fig)), exist_ok=True)
            fig.savefig(save_fig, dpi=120)
            plt.close(fig)
        except Exception:
            pass

    return {"rmse_x": float(rmse[0]), "rmse_y": float(rmse[1]),
            "rmse_z": float(rmse[2]), "rmse": float(np.linalg.norm(rmse))}
