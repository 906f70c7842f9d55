"""Evaluation harness — roll a trained policy to episode completion and
record trajectories, figures and videos.

Counterpart of the reference ``TestBase``
(`/root/reference/utils/evaluate.py:28-253`): rollout until all agents are
done (auto-reset suppressed, the reference's ``is_test=True``), record
obs/state/action/collision per step, emit per-env trajectory figures and an
mp4 (+ per-sensor sub-videos) when matplotlib / imageio are available.
"""
from __future__ import annotations

import os
from typing import Callable, Dict, List, Optional

import jax
import numpy as np


class TestBase:
    def __init__(self, model, env=None, save_path: str = "./test_results",
                 name: str = "test"):
        self.model = model
        self.env = env if env is not None else model.env
        self.save_path = save_path
        self.name = name
        os.makedirs(save_path, exist_ok=True)

    def rollout(self, state, max_steps: int = 1024, key=None,
                render_every: int = 0, render_kwargs: Optional[dict] = None):
        """Step the deterministic policy until every agent is done
        (`evaluate.py:55-151`). Returns a record dict of stacked arrays.
        ``render_every > 0`` captures global debug-view frames
        (`SceneManager.render`) every k steps."""
        env = self.env
        key = jax.random.PRNGKey(0) if key is None else key
        env_state, obs = env.reset(key)
        step = jax.jit(lambda s, a: env.step(s, a, is_test=True))
        global_frames: List[np.ndarray] = []

        record: Dict[str, List] = {
            "position": [], "velocity": [], "reward": [], "done": [],
            "action": [], "collision_dis": [], "t": [],
        }
        sensor_frames: Dict[str, List] = {}
        all_done = np.zeros(env.num_envs, bool)
        returns = np.zeros(env.num_envs)
        lengths = np.zeros(env.num_envs, np.int32)
        success = np.zeros(env.num_envs, bool)

        # recurrent policies need their hidden state threaded + reset at
        # episode boundaries (TrainerMixin.evaluate hooks); plain policies
        # get a () carry and predict_step == predict
        carry = self.model.init_predict_carry(obs)

        for i in range(max_steps):
            action, carry = self.model.predict_step(state, obs, carry)
            env_state, out = step(env_state, action)
            obs = out.obs
            carry = self.model.mask_predict_carry(carry, out.done)
            done_now = np.asarray(out.done)
            active = ~all_done
            returns += np.asarray(out.reward) * active
            lengths += active.astype(np.int32)
            success |= np.asarray(out.info["is_success"]) & active

            record["position"].append(np.asarray(env_state.dyn.pos))
            record["velocity"].append(np.asarray(env_state.dyn.vel))
            record["reward"].append(np.asarray(out.reward))
            record["done"].append(done_now)
            record["action"].append(np.asarray(action))
            record["collision_dis"].append(np.asarray(env_state.collision.dis))
            record["t"].append(np.asarray(env_state.dyn.t))
            for k, v in obs.items():
                if np.asarray(v).ndim >= 3:  # image sensors
                    sensor_frames.setdefault(k, []).append(np.asarray(v))
            if render_every and i % render_every == 0 and env.scene is not None:
                traj = np.stack(record["position"])
                frame = env.render(env_state, traj_history=traj,
                                   trajectory=True, **(render_kwargs or {}))
                if frame is not None:
                    global_frames.append(frame)

            all_done |= done_now
            if all_done.all():
                break

        stats = {
            "episode_returns": returns,
            "episode_lengths": lengths,
            "success": success,
            "success_rate": float(success.mean()),
            "mean_return": float(returns.mean()),
            "mean_length": float(lengths.mean()),
        }
        arrays = {k: np.stack(v) for k, v in record.items()}
        if global_frames:
            sensor_frames["global"] = [f[None] for f in global_frames]
        return arrays, sensor_frames, stats

    def draw(self, arrays: Dict[str, np.ndarray]):
        """Per-env state figures (`evaluate.py:152-188`)."""
        try:
            import matplotlib

            matplotlib.use("Agg")
            import matplotlib.pyplot as plt

            from .figfashion import FigFon

            FigFon.set_fashion("IEEE")  # reference `evaluate.py:15`
        except Exception:
            return None
        pos = arrays["position"]  # (T, N, 3)
        fig, axes = plt.subplots(2, 2, figsize=(10, 8))
        axes[0, 0].plot(pos[:, :, 0], pos[:, :, 1], lw=0.8)
        axes[0, 0].set_title("xy trajectory")
        axes[0, 1].plot(pos[:, :, 2], lw=0.8)
        axes[0, 1].set_title("altitude")
        axes[1, 0].plot(np.linalg.norm(arrays["velocity"], axis=-1), lw=0.8)
        axes[1, 0].set_title("speed")
        axes[1, 1].plot(arrays["reward"], lw=0.8)
        axes[1, 1].set_title("reward")
        for ax in axes.flat:
            ax.grid(alpha=0.3)
        out = os.path.join(self.save_path, f"{self.name}_trajectories.png")
        fig.tight_layout()
        fig.savefig(out, dpi=120)
        plt.close(fig)
        return out

    def save_video(self, sensor_frames: Dict[str, np.ndarray], fps: int = 30):
        """Per-sensor videos (`evaluate.py:189-253`). Uses imageio/cv2 when
        available; silently skips otherwise."""
        from .common import depth2rgb

        paths = []
        for name, frames in sensor_frames.items():
            frames = np.stack(frames) if isinstance(frames, list) else frames
            # (T, N, C, H, W) sensors → first agent; (T, 1, H, W, 3) globals
            f0 = frames[:, 0]
            if f0.ndim == 4 and f0.shape[-1] == 3:  # global view, already HWC
                imgs = f0.astype(np.uint8)
            elif f0.shape[1] == 1:  # depth/semantic (T, 1, H, W)
                imgs = np.stack([depth2rgb(f[0]) for f in f0])
            else:
                imgs = np.transpose(f0, (0, 2, 3, 1)).astype(np.uint8)
            out = os.path.join(self.save_path, f"{self.name}_{name}.mp4")
            try:
                import imageio.v2 as imageio

                imageio.mimwrite(out, imgs, fps=fps)
                paths.append(out)
            except Exception:
                try:
                    import cv2

                    h, w = imgs.shape[1:3]
                    vw = cv2.VideoWriter(
                        out, cv2.VideoWriter_fourcc(*"mp4v"), fps, (w, h)
                    )
                    for img in imgs:
                        vw.write(img[..., ::-1])
                    vw.release()
                    paths.append(out)
                except Exception:
                    np.save(out.replace(".mp4", ".npy"), imgs)
                    paths.append(out.replace(".mp4", ".npy"))
        return paths

    def test(self, state=None, max_steps: int = 1024, is_render: bool = True,
             **_ignored):
        """Full evaluation flow (`evaluate.py:55-151` + figure/video export)."""
        arrays, sensor_frames, stats = self.rollout(state, max_steps)
        fig = self.draw(arrays) if is_render else None
        videos = self.save_video(sensor_frames) if (is_render and sensor_frames) else []
        print(
            f"[eval] success={stats['success_rate']:.2%} "
            f"return={stats['mean_return']:.2f} length={stats['mean_length']:.1f}"
            + (f" fig={fig}" if fig else "")
            + (f" videos={videos}" if videos else ""),
            flush=True,
        )
        return stats
