"""Headline benchmark — env steps/sec at 64×64 depth rendering.

Mirrors the reference FPS harness (`/root/reference/debug/FPS_test.py:13-155`;
baseline: ~1e4 Hz at 64×64 on an RTX 4090, `readme.md:6`) on one TPU chip:
a cluttered-scene NavigationEnv with 256 agents rendering 64×64 depth every
step, stepped in jitted 32-step scan chunks. Secondary diagnostics (physics-
only FPS, BPTT update wall-clock) go to stderr; stdout carries exactly ONE
JSON line for the driver.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

BASELINE_FPS = 1e4


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def report_cache_state():
    """Cold-start honesty (stderr): warm-vs-cold cache and the expected
    wait — 5.5 s warm vs ~42 s compile, up to 449 s on a slow
    remote-compile lane (README "Cold-compile cost")."""
    import contextlib
    import io

    from visfly_tpu.utils.common import setup_compile_cache

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        setup_compile_cache()
    log(buf.getvalue().strip())


def rollout_fps(env, n_chunks=6, chunk=32, warmup=1):
    state, _ = env.reset(jax.random.PRNGKey(0))
    n = env.num_envs

    @jax.jit
    def run_chunk(state, key):
        def body(carry, _):
            state, key = carry
            key, k = jax.random.split(key)
            a = jax.random.uniform(k, (n, 4), minval=-0.3, maxval=0.3)
            state, out = env.step(state, a)
            # consume every observation so XLA cannot dead-code-eliminate the
            # renderer (a discarded out.obs would skip the whole render!)
            obs_sum = sum(jnp.sum(v.astype(jnp.float32)) for v in out.obs.values())
            return (state, key), out.reward.sum() + obs_sum * 1e-12

        (state, key), rs = jax.lax.scan(body, (state, key), None, length=chunk)
        return state, key, rs.sum()

    key = jax.random.PRNGKey(1)
    t_compile = time.time()
    state, key, _ = run_chunk(state, key)
    jax.block_until_ready(state.dyn.pos)
    log(f"  compile+first chunk: {time.time() - t_compile:.1f}s")
    for _ in range(warmup):
        state, key, _ = run_chunk(state, key)
    jax.block_until_ready(state.dyn.pos)
    t0 = time.time()
    for _ in range(n_chunks):
        state, key, _ = run_chunk(state, key)
    jax.block_until_ready(state.dyn.pos)
    dt = time.time() - t0
    return n * chunk * n_chunks / dt


def main():
    from visfly_tpu.algos import BPTT
    from visfly_tpu.envs import HoverEnv, NavigationEnv

    log(f"devices: {jax.devices()}")
    report_cache_state()

    # 1. headline: 256 agents, cluttered scene, 64×64 depth every step
    env = NavigationEnv(
        num_agent_per_scene=256,
        visual=True,
        scene_kwargs={"path": "garage_simple_l_medium", "trace_steps": 40},
        sensor_kwargs=[{"uuid": "depth", "sensor_type": "depth",
                        "resolution": [64, 64]}],
        random_kwargs={"state_generator": {"class": "Uniform", "kwargs": [
            {"position": {"mean": [1.0, 0.0, 1.5], "half": [0.5, 2.0, 1.0]}}]}},
        dynamics_kwargs={"dt": 0.03, "ctrl_dt": 0.03, "action_type": "bodyrate"},
        max_episode_steps=256,
    )
    depth_fps = rollout_fps(env)
    log(f"depth-render env steps/s (256 agents, 64×64): {depth_fps:.0f}")

    # 2. physics-only FPS (reference FPS_test config 1: 200 agents)
    env_phys = HoverEnv(
        num_agent_per_scene=200, visual=False,
        dynamics_kwargs={"dt": 0.0025, "ctrl_dt": 0.02, "action_type": "bodyrate"},
        max_episode_steps=500,
    )
    phys_fps = rollout_fps(env_phys, n_chunks=4, chunk=125)
    log(f"physics-only env steps/s (200 agents): {phys_fps:.0f}")

    # 3. fully-jit'd HoverEnv BPTT update wall-clock
    env_bptt = HoverEnv(
        num_agent_per_scene=128, visual=False, requires_grad=True,
        dynamics_kwargs={"dt": 0.03, "ctrl_dt": 0.03}, max_episode_steps=256,
    )
    trainer = BPTT(env_bptt, horizon=32)
    st = trainer.init(jax.random.PRNGKey(0))
    st, _ = trainer.update(st)  # compile
    jax.block_until_ready(st.params)
    t0 = time.time()
    reps = 5
    for _ in range(reps):
        st, m = trainer.update(st)
    jax.block_until_ready(st.params)
    bptt_ms = (time.time() - t0) / reps * 1e3
    log(f"BPTT update (128 agents × H=32): {bptt_ms:.1f} ms "
        f"({128 * 32 * reps / (time.time() - t0):.0f} steps/s)")

    print(json.dumps({
        "metric": "env_steps_per_sec_64x64_depth",
        "value": round(depth_fps, 1),
        "unit": "steps/s",
        "vs_baseline": round(depth_fps / BASELINE_FPS, 3),
    }))


if __name__ == "__main__":
    main()
