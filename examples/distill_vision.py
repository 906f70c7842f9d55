"""Privileged-teacher → vision-student distillation for navigation.

The standard recipe for deployable vision policies (teacher-student /
DAgger): a state-based teacher trained with analytic gradients in seconds
(it sees the privileged ``collision_vector``) supervises a depth-camera
student that sees only what a real drone would. The reference has no
counterpart — its manuscript trains vision policies directly — but this is
the workflow its users ask for, and on TPU the whole pipeline (teacher
training + DAgger rollouts + student regression) runs in minutes.

    python examples/distill_vision.py [--teacher saved/navigation2/BPTT_tpu2m_1]
                                      [--rounds 6] [--epochs 40]

Stages:
 1. load (or quickly train) the state-based BPTT teacher
 2. DAgger loop: roll out a mixture policy (student takes over gradually),
    labelling every visited depth observation with the teacher's action
 3. regress the student (depth+state+target → action) on the aggregate set
 4. evaluate the pure student
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np
import optax

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(__file__), "..", ".jax_cache"))


def teacher_obs(obs):
    """What the privileged teacher sees (no camera)."""
    return {"state": obs["state"], "collision_vector": obs["collision_vector"]}


def student_obs(obs):
    """What the deployable student sees (camera + proprioception only)."""
    return {"state": obs["state"], "depth": obs["depth"]}


def main():
    repo_root = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..")
    p = argparse.ArgumentParser()
    p.add_argument("--teacher",
                   default=os.path.join(repo_root, "saved", "navigation2",
                                        "BPTT_tpu2m_1"))
    p.add_argument("--rounds", type=int, default=6,
                   help="DAgger rounds (student takes over linearly)")
    p.add_argument("--steps", type=int, default=96,
                   help="env steps recorded per round")
    p.add_argument("--epochs", type=int, default=40,
                   help="regression epochs per round")
    p.add_argument("--agents", type=int, default=96)
    p.add_argument("--lr", type=float, default=3e-4)
    args = p.parse_args()

    from visfly_tpu.algos import BPTT
    from visfly_tpu.envs import NavigationEnv2
    from visfly_tpu.policies import Actor

    env = NavigationEnv2(
        num_agent_per_scene=args.agents, visual=True,
        scene_kwargs={"path": "garage_simple_l_medium"},
        sensor_kwargs=[{"sensor_type": "depth", "uuid": "depth",
                        "resolution": [64, 64]}],
        dynamics_kwargs={"dt": 0.03, "ctrl_dt": 0.03,
                         "action_type": "bodyrate"},
        max_episode_steps=256,
    )

    # -- 1. teacher ----------------------------------------------------------
    # the teacher's params must be built on ITS observation structure
    # (state + collision_vector, no camera) — init it on a sensor-free twin
    # of the env so the checkpoint's extractor shapes match
    teacher_env = NavigationEnv2(
        num_agent_per_scene=args.agents, visual=True, requires_grad=True,
        scene_kwargs={"path": "garage_simple_l_medium"},
        dynamics_kwargs={"dt": 0.03, "ctrl_dt": 0.03,
                         "action_type": "bodyrate"},
        max_episode_steps=256,
    )
    teacher = BPTT(teacher_env, horizon=32,
                   policy_kwargs={"latent_dim": (128, 128)})
    t_st = teacher.init(jax.random.PRNGKey(0))
    if os.path.exists(args.teacher) or os.path.exists(args.teacher + ".pkl"):
        t_st = teacher.load(t_st, args.teacher)
        print(f"teacher loaded from {args.teacher}", flush=True)
    else:
        print("no teacher checkpoint — training one (500k steps)…", flush=True)
        t_st = teacher.learn(500_000, state=t_st, log_interval=50)

    t_params = t_st.params

    # -- 2./3. DAgger + regression ------------------------------------------
    student = Actor(action_dim=env.action_size, latent_dim=(128, 128),
                    net_arch={"depth": {"cnn": 128},
                              "state": {"mlp": [128, 64]}})
    env_state, obs = env.reset(jax.random.PRNGKey(1))
    s_params = student.init(jax.random.PRNGKey(2), student_obs(obs),
                            deterministic=True)
    tx = optax.adam(args.lr)
    opt = tx.init(s_params)

    @jax.jit
    def collect(env_state, obs, s_params, beta, key):
        """Roll ``steps`` env steps under beta·teacher + (1-beta)·student
        (per-agent Bernoulli), recording (student_obs, teacher_action)."""
        def body(carry, k):
            env_state, obs = carry
            ta, _ = teacher.actor.apply(t_params, teacher_obs(obs),
                                        deterministic=True)
            sa, _ = student.apply(s_params, student_obs(obs),
                                  deterministic=True)
            pick_teacher = (jax.random.uniform(k, (ta.shape[0], 1)) < beta)
            act = jnp.where(pick_teacher, ta, sa)
            env_state, out = env.step(env_state, jnp.clip(act, -1, 1))
            return (env_state, out.obs), (student_obs(obs), ta)
        keys = jax.random.split(key, args.steps)
        (env_state, obs), (s_obs, t_act) = jax.lax.scan(
            body, (env_state, obs), keys)
        return env_state, obs, s_obs, t_act

    @jax.jit
    def train_epoch(s_params, opt, s_obs, t_act):
        """One full-batch regression step on the flattened aggregate set."""
        def loss_fn(p):
            pred, _ = student.apply(p, s_obs, deterministic=True)
            return jnp.mean((pred - t_act) ** 2)
        loss, g = jax.value_and_grad(loss_fn)(s_params)
        upd, opt = tx.update(g, opt, s_params)
        return optax.apply_updates(s_params, upd), opt, loss

    def flatten(tree):
        return jax.tree_util.tree_map(
            lambda x: x.reshape((-1,) + x.shape[2:]), tree)

    agg_obs, agg_act = None, None
    key = jax.random.PRNGKey(3)
    t0 = time.time()
    for r in range(args.rounds):
        beta = 1.0 - r / max(args.rounds - 1, 1)  # 1 → 0: student takes over
        key, k = jax.random.split(key)
        env_state, obs, s_obs, t_act = collect(env_state, obs, s_params,
                                               beta, k)
        s_obs, t_act = flatten(s_obs), t_act.reshape(-1, t_act.shape[-1])
        if agg_obs is None:
            agg_obs, agg_act = s_obs, t_act
        else:
            agg_obs = jax.tree_util.tree_map(
                lambda a, b: jnp.concatenate([a, b]), agg_obs, s_obs)
            agg_act = jnp.concatenate([agg_act, t_act])
        loss = float("nan")
        for _ in range(args.epochs):
            s_params, opt, loss = train_epoch(s_params, opt, agg_obs, agg_act)
        print(f"round {r}: beta={beta:.2f} dataset={agg_act.shape[0]} "
              f"loss={float(loss):.5f} t={time.time()-t0:.0f}s", flush=True)

    # -- 4. evaluate teacher and pure student on the SAME visual env --------
    from visfly_tpu.algos.common import TrainerMixin

    def make_eval(apply_fn):
        mixin = TrainerMixin()
        mixin.env = env
        mixin.predict = lambda st, obs: jnp.clip(apply_fn(obs), -1.0, 1.0)
        return mixin

    t_eval = make_eval(lambda obs: teacher.actor.apply(
        t_params, teacher_obs(obs), deterministic=True)[0])
    s_eval = make_eval(lambda obs: student.apply(
        s_params, student_obs(obs), deterministic=True)[0])
    print("teacher (privileged):",
          {k: round(float(v), 4)
           for k, v in t_eval.evaluate(None, max_steps=256).items()},
          flush=True)
    print("student (depth only):",
          {k: round(float(v), 4)
           for k, v in s_eval.evaluate(None, max_steps=256).items()},
          flush=True)


if __name__ == "__main__":
    main()
