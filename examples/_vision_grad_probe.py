"""Scratch probe: per-reward-term BPTT gradient norms on cluttered_flight.

Diagnoses the from-scratch vision-BPTT plateau (README: 8.3%): for each
reward term, the norm of d(-sum_t gamma^t term_t)/d(policy params) over an
H-step differentiable rollout, with the collision query gradient-free
(reference parity) vs differentiable (grad_collision=True). Run directly
on the v5e. Not part of the package.
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from visfly_tpu.utils.common import setup_compile_cache

setup_compile_cache()

H = 16
N = 16
TERMS = ["approach", "view", "upright", "vel", "omega", "col_dis",
         "col_closing", "success"]


def probe(grad_collision: bool, updates: int = 0):
    from visfly_tpu.algos import BPTT
    from visfly_tpu.envs import NavigationEnv

    env = NavigationEnv(
        num_agent_per_scene=N, visual=True, requires_grad=True,
        indiv_reward=True, grad_collision=grad_collision,
        scene_kwargs={"path": "garage_simple_l_medium"},
        sensor_kwargs=[{"uuid": "depth", "sensor_type": "depth",
                        "resolution": [64, 64]}],
        random_kwargs={"state_generator": {"class": "Uniform", "kwargs": [
            {"position": {"mean": [1.0, 0.0, 1.5], "half": [0.5, 2.0, 1.0]}}]}},
        dynamics_kwargs={"dt": 0.03, "ctrl_dt": 0.03,
                         "action_type": "bodyrate"},
        max_episode_steps=256,
    )
    tr = BPTT(env, horizon=H, learning_rate=5e-4,
              policy_kwargs={"latent_dim": (128, 128),
                             "net_arch": {"depth": {"cnn": 128},
                                          "state": {"mlp": [128, 64]},
                                          "target": {"mlp": [64]}}})
    st = tr.init(jax.random.PRNGKey(0))
    for _ in range(updates):  # optionally probe a partially-trained policy
        st, _ = tr.update(st)

    def term_loss(params, env_state, obs, key, w):
        def body(carry, _):
            env_state, obs, discount, key, loss = carry
            key, k_act = jax.random.split(key)
            action, _ = tr.actor.apply(params, obs, k_act)
            action = jnp.clip(action, -1.0, 1.0)
            env_state, out = env.step(env_state, action)
            done = out.done.astype(loss.dtype)
            term_vec = jnp.stack(
                [out.info[f"extra_{k}"] for k in TERMS])  # (T, N)
            loss = loss - (w @ term_vec) * discount
            discount = discount * 0.99 * (1.0 - done) + done
            return (env_state, out.obs, discount, key, loss), None

        from jax.ad_checkpoint import checkpoint

        body = checkpoint(
            body, prevent_cse=False,
            policy=jax.checkpoint_policies.save_only_these_names(
                "pallas_render"))
        init = (env_state, obs, jnp.ones(N), key, jnp.zeros(N))
        (state, obs, _, _, loss), _ = jax.lax.scan(body, init, None,
                                                   length=H)
        return loss.mean()

    gfn = jax.jit(jax.grad(term_loss))
    out, grads = {}, {}
    for i, name in enumerate(TERMS + ["TOTAL"]):
        w = (jnp.ones(len(TERMS)) if name == "TOTAL"
             else jnp.zeros(len(TERMS)).at[i].set(1.0))
        g = gfn(st.params, st.env_state, st.obs, st.key, w)
        flat = jnp.concatenate([x.ravel() for x in jax.tree.leaves(g)])
        grads[name] = flat
        out[name] = float(jnp.linalg.norm(flat))
    # direction conflict: cosine of each collision term vs the rest of
    # the objective (does the restored gradient fight the approach pull?)
    rest = grads["approach"] + grads["view"] + grads["vel"] + grads["omega"]
    for name in ("col_dis", "col_closing"):
        denom = out[name] * float(jnp.linalg.norm(rest))
        out[f"cos({name},task)"] = (
            float(grads[name] @ rest) / denom if denom > 0 else float("nan"))
    return out


if __name__ == "__main__":
    ups = int(sys.argv[1]) if len(sys.argv) > 1 else 0
    for flag in (False, True):
        t0 = time.time()
        norms = probe(flag, ups)
        print(f"grad_collision={flag} (after {ups} updates, "
              f"{time.time()-t0:.0f}s):", flush=True)
        for k, v in norms.items():
            print(f"  {k:12s} |grad| = {v:.3e}", flush=True)
