"""Experiment CLI — train or evaluate from YAML configs.

Counterpart of the reference runner (`/root/reference/exps/examples/run.py`):

    python -m visfly_tpu.run -t 1 -e cluttered_flight -a PPO [-c comment]
    python -m visfly_tpu.run -t 0 -e cluttered_flight -w <ckpt>

YAML configs live in ``visfly_tpu/exps/env_cfgs/<env>.yaml`` and
``visfly_tpu/exps/alg_cfgs/<env>/<ALG>.yaml``; ``eval_env`` inherits ``env``
via deep_merge (`utils/common.py:214-237` semantics).
"""
from __future__ import annotations

import argparse
import os
import sys

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)

from visfly_tpu.algos import ALGO_ALIASES
from visfly_tpu.envs import (
    ENV_ALIASES,
    LandingEnv,
    MultiNavigationEnv,
    NavigationEnv,
)
from visfly_tpu.utils.common import load_yaml_config, set_seed

# experiment-name → env class (reference `run.py:24-28`)
EXPERIMENT_ENVS = {
    "cluttered_flight": NavigationEnv,
    "crossing": MultiNavigationEnv,
    "landing": LandingEnv,
    **ENV_ALIASES,
}


def parse_args(default_env: str = "cluttered_flight"):
    parser = argparse.ArgumentParser(description="Run visfly_tpu experiments")
    parser.add_argument("--comment", "-c", type=str, default=None)
    parser.add_argument("--train", "-t", type=int, default=1)
    parser.add_argument("--algorithm", "-a", type=str, default="PPO")
    parser.add_argument("--env", "-e", type=str, default=default_env)
    parser.add_argument("--seed", "-s", type=int, default=42)
    parser.add_argument("--weight", "-w", type=str, default=None)
    parser.add_argument("--timesteps", "-n", type=int, default=None,
                        help="override learn.total_timesteps from the YAML")
    return parser


def main(default_env: str = "cluttered_flight") -> None:
    args = parse_args(default_env).parse_args()
    set_seed(args.seed)
    from visfly_tpu.utils.common import setup_compile_cache

    setup_compile_cache()

    base_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)), "exps")
    save_folder = os.path.join(os.getcwd(), "saved", args.env)
    os.makedirs(save_folder, exist_ok=True)

    env_config = load_yaml_config(
        os.path.join(base_dir, "env_cfgs", f"{args.env}.yaml")
    )
    alg_config = load_yaml_config(
        os.path.join(base_dir, "alg_cfgs", args.env, f"{args.algorithm}.yaml")
    )
    # algorithm YAMLs may carry env overrides (e.g. BPTT needs
    # requires_grad: true while PPO on the same env cfg must not pay for it)
    from visfly_tpu.utils.common import deep_merge

    for section in ("env", "eval_env"):
        if section in alg_config:
            env_config[section] = deep_merge(
                origin=env_config.get(section, {}),
                target=alg_config[section],
            )

    env_cls = EXPERIMENT_ENVS[args.env]
    # variant YAMLs resolve to their base algorithm: `-a PPO_tuned` loads
    # alg_cfgs/<env>/PPO_tuned.yaml but trains with the PPO class
    alg_name = args.algorithm.lower()
    alg_cls = ALGO_ALIASES[alg_name if alg_name in ALGO_ALIASES
                           else alg_name.split("_")[0]]

    if args.train:
        env = env_cls(**env_config["env"])
        model = alg_cls(
            env=env,
            seed=args.seed,
            comment=args.comment,
            save_path=save_folder,
            **alg_config.get("algorithm", {}),
        )
        state = model.init()
        if args.weight is not None:
            state = model.load(state, os.path.join(save_folder, args.weight))
        learn_kwargs = dict(alg_config.get("learn", {}))
        if args.timesteps is not None:
            learn_kwargs["total_timesteps"] = args.timesteps
        state = model.learn(state=state, **learn_kwargs)
        from visfly_tpu.utils.checkpoint import unique_path

        path = unique_path(save_folder, args.comment, type(model).__name__)
        model.save(state, path)
        print(f"model saved at {path}", flush=True)
        return

    if args.weight is None:
        raise ValueError("Testing requires --weight/-w.")

    eval_env = env_cls(**env_config["eval_env"])
    # train=False: keep the eval env exactly as configured (no requires_grad
    # flip / XLA-render forcing by the analytic-gradient trainers)
    model = alg_cls(env=eval_env, seed=args.seed, train=False,
                    **alg_config.get("algorithm", {}))
    state = model.init()
    state = model.load(state, os.path.join(save_folder, args.weight))

    from visfly_tpu.utils.evaluate import TestBase

    TestBase(model, eval_env,
             save_path=os.path.join(save_folder, "test"),
             name=args.weight).test(state=state, **alg_config.get("test", {}))


if __name__ == "__main__":
    main()
