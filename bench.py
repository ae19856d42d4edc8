"""Headline benchmark: env-steps/s for 9x9x5 self-play PPO (one chip).

Measures the full training iteration (self-play rollout + PPO update) on
the reference's default workload — 9x9x5 board, resnet_b_s — at a
TPU-appropriate env count, and prints ONE JSON line:

    {"metric": "env_steps_per_sec", "value": N, "unit": "steps/s",
     "vs_baseline": N / 10_000_000}

``vs_baseline`` is the fraction of the BASELINE.json north star (10M
aggregate env-steps/s). The reference publishes no numbers of its own
(BASELINE.md), so the north star is the comparison point.
"""

import argparse
import json
import sys
import time

import jax
import jax.numpy as jnp
import optax


def run_bench(num_envs: int, n_steps: int, iters: int, warmup: int, arch: str):
    from rl_selfplay_mnk_tpu.alg import PPOConfig, PPOLearner
    from rl_selfplay_mnk_tpu.env import EnvConfig
    from rl_selfplay_mnk_tpu.models.registry import (
        create_model_from_architecture,
        init_network,
        make_apply_fns,
    )
    from rl_selfplay_mnk_tpu.selfplay.policies import make_network_policy
    from rl_selfplay_mnk_tpu.utils.hardware import detect_hardware_config

    hw = detect_hardware_config()
    env_cfg = EnvConfig(9, 9, 5)
    module, _ = create_model_from_architecture(
        arch, (2, 9, 9), 81, dtype=hw.compute_dtype
    )
    variables = init_network(module, (2, 9, 9), jax.random.PRNGKey(0))
    eval_apply, _ = make_apply_fns(module)
    policy_act = make_network_policy(eval_apply)

    from rl_selfplay_mnk_tpu.alg.ppo import pick_group_size

    config = PPOConfig(
        env=env_cfg,
        num_envs=num_envs,
        n_steps=n_steps,
        batch_size=8192,
        ppo_epochs=4,
        shuffle="grouped" if hw.is_accelerator else "global",
        group_size=pick_group_size(8192),
    )
    optimizer = optax.flatten(
        optax.chain(
            optax.clip_by_global_norm(0.5),
            optax.adamw(5e-4, eps=1e-5, weight_decay=0.01),
        )
    )
    learner = PPOLearner(module, config, optimizer, variables, jax.random.PRNGKey(1))

    # Self-play vs a snapshot of the network — the 85% branch of the
    # reference's opponent schedule, i.e. the steady-state workload.
    opponent = learner.variables

    for _ in range(warmup):
        learner.learn(policy_act, opponent, entropy_coef=0.01)

    steps_per_iter = num_envs * n_steps
    t0 = time.perf_counter()
    rollout_t = 0.0
    learn_t = 0.0
    for _ in range(iters):
        m = learner.learn(policy_act, opponent, entropy_coef=0.01)
        rollout_t += m.rollout_time
        learn_t += m.learn_time
    total = time.perf_counter() - t0

    throughput = steps_per_iter * iters / total
    rollout_fps = steps_per_iter * iters / rollout_t if rollout_t else 0.0
    return {
        "throughput": throughput,
        "rollout_fps": rollout_fps,
        "rollout_time_per_iter": rollout_t / iters,
        "learn_time_per_iter": learn_t / iters,
        "steps_per_iter": steps_per_iter,
    }


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--num-envs", type=int, default=8192)
    parser.add_argument("--n-steps", type=int, default=256)
    parser.add_argument("--iters", type=int, default=3)
    parser.add_argument("--warmup", type=int, default=1)
    parser.add_argument("--arch", default="resnet_b_s")
    args = parser.parse_args()

    res = run_bench(args.num_envs, args.n_steps, args.iters, args.warmup, args.arch)
    print(
        f"# rollout fps {res['rollout_fps']:.0f} | "
        f"rollout {res['rollout_time_per_iter']:.3f}s | "
        f"learn {res['learn_time_per_iter']:.3f}s per iter "
        f"({res['steps_per_iter']} steps)",
        file=sys.stderr,
    )
    print(
        json.dumps(
            {
                "metric": "env_steps_per_sec",
                "value": round(res["throughput"], 1),
                "unit": "steps/s",
                "vs_baseline": round(res["throughput"] / 10_000_000, 4),
            }
        )
    )


if __name__ == "__main__":
    main()
