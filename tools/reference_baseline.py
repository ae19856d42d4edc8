"""Same-hardware head-to-head: this framework vs the PyTorch reference, CPU.

The reference publishes no performance numbers and its CUDA path can't run
here, so the only like-for-like comparison available is CPU vs CPU on this
host: one full PPO training iteration (rollout n_steps + 4-epoch update) of
the 9x9x5 / resnet_b_s default workload at identical hyperparameters.

The reference's own CPU path crashes in detect_hardware_config (SURVEY.md
§7 quirk 3), so its HardwareConfig is constructed manually — the benchmark
otherwise drives the reference's unmodified PPOAgent/wrapper/env.

Usage:  python tools/reference_baseline.py [--num-envs 384] [--n-steps 64]
Prints a JSON line with both rates.
"""

import argparse
import copy
import json
import sys
import time

sys.path.insert(0, "/root/reference/src")
sys.path.insert(0, ".")


def bench_reference(num_envs: int, n_steps: int, iters: int) -> float:
    import torch

    from alg.ppo import PPOAgent
    from env.torch_vector_mnk_env import TorchVectorMnkEnv
    from selfplay.policy import NNPolicy
    from selfplay.torch_self_play_wrapper import TorchSelfPlayWrapper
    from utils.hardware import HardwareConfig
    from utils.model_export import create_model_from_architecture

    hw = HardwareConfig(
        device="cpu", dtype=torch.float32, use_scaler=False, compile_mode=None
    )
    env = TorchVectorMnkEnv(9, 9, 5, num_envs=num_envs, device="cpu")
    wrapper = TorchSelfPlayWrapper(env)
    network = create_model_from_architecture(
        "resnet_b_s", obs_shape=(2, 9, 9), action_dim=81
    )
    optimizer = torch.optim.AdamW(network.parameters(), lr=5e-4, eps=1e-5)
    agent = PPOAgent(
        (2, 9, 9),
        81,
        network,
        hw_config=hw,
        n_steps=n_steps,
        optimizer=optimizer,
        gamma=0.99,
        batch_size=min(8192, num_envs * n_steps),
        ppo_epochs=4,
        num_envs=num_envs,
        entropy_coef=0.04,
        clip_range=0.2,
    )
    wrapper.set_opponent(NNPolicy(copy.deepcopy(network)))

    agent.learn(wrapper)  # warmup
    t0 = time.perf_counter()
    for _ in range(iters):
        agent.learn(wrapper)
    dt = time.perf_counter() - t0
    return num_envs * n_steps * iters / dt


def bench_ours(num_envs: int, n_steps: int, iters: int) -> float:
    import jax

    jax.config.update("jax_platforms", "cpu")
    import optax

    from rl_selfplay_mnk_tpu.alg import PPOConfig, PPOLearner
    from rl_selfplay_mnk_tpu.env import EnvConfig
    from rl_selfplay_mnk_tpu.models.registry import (
        create_model_from_architecture,
        init_network,
        make_apply_fns,
    )
    from rl_selfplay_mnk_tpu.selfplay.policies import make_network_policy

    module, _ = create_model_from_architecture("resnet_b_s", (2, 9, 9), 81)
    variables = init_network(module, (2, 9, 9), jax.random.PRNGKey(0))
    eval_apply, _ = make_apply_fns(module)
    policy_act = make_network_policy(eval_apply)
    config = PPOConfig(
        env=EnvConfig(9, 9, 5),
        num_envs=num_envs,
        n_steps=n_steps,
        batch_size=min(8192, num_envs * n_steps),
        ppo_epochs=4,
    )
    optimizer = optax.flatten(
        optax.chain(
            optax.clip_by_global_norm(0.5),
            optax.adamw(5e-4, eps=1e-5, weight_decay=0.01),
        )
    )
    learner = PPOLearner(module, config, optimizer, variables, jax.random.PRNGKey(1))
    opponent = learner.variables

    learner.learn(policy_act, opponent, 0.04)  # warmup/compile
    t0 = time.perf_counter()
    for _ in range(iters):
        learner.learn(policy_act, opponent, 0.04, precise_timing=False)
    dt = time.perf_counter() - t0
    return num_envs * n_steps * iters / dt


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--num-envs", type=int, default=384)
    parser.add_argument("--n-steps", type=int, default=64)
    parser.add_argument("--iters", type=int, default=2)
    parser.add_argument("--skip-reference", action="store_true")
    args = parser.parse_args()

    ours = bench_ours(args.num_envs, args.n_steps, args.iters)
    print(f"# ours (jax cpu): {ours:.0f} env-steps/s", file=sys.stderr)
    ref = None
    if not args.skip_reference:
        ref = bench_reference(args.num_envs, args.n_steps, args.iters)
        print(f"# reference (torch cpu): {ref:.0f} env-steps/s", file=sys.stderr)
    print(
        json.dumps(
            {
                "metric": "cpu_env_steps_per_sec",
                "ours": round(ours, 1),
                "reference": round(ref, 1) if ref else None,
                "speedup": round(ours / ref, 2) if ref else None,
                "config": f"9x9x5 resnet_b_s {args.num_envs}x{args.n_steps}",
            }
        )
    )


if __name__ == "__main__":
    main()
