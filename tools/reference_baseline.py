"""Measured reference baseline: the PyTorch reference's throughput on this
machine, driven through its own unmodified PPOAgent/wrapper/env.

The reference publishes no performance numbers (BASELINE.md) and has no
CUDA device here, so its best available number is the torch-CPU path. Its
own CPU bootstrap crashes in detect_hardware_config (SURVEY.md §7 quirk 3),
so the HardwareConfig is constructed manually; everything else is the
reference's code.

Measured on this host (2026-08-17):
  reference torch-CPU, 9x9x5 resnet_b_s, 384 envs x 64 steps: ~273 env-steps/s
  this framework, same workload, the TPU the reference cannot use: ~219,000
  (and ~270,000 at 8192 envs — see PERFORMANCE.md)

``--ours-cpu`` also times this framework on CPU for completeness; note
XLA-CPU convolution *gradients* are orders of magnitude slower than torch's
MKL path, so CPU-vs-CPU chiefly measures that backend gap, not the design
(the compute path here is built for TPU).

Usage:  python tools/reference_baseline.py [--num-envs 384] [--n-steps 64]
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
    parser.add_argument("--ours-cpu", action="store_true")
    args = parser.parse_args()

    ref = bench_reference(args.num_envs, args.n_steps, args.iters)
    print(f"# reference (torch cpu): {ref:.0f} env-steps/s", file=sys.stderr)
    ours = None
    if args.ours_cpu:
        ours = bench_ours(args.num_envs, args.n_steps, args.iters)
        print(f"# ours (jax cpu): {ours:.0f} env-steps/s", file=sys.stderr)
    print(
        json.dumps(
            {
                "metric": "reference_cpu_env_steps_per_sec",
                "reference": round(ref, 1),
                "ours_cpu": round(ours, 1) if ours else None,
                "config": f"9x9x5 resnet_b_s {args.num_envs}x{args.n_steps}",
            }
        )
    )


if __name__ == "__main__":
    main()
