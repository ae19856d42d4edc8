"""Weak-scaling benchmark over the device mesh (ROADMAP: real multi-chip
measurement).

Runs the full self-play PPO iteration (rollout + update) at a FIXED per-
device env count over growing 1-D env-axis meshes (1, 2, 4, ... devices)
and reports aggregate env-steps/s plus weak-scaling efficiency relative to
the 1-device point. On a pod slice this is the one command that produces
the BASELINE.md scaling-efficiency number (target: >=85% from 1 chip to N
hosts; north star 10M aggregate env-steps/s):

    python tools/scaling_bench.py                      # all local devices
    python tools/scaling_bench.py --envs-per-device 8192

In this dev environment (one tunneled chip) the harness still runs — it
just produces a single point. For a shape/correctness smoke on the virtual
CPU mesh (numbers meaningless, scaling law real):

    JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        python tools/scaling_bench.py --envs-per-device 16 --n-steps 8 \
        --batch-size-per-device 16 --iters 2 --warmup 1

Design notes: envs shard over the mesh with zero communication (the
rollout scan is batch-parallel); params/optimizer replicate and the update
is data-parallel, so the only collective is the gradient psum over ICI.
Every sweep point uses the SAME shuffle mode — "grouped" with shard-local
group permutations (alg/ppo.py PPOConfig docstring) — and the SAME
per-device minibatch (batch_size scales with the device count), so the only
thing varying between points is the device count (ADVICE.md round-1
findings 1 and 4). Weak scaling should therefore be near-linear; this
harness measures instead of assumes.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax
import optax


def run_point(
    n_devices: int,
    envs_per_device: int,
    n_steps: int,
    batch_per_device: int,
    iters: int,
    warmup: int,
    arch: str,
    update_chunks: int = 0,
) -> dict:
    from rl_selfplay_mnk_tpu.alg import PPOConfig, PPOLearner
    from rl_selfplay_mnk_tpu.alg.ppo import pick_group_size
    from rl_selfplay_mnk_tpu.env import EnvConfig
    from rl_selfplay_mnk_tpu.models.registry import (
        create_model_from_architecture,
        init_network,
        make_apply_fns,
    )
    from rl_selfplay_mnk_tpu.parallel import make_mesh
    from rl_selfplay_mnk_tpu.selfplay.policies import make_network_policy
    from rl_selfplay_mnk_tpu.utils.hardware import detect_hardware_config

    avail = len(jax.devices())
    if n_devices > avail:
        # make_mesh would silently truncate to the available devices and the
        # point would be mislabeled (ADVICE.md round-1 finding 2)
        raise ValueError(
            f"requested {n_devices} devices but only {avail} are available"
        )
    hw = detect_hardware_config()
    mesh = make_mesh(num_devices=n_devices)
    num_envs = envs_per_device * n_devices
    # Fixed per-device minibatch: SGD granularity (updates/iteration and
    # per-device minibatch rows) is identical at every point, so efficiency
    # measures communication/overhead only (ADVICE.md round-1 finding 4).
    batch_size = batch_per_device * n_devices

    env_cfg = EnvConfig(9, 9, 5)
    module, _ = create_model_from_architecture(
        arch, (2, 9, 9), 81, dtype=hw.compute_dtype
    )
    variables = init_network(module, (2, 9, 9), jax.random.PRNGKey(0))
    eval_apply, _ = make_apply_fns(module)
    policy_act = make_network_policy(eval_apply)

    if not update_chunks:
        # the monolithic multi-epoch transformer update exceeds the axon
        # tunnel's ~90s single-execution kill; mirror bench.py's auto-set
        # (ADVICE.md round-1 finding 3)
        update_chunks = 4 if "transformer" in arch else 1
    config = PPOConfig(
        env=env_cfg,
        num_envs=num_envs,
        n_steps=n_steps,
        batch_size=batch_size,
        ppo_epochs=4,
        # Same mode at EVERY point: grouped DMA-friendly shuffle whose group
        # permutation is shard-local for n_devices > 1 (no cross-shard
        # gathers), identical per-device behavior at d = 1.
        shuffle="grouped",
        shard_groups=n_devices,
        group_size=pick_group_size(batch_per_device),
        update_chunks=update_chunks,
    )
    optimizer = optax.flatten(
        optax.chain(
            optax.clip_by_global_norm(0.5),
            optax.adamw(5e-4, eps=1e-5, weight_decay=0.01),
        )
    )
    learner = PPOLearner(
        module, config, optimizer, variables, jax.random.PRNGKey(1), mesh=mesh
    )
    opponent = learner.variables

    for _ in range(warmup):
        learner.learn(policy_act, opponent, entropy_coef=0.01)

    steps_per_iter = num_envs * n_steps
    t0 = time.perf_counter()
    for _ in range(iters):
        m = learner.learn(policy_act, opponent, entropy_coef=0.01,
                          precise_timing=False)
    # learn() ends with a host metric fetch, so t1 is an honest boundary
    assert float(m.actor_loss) == float(m.actor_loss), "NaN actor loss"
    total = time.perf_counter() - t0

    return {
        "devices": n_devices,
        "num_envs": num_envs,
        "steps_per_sec": steps_per_iter * iters / total,
        "sec_per_iter": total / iters,
    }


def run_scaling(
    device_counts,
    envs_per_device: int,
    n_steps: int,
    batch_per_device: int,
    iters: int,
    warmup: int,
    arch: str,
    update_chunks: int = 0,
) -> list[dict]:
    points = []
    for d in device_counts:
        p = run_point(d, envs_per_device, n_steps, batch_per_device, iters,
                      warmup, arch, update_chunks)
        base = points[0] if points else p
        # weak scaling: per-device throughput retention vs the first point
        p["efficiency"] = (p["steps_per_sec"] / p["devices"]) / (
            base["steps_per_sec"] / base["devices"]
        )
        points.append(p)
        print(json.dumps({k: round(v, 4) if isinstance(v, float) else v
                          for k, v in p.items()}))
        sys.stdout.flush()
    return points


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--envs-per-device", type=int, default=8192)
    parser.add_argument("--n-steps", type=int, default=256)
    parser.add_argument(
        "--batch-size-per-device", type=int, default=8192,
        help="per-device minibatch rows; the global minibatch is this "
             "times the device count (fixed SGD granularity per device)")
    parser.add_argument("--iters", type=int, default=3)
    parser.add_argument("--warmup", type=int, default=1)
    parser.add_argument("--arch", default="resnet_b_s")
    parser.add_argument(
        "--update-chunks", type=int, default=0,
        help="epoch-chunked update dispatch (0 = auto: 4 for transformers)")
    parser.add_argument(
        "--devices", type=int, nargs="*", default=None,
        help="device counts to sweep (default: 1,2,4,... up to all)")
    args = parser.parse_args()

    avail = len(jax.devices())
    if args.devices:
        counts = args.devices
        bad = [d for d in counts if d > avail]
        if bad:
            parser.error(f"--devices {bad} exceeds the {avail} available devices")
    else:
        counts, d = [], 1
        while d <= avail:
            counts.append(d)
            d *= 2

    points = run_scaling(counts, args.envs_per_device, args.n_steps,
                         args.batch_size_per_device, args.iters, args.warmup,
                         args.arch, args.update_chunks)
    last = points[-1]
    print(json.dumps({
        "metric": "weak_scaling_efficiency",
        "value": round(last["efficiency"], 4),
        "unit": "fraction",
        "devices": last["devices"],
        "aggregate_steps_per_sec": round(last["steps_per_sec"], 1),
        "vs_north_star": round(last["steps_per_sec"] / 10_000_000.0, 4),
    }))


if __name__ == "__main__":
    main()
