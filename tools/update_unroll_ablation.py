"""Measure the update-phase scan-unroll variants at bench shape.

Round-4 VERDICT item 6: the 7.06 s bench-shape update sits ~12% above the
6.3 s conv shape floor; the on-chip trace attributes ~5% to loop-carry
copies from XLA's conservative scan buffer assignment (PERFORMANCE.md
"Profile-guided attribution"). PPOConfig.epoch_unroll / mb_unroll change
exactly that program structure (same math — tests/test_ppo.py
unroll-equivalence). This tool measures whether any variant recovers the
slack, writing evidence/update_unroll_ablation.json either way (claim or
retire).

    python tools/update_unroll_ablation.py [--arch resnet_b_s] [--iters 3]
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import optax

VARIANTS = [
    {"name": "baseline"},
    {"name": "epoch_unroll", "epoch_unroll": True},
    {"name": "mb_unroll2", "mb_unroll": 2},
    {"name": "epoch_unroll+mb2", "epoch_unroll": True, "mb_unroll": 2},
]


def measure(arch: str, num_envs: int, iters: int, cfg_over: dict) -> dict:
    from rl_selfplay_mnk_tpu.alg import PPOConfig, PPOLearner
    from rl_selfplay_mnk_tpu.alg.ppo import pick_group_size
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
    config = PPOConfig(
        env=env_cfg,
        num_envs=num_envs,
        n_steps=256,
        batch_size=8192,
        ppo_epochs=4,
        shuffle="grouped" if hw.is_accelerator else "global",
        group_size=pick_group_size(8192),
        **cfg_over,
    )
    optimizer = optax.flatten(
        optax.chain(
            optax.clip_by_global_norm(0.5),
            optax.adamw(5e-4, eps=1e-5, weight_decay=0.01),
        )
    )
    learner = PPOLearner(
        module, config, optimizer, variables, jax.random.PRNGKey(1)
    )
    opponent = learner.variables

    t0 = time.perf_counter()
    learner.learn(policy_act, opponent, entropy_coef=0.01)  # compile + warm
    compile_s = time.perf_counter() - t0
    rollout_t, learn_t, total_t = [], [], []
    for _ in range(iters):
        t0 = time.perf_counter()
        m = learner.learn(policy_act, opponent, entropy_coef=0.01)
        # learn() already forces scalar fetches (TrainingMetrics floats),
        # so perf_counter here bounds one full dispatched+fetched iteration
        total_t.append(time.perf_counter() - t0)
        rollout_t.append(m.rollout_time)
        learn_t.append(m.learn_time)
    return {
        "compile_plus_first_iter_s": round(compile_s, 2),
        "rollout_s": round(statistics.median(rollout_t), 3),
        "update_s": round(statistics.median(learn_t), 3),
        "iteration_s": round(statistics.median(total_t), 3),
        "env_steps_per_sec": round(
            num_envs * 256 / statistics.median(total_t), 0
        ),
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--arch", default="resnet_b_s")
    ap.add_argument("--num-envs", type=int, default=8192)
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument("--out", default="evidence/update_unroll_ablation.json")
    args = ap.parse_args()

    results = []
    for v in VARIANTS:
        cfg = {k: x for k, x in v.items() if k != "name"}
        print(f"=== {v['name']} ({cfg})", flush=True)
        r = {"variant": v["name"], **measure(
            args.arch, args.num_envs, args.iters, cfg
        )}
        print(json.dumps(r), flush=True)
        results.append(r)
        os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
        with open(args.out, "w") as f:
            json.dump(
                {"arch": args.arch, "num_envs": args.num_envs,
                 "variants": results},
                f, indent=1,
            )
    base = results[0]["update_s"]
    for r in results[1:]:
        print(
            f"{r['variant']}: update {r['update_s']}s vs baseline {base}s "
            f"({(base - r['update_s']) / base:+.1%})"
        )


if __name__ == "__main__":
    main()
