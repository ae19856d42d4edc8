"""BASELINE configs 1-4 as NAMED end-to-end experiments on the chip.

Round-4 VERDICT item 3: the driver's enumerated milestone configs
(/root/repo/BASELINE.json `configs`) had never been exercised as named
runs — config 3 (7x7x4 / 2048 envs / 10-agent weighted pool + validation)
appeared nowhere. This tool drives each of configs 1-4 for a bounded
number of iterations, records throughput and win/score rate vs a uniform
random policy, and writes the committed summary
``evidence/configs_matrix.json``. (Config 5 — 13x13 over >=2 hosts — is
executed for real by tests/test_multiprocess.py::
test_config5_shape_two_processes and by the full13 600M-horizon evidence.)

    python tools/configs_matrix.py                 # all four
    python tools/configs_matrix.py --only 3        # one config
    python tools/configs_matrix.py --iters-scale 0.1   # quick smoke
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

# Per-config recipes, verbatim from BASELINE.json `configs[0..3]`.
MATRIX = [
    {
        "config": 1,
        "baseline": "3x3x3 tic-tac-toe, 64 vector envs, tiny MLP policy, "
                    "PPO vs random opponent (CPU-runnable PR1 ref)",
        "run_name": "cfgmatrix_1_3x3_mlp",
        "mnk": (3, 3, 3),
        "num_envs": 64,
        "arch": "mlp_tiny",
        "mode": "vs_random",  # PPO against RandomPolicy, no pool
        "iters": 500,
    },
    {
        "config": 2,
        "baseline": "5x5x4 board, 512 envs, small conv policy, self-play "
                    "with 2-agent opponent pool",
        "run_name": "cfgmatrix_2_5x5_cnn",
        "mnk": (5, 5, 4),
        "num_envs": 512,
        "arch": "cnn_b_s",
        "mode": "train_mnk",
        "iters": 400,
        "overrides": {"opponent_pool": 2},
    },
    {
        "config": 3,
        "baseline": "7x7x4 board, 2048 envs, conv policy/value nets, full "
                    "10-agent weighted opponent pool + validation",
        "run_name": "cfgmatrix_3_7x7_resnet",
        "mnk": (7, 7, 4),
        "num_envs": 2048,
        "arch": "resnet_b_s",
        "mode": "train_mnk",
        "iters": 250,
        "overrides": {"opponent_pool": 10, "pool_weighted": True},
    },
    {
        "config": 4,
        "baseline": "9x9x5 Gomoku (default config), 8192 envs, full PPO + "
                    "pool + benchmark validation every 50 iters",
        "run_name": "cfgmatrix_4_9x9_default",
        "mnk": (9, 9, 5),
        "num_envs": 8192,
        "arch": "resnet_b_s",
        "mode": "train_mnk",
        "iters": 100,
        "overrides": {"validation_interval": 50},
    },
]


def run_vs_random(entry: dict, iters: int, seed: int) -> dict:
    """Config 1: PPO against a uniform-random opponent, no pool — the
    PR1 minimum slice (SURVEY.md §7), driven straight through PPOLearner."""
    import jax

    from rl_selfplay_mnk_tpu.train import create_learner, get_default_config
    from rl_selfplay_mnk_tpu.models.registry import make_apply_fns
    from rl_selfplay_mnk_tpu.selfplay.policies import (
        RandomPolicy,
        make_network_policy,
    )
    from rl_selfplay_mnk_tpu.selfplay.validation import validate
    from rl_selfplay_mnk_tpu.utils.hardware import detect_hardware_config

    config = get_default_config()
    config.update(
        mnk=entry["mnk"], num_envs=entry["num_envs"],
        architecture_name=entry["arch"], seed=seed,
        total_environment_steps=iters * entry["num_envs"] * config["n_steps"],
    )
    hw = detect_hardware_config()
    learner, module, env_cfg, _, _ = create_learner(config, hw, mesh=None)
    rp = RandomPolicy()

    t_first = time.perf_counter()
    m = learner.learn(rp.apply, rp.params, entropy_coef=config["entropy_coef"])
    compile_s = time.perf_counter() - t_first
    t0 = time.perf_counter()
    for _ in range(iters - 1):
        m = learner.learn(
            rp.apply, rp.params, entropy_coef=config["entropy_coef"]
        )
    # the learner's own fps accounting already forces scalar fetches per
    # iteration (TrainingMetrics); wall-clock over the post-compile span
    wall = time.perf_counter() - t0
    steps = (iters - 1) * entry["num_envs"] * config["n_steps"]

    eval_apply, _ = make_apply_fns(module)
    res = validate(
        env_cfg, make_network_policy(eval_apply), learner.variables,
        rp.apply, rp.params, 512, jax.random.PRNGKey(seed + 1),
    )
    return {
        "iterations": iters,
        "env_steps": iters * entry["num_envs"] * config["n_steps"],
        "steps_per_sec": round(steps / wall, 1),
        "compile_plus_first_iter_s": round(compile_s, 1),
        "win_rate_vs_random": round(
            res["validation/vs_benchmark/win_rate"], 4
        ),
        "score_rate_vs_random": round(
            res["validation/vs_benchmark/score_rate"], 4
        ),
        "final_mean_reward": round(float(m.mean_reward), 4),
    }


def run_train_mnk(entry: dict, iters: int, seed: int) -> dict:
    """Configs 2-4: the production host-loop driver end-to-end (pool,
    validation cadence, promotions, exports), then the final export scored
    vs random (sweep.evaluate_vs_random — cross-comparable outcome)."""
    import shutil

    from rl_selfplay_mnk_tpu.sweep import evaluate_vs_random
    from rl_selfplay_mnk_tpu.train import get_default_config, train_mnk
    from rl_selfplay_mnk_tpu.utils.metrics import MetricsLogger

    # Fresh named run: the metrics JSONL appends and evaluate_vs_random
    # picks the LATEST export, so leftovers from an earlier invocation
    # (e.g. an --iters-scale smoke) would contaminate fps/promotions/eval.
    for stale in (
        os.path.join("runs", f"{entry['run_name']}.jsonl"),
        os.path.join("models", entry["run_name"]),
        os.path.join("checkpoints", entry["run_name"]),
    ):
        if os.path.isdir(stale):
            shutil.rmtree(stale)
        elif os.path.exists(stale):
            os.remove(stale)

    config = get_default_config()
    config.update(
        mnk=entry["mnk"], num_envs=entry["num_envs"],
        architecture_name=entry["arch"], seed=seed,
        run_name=entry["run_name"],
        total_environment_steps=iters * entry["num_envs"] * config["n_steps"],
        **entry.get("overrides", {}),
    )
    t0 = time.perf_counter()
    with MetricsLogger(
        project="mnk_b", run_name=entry["run_name"], config=config,
        group="configs_matrix", use_wandb=False,
    ) as logger:
        train_mnk(config, logger)
    wall = time.perf_counter() - t0

    # throughput from the run's own fps stream (excludes compile: drop the
    # first 3 iterations), promotions from the validation records
    fps, promotions = [], 0
    with open(os.path.join("runs", f"{entry['run_name']}.jsonl")) as f:
        for line in f:
            rec = json.loads(line)
            if "training/fps" in rec:
                fps.append(rec["training/fps"])
            if rec.get("validation/new_benchmark_step"):
                promotions += 1
    fps = fps[3:] or fps
    out = {
        "iterations": iters,
        "env_steps": iters * entry["num_envs"] * config["n_steps"],
        "wall_s": round(wall, 1),
        "steps_per_sec": round(sum(fps) / len(fps), 1),
        "benchmark_promotions": promotions,
    }
    out.update(evaluate_vs_random(entry["run_name"], entry["mnk"], 512, seed))
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--only", type=int, default=None, help="run one config")
    ap.add_argument("--iters-scale", type=float, default=1.0)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--out", default="evidence/configs_matrix.json")
    args = ap.parse_args()

    results = []
    if os.path.exists(args.out):
        with open(args.out) as f:
            results = json.load(f).get("configs", [])
    for entry in MATRIX:
        if args.only is not None and entry["config"] != args.only:
            continue
        iters = max(2, int(entry["iters"] * args.iters_scale))
        print(f"=== config {entry['config']}: {entry['baseline']}", flush=True)
        runner = run_vs_random if entry["mode"] == "vs_random" else run_train_mnk
        res = {
            "config": entry["config"],
            "baseline": entry["baseline"],
            "run_name": entry["run_name"],
            "arch": entry["arch"],
            "iterations_requested": iters,
        }
        res.update(runner(entry, iters, args.seed))
        print(json.dumps(res), flush=True)
        results = [r for r in results if r["config"] != entry["config"]]
        results.append(res)
        results.sort(key=lambda r: r["config"])
        os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
        with open(args.out, "w") as f:
            json.dump({"seed": args.seed, "configs": results}, f, indent=1)
        print(f"updated {args.out}", flush=True)


if __name__ == "__main__":
    main()
