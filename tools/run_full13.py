"""Full-horizon 13x13x5 big-board recipe (reference's second first-class
experiment: src/train_all_13.py:18-21 + src/train_worker.py:11-16 — 600M env
steps, minibatch 4096, entropy horizon 300M, per-family hyperparams).

Same config path as ``rl_selfplay_mnk_tpu.train_worker <arch> 13x13`` plus
the framework-side durability knobs a multi-hour run wants: a stable run
name, periodic orbax checkpoints, and ``--resume``.

    python tools/run_full13.py --arch resnet_b_s
    python tools/summarize_run.py runs/full13_resnet_b_s.jsonl \
        -o evidence/full13_summary.json
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

from rl_selfplay_mnk_tpu.train import get_default_config, train_mnk
from rl_selfplay_mnk_tpu.train_all import apply_family_hparams
from rl_selfplay_mnk_tpu.utils.metrics import MetricsLogger


def build_config(arch: str, total_steps: int = 600_000_000) -> dict:
    config = get_default_config()
    config["architecture_name"] = arch
    config["mnk"] = (13, 13, 5)
    config["total_environment_steps"] = total_steps
    config["entropy_coef_schedule"]["params"]["total_steps"] = 300_000_000
    config["batch_size"] = 4096
    apply_family_hparams(config, arch)
    return config


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--arch", default="resnet_b_s")
    ap.add_argument("--total-steps", type=int, default=600_000_000)
    ap.add_argument("--run-name", default=None)
    ap.add_argument("--checkpoint-interval", type=int, default=500)
    ap.add_argument("--resume", action="store_true")
    ap.add_argument(
        "--update-chunks", type=int, default=None,
        help="per-epoch update dispatch (tunnel ~90s execution deadline; "
        "bench.py auto-sets this for transformer archs)",
    )
    args = ap.parse_args()

    config = build_config(args.arch, args.total_steps)
    run_name = args.run_name or f"full13_{args.arch}"
    config["run_name"] = run_name
    config["checkpoint_interval"] = args.checkpoint_interval
    config["resume"] = args.resume
    if args.update_chunks is not None:
        config["update_chunks"] = args.update_chunks
    elif "transformer" in args.arch:
        config["update_chunks"] = config["ppo_epochs"]

    with MetricsLogger(
        project="mnk_b",
        run_name=run_name,
        config=config,
        group="final",
        tags=[args.arch, "13x13", "full_horizon"],
    ) as logger:
        train_mnk(config, logger)


if __name__ == "__main__":
    main()
