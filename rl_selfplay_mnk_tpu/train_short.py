"""Short sweep-target run: 80M env steps (reference src/train_short.py:6-16).

Hyperparameter overrides arrive via CLI flags (the reference relied on the
wandb sweep agent mutating the run config; without egress the sweep driver
is ``sweep.py``, which shells into this entry point).
"""

from __future__ import annotations

import argparse

from .train import get_default_config, train_mnk
from .utils.metrics import MetricsLogger


def main(argv=None) -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--learning_rate", type=float, default=None)
    parser.add_argument("--entropy_coef", type=float, default=None)
    parser.add_argument("--architecture_name", default=None)
    parser.add_argument("--seed", type=int, default=None)
    parser.add_argument("--run-name", default=None)
    # scale overrides (smoke tests / tiny-board sweeps); defaults keep the
    # reference's 80M-step sweep target
    parser.add_argument("--total-steps", type=int, default=None)
    parser.add_argument("--num-envs", type=int, default=None)
    parser.add_argument("--n-steps", type=int, default=None)
    parser.add_argument("--batch-size", type=int, default=None)
    parser.add_argument("--mnk", type=int, nargs=3, default=None)
    args = parser.parse_args(argv)

    config = get_default_config()
    config["total_environment_steps"] = 80_000_000
    config["entropy_coef_schedule"] = {
        "type": "linear",
        "params": {"final_coef": 0.001, "total_steps": 50_000_000},
    }
    config["lr_decay"] = False
    for key in ("learning_rate", "entropy_coef", "architecture_name", "seed"):
        val = getattr(args, key)
        if val is not None:
            config[key] = val
    if args.total_steps is not None:
        config["total_environment_steps"] = args.total_steps
    if args.num_envs is not None:
        config["num_envs"] = args.num_envs
    if args.n_steps is not None:
        config["n_steps"] = args.n_steps
    if args.batch_size is not None:
        config["batch_size"] = args.batch_size
    if args.mnk is not None:
        config["mnk"] = tuple(args.mnk)

    with MetricsLogger(
        project="mnk_b_sweeps", run_name=args.run_name, config=config
    ) as logger:
        train_mnk(config, logger)


if __name__ == "__main__":
    main()
