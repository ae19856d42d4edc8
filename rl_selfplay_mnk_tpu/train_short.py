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

    with MetricsLogger(
        project="mnk_b_sweeps", run_name=args.run_name, config=config
    ) as logger:
        train_mnk(config, logger)


if __name__ == "__main__":
    main()
