"""Local random-search sweep driver.

The reference uses a wandb random-search sweep (sweep_config.yaml:1-13:
log-uniform lr 1e-5..2e-3, log-uniform entropy 0.001..0.2, arch in
{transformer_b_s, resnet_b_s, cnn_b_s}, program train_short). This image
has no egress, so the sweep loop runs locally with the same search space,
invoking the same short-run target in-process.

Usage:
    python -m rl_selfplay_mnk_tpu.sweep --trials 8 --seed 0
"""

from __future__ import annotations

import argparse
import math
import random

from .train_short import main as train_short_main

SEARCH_SPACE = {
    "learning_rate": ("log_uniform", 1e-5, 2e-3),
    "entropy_coef": ("log_uniform", 0.001, 0.2),
    "architecture_name": ("choice", ["transformer_b_s", "resnet_b_s", "cnn_b_s"]),
}


def sample_config(rng: random.Random) -> dict:
    out = {}
    for key, spec in SEARCH_SPACE.items():
        if spec[0] == "log_uniform":
            lo, hi = spec[1], spec[2]
            out[key] = math.exp(rng.uniform(math.log(lo), math.log(hi)))
        elif spec[0] == "choice":
            out[key] = rng.choice(spec[1])
    return out


def main(argv=None) -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--trials", type=int, default=8)
    parser.add_argument("--seed", type=int, default=0)
    # unknown flags pass through to the train_short target (scale overrides
    # for smoke tests / tiny-board sweeps)
    args, extra = parser.parse_known_args(argv)

    rng = random.Random(args.seed)
    for t in range(args.trials):
        trial = sample_config(rng)
        print(f"\n=== sweep trial {t}: {trial} ===")
        train_short_main(
            [
                "--learning_rate", str(trial["learning_rate"]),
                "--entropy_coef", str(trial["entropy_coef"]),
                "--architecture_name", trial["architecture_name"],
                "--seed", str(args.seed * 1000 + t),
                "--run-name", f"sweep_{args.seed}_{t}",
            ]
            + extra
        )


if __name__ == "__main__":
    main()
