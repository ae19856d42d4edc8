"""Single-run worker: ``python -m rl_selfplay_mnk_tpu.train_worker <arch> <board>``.

Parity with reference src/train_worker.py:7-45: positional (architecture,
board_size) where board_size "13x13" selects the 13x13x5 recipe (600M env
steps, entropy horizon 300M, minibatch 4096).
"""

from __future__ import annotations

import sys

from .train import get_default_config, train_mnk
from .train_all import apply_family_hparams
from .utils.metrics import MetricsLogger


def run_training(arch: str, board_size: str) -> None:
    config = get_default_config()
    config["architecture_name"] = arch

    if board_size == "13x13":
        config["mnk"] = (13, 13, 5)
        config["total_environment_steps"] = 600_000_000
        config["entropy_coef_schedule"]["params"]["total_steps"] = 300_000_000
        config["batch_size"] = 4096
    group_name = "final"

    apply_family_hparams(config, arch)

    with MetricsLogger(
        project="mnk_b",
        run_name=f"run_{arch}_{board_size}",
        config=config,
        group=group_name,
        tags=[arch, board_size, "final_final"],
    ) as logger:
        train_mnk(config, logger)


if __name__ == "__main__":
    if len(sys.argv) == 3:
        run_training(sys.argv[1], sys.argv[2])
    else:
        print("usage: python -m rl_selfplay_mnk_tpu.train_worker <arch> <board_size>")
