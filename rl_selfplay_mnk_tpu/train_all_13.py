"""Batch experiment: all six budget architectures on the 13x13x5 board.

Parity with reference src/train_all_13.py:6-43: 700M env steps, entropy
horizon 300M, minibatch 4096, per-family lr/entropy settings.
"""

from __future__ import annotations

from .train import get_default_config, train_mnk
from .train_all import ARCHITECTURES, apply_family_hparams
from .utils.metrics import MetricsLogger


def main() -> None:
    for arch in ARCHITECTURES:
        config = get_default_config()
        config["architecture_name"] = arch
        config["mnk"] = (13, 13, 5)
        config["total_environment_steps"] = 700_000_000
        config["entropy_coef_schedule"]["params"]["total_steps"] = 300_000_000
        config["batch_size"] = 4096
        apply_family_hparams(config, arch)
        with MetricsLogger(
            project="mnk_b",
            run_name=f"run_{arch}_13x13",
            config=config,
            group="main_run_13x13_board",
            tags=[arch, "13x13"],
        ) as logger:
            train_mnk(config, logger)


if __name__ == "__main__":
    main()
