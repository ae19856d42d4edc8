"""Batch experiment: train all six budget-tier architectures at 9x9x5.

Parity with reference src/train_all.py:6-39, including the per-family
hyperparameters (transformer lr 12e-4 / entropy 0.10 -> 0.01; resnet 8e-4 /
0.05; cnn 6e-4 / 0.04).
"""

from __future__ import annotations

from .train import get_default_config, train_mnk
from .utils.metrics import MetricsLogger

ARCHITECTURES = [
    "transformer_b_l",
    "transformer_b_s",
    "resnet_b_l",
    "resnet_b_s",
    "cnn_b_l",
    "cnn_b_s",
]


def apply_family_hparams(config: dict, arch: str) -> dict:
    """Per-family lr/entropy settings (reference train_all.py:19-30)."""
    if "transformer" in arch:
        config["entropy_coef_schedule"]["params"]["final_coef"] = 0.01
        config["entropy_coef"] = 0.10
        config["learning_rate"] = 12e-4
    elif "resnet" in arch:
        config["entropy_coef_schedule"]["params"]["final_coef"] = 0.001
        config["entropy_coef"] = 0.05
        config["learning_rate"] = 8e-4
    elif "cnn" in arch:
        config["entropy_coef_schedule"]["params"]["final_coef"] = 0.001
        config["entropy_coef"] = 0.04
        config["learning_rate"] = 6e-4
    return config


def main() -> None:
    for arch in ARCHITECTURES:
        config = get_default_config()
        config["architecture_name"] = arch
        apply_family_hparams(config, arch)
        with MetricsLogger(
            project="mnk_b",
            run_name=f"run4_{arch}",
            config=config,
            group="main_run2_small_board",
            tags=[arch, "main_experiment"],
        ) as logger:
            train_mnk(config, logger)


if __name__ == "__main__":
    main()
