"""Hardware-config detection tests (the reference's CPU path raises a
TypeError — SURVEY.md §7 quirk 3; ours must actually work on CPU)."""

import jax.numpy as jnp

from rl_selfplay_mnk_tpu.utils.hardware import detect_hardware_config


def test_detect_on_cpu():
    cfg = detect_hardware_config()
    assert cfg.platform == "cpu"
    assert cfg.num_devices >= 1
    assert cfg.compute_dtype == jnp.float32
    assert not cfg.is_accelerator
