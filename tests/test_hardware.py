"""Hardware-config detection tests (the reference's CPU path raises a
TypeError — SURVEY.md §7 quirk 3; ours must actually work on CPU), plus
the full platform/dtype policy matrix (VERDICT.md round-1 item 10)."""

import jax
import jax.numpy as jnp
import pytest

from rl_selfplay_mnk_tpu.utils.hardware import (
    HardwareConfig,
    detect_hardware_config,
    resolve_platform_policy,
)


def test_detect_on_cpu():
    cfg = detect_hardware_config()
    assert cfg.platform == "cpu"
    assert cfg.num_devices >= 1
    assert cfg.compute_dtype == jnp.float32
    assert not cfg.is_accelerator


@pytest.mark.parametrize(
    "raw, platform, dtype, accel",
    [
        ("axon", "tpu", jnp.bfloat16, True),   # tunnel plugin alias
        ("tpu", "tpu", jnp.bfloat16, True),
        ("TPU", "tpu", jnp.bfloat16, True),    # case-insensitive
        ("gpu", "gpu", jnp.bfloat16, True),
        ("cuda", "gpu", jnp.bfloat16, True),
        ("rocm", "gpu", jnp.bfloat16, True),
        ("cpu", "cpu", jnp.float32, False),
        ("interpreter", "interpreter", jnp.float32, False),  # unknown -> f32
    ],
)
def test_platform_policy_matrix(raw, platform, dtype, accel):
    got_platform, got_dtype = resolve_platform_policy(raw)
    assert got_platform == platform
    assert got_dtype == dtype
    cfg = HardwareConfig(
        platform=got_platform, num_devices=1,
        compute_dtype=got_dtype, device_kind=raw,
    )
    assert cfg.is_accelerator == accel


def test_detect_uses_policy_for_tunnel_platform(monkeypatch):
    """detect_hardware_config must route through the policy (an 'axon'
    device is a real TPU: bf16, accelerator, device count preserved)."""

    class FakeDevice:
        platform = "axon"
        device_kind = "TPU v5 lite"

    monkeypatch.setattr(jax, "devices", lambda: [FakeDevice(), FakeDevice()])
    cfg = detect_hardware_config()
    assert cfg.platform == "tpu"
    assert cfg.compute_dtype == jnp.bfloat16
    assert cfg.num_devices == 2
    assert cfg.is_accelerator
    assert cfg.device_kind == "TPU v5 lite"
