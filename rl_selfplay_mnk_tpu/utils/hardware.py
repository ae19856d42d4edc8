"""Hardware detection and precision policy.

Replaces the reference's CUDA capability probe
(src/utils/hardware.py:15-64: TF32/bf16 on Ampere+, fp16+GradScaler on
pre-Ampere, torch.compile gating — and a latent CPU-path TypeError). On
TPU the policy is one-line simple: bf16 compute + f32 params everywhere,
always jit. This module also actually works on CPU (SURVEY.md §7 quirk 3:
the reference does not).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any

import jax
import jax.numpy as jnp


@dataclass(frozen=True)
class HardwareConfig:
    platform: str  # "tpu" | "cpu" | "gpu"
    num_devices: int
    compute_dtype: Any
    device_kind: str

    @property
    def is_accelerator(self) -> bool:
        # explicit allowlist: an unknown platform gets the conservative
        # CPU policy (f32 compute, exact reference shuffle)
        return self.platform in ("tpu", "gpu")


def resolve_platform_policy(raw_platform: str):
    """(canonical platform, compute dtype) for a PJRT platform name.

    The full policy matrix (pinned by tests/test_hardware.py):
      axon -> tpu, bf16   (the remote-tunnel plugin's name for a TPU chip)
      tpu  -> tpu, bf16
      gpu/cuda/rocm -> gpu, bf16
      cpu / anything else -> cpu-style f32 (params are f32 everywhere; this
      is the COMPUTE dtype — reference AMP autocast equivalent)
    """
    platform = raw_platform.lower()
    if platform in ("tpu", "axon"):
        platform = "tpu"
    elif platform in ("gpu", "cuda", "rocm"):
        platform = "gpu"
    compute_dtype = jnp.bfloat16 if platform in ("tpu", "gpu") else jnp.float32
    return platform, compute_dtype


def detect_hardware_config() -> HardwareConfig:
    devices = jax.devices()
    platform, compute_dtype = resolve_platform_policy(devices[0].platform)
    cfg = HardwareConfig(
        platform=platform,
        num_devices=len(devices),
        compute_dtype=compute_dtype,
        device_kind=devices[0].device_kind,
    )
    print(
        f"Hardware: {cfg.num_devices}x {cfg.device_kind} ({cfg.platform}), "
        f"compute dtype {jnp.dtype(compute_dtype).name}"
    )
    return cfg
