"""CNN actor-critic (reference src/alg/architectures/cnn.py:7-110).

Body: stacked 3x3 same-padding Conv + BatchNorm + ReLU. NHWC layout so XLA
tiles the convs straight onto the MXU; bf16 compute with f32 params/stats.

BatchNorm semantics mirror torch: train-mode forwards normalize by batch
statistics and update running stats (momentum 0.1 torch == 0.9 flax);
eval-mode forwards (opponent/benchmark policies) use running averages.
"""

from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax.numpy as jnp

from .common import ActorCriticHeads, RELU_GAIN, orthogonal, to_nhwc


class CnnActorCritic(nn.Module):
    action_dim: int
    channels: Sequence[int] = (64, 64, 64)
    head_hidden: int = 256
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, obs: jnp.ndarray, train: bool = False):
        x = to_nhwc(obs, self.dtype)
        for ch in self.channels:
            x = nn.Conv(
                ch,
                (3, 3),
                padding="SAME",
                kernel_init=orthogonal(RELU_GAIN),
                dtype=self.dtype,
            )(x)
            x = nn.BatchNorm(
                use_running_average=not train,
                momentum=0.9,
                epsilon=1e-5,
                dtype=self.dtype,
            )(x)
            x = nn.relu(x)
        return ActorCriticHeads(
            action_dim=self.action_dim, hidden=self.head_hidden, dtype=self.dtype
        )(x)
