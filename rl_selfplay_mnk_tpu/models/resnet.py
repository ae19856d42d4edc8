"""ResNet actor-critic (reference src/alg/architectures/resnet.py:8-115).

conv-in (3x3 Conv+BN+ReLU) followed by N residual blocks:
Conv-BN-ReLU-Conv-BN + identity skip, post-add ReLU (reference :16-21).
NHWC, bf16 compute / f32 params.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp

from .common import ActorCriticHeads, RELU_GAIN, orthogonal, to_nhwc


class ResidualBlock(nn.Module):
    channels: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool):
        def conv():
            return nn.Conv(
                self.channels,
                (3, 3),
                padding="SAME",
                kernel_init=orthogonal(RELU_GAIN),
                dtype=self.dtype,
            )

        def bn():
            return nn.BatchNorm(
                use_running_average=not train,
                momentum=0.9,
                epsilon=1e-5,
                dtype=self.dtype,
            )

        residual = x
        out = nn.relu(bn()(conv()(x)))
        out = bn()(conv()(out))
        return nn.relu(out + residual)


class ResNetActorCritic(nn.Module):
    action_dim: int
    channels: int = 64
    num_blocks: int = 4
    head_hidden: int = 256
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, obs: jnp.ndarray, train: bool = False):
        x = to_nhwc(obs, self.dtype)
        x = nn.Conv(
            self.channels,
            (3, 3),
            padding="SAME",
            kernel_init=orthogonal(RELU_GAIN),
            dtype=self.dtype,
        )(x)
        x = nn.BatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-5, dtype=self.dtype
        )(x)
        x = nn.relu(x)
        for _ in range(self.num_blocks):
            x = ResidualBlock(self.channels, dtype=self.dtype)(x, train)
        return ActorCriticHeads(
            action_dim=self.action_dim, hidden=self.head_hidden, dtype=self.dtype
        )(x)
