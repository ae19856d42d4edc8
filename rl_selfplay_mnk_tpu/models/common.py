"""Shared actor-critic head stack and initialization policy.

Every reference network shares the same two heads (reference
src/alg/architectures/cnn.py:34-55, resnet.py:44-65, transformer.py:29-50):

  policy: 1x1 conv -> 2 planes -> flatten -> LN -> ReLU -> Dense(hidden)
          -> LN -> ReLU -> Dense(action_dim)
  value:  1x1 conv -> 1 plane  -> flatten -> LN -> ReLU -> Dense(hidden)
          -> LN -> ReLU -> Dense(1) -> Tanh   (bounded to [-1,1], matching
          zero-sum returns)

and the same init policy (reference src/alg/weight_init.py:16-66):
orthogonal(relu gain) on conv/linear with zero bias, ones/zeros on norms,
then the LAST linear overwritten with gain 0.01 (actor) / 1.0 (critic).

TPU notes: a 1x1 conv is a Dense over the trailing channel axis — we keep
features channels-last (NHWC / tokens-last) so every head op is a clean MXU
matmul. Flattening order differs from torch's channel-major flatten, which
is a fixed permutation of identically-distributed features — architecture-
equivalent, same parameter count.
"""

from __future__ import annotations

import math
from typing import Any

import flax.linen as nn
import jax.numpy as jnp

RELU_GAIN = math.sqrt(2.0)


def orthogonal(gain: float = 1.0):
    return nn.initializers.orthogonal(scale=gain)


class HeadMLP(nn.Module):
    """One head: plane-projection + LayerNorm/ReLU MLP."""

    planes: int
    hidden: int
    out_dim: int
    final_gain: float
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feats: jnp.ndarray) -> jnp.ndarray:
        # feats: (B, ..., C) channels-last (grid or token layout).
        x = nn.Dense(
            self.planes,
            kernel_init=orthogonal(RELU_GAIN),
            dtype=self.dtype,
            name="plane_proj",
        )(feats)
        x = x.reshape(x.shape[0], -1)
        x = nn.LayerNorm(dtype=self.dtype)(x)
        x = nn.relu(x)
        x = nn.Dense(self.hidden, kernel_init=orthogonal(RELU_GAIN), dtype=self.dtype)(x)
        x = nn.LayerNorm(dtype=self.dtype)(x)
        x = nn.relu(x)
        x = nn.Dense(
            self.out_dim, kernel_init=orthogonal(self.final_gain), dtype=self.dtype
        )(x)
        return x


class ActorCriticHeads(nn.Module):
    """The shared policy/value head pair. Returns (logits f32, value f32).

    Outputs are cast to float32 regardless of compute dtype so that
    sampling, log-probs and the value loss run in full precision (the
    reference upcasts losses to float via ``.float()``, ppo.py:213-217).
    """

    action_dim: int
    hidden: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feats: jnp.ndarray):
        logits = HeadMLP(
            planes=2,
            hidden=self.hidden,
            out_dim=self.action_dim,
            final_gain=0.01,
            dtype=self.dtype,
            name="policy_head",
        )(feats)
        value = HeadMLP(
            planes=1,
            hidden=self.hidden,
            out_dim=1,
            final_gain=1.0,
            dtype=self.dtype,
            name="value_head",
        )(feats)
        value = jnp.tanh(value.astype(jnp.float32))
        return logits.astype(jnp.float32), value


def to_nhwc(obs: jnp.ndarray, dtype) -> jnp.ndarray:
    """(B, 2, M, N) observation -> channels-last compute layout."""
    return jnp.transpose(obs, (0, 2, 3, 1)).astype(dtype)
