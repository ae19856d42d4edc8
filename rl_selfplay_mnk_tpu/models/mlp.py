"""Tiny MLP actor-critic — BASELINE configs[0]'s "tiny MLP policy".

An extension beyond the reference's 14 registry architectures
(src/utils/model_export.py:29-44 has no MLP): the driver's config-1
milestone ("3x3x3 tic-tac-toe, 64 vector envs, tiny MLP policy, PPO vs
random opponent") names one, so the registry carries it. Same head
contract as every other body (models/common.ActorCriticHeads: 2-plane
policy head gain 0.01, 1-plane Tanh-bounded value head gain 1.0,
orthogonal ReLU-gain inits — reference weight_init.py:29-66 semantics).
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp

from .common import ActorCriticHeads, RELU_GAIN, orthogonal


class MlpActorCritic(nn.Module):
    action_dim: int
    hidden: int = 64
    head_hidden: int = 64
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, obs: jnp.ndarray, train: bool = False):
        del train  # no batch stats
        b = obs.shape[0]
        x = obs.reshape(b, -1).astype(self.dtype)
        x = nn.relu(
            nn.Dense(
                self.hidden, kernel_init=orthogonal(RELU_GAIN), dtype=self.dtype
            )(x)
        )
        # single-token layout for the shared heads
        return ActorCriticHeads(
            action_dim=self.action_dim, hidden=self.head_hidden, dtype=self.dtype
        )(x[:, None, :])
