"""SGR (Stabilized Gated Residual) transformer actor-critic (reference
src/alg/architectures/sgrtransformer.py:7-157).

Each block gates both residual branches with a sigmoid gate whose weights
start at zero and bias at 2.0 (sigmoid(2) ~ 0.88 — mostly-open gates at
init, reference :27-32):

    a = MHA(LN(x));      x = x + sigmoid(gate1(a)) * a
    h = MLP(LN(x));      x = x + sigmoid(gate2(h)) * h     # MLP uses GELU
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp

from ..ops.pallas_attention import tiny_head_attention
from .common import ActorCriticHeads


class SGRBlock(nn.Module):
    embed_dim: int
    num_heads: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        a = nn.LayerNorm(dtype=self.dtype)(x)
        a = nn.MultiHeadDotProductAttention(
            num_heads=self.num_heads,
            qkv_features=self.embed_dim,
            dtype=self.dtype,
            attention_fn=tiny_head_attention,
        )(a, a)
        g1 = nn.sigmoid(
            nn.Dense(
                self.embed_dim,
                kernel_init=nn.initializers.zeros_init(),
                bias_init=nn.initializers.constant(2.0),
                dtype=self.dtype,
                name="gate1",
            )(a)
        )
        x = x + g1 * a

        h = nn.LayerNorm(dtype=self.dtype)(x)
        h = nn.Dense(self.embed_dim * 4, dtype=self.dtype)(h)
        h = nn.gelu(h)
        h = nn.Dense(self.embed_dim, dtype=self.dtype)(h)
        g2 = nn.sigmoid(
            nn.Dense(
                self.embed_dim,
                kernel_init=nn.initializers.zeros_init(),
                bias_init=nn.initializers.constant(2.0),
                dtype=self.dtype,
                name="gate2",
            )(h)
        )
        return x + g2 * h


class SGRTransformerActorCritic(nn.Module):
    action_dim: int
    embed_dim: int = 128
    num_layers: int = 4
    num_heads: int = 4
    head_hidden: int = 256
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, obs: jnp.ndarray, train: bool = False):
        del train
        b, c, m, n = obs.shape
        tokens = jnp.transpose(obs, (0, 2, 3, 1)).reshape(b, m * n, c)
        x = nn.Dense(
            self.embed_dim,
            kernel_init=nn.initializers.normal(stddev=0.02),
            dtype=self.dtype,
            name="cell_embed",
        )(tokens.astype(self.dtype))
        pos = self.param(
            "pos_embed",
            nn.initializers.normal(stddev=0.02),
            (1, m * n, self.embed_dim),
        )
        x = x + pos.astype(self.dtype)
        for _ in range(self.num_layers):
            x = SGRBlock(
                embed_dim=self.embed_dim, num_heads=self.num_heads, dtype=self.dtype
            )(x)
        return ActorCriticHeads(
            action_dim=self.action_dim, hidden=self.head_hidden, dtype=self.dtype
        )(x)
