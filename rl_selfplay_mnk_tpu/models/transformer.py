"""Board transformer actor-critic (reference
src/alg/architectures/transformer.py:7-111).

Per-cell 1x1-conv embedding (= Dense over channels), learned positional
embedding, then L pre-norm encoder layers:

    x = x + MHA(LN(x));  x = x + FFN(LN(x))   # FFN = Dense(4d)-ReLU-Dense(d)

matching torch ``TransformerEncoderLayer(norm_first=True, dropout=0.0)``
(reference :18-27; torch's default FFN activation is ReLU). No final norm
(torch ``TransformerEncoder`` adds one only when asked; the reference
doesn't).

Init parity: the reference leaves the encoder body at torch defaults
(``initialize_weights_explicit(modules_to_init=[], ...)``, :57-62) — we
likewise leave the body at flax defaults; cell/pos embeddings use
normal(0.02) (:53-55); heads get the shared orthogonal policy.

The sequence is M*N board cells (<=169 at 13x13) — deliberately no
ring-attention/sequence parallelism (SURVEY.md §5: scale the env batch
axis instead).
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp

from ..ops.pallas_attention import tiny_head_attention
from .common import ActorCriticHeads


class EncoderLayer(nn.Module):
    embed_dim: int
    num_heads: int
    dtype: Any = jnp.float32
    # Speed-tier knobs (reference layers always use qkv=d, ffn=4d; the _w
    # variants respend the same parameter budget on MXU-aligned shapes).
    ffn_dim: int | None = None  # None -> 4*embed_dim (torch default); 0 -> no FFN
    qkv_features: int | None = None  # None -> embed_dim

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        h = nn.LayerNorm(dtype=self.dtype)(x)
        # Board tokens have tiny head dims (d56/H4 -> 14); the fused Pallas
        # attention keeps the LxL score block in VMEM (ops/pallas_attention,
        # ~1.7x the XLA path on TPU; falls back to XLA math on CPU).
        h = nn.MultiHeadDotProductAttention(
            num_heads=self.num_heads,
            qkv_features=self.qkv_features or self.embed_dim,
            dtype=self.dtype,
            attention_fn=tiny_head_attention,
        )(h, h)
        x = x + h
        ffn = 4 * self.embed_dim if self.ffn_dim is None else self.ffn_dim
        if ffn == 0:
            return x
        h = nn.LayerNorm(dtype=self.dtype)(x)
        h = nn.Dense(ffn, dtype=self.dtype)(h)
        h = nn.relu(h)
        h = nn.Dense(self.embed_dim, dtype=self.dtype)(h)
        return x + h


class TransformerActorCritic(nn.Module):
    action_dim: int
    embed_dim: int = 128
    num_layers: int = 4
    num_heads: int = 4
    head_hidden: int = 256
    dtype: Any = jnp.float32
    ffn_dim: int | None = None
    qkv_features: int | None = None

    @nn.compact
    def __call__(self, obs: jnp.ndarray, train: bool = False):
        del train  # no batch-dependent layers in the transformer body
        b, c, m, n = obs.shape
        # (B, 2, M, N) -> (B, M*N, 2) tokens, then per-cell embedding.
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
            x = EncoderLayer(
                embed_dim=self.embed_dim,
                num_heads=self.num_heads,
                dtype=self.dtype,
                ffn_dim=self.ffn_dim,
                qkv_features=self.qkv_features,
            )(x)
        return ActorCriticHeads(
            action_dim=self.action_dim, hidden=self.head_hidden, dtype=self.dtype
        )(x)
