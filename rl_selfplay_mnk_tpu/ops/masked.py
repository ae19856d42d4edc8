"""Masked categorical distribution primitives.

Every network in the reference masks illegal actions identically:
``logits = where(mask, logits, -inf)`` with an all-masked-row fallback to
zeros (uniform) — reference src/alg/architectures/cnn.py:69-77 (same block in
resnet.py:84-92, transformer.py:80-88). Here that logic is a standalone op so
models stay pure feature extractors and the distribution math lives in one
place, fused by XLA into whatever surrounds it.

All functions operate on float32 logits of shape (..., A).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

NEG_INF = -jnp.inf


def mask_logits(logits: jax.Array, mask: jax.Array) -> jax.Array:
    """Apply a legality mask; degenerate all-masked rows fall back to uniform.

    Mirrors reference cnn.py:73-77: illegal logits -> -inf; if a row has no
    legal action, replace the whole row with zeros so downstream softmax is
    uniform instead of NaN.
    """
    masked = jnp.where(mask, logits, NEG_INF)
    all_masked = ~mask.any(axis=-1, keepdims=True)
    return jnp.where(all_masked, jnp.zeros_like(logits), masked)


def masked_sample(rng: jax.Array, logits: jax.Array) -> jax.Array:
    """Sample actions from (already masked) logits. Returns int32 (...)."""
    return jax.random.categorical(rng, logits, axis=-1).astype(jnp.int32)


def masked_argmax(logits: jax.Array) -> jax.Array:
    """Deterministic action = argmax of logits (reference policy.py:50)."""
    return jnp.argmax(logits, axis=-1).astype(jnp.int32)


def log_prob(logits: jax.Array, actions: jax.Array) -> jax.Array:
    """log pi(a) for the categorical defined by (masked) logits."""
    logp = jax.nn.log_softmax(logits, axis=-1)
    return jnp.take_along_axis(logp, actions[..., None].astype(jnp.int32), axis=-1)[
        ..., 0
    ]


def entropy(logits: jax.Array) -> jax.Array:
    """Entropy of the categorical; -inf logits contribute exactly 0.

    The -inf is sanitized BEFORE the product (not after): ``p * logp`` with
    ``p=0, logp=-inf`` is NaN, and even under ``where`` the product's
    backward pass would emit ``0 * -inf`` NaN cotangents.
    """
    logp = jax.nn.log_softmax(logits, axis=-1)
    p = jnp.exp(logp)
    safe_logp = jnp.where(p > 0, logp, 0.0)
    return -(p * safe_logp).sum(axis=-1)


def random_masked_actions(
    rng: jax.Array, mask: jax.Array, deterministic: bool = False
) -> jax.Array:
    """Uniform random legal action per row (reference RandomPolicy,
    src/selfplay/policy.py:13-29).

    Zero-legal rows fall back to uniform over all actions (the reference adds
    1e-8 to every cell, making multinomial uniform); deterministic mode takes
    the first legal cell (torch argmax tie-break = lowest index).
    """
    if deterministic:
        # argmax of the 0/1 mask: first True, or index 0 when none.
        return jnp.argmax(mask.astype(jnp.int32), axis=-1).astype(jnp.int32)
    # Reuse the one central masking fn (same -inf + all-masked-row policy).
    logits = mask_logits(jnp.zeros(mask.shape, jnp.float32), mask)
    return masked_sample(rng, logits)
