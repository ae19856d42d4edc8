"""Generalized Advantage Estimation as a reverse ``lax.scan``.

Parity with the reference's reverse Python loop
(src/alg/rollout_buffer.py:60-80):

    delta_t = r_t + gamma * V_{t+1} * (1 - done_t) - V_t
    gae_t   = delta_t + gamma * lambda * (1 - done_t) * gae_{t+1}
    returns = advantages + values
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def compute_gae(
    rewards: jax.Array,  # (T, E) f32
    values: jax.Array,  # (T, E) f32
    dones: jax.Array,  # (T, E) bool
    last_values: jax.Array,  # (E,) f32 bootstrap
    gamma: float,
    gae_lambda: float,
):
    """Returns (advantages, returns), both (T, E) f32."""
    nonterminal = 1.0 - dones.astype(jnp.float32)

    def body(carry, xs):
        gae, next_value = carry
        r, v, nt = xs
        delta = r + gamma * next_value * nt - v
        gae = delta + gamma * gae_lambda * nt * gae
        return (gae, v), gae

    e = rewards.shape[1]
    # reverse=True consumes xs back-to-front and emits outputs in original
    # order — no explicit [::-1] reversals needed.
    (_, _), advantages = jax.lax.scan(
        body,
        (jnp.zeros((e,), jnp.float32), last_values),
        (rewards, values, nonterminal),
        reverse=True,
    )
    return advantages, advantages + values
