"""Opponent pool: FIFO eviction + uniform sampling.

Reference ``OpponentPool`` (src/selfplay/opponent_pool.py:5-19) is a
``deque(maxlen)`` of deep-copied ``nn.Module``s with uniform
``random.choice``. (The reference README claims weighted sampling; the code
is uniform+FIFO — SURVEY.md §2.1. We build to the code, with weighting as an
explicit extension hook.)

Two implementations:

  * ``DevicePool`` — pure-functional, device-resident: K stacked parameter
    pytrees + a ring pointer. Insert is a ``dynamic_update``-style ``.at[]``
    write, sampling is a gather; both jit/shard cleanly, so pool management
    can live inside a compiled program on a sharded mesh (BASELINE.json
    north star).
  * ``OpponentPool`` — a thin host-side facade with the reference's exact
    API (``add_opponent`` / ``get_random_opponent`` / ``size``) holding
    device pytrees in a deque, for host-driven orchestration loops.
"""

from __future__ import annotations

import random
from collections import deque
from typing import Any, NamedTuple, Optional

import jax
import jax.numpy as jnp


class DevicePool(NamedTuple):
    """Ring buffer of K parameter sets living on device.

    stacked:  pytree whose leaves have a leading ``max_size`` axis
    size:     () int32 — number of valid entries (<= max_size)
    next_idx: () int32 — ring insertion slot
    weights:  (max_size,) float32 — sampling weights (all-ones = uniform,
              the reference behavior; hook for weighted sampling extensions)
    """

    stacked: Any
    size: jax.Array
    next_idx: jax.Array
    weights: jax.Array

    @property
    def max_size(self) -> int:
        return self.weights.shape[0]


def pool_init(template: Any, max_size: int) -> DevicePool:
    """Empty pool shaped like ``template`` (a single parameter pytree)."""
    stacked = jax.tree.map(
        lambda x: jnp.zeros((max_size,) + jnp.shape(x), jnp.asarray(x).dtype),
        template,
    )
    return DevicePool(
        stacked=stacked,
        size=jnp.zeros((), jnp.int32),
        next_idx=jnp.zeros((), jnp.int32),
        weights=jnp.ones((max_size,), jnp.float32),
    )


def pool_add(pool: DevicePool, params: Any, weight: float = 1.0) -> DevicePool:
    """FIFO insert: overwrite the oldest slot once full (deque maxlen
    semantics, reference :8,10-11)."""
    idx = pool.next_idx
    stacked = jax.tree.map(
        lambda s, p: s.at[idx].set(jnp.asarray(p, s.dtype)), pool.stacked, params
    )
    max_size = pool.max_size
    return DevicePool(
        stacked=stacked,
        size=jnp.minimum(pool.size + 1, max_size),
        next_idx=(pool.next_idx + 1) % max_size,
        weights=pool.weights.at[idx].set(weight),
    )


def pool_add_if(
    pool: DevicePool, params: Any, weight: jax.Array, do_insert: jax.Array
) -> DevicePool:
    """``pool_add`` under a traced predicate, for compiled loops with an
    insertion cadence (alg/fused.py). Selects at the single written slot
    instead of a dense pytree-wide ``where`` over all ``max_size`` stacked
    entries — one slot of traffic per iteration instead of the whole pool."""
    idx = pool.next_idx
    stacked = jax.tree.map(
        lambda s, p: s.at[idx].set(
            jnp.where(do_insert, jnp.asarray(p, s.dtype), s[idx])
        ),
        pool.stacked,
        params,
    )
    max_size = pool.max_size
    return DevicePool(
        stacked=stacked,
        size=jnp.where(do_insert, jnp.minimum(pool.size + 1, max_size), pool.size),
        next_idx=jnp.where(do_insert, (pool.next_idx + 1) % max_size, pool.next_idx),
        weights=pool.weights.at[idx].set(
            jnp.where(do_insert, weight, pool.weights[idx])
        ),
    )


def pool_sample(pool: DevicePool, rng: jax.Array) -> Any:
    """Draw one parameter set; uniform over valid entries (reference :13-16),
    modulated by slot weights. Pure gather — shardable."""
    slot_ids = jnp.arange(pool.max_size)
    valid = slot_ids < pool.size
    logits = jnp.where(valid, jnp.log(jnp.maximum(pool.weights, 1e-30)), -jnp.inf)
    # Guard the empty pool: fall back to slot 0 (callers check size first).
    logits = jnp.where(pool.size > 0, logits, jnp.zeros_like(logits))
    idx = jax.random.categorical(rng, logits)
    return jax.tree.map(lambda s: s[idx], pool.stacked)


class OpponentPool:
    """Host-side facade with the reference API (opponent_pool.py:5-19).

    Default behavior matches the reference exactly: uniform sampling + FIFO
    eviction. The reference README additionally promises "performance-based
    weighted sampling with adaptive eviction" that its code never implements
    (SURVEY.md §2.1); both are available here as explicit extensions:

      * ``weighted=True`` — sampling proportional to each snapshot's weight
        (e.g. its validation score rate at insertion);
      * ``eviction="adaptive"`` — when full, evict the LOWEST-weight
        snapshot instead of the oldest, keeping the strongest opponents.
    """

    def __init__(
        self,
        max_size: int = 5,
        seed: Optional[int] = None,
        weighted: bool = False,
        eviction: str = "fifo",
    ):
        assert eviction in ("fifo", "adaptive"), eviction
        self.max_size = max_size
        self.pool: deque = deque()  # bounded manually (eviction policy)
        self.weights: deque = deque()
        self.weighted = weighted
        self.eviction = eviction
        self._rng = random.Random(seed)

    def add_opponent(self, opponent: Any, weight: float = 1.0) -> None:
        if len(self.pool) >= self.max_size:
            if self.eviction == "adaptive":
                drop = min(range(len(self.weights)), key=self.weights.__getitem__)
            else:  # fifo — deque(maxlen) semantics, reference :8
                drop = 0
            del self.pool[drop]
            del self.weights[drop]
        self.pool.append(opponent)
        self.weights.append(max(float(weight), 1e-6))

    def get_random_opponent(self) -> Optional[Any]:
        if not self.pool:
            return None
        if self.weighted:
            return self._rng.choices(list(self.pool), weights=list(self.weights))[0]
        return self._rng.choice(list(self.pool))

    def size(self) -> int:
        return len(self.pool)
