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
    scores:   (max_size,) float32 — per-slot EMA of the learner's score vs
              that member (League.score_ema twin; 0.5 = even-match prior) —
              drives device-side PFSP matchmaking (pool_sample_league)
    games:    (max_size,) float32 — per-slot recorded-result count
              (League.games twin; diagnostics/tests)
    """

    stacked: Any
    size: jax.Array
    next_idx: jax.Array
    weights: jax.Array
    scores: jax.Array
    games: jax.Array

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
        scores=jnp.full((max_size,), 0.5, jnp.float32),
        games=jnp.zeros((max_size,), jnp.float32),
    )


def _insert_slot(pool: DevicePool, eviction: str) -> jax.Array:
    """Slot for the next insert. FIFO: the ring pointer (deque maxlen
    semantics, reference :8). Adaptive (extension, OpponentPool parity):
    once full, overwrite the LOWEST-WEIGHT member instead of the oldest."""
    if eviction == "adaptive":
        full = pool.size >= pool.max_size
        return jnp.where(full, jnp.argmin(pool.weights).astype(jnp.int32),
                         pool.next_idx)
    return pool.next_idx


def pool_add(
    pool: DevicePool, params: Any, weight: float = 1.0, eviction: str = "fifo"
) -> DevicePool:
    """Insert: overwrite the eviction slot once full (FIFO by default —
    deque maxlen semantics, reference :8,10-11). Fresh members start at the
    even-match score prior (League.add_opponent parity)."""
    idx = _insert_slot(pool, eviction)
    stacked = jax.tree.map(
        lambda s, p: s.at[idx].set(jnp.asarray(p, s.dtype)), pool.stacked, params
    )
    max_size = pool.max_size
    return DevicePool(
        stacked=stacked,
        size=jnp.minimum(pool.size + 1, max_size),
        next_idx=(pool.next_idx + 1) % max_size,
        weights=pool.weights.at[idx].set(weight),
        scores=pool.scores.at[idx].set(0.5),
        games=pool.games.at[idx].set(0.0),
    )


def pool_add_if(
    pool: DevicePool,
    params: Any,
    weight: jax.Array,
    do_insert: jax.Array,
    eviction: str = "fifo",
) -> DevicePool:
    """``pool_add`` under a traced predicate, for compiled loops with an
    insertion cadence (alg/fused.py). Selects at the single written slot
    instead of a dense pytree-wide ``where`` over all ``max_size`` stacked
    entries — one slot of traffic per iteration instead of the whole pool."""
    idx = _insert_slot(pool, eviction)
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
        scores=pool.scores.at[idx].set(
            jnp.where(do_insert, 0.5, pool.scores[idx])
        ),
        games=pool.games.at[idx].set(
            jnp.where(do_insert, 0.0, pool.games[idx])
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


def pfsp_slot_weights(
    scores: jax.Array, mode: str, power: float = 2.0
) -> jax.Array:
    """Device twin of ``selfplay.league.pfsp_weight`` (same formulas, same
    1e-3 floor), vectorized over the slot axis."""
    s = jnp.clip(scores, 0.0, 1.0)
    if mode == "pfsp_hard":
        w = (1.0 - s) ** power
    elif mode == "pfsp_even":
        w = (4.0 * s * (1.0 - s)) ** power
    elif mode == "uniform":
        w = jnp.ones_like(s)
    else:
        raise ValueError(f"unknown matchmaking mode {mode!r}")
    return jnp.maximum(w, 1e-3)


def pool_sample_league(
    pool: DevicePool, rng: jax.Array, mode: str, power: float = 2.0
):
    """PFSP draw over valid slots: p ∝ pfsp_weight(score_ema) — the device
    twin of ``League.get_opponent``. Returns ``(slot_idx, params)`` so the
    caller can fold the iteration's outcome back into that slot's EMA
    (``pool_record_result_if``)."""
    slot_ids = jnp.arange(pool.max_size)
    valid = slot_ids < pool.size
    w = pfsp_slot_weights(pool.scores, mode, power)
    logits = jnp.where(valid, jnp.log(w), -jnp.inf)
    logits = jnp.where(pool.size > 0, logits, jnp.zeros_like(logits))
    idx = jax.random.categorical(rng, logits)
    return idx, jax.tree.map(lambda s: s[idx], pool.stacked)


def pool_record_result_if(
    pool: DevicePool,
    idx: jax.Array,
    score: jax.Array,
    do_record: jax.Array,
    ema: float = 0.3,
) -> DevicePool:
    """Fold one outcome (learner score ∈ [0,1] vs slot ``idx``) into that
    slot's EMA under a traced predicate — ``League.record_result`` inside a
    compiled program. Non-finite scores record nothing (League parity)."""
    score = jnp.clip(score, 0.0, 1.0)
    ok = do_record & jnp.isfinite(score)
    new_score = (1.0 - ema) * pool.scores[idx] + ema * score
    return pool._replace(
        scores=pool.scores.at[idx].set(
            jnp.where(ok, new_score, pool.scores[idx])
        ),
        games=pool.games.at[idx].set(
            jnp.where(ok, pool.games[idx] + 1.0, pool.games[idx])
        ),
    )


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
