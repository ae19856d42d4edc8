"""League-style matchmaking over the opponent pool (extension).

The reference samples historical opponents uniformly
(src/selfplay/opponent_pool.py:13-16); its README promises
"performance-based weighted sampling" it never implements (SURVEY.md
§2.1). ``OpponentPool(weighted=True)`` adds static insertion weights; this
module goes one step further with **prioritized fictitious self-play**
(PFSP): each pool member keeps an exponential moving average of the
learner's score against it (0 = always loses, 1 = always wins, drawn from
the per-iteration mean self-play reward), and sampling focuses where it is
most informative:

  * ``"uniform"``    — the reference behavior (p ∝ 1);
  * ``"pfsp_hard"``  — p ∝ (1 - s)^power: prioritize opponents the learner
                        still loses to (curriculum against forgetting);
  * ``"pfsp_even"``  — p ∝ (s·(1-s))^power: prioritize evenly-matched
                        opponents (maximum learning signal per game).

Unplayed members default to s = 0.5 (maximum priority under "even", middle
priority under "hard"), so fresh snapshots always get probed.
"""

from __future__ import annotations

import math
import random
from typing import Any, List, Optional, Tuple

MATCHMAKING_MODES = ("uniform", "pfsp_hard", "pfsp_even")


def pfsp_weight(score: float, mode: str, power: float = 2.0) -> float:
    """Sampling weight for an opponent the learner scores ``score`` ∈ [0,1]
    against. Floored so no member starves entirely."""
    s = min(max(score, 0.0), 1.0)
    if mode == "pfsp_hard":
        w = (1.0 - s) ** power
    elif mode == "pfsp_even":
        # normalized so s=0.5 gives weight 1.0
        w = (4.0 * s * (1.0 - s)) ** power
    elif mode == "uniform":
        w = 1.0
    else:
        raise ValueError(
            f"unknown matchmaking mode {mode!r}; choose from {MATCHMAKING_MODES}"
        )
    return max(w, 1e-3)


class LeagueEntry:
    __slots__ = ("entry_id", "params", "score_ema", "games")

    def __init__(self, entry_id: int, params: Any):
        self.entry_id = entry_id
        self.params = params
        self.score_ema = 0.5  # unknown strength: even-match prior
        self.games = 0


class League:
    """FIFO roster (same capacity semantics as the reference pool) with
    PFSP matchmaking and per-member result tracking.

    API mirrors ``OpponentPool`` plus:
      * ``get_opponent() -> (entry_id, params)``;
      * ``record_result(entry_id, score)`` — score ∈ [0,1] from the
        learner's perspective (e.g. ``(mean_reward + 1) / 2``), folded into
        the member's EMA.
    """

    def __init__(
        self,
        max_size: int = 5,
        mode: str = "pfsp_even",
        power: float = 2.0,
        ema: float = 0.3,
        seed: Optional[int] = None,
    ):
        if mode not in MATCHMAKING_MODES:
            raise ValueError(
                f"unknown matchmaking mode {mode!r}; choose from {MATCHMAKING_MODES}"
            )
        self.max_size = max_size
        self.mode = mode
        self.power = power
        self.ema = ema
        self.entries: List[LeagueEntry] = []
        self._next_id = 0
        self._rng = random.Random(seed)

    # -- pool-compatible surface ------------------------------------------
    def add_opponent(self, params: Any, weight: float = 1.0) -> int:
        """Insert a snapshot; FIFO-evict the oldest beyond capacity.
        ``weight`` is accepted for OpponentPool API compatibility but
        ignored: a fresh snapshot starts at the even-match prior (0.5) —
        its vs-benchmark score says nothing about how the CURRENT learner
        fares against it."""
        del weight
        entry = LeagueEntry(self._next_id, params)
        self._next_id += 1
        self.entries.append(entry)
        if len(self.entries) > self.max_size:
            self.entries.pop(0)
        return entry.entry_id

    def size(self) -> int:
        return len(self.entries)

    def get_random_opponent(self) -> Optional[Any]:
        drawn = self.get_opponent()
        return None if drawn is None else drawn[1]

    # -- league surface ----------------------------------------------------
    def weights(self) -> List[float]:
        return [
            pfsp_weight(e.score_ema, self.mode, self.power) for e in self.entries
        ]

    def get_opponent(self) -> Optional[Tuple[int, Any]]:
        if not self.entries:
            return None
        entry = self._rng.choices(self.entries, weights=self.weights())[0]
        return entry.entry_id, entry.params

    def record_result(self, entry_id: int, score: float) -> None:
        """Fold one match outcome (learner score ∈ [0,1]) into the member's
        EMA. Unknown ids (evicted members) are ignored."""
        if not math.isfinite(score):
            return
        score = min(max(float(score), 0.0), 1.0)
        for e in self.entries:
            if e.entry_id == entry_id:
                e.score_ema = (1.0 - self.ema) * e.score_ema + self.ema * score
                e.games += 1
                return
