"""Tournament match runner.

Parity with the reference (src/model_comparison/match_runner.py:23-262):
round-robin over all model pairs, each pairing playing ``games_per_pair``
split half-as-Black / half-as-White, stochastic policies, results as one
pandas row per match.

TPU re-design: the reference's per-turn host loop with boolean-subset policy
calls (:149-216) becomes a single jitted ``lax.while_loop`` that runs BOTH
policies densely each turn and selects per-env by turn mask — all games of a
pairing finish inside one XLA program. The torch version tiles models into
batches of 8 with explicit GPU unloading to fit VRAM (:37-84); jax frees
buffers when references drop, so the loader's lazy load/unload fills that
role per pairing.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass
from typing import Callable, List, Optional, Tuple

import jax
import jax.numpy as jnp
import pandas as pd

from ..env.constants import PLAYER_WHITE
from ..env.mnk_env import EnvConfig, make_env_state, observe, step
from ..selfplay.wrapper import flip_channels
from .model_loader import ModelInfo


@dataclass
class GameConfig:
    m: int = 9
    n: int = 9
    k: int = 5


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "p1_apply", "p2_apply", "n_games", "p1_side"),
)
def play_batch_games(
    cfg: EnvConfig,
    p1_apply: Callable,
    p2_apply: Callable,
    p1_params,
    p2_params,
    n_games: int,
    p1_side: int,
    rng: jax.Array,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Play ``n_games`` two-policy games to completion; returns
    (p1_wins, p1_losses, draws) scalars. Stochastic actions, each mover sees
    the board canonical to its color (reference :160-198)."""
    state = make_env_state(cfg, n_games)

    def cond(carry):
        _, active, _, _, _, _ = carry
        return active.any()

    def body(carry):
        state, active, wins, losses, draws, rng = carry
        rng, k1, k2 = jax.random.split(rng, 3)
        raw = observe(state)
        # Same canonicalization the training wrapper uses (one shared fn).
        observation = flip_channels(
            raw["observation"], state.current_player == PLAYER_WHITE
        )
        obs = {"observation": observation, "action_mask": raw["action_mask"]}
        a1 = p1_apply(p1_params, k1, obs, False)
        a2 = p2_apply(p2_params, k2, obs, False)
        p1_turn = state.current_player == p1_side
        actions = jnp.where(p1_turn, a1, a2)
        state, rewards, dones = step(cfg, state, actions, active)
        just = dones & active
        won = just & (rewards == 1.0)
        wins = wins + (won & p1_turn).sum()
        losses = losses + (won & ~p1_turn).sum()
        draws = draws + (just & (rewards == 0.0)).sum()
        active = active & ~dones
        return state, active, wins, losses, draws, rng

    zero = jnp.zeros((), jnp.int32)
    active0 = jnp.ones((n_games,), bool)
    _, _, wins, losses, draws, _ = jax.lax.while_loop(
        cond, body, (state, active0, zero, zero, zero, rng)
    )
    return wins, losses, draws


class MatchRunner:
    def __init__(self, config: GameConfig, seed: int = 0):
        self.config = config
        self.env_cfg = EnvConfig(config.m, config.n, config.k)
        self._rng = jax.random.PRNGKey(seed)

    def _next_key(self):
        self._rng, k = jax.random.split(self._rng)
        return k

    def run_tournament_batched(
        self, models: List[ModelInfo], games_per_pair: int, batch_size: int = 8
    ) -> pd.DataFrame:
        """All-pairs round robin (reference :27-84). ``batch_size`` bounds
        how many models stay loaded at once — the reference tiles models
        into GPU-resident batches of 8 for the same reason (:37-61); here
        an LRU over loaded entries gives the same working-set bound with
        better reuse across the pair ordering."""
        all_results = []
        if len(models) < 2:
            return pd.DataFrame()

        loaded: List[ModelInfo] = []  # LRU order: oldest first

        def ensure_loaded(m: ModelInfo, keep: Optional[ModelInfo]) -> None:
            if m in loaded:
                loaded.remove(m)
                loaded.append(m)
                return
            # Evict BEFORE loading so the bound is never exceeded, and never
            # evict the current pair's other member.
            while len(loaded) >= max(2, batch_size):
                victim = next((x for x in loaded if x is not keep), None)
                if victim is None:
                    break
                loaded.remove(victim)
                victim.unload_model(hard=True)
            m.load_model()
            loaded.append(m)

        total = len(models) * (len(models) - 1) // 2
        done = 0
        for i, model1 in enumerate(models):
            for model2 in models[i + 1 :]:
                ensure_loaded(model1, keep=None)
                ensure_loaded(model2, keep=model1)
                result = self._play_match(model1, model2, games_per_pair)
                all_results.append(result)
                done += 1
                r = result.iloc[0]
                print(
                    f"[{done}/{total}] {model1.unique_id} vs {model2.unique_id}: "
                    f"{r['player1_wins']}-{r['player2_wins']}-{r['draws']}"
                )
            if model1 in loaded:
                loaded.remove(model1)
            model1.unload_model(hard=True)  # its row is finished
        for m in loaded:
            m.unload_model(hard=True)
        return (
            pd.concat(all_results, ignore_index=True)
            if all_results
            else pd.DataFrame()
        )

    def _play_match(
        self, model1: ModelInfo, model2: ModelInfo, games_per_pair: int
    ) -> pd.DataFrame:
        """Half the games with model1 as Black, half as White (reference
        :86-123)."""
        _, vars1, act1 = model1.load_model()
        _, vars2, act2 = model2.load_model()

        games_as_first = games_per_pair // 2
        games_as_second = games_per_pair - games_as_first

        w1, l1, d1 = play_batch_games(
            self.env_cfg, act1, act2, vars1, vars2, games_as_first, 0,
            self._next_key(),
        )
        w2, l2, d2 = play_batch_games(
            self.env_cfg, act1, act2, vars1, vars2, games_as_second, 1,
            self._next_key(),
        )
        player1_wins = int(w1) + int(w2)
        player2_wins = int(l1) + int(l2)
        draws = int(d1) + int(d2)
        total_games = games_per_pair
        player1_score = (player1_wins + 0.5 * draws) / max(1, total_games)
        player2_score = (player2_wins + 0.5 * draws) / max(1, total_games)

        return pd.DataFrame(
            [
                {
                    "player1_unique_id": model1.unique_id,
                    "player2_unique_id": model2.unique_id,
                    "player1_run_name": model1.run_name,
                    "player2_run_name": model2.run_name,
                    "player1_iteration": model1.iteration,
                    "player2_iteration": model2.iteration,
                    "total_games": total_games,
                    "player1_wins": player1_wins,
                    "player2_wins": player2_wins,
                    "draws": draws,
                    "player1_score": player1_score,
                    "player2_score": player2_score,
                }
            ]
        )
