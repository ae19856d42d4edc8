"""Vectorized convergent batch ELO over tournament results.

Behavioral contract (reference spec:
`/root/reference/src/model_comparison/elo_tracker.py:12-44`): K=32, initial
rating 1500, the match list is replayed for at most 50 passes until the mean
absolute per-update rating change drops below 0.1, then per-player W/D/L and
win_rate are aggregated.

The reference realizes that contract as a pandas `iterrows` Gauss-Seidel
sweep — O(passes x matches) Python-level work, minutes on large tournaments.
Here the same sweep is computed by WAVEFRONT SCHEDULING instead: the match
list is partitioned (once, O(matches)) into an ordered sequence of "waves"
such that (a) no player appears twice inside a wave and (b) every earlier
match of either player lands in a strictly earlier wave. Within a wave the
sequential sweep's reads all see ratings as of the end of the previous wave
and its writes touch disjoint players, so one vectorized numpy update per
wave reproduces the sequential float64 arithmetic EXACTLY (same values, same
per-player operation order) while doing O(waves) numpy calls per pass. For a
round-robin of P players that is ~P waves instead of ~P^2/2 Python
iterations — ~100x faster at tournament scale (see
tests/test_compare_and_play.py::test_elo_wavefront_speed).
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
import tempfile

import numpy as np
import pandas as pd

_ELO_SCALE = 400.0

_NATIVE_SRC = os.path.join(os.path.dirname(__file__), "_elo_sweep.c")
_native_lib = None
_native_tried = False


def _load_native():
    """Compile + load the C sequential sweep on first use (cached .so).

    The kernel is bit-identical double math to the numpy path; it exists
    because the sweep is inherently sequential and a 10k-match tournament
    sweep should cost milliseconds, not seconds. Falls back silently."""
    global _native_lib, _native_tried
    if _native_tried:
        return _native_lib
    _native_tried = True
    try:
        with open(_NATIVE_SRC, "rb") as f:
            src = f.read()
        tag = hashlib.sha256(src).hexdigest()[:16]
        cache_dir = os.environ.get(
            "RL_MNK_NATIVE_CACHE",
            os.path.join(tempfile.gettempdir(), "rl_selfplay_mnk_tpu_native"),
        )
        os.makedirs(cache_dir, exist_ok=True)
        so_path = os.path.join(cache_dir, f"elo_sweep_{tag}.so")
        if not os.path.exists(so_path):
            tmp = so_path + f".tmp{os.getpid()}"
            subprocess.run(
                ["cc", "-O2", "-shared", "-fPIC", "-o", tmp, _NATIVE_SRC, "-lm"],
                check=True,
                capture_output=True,
                timeout=60,
            )
            os.replace(tmp, so_path)
        lib = ctypes.CDLL(so_path)
        lib.elo_sweep.restype = ctypes.c_int64
        lib.elo_sweep.argtypes = [
            ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_double),
            ctypes.POINTER(ctypes.c_double),
            ctypes.c_int64,
            ctypes.POINTER(ctypes.c_double),
            ctypes.c_int64,
            ctypes.c_double,
            ctypes.c_double,
        ]
        _native_lib = lib
    except Exception:
        _native_lib = None
    return _native_lib


def wavefront_schedule(p1: np.ndarray, p2: np.ndarray, n_players: int):
    """Assign each match the earliest wave respecting player dependencies.

    Match i goes to wave 1 + max(wave of the previous match of p1[i], wave of
    the previous match of p2[i]) — the classic list-scheduling recurrence.
    Returns (order, bounds): `order` permutes match indices wave-by-wave
    (stable within a wave) and `bounds[w]:bounds[w+1]` slices wave w.
    """
    n = p1.shape[0]
    next_free = np.zeros(n_players, dtype=np.int64)
    wave = np.empty(n, dtype=np.int64)
    for i in range(n):
        a = p1[i]
        b = p2[i]
        w = next_free[a]
        wb = next_free[b]
        if wb > w:
            w = wb
        wave[i] = w
        next_free[a] = w + 1
        next_free[b] = w + 1
    order = np.argsort(wave, kind="stable")
    n_waves = int(wave.max()) + 1 if n else 0
    bounds = np.zeros(n_waves + 1, dtype=np.int64)
    np.add.at(bounds, wave + 1, 1)
    np.cumsum(bounds, out=bounds)
    return order, bounds


def _sweep_to_convergence(
    p1: np.ndarray,
    p2: np.ndarray,
    s1: np.ndarray,
    s2: np.ndarray,
    n_players: int,
    initial: float,
    k: float,
    max_passes: int = 50,
    tol: float = 0.1,
) -> np.ndarray:
    """Run the convergent rating sweep; returns final per-player ratings."""
    lib = _load_native()
    if lib is not None and p1.shape[0] > 0:
        p1c = np.ascontiguousarray(p1, dtype=np.int64)
        p2c = np.ascontiguousarray(p2, dtype=np.int64)
        s1c = np.ascontiguousarray(s1, dtype=np.float64)
        s2c = np.ascontiguousarray(s2, dtype=np.float64)
        ratings = np.full(n_players, initial, dtype=np.float64)
        i64p = ctypes.POINTER(ctypes.c_int64)
        f64p = ctypes.POINTER(ctypes.c_double)
        lib.elo_sweep(
            p1c.ctypes.data_as(i64p),
            p2c.ctypes.data_as(i64p),
            s1c.ctypes.data_as(f64p),
            s2c.ctypes.data_as(f64p),
            ctypes.c_int64(p1c.shape[0]),
            ratings.ctypes.data_as(f64p),
            ctypes.c_int64(max_passes),
            ctypes.c_double(k),
            ctypes.c_double(tol),
        )
        return ratings

    order, bounds = wavefront_schedule(p1, p2, n_players)
    # Pre-slice per-wave index/score arrays once; passes only do arithmetic.
    waves = []
    for w in range(len(bounds) - 1):
        sel = order[bounds[w] : bounds[w + 1]]
        waves.append((sel, p1[sel], p2[sel], s1[sel], s2[sel]))

    n = p1.shape[0]
    ratings = np.full(n_players, initial, dtype=np.float64)
    denom = 2.0 * max(1, n)
    contrib = np.zeros(n, dtype=np.float64)
    for _ in range(max_passes):
        for sel, a, b, sa, sb in waves:
            ra = ratings[a]
            rb = ratings[b]
            expected_a = 1.0 / (1.0 + np.power(10.0, (rb - ra) / _ELO_SCALE))
            da = k * (sa - expected_a)
            db = k * (sb - (1.0 - expected_a))
            new_a = ra + da
            new_b = rb + db
            self_rows = a == b
            if self_rows.any():
                # Reference semantics apply BOTH updates to a self-match's
                # single entry ((r + da) + db); plain fancy-index assignment
                # would let the second write drop da.
                new_b = np.where(self_rows, new_a + db, new_b)
            ratings[a] = new_a
            ratings[b] = new_b
            contrib[sel] = np.abs(da) + np.abs(db)
        # Convergence accumulation matches the sequential sweep exactly
        # GIVEN identical per-match deltas: original match order with
        # left-fold adds (numpy's pairwise sum would differ by ULPs and
        # can flip a pass count at the tol boundary). The deltas themselves
        # depend on np.power vs libm pow, which are not guaranteed
        # bit-identical across platforms/SIMD dispatch — so cross-BACKEND
        # exactness at the tol boundary is best-effort, not a contract
        # (the backends agree bit-for-bit on every platform we test). A
        # Python fold over the host list is ~ms at tournament scale and
        # only runs when no C compiler is available.
        total_change = 0.0
        for t in contrib.tolist():
            total_change += t
        if total_change / denom < tol:
            break
    return ratings


class ELOTracker:
    """Drop-in tracker: `calculate_ratings(match_df) -> ratings_df`."""

    def __init__(self, initial_rating: float = 1500.0, k_factor: float = 32.0):
        self.initial_rating = float(initial_rating)
        self.k_factor = float(k_factor)

    def calculate_ratings(self, match_results: pd.DataFrame) -> pd.DataFrame:
        if match_results.empty:
            return pd.DataFrame()

        ids = pd.concat(
            [match_results["player1_unique_id"], match_results["player2_unique_id"]],
            ignore_index=True,
        )
        codes, players = pd.factorize(ids)
        n_matches = len(match_results)
        n_players = len(players)
        p1 = np.asarray(codes[:n_matches], dtype=np.int64)
        p2 = np.asarray(codes[n_matches:], dtype=np.int64)

        ratings = _sweep_to_convergence(
            p1,
            p2,
            match_results["player1_score"].to_numpy(dtype=np.float64),
            match_results["player2_score"].to_numpy(dtype=np.float64),
            n_players,
            self.initial_rating,
            self.k_factor,
        )

        # Aggregate W/D/L per player with bincount (both seats).
        def count(col_as_p1: str, col_as_p2: str) -> np.ndarray:
            w1 = match_results[col_as_p1].to_numpy(dtype=np.float64)
            w2 = match_results[col_as_p2].to_numpy(dtype=np.float64)
            return np.bincount(p1, w1, n_players) + np.bincount(p2, w2, n_players)

        games = count("total_games", "total_games")
        wins = count("player1_wins", "player2_wins")
        draws = count("draws", "draws")
        losses = count("player2_wins", "player1_wins")

        # Each player's run metadata comes from their first appearance,
        # preferring the p1 seat (reference behavior, elo_tracker.py:57-63).
        positions = np.arange(n_matches, dtype=np.int64)
        first_p1 = np.full(n_players, n_matches, dtype=np.int64)
        first_p2 = np.full(n_players, n_matches, dtype=np.int64)
        np.minimum.at(first_p1, p1, positions)
        np.minimum.at(first_p2, p2, positions)
        use_p1 = first_p1 < n_matches
        row_idx = np.where(use_p1, first_p1, first_p2)

        def meta(col_p1: str, col_p2: str) -> np.ndarray:
            v1 = match_results[col_p1].to_numpy()
            v2 = match_results[col_p2].to_numpy()
            return np.where(use_p1, v1[np.minimum(row_idx, n_matches - 1)], v2[np.minimum(row_idx, n_matches - 1)])

        out = pd.DataFrame(
            {
                "unique_id": players,
                "rating": np.round(ratings, 2),
                "run_name": meta("player1_run_name", "player2_run_name"),
                "iteration": meta("player1_iteration", "player2_iteration"),
                "games_played": games.astype(np.int64),
                "wins": wins.astype(np.int64),
                "draws": draws.astype(np.int64),
                "losses": losses.astype(np.int64),
                "win_rate": np.where(games > 0, wins / np.maximum(games, 1), 0.0),
            }
        )
        return out.sort_values("rating", ascending=False)
