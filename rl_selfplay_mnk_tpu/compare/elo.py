"""Convergent batch ELO over tournament results.

Parity with the reference tracker (src/model_comparison/elo_tracker.py:
5-85): K=32, initial 1500, replay the match list up to 50 passes until the
mean absolute change drops below 0.1, then aggregate W/D/L and win_rate per
player.
"""

from __future__ import annotations

import math

import pandas as pd


class ELOTracker:
    def __init__(self, initial_rating: float = 1500.0, k_factor: float = 32.0):
        self.initial_rating = initial_rating
        self.k_factor = k_factor

    def calculate_ratings(self, match_results: pd.DataFrame) -> pd.DataFrame:
        if match_results.empty:
            return pd.DataFrame()

        all_players = set(match_results["player1_unique_id"].unique()) | set(
            match_results["player2_unique_id"].unique()
        )
        ratings = {player: self.initial_rating for player in all_players}

        for _ in range(50):  # max passes (reference :26)
            total_change = 0.0
            for _, match in match_results.iterrows():
                p1, p2 = match["player1_unique_id"], match["player2_unique_id"]
                expected_p1 = self._expected_score(ratings[p1], ratings[p2])
                change_p1 = self.k_factor * (match["player1_score"] - expected_p1)
                change_p2 = self.k_factor * (
                    match["player2_score"] - (1.0 - expected_p1)
                )
                ratings[p1] += change_p1
                ratings[p2] += change_p2
                total_change += abs(change_p1) + abs(change_p2)
            if total_change / (len(match_results) * 2) < 0.1:
                break

        rows = []
        for player in all_players:
            as_p1 = match_results[match_results["player1_unique_id"] == player]
            as_p2 = match_results[match_results["player2_unique_id"] == player]
            games = as_p1["total_games"].sum() + as_p2["total_games"].sum()
            wins = as_p1["player1_wins"].sum() + as_p2["player2_wins"].sum()
            draws = as_p1["draws"].sum() + as_p2["draws"].sum()
            losses = as_p1["player2_wins"].sum() + as_p2["player1_wins"].sum()
            if not as_p1.empty:
                info = as_p1.iloc[0]
                run_name, iteration = info["player1_run_name"], info["player1_iteration"]
            else:
                info = as_p2.iloc[0]
                run_name, iteration = info["player2_run_name"], info["player2_iteration"]
            rows.append(
                {
                    "unique_id": player,
                    "rating": round(ratings[player], 2),
                    "run_name": run_name,
                    "iteration": iteration,
                    "games_played": int(games),
                    "wins": int(wins),
                    "draws": int(draws),
                    "losses": int(losses),
                    "win_rate": wins / games if games > 0 else 0.0,
                }
            )
        return pd.DataFrame(rows).sort_values("rating", ascending=False)

    def _expected_score(self, rating1: float, rating2: float) -> float:
        return 1.0 / (1.0 + math.pow(10.0, (rating2 - rating1) / 400.0))
