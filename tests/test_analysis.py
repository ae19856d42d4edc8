"""result_analysis module tests (the reference notebook's pipeline, headless)."""

import os
import sys

import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from result_analysis.analysis import analyze, categorize_runs


def _fake_results(tmp_path):
    elo = pd.DataFrame(
        [
            {
                "unique_id": f"{run}/model_{i:05d}",
                "rating": 1500 + 40 * i + hash(run) % 7,
                "run_name": run,
                "iteration": i * 5,
                "games_played": 40,
                "wins": 15 + i,
                "draws": 5,
                "losses": 20 - i,
                "win_rate": (15 + i) / 40,
            }
            for run in ("run_resnet_b_s", "run_transformer_b_l", "run_cnn_b_s")
            for i in range(4)
        ]
    )
    matches = pd.DataFrame(
        [{"player1_unique_id": "a", "player2_unique_id": "b", "total_games": 4}]
    )
    elo.to_csv(tmp_path / "elo_ratings.csv", index=False)
    matches.to_csv(tmp_path / "match_results.csv", index=False)


def test_categorize_runs_families():
    df = pd.DataFrame(
        {
            "run_name": [
                "run_transformer_c_s",
                "run_transformer_b_l",
                "x_resnet_b_s",
                "y_cnn_b_l",
            ]
        }
    )
    out = categorize_runs(df)
    assert out["family"].tolist() == ["transformer_c", "transformer", "resnet", "cnn"]
    assert out["size"].tolist() == ["S", "L", "S", "L"]


def test_analyze_renders_all_plots(tmp_path):
    _fake_results(tmp_path)
    elo = analyze(str(tmp_path))
    assert {"family", "size"} <= set(elo.columns)
    for png in ("best_elo.png", "elo_progression_analysis.png", "win_draw_rates.png"):
        assert os.path.exists(tmp_path / png)
