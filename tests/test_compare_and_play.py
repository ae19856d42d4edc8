"""Tournament + play-CLI tests: two-policy game driver, ELO math,
loader/round-robin/CSV flow, board rendering, replay."""

import json
import os

import numpy as np
import jax
import jax.numpy as jnp
import pandas as pd
import pytest

from rl_selfplay_mnk_tpu.compare.elo import ELOTracker
from rl_selfplay_mnk_tpu.compare.match_runner import (
    GameConfig,
    MatchRunner,
    play_batch_games,
)
from rl_selfplay_mnk_tpu.compare.model_loader import ModelLoader
from rl_selfplay_mnk_tpu.env import EnvConfig
from rl_selfplay_mnk_tpu.selfplay import RandomPolicy


def test_play_batch_games_random_vs_random():
    cfg = EnvConfig(3, 3, 3)
    rp = RandomPolicy()
    w, l, d = play_batch_games(
        cfg, rp.apply, rp.apply, None, None, 128, 0, jax.random.PRNGKey(0)
    )
    w, l, d = int(w), int(l), int(d)
    assert w + l + d == 128
    # 3x3 random play: first mover wins most decided games
    assert w > l


def test_play_batch_games_strong_beats_random():
    """A center-then-first-legal heuristic should crush random on 3x3x3 as
    p1... actually verify side symmetry: swap p1_side flips win counts."""
    cfg = EnvConfig(3, 3, 3)
    rp = RandomPolicy()
    w0, l0, d0 = play_batch_games(
        cfg, rp.apply, rp.apply, None, None, 256, 0, jax.random.PRNGKey(1)
    )
    w1, l1, d1 = play_batch_games(
        cfg, rp.apply, rp.apply, None, None, 256, 1, jax.random.PRNGKey(1)
    )
    # identical seeds, swapped sides: p1-as-white should win about as often
    # as p2-did-when-p1-was-black
    assert int(w0) + int(l0) + int(d0) == 256
    assert int(w1) + int(l1) + int(d1) == 256
    assert int(w0) > int(w1)  # black advantage persists


def test_elo_tracker_orders_by_strength():
    rows = []
    # A beats B 9-1, B beats C 9-1, A beats C 10-0
    for p1, p2, w1, w2 in [
        ("A", "B", 9, 1),
        ("B", "C", 9, 1),
        ("A", "C", 10, 0),
    ]:
        rows.append(
            {
                "player1_unique_id": p1,
                "player2_unique_id": p2,
                "player1_run_name": p1,
                "player2_run_name": p2,
                "player1_iteration": 0,
                "player2_iteration": 0,
                "total_games": 10,
                "player1_wins": w1,
                "player2_wins": w2,
                "draws": 0,
                "player1_score": w1 / 10,
                "player2_score": w2 / 10,
            }
        )
    df = pd.DataFrame(rows)
    ratings = ELOTracker().calculate_ratings(df)
    order = ratings["unique_id"].tolist()
    assert order == ["A", "B", "C"]
    a = ratings[ratings.unique_id == "A"].iloc[0]
    assert a["wins"] == 19 and a["losses"] == 1 and a["games_played"] == 20
    assert a["win_rate"] == pytest.approx(19 / 20)


@pytest.fixture
def exported_models(tmp_path):
    from rl_selfplay_mnk_tpu.models.registry import (
        create_model_from_architecture,
        init_network,
    )
    from rl_selfplay_mnk_tpu.utils.model_export import ModelExporter

    paths = []
    for run, seeds in [("runA", (0, 1)), ("runB", (2,))]:
        exporter = ModelExporter(run, base_dir=str(tmp_path / "models"))
        for it, seed in enumerate(seeds):
            module, arch_params = create_model_from_architecture(
                "cnn_b_s", (2, 3, 3), 9
            )
            variables = init_network(module, (2, 3, 3), jax.random.PRNGKey(seed))
            exporter.export_model(variables, "cnn_b_s", arch_params, it)
        paths.append(str(tmp_path / "models" / run))
    return paths


def test_loader_and_tournament_end_to_end(exported_models, tmp_path):
    loader = ModelLoader()
    models = loader.load_from_paths(exported_models)
    assert len(models) == 3
    assert models[0].unique_id == "runA/model_00000"

    runner = MatchRunner(GameConfig(3, 3, 3), seed=0)
    results = runner.run_tournament_batched(models, games_per_pair=8)
    assert len(results) == 3  # 3 pairings
    assert (results["total_games"] == 8).all()
    assert (
        results["player1_wins"] + results["player2_wins"] + results["draws"] == 8
    ).all()

    ratings = ELOTracker().calculate_ratings(results)
    assert len(ratings) == 3
    assert ratings["games_played"].sum() == 3 * 8 * 2

    from rl_selfplay_mnk_tpu.compare.visualizer import ResultsVisualizer

    viz_dir = str(tmp_path / "viz")
    ResultsVisualizer(viz_dir).create_all_visualizations(ratings)
    assert os.path.exists(os.path.join(viz_dir, "elo_progression.png"))
    assert os.path.exists(os.path.join(viz_dir, "elo_progression.html"))


def test_compare_models_cli(exported_models, tmp_path, monkeypatch, capsys):
    monkeypatch.chdir(tmp_path)
    from rl_selfplay_mnk_tpu.compare_models import main

    main(exported_models + ["--games", "4", "--board", "3", "3", "3"])
    out_root = tmp_path / "comparison_results"
    run_dirs = list(out_root.iterdir())
    assert len(run_dirs) == 1
    files = {p.name for p in run_dirs[0].iterdir()}
    assert {"elo_ratings.csv", "match_results.csv"} <= files


def test_play_cli_random_vs_random_and_replay(tmp_path, monkeypatch, capsys):
    monkeypatch.chdir(tmp_path)
    from rl_selfplay_mnk_tpu.play import main

    main(
        [
            "--p1", "random", "--p2", "random",
            "--m", "3", "--n", "3", "--k", "3",
            "--seed", "0", "--export",
        ]
    )
    out = capsys.readouterr().out
    assert "plays" in out and ("wins!" in out or "Draw!" in out)
    games = [f for f in os.listdir(tmp_path) if f.startswith("game_")]
    assert len(games) == 1
    record = json.load(open(tmp_path / games[0]))
    assert record["mnk"] == [3, 3, 3]
    assert 5 <= len(record["moves"]) <= 9

    main(["--import_game", str(tmp_path / games[0]), "--delay", "0"])
    out = capsys.readouterr().out
    assert "plays" in out


def test_play_cli_model_policy(exported_models, tmp_path, monkeypatch, capsys):
    monkeypatch.chdir(tmp_path)
    from rl_selfplay_mnk_tpu.play import main

    main(
        [
            "--p1", exported_models[0], "--p2", "random",
            "--m", "3", "--n", "3", "--k", "3", "--seed", "1",
        ]
    )
    out = capsys.readouterr().out
    assert "runA/model_00001" in out  # latest iteration resolved from dir


def test_loader_skips_non_model_json(exported_models):
    """A stray JSON (run config, partial write) in a models dir must not
    abort discovery (get_models_from_directory previously KeyError'd)."""
    run_dir = exported_models[0]
    with open(os.path.join(run_dir, "config.json"), "w") as f:
        json.dump({"lr": 3e-4}, f)
    with open(os.path.join(run_dir, "broken.json"), "w") as f:
        f.write("{not json")
    models = ModelLoader().load_from_paths([run_dir])
    assert len(models) == 2  # the two real exports, strays skipped


def test_tournament_bounds_loaded_models(exported_models):
    """run_tournament_batched keeps at most ``batch_size`` models loaded
    (the reference tiles into GPU batches of 8 for the same reason)."""
    from rl_selfplay_mnk_tpu.compare.model_loader import ModelInfo

    models = ModelLoader().load_from_paths(exported_models)
    assert len(models) == 3
    peak = {"n": 0}
    orig_load = ModelInfo.load_model

    def counting_load(self):
        out = orig_load(self)
        loaded_now = sum(1 for m in models if m._loaded is not None)
        peak["n"] = max(peak["n"], loaded_now)
        return out

    ModelInfo.load_model = counting_load
    try:
        runner = MatchRunner(GameConfig(m=3, n=3, k=3), seed=0)
        results = runner.run_tournament_batched(models, 4, batch_size=2)
    finally:
        ModelInfo.load_model = orig_load
    assert len(results) == 3  # all pairs still played
    assert peak["n"] <= 2
    assert all(m._loaded is None for m in models)  # all unloaded at the end
