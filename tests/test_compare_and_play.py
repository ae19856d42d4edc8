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


def _random_match_df(n_matches, n_players, seed):
    rng = np.random.default_rng(seed)
    p1 = rng.integers(0, n_players, n_matches)
    p2 = (p1 + 1 + rng.integers(0, n_players - 1, n_matches)) % n_players
    w1 = rng.integers(0, 11, n_matches)
    d = rng.integers(0, 11 - w1)
    w2 = 10 - w1 - d
    return pd.DataFrame(
        {
            "player1_unique_id": [f"P{i}" for i in p1],
            "player2_unique_id": [f"P{i}" for i in p2],
            "player1_run_name": [f"run{i % 3}" for i in p1],
            "player2_run_name": [f"run{i % 3}" for i in p2],
            "player1_iteration": p1,
            "player2_iteration": p2,
            "total_games": 10,
            "player1_wins": w1,
            "player2_wins": w2,
            "draws": d,
            "player1_score": (w1 + 0.5 * d) / 10,
            "player2_score": (w2 + 0.5 * d) / 10,
        }
    )


def _sequential_oracle(df, initial=1500.0, k=32.0):
    """Scalar Gauss-Seidel sweep: the reference tracker's contract
    (elo_tracker.py:26-44) restated as a straight-line test oracle."""
    ratings = {p: initial for p in set(df.player1_unique_id) | set(df.player2_unique_id)}
    cols = list(zip(df.player1_unique_id, df.player2_unique_id, df.player1_score, df.player2_score))
    for _ in range(50):
        total = 0.0
        for a, b, sa, sb in cols:
            ea = 1.0 / (1.0 + 10.0 ** ((ratings[b] - ratings[a]) / 400.0))
            da = k * (sa - ea)
            db = k * (sb - (1.0 - ea))
            ratings[a] += da
            ratings[b] += db
            total += abs(da) + abs(db)
        if total / (2 * len(cols)) < 0.1:
            break
    return ratings


@pytest.fixture(params=["native", "wavefront"])
def elo_path(request, monkeypatch):
    """Run ELO tests through both the C sweep and the numpy fallback."""
    import rl_selfplay_mnk_tpu.compare.elo as elo_mod

    if request.param == "wavefront":
        monkeypatch.setattr(elo_mod, "_native_tried", True)
        monkeypatch.setattr(elo_mod, "_native_lib", None)
    else:
        if elo_mod._load_native() is None:
            pytest.skip("no C compiler available")
    return request.param


def test_elo_sweep_matches_sequential_oracle_exactly(elo_path):
    """Both the native sweep and the vectorized wavefront sweep must be
    float64-identical to the sequential per-match sweep the reference
    performs (dependency-exact scheduling, not an approximation)."""
    df = _random_match_df(300, 17, seed=3)
    got = ELOTracker().calculate_ratings(df)
    want = _sequential_oracle(df)
    for _, row in got.iterrows():
        assert row["rating"] == pytest.approx(round(want[row["unique_id"]], 2), abs=0)


def test_elo_golden_fixture():
    """Regression pin: exact ratings on a fixed match list."""
    df = _random_match_df(40, 6, seed=0)
    got = ELOTracker().calculate_ratings(df).set_index("unique_id")["rating"]
    want = _sequential_oracle(df)
    for pid, r in want.items():
        assert got[pid] == round(r, 2)


def test_elo_self_match_rows_match_oracle(elo_path):
    """p1 == p2 rows apply BOTH rating updates to the one entry (the
    reference's dict `+=` semantics); read-before-write sweeps must not
    drop the first update. Scores are made asymmetric so da + db != 0."""
    df = _random_match_df(60, 8, seed=5)
    self_rows = df.sample(n=6, random_state=7).index
    for col in ("player2_unique_id", "player2_run_name", "player2_iteration"):
        df.loc[self_rows, col] = df.loc[self_rows, col.replace("2", "1")].values
    df.loc[self_rows, "player2_score"] = 0.9  # asymmetric: da+db != 0
    got = ELOTracker().calculate_ratings(df).set_index("unique_id")["rating"]
    want = _sequential_oracle(df)
    for pid, r in want.items():
        assert got[pid] == round(r, 2)


def test_elo_wavefront_speed():
    """10k matches must rate in well under a second (VERDICT.md item 2)."""
    import time

    df = _random_match_df(10_000, 64, seed=1)
    t0 = time.perf_counter()
    ratings = ELOTracker().calculate_ratings(df)
    dt = time.perf_counter() - t0
    assert len(ratings) == 64
    assert dt < 1.0, f"10k-match ELO took {dt:.2f}s"


def test_elo_wavefront_schedule_properties():
    """No player twice in a wave; waves preserve per-player match order."""
    from rl_selfplay_mnk_tpu.compare.elo import wavefront_schedule

    rng = np.random.default_rng(2)
    p1 = rng.integers(0, 9, 200)
    p2 = (p1 + 1 + rng.integers(0, 8, 200)) % 9
    order, bounds = wavefront_schedule(p1, p2, 9)
    seen_wave = {}
    for w in range(len(bounds) - 1):
        sel = order[bounds[w] : bounds[w + 1]]
        players = np.concatenate([p1[sel], p2[sel]])
        assert len(set(players.tolist())) == len(players)  # disjoint in wave
        for i in sel:
            for p in (p1[i], p2[i]):
                assert seen_wave.get(p, -1) < w  # deps in earlier waves
                seen_wave[p] = w


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
    html = open(os.path.join(viz_dir, "elo_progression.html")).read()
    # interactive contract (reference plotly chart): inline data + SVG chart
    # + hover tooltip + toggleable legend, all self-contained (no CDN deps)
    assert "<svg" in html and "const DATA" in html
    assert "tip" in html and "mousemove" in html and "legend" in html
    # self-contained: no external scripts/styles/images fetched
    assert 'src="http' not in html and 'href="http' not in html
    for uid in ratings["unique_id"]:
        assert str(uid).split("/")[0] in html  # run names reach the page
    datasets = json.loads(html.split("const DATA = ")[1].split(";\n")[0])
    pts = {
        (s["run"], p["iteration"]): p for s in datasets for p in s["points"]
    }
    row = ratings.iloc[0]
    pt = pts[(str(row["run_name"]), int(row["iteration"]))]
    assert pt["rating"] == float(row["rating"])
    assert pt["wins"] == int(row["wins"])


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


def test_full13_evidence_pick_exports(tmp_path):
    """Evenly spaced export selection always includes first+last, dedups,
    and survives degenerate --exports values (review finding: n=1 divided
    by zero after the summary was already written)."""
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).parents[1] / "tools"))
    from full13_evidence import pick_exports

    for i in (5, 100, 2040, 3395, 6103):
        (tmp_path / f"model_{i:05d}.msgpack").write_bytes(b"x")
    all_paths = pick_exports(str(tmp_path), 10)
    assert len(all_paths) == 5  # fewer exports than requested: all of them
    three = pick_exports(str(tmp_path), 3)
    assert [p.split("model_")[-1] for p in three] == [
        "00005.msgpack", "02040.msgpack", "06103.msgpack"
    ]
    one = pick_exports(str(tmp_path), 1)
    assert [p.split("model_")[-1] for p in one] == [
        "00005.msgpack", "06103.msgpack"
    ]
