"""Tournament CLI: round-robin + ELO + CSVs + charts.

Parity with reference src/compare_models.py:14-126: positional model paths
(files/dirs/globs), ``--games``, ``--board M N K``, ``--output``; writes
``elo_ratings.csv`` + ``match_results.csv`` under a timestamped directory
and renders the ELO chart.

Usage:
    python -m rl_selfplay_mnk_tpu.compare_models models/runA models/runB \
        --games 64 --board 9 9 5
"""

from __future__ import annotations

import argparse
import os
from datetime import datetime

from .compare.elo import ELOTracker
from .compare.match_runner import GameConfig, MatchRunner
from .compare.model_loader import ModelLoader
from .compare.visualizer import ResultsVisualizer


def main(argv=None) -> None:
    parser = argparse.ArgumentParser(description="Compare trained MNK models")
    parser.add_argument(
        "paths", nargs="+", help="model files, directories, or globs"
    )
    parser.add_argument(
        "--games", "-g", type=int, default=50,
        help="games per pairing (default: 50)",
    )
    parser.add_argument(
        "--board", "-b", type=int, nargs=3, default=[9, 9, 5],
        metavar=("M", "N", "K"),
        help="board dimensions M x N and win condition K (default: 9 9 5)",
    )
    parser.add_argument(
        "--device", "-d", choices=["cpu", "tpu"], default=None,
        help="JAX platform to run matches on (default: auto-detect)",
    )
    parser.add_argument(
        "--output", "-o", default="comparison_results",
        help="output directory for results (default: comparison_results)",
    )
    parser.add_argument("--seed", type=int, default=0)
    args = parser.parse_args(argv)

    if args.device is not None:
        # Must land before the first array op initializes a backend
        # (reference picks a torch device string the same way, :58-64).
        import jax

        jax.config.update("jax_platforms", args.device)

    loader = ModelLoader()
    models = loader.load_from_paths(args.paths)
    print(f"Loaded {len(models)} models")
    if len(models) < 2:
        print("Need at least 2 models to compare")
        return

    m, n, k = args.board
    runner = MatchRunner(GameConfig(m=m, n=n, k=k), seed=args.seed)
    results = runner.run_tournament_batched(models, args.games)

    tracker = ELOTracker()
    ratings = tracker.calculate_ratings(results)

    out_dir = os.path.join(
        args.output, datetime.now().strftime("%Y%m%d_%H%M%S")
    )
    os.makedirs(out_dir, exist_ok=True)
    ratings.to_csv(os.path.join(out_dir, "elo_ratings.csv"), index=False)
    results.to_csv(os.path.join(out_dir, "match_results.csv"), index=False)
    print(f"Results saved to {out_dir}")
    print(ratings.to_string(index=False))

    ResultsVisualizer(out_dir).create_all_visualizations(ratings)


if __name__ == "__main__":
    main()
