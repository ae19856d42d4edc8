"""Training-level A/B of league matchmaking (round-2 VERDICT item 6).

The reference README promises "performance-based weighted sampling" it
never implements (SURVEY.md §2.1); this repo built it as League/PFSP
(selfplay/league.py). This harness measures whether it DOES anything at
training level: three identical runs (same seed/config/arch) differing
only in matchmaking — reference uniform pool vs pfsp_even vs pfsp_hard —
then a cross-tournament of their final exports.

    python tools/pfsp_ab.py --iters 500          # ~15 min on one chip
    -> evidence/pfsp_ab.json (promotions, validation trail, cross-ELO)
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))


def run_one(mode, iters: int, seed: int, size_over: dict) -> dict:
    from rl_selfplay_mnk_tpu.train import get_default_config, train_mnk
    from rl_selfplay_mnk_tpu.utils.metrics import MetricsLogger

    config = get_default_config()
    config.update(size_over)
    run_name = f"pfsp_ab_{mode or 'uniform_ref'}"
    config.update(
        total_environment_steps=config["num_envs"] * config["n_steps"] * iters,
        matchmaking=mode,
        seed=seed,
        run_name=run_name,
        watch_interval=0,
    )
    with MetricsLogger(
        project="mnk_ab", run_name=run_name, config=config,
        group="pfsp_ab", tags=["pfsp_ab", str(mode)], use_wandb=False,
    ) as logger:
        train_mnk(config, logger)
        jsonl = logger.jsonl_path

    vals, promotions = [], 0
    for line in open(jsonl):
        rec = json.loads(line)
        score = rec.get("validation/vs_benchmark/score_rate")
        if score is not None:
            vals.append(round(score, 4))
            if score > config["benchmark_update_threshold_score"]:
                promotions += 1
    return {
        "mode": mode or "uniform_ref",
        "run_name": run_name,
        "iterations": iters,
        "promotions": promotions,
        "validations": len(vals),
        "validation_score_trail": vals[-10:],
        "final_export": max(
            glob.glob(f"models/{run_name}/model_*.msgpack")
        ),
    }


def cross_tournament(results, games: int, out_dir: str, board) -> dict:
    """Round-robin the three final exports; return name -> ELO."""
    import pandas as pd

    from rl_selfplay_mnk_tpu.compare_models import main as compare_main

    paths = [r["final_export"] for r in results]
    compare_main(paths + ["--games", str(games), "--board", *board,
                          "--output", out_dir])
    # compare_models saves under a timestamped subdir of out_dir
    csvs = sorted(glob.glob(os.path.join(out_dir, "*", "elo_ratings.csv")))
    df = pd.read_csv(csvs[-1])
    return {
        row["run_name"]: {
            "elo": round(float(row["rating"]), 1),
            "win_rate": round(float(row["win_rate"]), 4),
        }
        for _, row in df.iterrows()
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=500)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--games", type=int, default=128)
    ap.add_argument("--out", default="evidence/pfsp_ab.json")
    # smoke-scale overrides (tests / CPU)
    ap.add_argument("--mnk", type=int, nargs=3, default=None)
    ap.add_argument("--num-envs", type=int, default=None)
    ap.add_argument("--n-steps", type=int, default=None)
    ap.add_argument("--batch-size", type=int, default=None)
    ap.add_argument("--validation-episodes", type=int, default=None)
    args = ap.parse_args()

    size_over = {}
    if args.mnk:
        size_over["mnk"] = tuple(args.mnk)
    for key in ("num_envs", "n_steps", "batch_size", "validation_episodes"):
        v = getattr(args, key)
        if v is not None:
            size_over[key] = v

    results = [
        run_one(mode, args.iters, args.seed, size_over)
        for mode in (None, "pfsp_even", "pfsp_hard")
    ]
    board = [str(x) for x in (args.mnk or (9, 9, 5))]
    elo = cross_tournament(
        results, args.games, "comparison_results/pfsp_ab", board
    )
    for r in results:
        r["cross_tournament"] = elo.get(r["run_name"])

    out = {"config": {"iters": args.iters, "seed": args.seed,
                      "games_per_pair": args.games},
           "runs": results}
    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
        f.write("\n")
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
