"""Collect the full-horizon 13x13x5 evidence (round-2 VERDICT item 1).

After ``tools/run_full13.py`` finishes:

    python tools/full13_evidence.py --arch resnet_b_s --games 32

Produces:
  * evidence/full13_summary.json   — run summary (tools/summarize_run.py)
  * evidence/full13_elo.csv        — ELO over N evenly spaced exports
  * evidence/full13_matches.csv    — the tournament's match rows
"""

from __future__ import annotations

import argparse
import glob
import os
import shutil
import sys

_HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.join(_HERE, ".."))
sys.path.insert(0, _HERE)

from summarize_run import summarize  # noqa: E402  (tools sibling)


def pick_exports(model_dir: str, n: int) -> list:
    """N evenly spaced exports by iteration number (always includes the
    first and last)."""
    paths = sorted(
        glob.glob(os.path.join(model_dir, "model_*.msgpack")),
        key=lambda p: int(os.path.basename(p)[6:11]),
    )
    assert len(paths) >= 2, f"not enough exports in {model_dir}"
    if len(paths) <= n:
        return paths
    if n < 2:  # a 1-export "tournament" is meaningless; keep first+last
        return [paths[0], paths[-1]]
    idx = [round(i * (len(paths) - 1) / (n - 1)) for i in range(n)]
    return [paths[i] for i in sorted(set(idx))]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--arch", default="resnet_b_s")
    ap.add_argument("--run-name", default=None)
    ap.add_argument("--exports", type=int, default=10)
    ap.add_argument("--games", type=int, default=32)
    ap.add_argument("--out-prefix", default="evidence/full13")
    args = ap.parse_args()

    run_name = args.run_name or f"full13_{args.arch}"

    import json

    s = summarize(f"runs/{run_name}.jsonl")
    os.makedirs(os.path.dirname(args.out_prefix) or ".", exist_ok=True)
    with open(f"{args.out_prefix}_summary.json", "w") as f:
        json.dump(s, f, indent=1)
        f.write("\n")
    print(
        f"summary: {s['iterations']} iters, {s['env_steps']:,} steps, "
        f"{s['wall_seconds']:.0f}s wall, "
        f"{s['aggregate_steps_per_sec']:,.0f} steps/s, "
        f"{s['benchmark_promotions']} promotions, {s['errors']} errors"
    )

    from rl_selfplay_mnk_tpu.compare_models import main as compare_main

    paths = pick_exports(f"models/{run_name}", args.exports)
    print(f"tournament over {len(paths)} exports, {args.games} games/pair")
    out_dir = "comparison_results/full13"
    compare_main(
        paths
        + ["--games", str(args.games), "--board", "13", "13", "5",
           "--output", out_dir]
    )
    latest = sorted(glob.glob(os.path.join(out_dir, "*")))[-1]
    shutil.copy(
        os.path.join(latest, "elo_ratings.csv"), f"{args.out_prefix}_elo.csv"
    )
    shutil.copy(
        os.path.join(latest, "match_results.csv"),
        f"{args.out_prefix}_matches.csv",
    )
    print(f"wrote {args.out_prefix}_summary.json / _elo.csv / _matches.csv")


if __name__ == "__main__":
    main()
