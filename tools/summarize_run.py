"""Condense a training-run JSONL into a small committable summary.

The raw metric streams (runs/<name>.jsonl) are multi-MB and git-ignored;
PERFORMANCE.md's claims about full-scale runs are backed by these summaries
in evidence/ instead (VERDICT.md round-1 item 8).

    python tools/summarize_run.py runs/full300m.jsonl -o evidence/full300m_summary.json
"""

from __future__ import annotations

import argparse
import json


def summarize(path: str, keep_every: int = 50) -> dict:
    train, val, watch_keys, errors = [], [], set(), 0
    config = None
    for line in open(path):
        rec = json.loads(line)
        if rec.get("_type") == "config":
            config = rec["config"]
            continue
        if "training/mean_reward" in rec:
            train.append(rec)
        if "validation/vs_benchmark/score_rate" in rec:
            val.append(rec)
        if any(k.startswith("error/") for k in rec):
            errors += 1
        watch_keys |= {k for k in rec if k.startswith(("gradients/", "parameters/"))}

    promotions = sum(
        1 for rec in val
        if rec["validation/vs_benchmark/score_rate"] > 0.60
    )

    def slim(rec):
        return {
            "step": rec.get("_step"),
            "reward": round(rec.get("training/mean_reward", 0.0), 4),
            "length": round(rec.get("training/mean_length", 0.0), 2),
            "entropy": round(rec.get("training/entropy_loss", 0.0), 4),
            "explained_var": round(
                rec.get("training/explained_variance", 0.0), 4
            ),
            "fps": round(rec.get("training/fps", 0.0), 1),
        }

    return {
        "source": path,
        "config": {
            k: config.get(k)
            for k in (
                "mnk", "architecture_name", "num_envs", "n_steps",
                "batch_size", "total_environment_steps", "seed",
            )
        } if config else None,
        "iterations": len(train),
        "env_steps": train[-1]["_step"] if train else 0,
        "wall_seconds": round(train[-1]["_time"] - train[0]["_time"], 1)
        if len(train) > 1 else 0.0,
        "aggregate_steps_per_sec": round(
            (train[-1]["_step"] - train[0]["_step"])
            / max(1e-9, train[-1]["_time"] - train[0]["_time"]),
            1,
        ) if len(train) > 1 else 0.0,
        "validations": len(val),
        "benchmark_promotions": promotions,
        "final_validation": {
            k.split("/")[-1]: round(v, 4)
            for k, v in val[-1].items()
            if k.startswith("validation/")
        } if val else None,
        "errors": errors,
        "watch_keys_logged": len(watch_keys),
        "training_curve_sampled": [slim(r) for r in train[::keep_every]],
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("jsonl")
    ap.add_argument("-o", "--out", default=None)
    ap.add_argument("--keep-every", type=int, default=50)
    args = ap.parse_args()
    s = summarize(args.jsonl, args.keep_every)
    text = json.dumps(s, indent=1)
    if args.out:
        with open(args.out, "w") as f:
            f.write(text + "\n")
        print(f"wrote {args.out} ({len(text)} bytes)")
    else:
        print(text)


if __name__ == "__main__":
    main()
