"""Package an in-flight full13 run so the NEXT session can resume it.

Round-3 lesson: the 200M-step transformer checkpoint lived only in
gitignored ``checkpoints/``/``runs/`` and did not survive the session
boundary — the 600M-horizon evidence (reference src/train_all_13.py:18-21)
had to restart from scratch. This tool copies everything a resume needs
into committed ``evidence/`` paths:

  * the LATEST orbax checkpoint dir        -> evidence/ckpt_full13_<arch>/<iter>/
  * N evenly spaced model exports + final  -> evidence/exports_full13_<arch>/
  * the gzipped metrics stream             -> evidence/full13_<arch>_metrics.jsonl.gz
  * a RESUME.md with the exact commands

Resume in a fresh clone:

    mkdir -p checkpoints models runs
    cp -r evidence/ckpt_full13_<arch>/<iter> checkpoints/full13_<arch>/<iter>
    cp evidence/exports_full13_<arch>/* models/full13_<arch>/
    gunzip -c evidence/full13_<arch>_metrics.jsonl.gz > runs/full13_<arch>.jsonl
    python tools/run_full13.py --arch <arch> --resume --checkpoint-interval 150
"""

from __future__ import annotations

import argparse
import glob
import gzip
import os
import shutil
import sys

_HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, _HERE)

from full13_evidence import pick_exports  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--arch", default="transformer_b_s_w")
    ap.add_argument("--run-name", default=None)
    ap.add_argument("--exports", type=int, default=14)
    args = ap.parse_args()
    run = args.run_name or f"full13_{args.arch}"

    ckpts = sorted(
        glob.glob(f"checkpoints/{run}/*"), key=lambda p: int(os.path.basename(p))
    )
    assert ckpts, f"no checkpoints under checkpoints/{run}"
    latest = ckpts[-1]
    it = os.path.basename(latest)
    dst_ckpt = f"evidence/ckpt_{run}/{it}"
    if os.path.exists(os.path.dirname(dst_ckpt)):
        shutil.rmtree(os.path.dirname(dst_ckpt))
    shutil.copytree(latest, dst_ckpt)
    print(f"checkpoint iter {it} -> {dst_ckpt}")

    exp_dir = f"evidence/exports_{run}"
    if os.path.exists(exp_dir):
        shutil.rmtree(exp_dir)
    os.makedirs(exp_dir)
    picked = pick_exports(f"models/{run}", args.exports)
    for p in picked:
        shutil.copy(p, exp_dir)
        sidecar = p.replace(".msgpack", ".json")
        if os.path.exists(sidecar):
            shutil.copy(sidecar, exp_dir)
    print(f"{len(picked)} exports -> {exp_dir}")

    src_jsonl = f"runs/{run}.jsonl"
    dst_jsonl = f"evidence/{run}_metrics.jsonl.gz"
    with open(src_jsonl, "rb") as fin, gzip.open(dst_jsonl, "wb") as fout:
        shutil.copyfileobj(fin, fout)
    print(f"{src_jsonl} -> {dst_jsonl}")

    with open(f"evidence/ckpt_{run}/RESUME.md", "w") as f:
        f.write(
            f"""# Resuming the {run} 600M-horizon recipe

This checkpoint is iteration {it} of the reference big-board recipe
(600M env steps total, src/train_all_13.py:18-21). To continue:

    mkdir -p checkpoints/{run} models/{run} runs
    cp -r evidence/ckpt_{run}/{it} checkpoints/{run}/{it}
    cp evidence/exports_{run}/* models/{run}/
    gunzip -c evidence/{run}_metrics.jsonl.gz > runs/{run}.jsonl
    python tools/run_full13.py --arch {args.arch} --resume \\
        --checkpoint-interval 150

Then refresh the evidence:

    python tools/full13_evidence.py --arch {args.arch} --games 32 \\
        --out-prefix evidence/full13_tbsw
    python tools/package_full13_continuation.py --arch {args.arch}
"""
        )
    print(f"wrote evidence/ckpt_{run}/RESUME.md")


if __name__ == "__main__":
    main()
