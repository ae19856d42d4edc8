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

    # Validate EVERY source before touching the previously committed
    # evidence, and stage the whole package into a temp dir swapped in at
    # the end — a failure mid-package must never leave the old
    # continuation half-deleted (round-4 ADVICE finding 4).
    ckpts = sorted(
        glob.glob(f"checkpoints/{run}/*"), key=lambda p: int(os.path.basename(p))
    )
    assert ckpts, f"no checkpoints under checkpoints/{run}"
    src_jsonl = f"runs/{run}.jsonl"
    assert os.path.exists(src_jsonl), f"missing {src_jsonl}"
    picked = pick_exports(f"models/{run}", args.exports)
    assert picked, f"no exports under models/{run}"
    latest = ckpts[-1]
    it = os.path.basename(latest)

    staging = f"evidence/.staging_{run}"
    if os.path.exists(staging):
        shutil.rmtree(staging)
    os.makedirs(staging)

    shutil.copytree(latest, f"{staging}/ckpt_{run}/{it}")
    print(f"checkpoint iter {it} staged")

    exp_dir = f"{staging}/exports_{run}"
    os.makedirs(exp_dir)
    for p in picked:
        shutil.copy(p, exp_dir)
        sidecar = p.replace(".msgpack", ".json")
        if os.path.exists(sidecar):
            shutil.copy(sidecar, exp_dir)
    print(f"{len(picked)} exports staged")

    with open(src_jsonl, "rb") as fin, gzip.open(
        f"{staging}/{run}_metrics.jsonl.gz", "wb"
    ) as fout:
        shutil.copyfileobj(fin, fout)
    print(f"{src_jsonl} staged (gzipped)")

    with open(f"{staging}/ckpt_{run}/RESUME.md", "w") as f:
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

The checkpoint is platform-portable: utils/checkpoint.restore_checkpoint
passes orbax an abstract target with the caller's LOCAL shardings, and
restore_checkpoint_portable restores with no template at all — a
TPU-saved checkpoint inspects/restores fine in a CPU-only process
(tests/test_portable_restore.py pins this against the committed
artifact).
"""
        )

    # Swap the staged package in. Two rename-only phases so an interruption
    # can never mix old and new artifacts destructively: first every old
    # artifact moves aside into a backup dir (renames, same filesystem),
    # then every staged artifact renames into place; only after both
    # phases does anything get deleted.
    rels = (f"ckpt_{run}", f"exports_{run}", f"{run}_metrics.jsonl.gz")
    backup = f"evidence/.old_{run}"
    if os.path.exists(backup):
        shutil.rmtree(backup)
    os.makedirs(backup)
    for rel in rels:
        dst = f"evidence/{rel}"
        if os.path.exists(dst):
            os.rename(dst, f"{backup}/{rel}")
    for rel in rels:
        os.rename(f"{staging}/{rel}", f"evidence/{rel}")
    shutil.rmtree(backup)
    os.rmdir(staging)
    print(f"packaged: evidence/ckpt_{run}/{it}, evidence/exports_{run}, "
          f"evidence/{run}_metrics.jsonl.gz")


if __name__ == "__main__":
    main()
