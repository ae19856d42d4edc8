"""Re-bisect the axon tunnel's single-program execution deadline.

Round-2 measurement (PERFORMANCE.md "Long programs"): a pure-XLA matmul
scan ran 69 s fine and was killed at 97 s ("TPU worker process crashed or
restarted").  Round 3 then observed a 187 s monolithic resnet_b_l update
SURVIVING (2026-08-21), so the limit may be variable or lifted.  This tool
settles it with a ladder of single-program executions of increasing wall
time, all sharing ONE compiled program: the trip count of a
``lax.fori_loop`` is a traced argument, so duration scales without
recompilation.

    python tools/bisect_deadline.py --targets 100 150 210 300

Writes evidence/deadline_bisect_r04.json.  A scalar fetch (float(...))
bounds each timing: ``block_until_ready`` alone does not truly sync on the
axon tunnel (CLAUDE.md "Measurement notes").
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax
import jax.numpy as jnp
from jax import lax

DIM = 4096


@jax.jit
def _burn(x: jax.Array, n: jax.Array) -> jax.Array:
    """n back-to-back DIM x DIM bf16 matmuls; returns a scalar."""

    def body(_, acc):
        return jnp.tanh(acc @ x)

    out = lax.fori_loop(0, n, body, x)
    return out[0, 0].astype(jnp.float32)


def timed_run(x: jax.Array, n: int) -> tuple[float, float]:
    t0 = time.monotonic()
    val = float(_burn(x, jnp.int32(n)))
    return time.monotonic() - t0, val


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--targets", type=float, nargs="+", default=[100.0, 150.0, 210.0, 300.0],
        help="target single-program durations (seconds), run in order",
    )
    ap.add_argument("--calibrate-iters", type=int, default=2000)
    ap.add_argument("--out", default="evidence/deadline_bisect_r04.json")
    args = ap.parse_args()

    dev = jax.devices()[0]
    print(f"device: {dev}", flush=True)
    key = jax.random.PRNGKey(0)
    # Orthogonal-ish scale so tanh keeps values bounded; bf16 for MXU rate.
    x = (jax.random.normal(key, (DIM, DIM)) * (1.0 / DIM**0.5)).astype(jnp.bfloat16)

    # Warmup/compile (tiny trip count), then calibrate per-iteration cost.
    t, _ = timed_run(x, 8)
    print(f"compile+warmup: {t:.1f}s", flush=True)
    t_cal, _ = timed_run(x, args.calibrate_iters)
    per_iter = t_cal / args.calibrate_iters
    print(f"calibrate: {args.calibrate_iters} iters in {t_cal:.2f}s "
          f"-> {per_iter*1e3:.3f} ms/iter", flush=True)

    results = [{"phase": "calibrate", "iters": args.calibrate_iters,
                "seconds": round(t_cal, 2)}]
    for target in args.targets:
        n = max(1, int(target / per_iter))
        print(f"target {target:.0f}s -> {n} iters ... ", end="", flush=True)
        try:
            t, val = timed_run(x, n)
            print(f"SURVIVED: {t:.1f}s (val={val:.4f})", flush=True)
            results.append({"phase": "run", "target_s": target, "iters": n,
                            "seconds": round(t, 2), "outcome": "survived"})
        except Exception as e:  # tunnel kill surfaces as XlaRuntimeError
            msg = f"{type(e).__name__}: {e}"
            print(f"KILLED after target {target:.0f}s attempt: {msg[:200]}",
                  flush=True)
            results.append({"phase": "run", "target_s": target, "iters": n,
                            "outcome": "killed", "error": msg[:500]})
            break

    out = {
        "date": "2026-08-21",
        "device": str(dev),
        "program": f"fori_loop of {DIM}x{DIM} bf16 matmul+tanh, traced trip count",
        "per_iter_ms": round(per_iter * 1e3, 3),
        "results": results,
    }
    # dirname is '' for a bare filename — fall back to cwd
    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
    print(f"wrote {args.out}", flush=True)


if __name__ == "__main__":
    main()
