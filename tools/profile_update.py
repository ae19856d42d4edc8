"""Profile-guided attribution of the PPO update phase (ROADMAP item).

Captures an XLA profiler trace of one rollout and one update-epoch program
at bench scale and prints a per-op-category time table from the device's
"XLA Ops" trace lane. Device-side traces DO come through the axon tunnel
(verified: XLA Modules / XLA Ops / Async XLA Ops lanes all populate).

Usage:
    python tools/profile_update.py [--arch resnet_b_s] [--num-envs 8192]
    python tools/profile_update.py --keep-trace   # leave trace dir for xprof
"""

from __future__ import annotations

import argparse
import collections
import glob
import gzip
import json
import os
import re
import shutil
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import optax


def capture(arch: str, num_envs: int, n_steps: int, trace_dir: str):
    from rl_selfplay_mnk_tpu.alg import PPOConfig, PPOLearner
    from rl_selfplay_mnk_tpu.alg.ppo import pick_group_size
    from rl_selfplay_mnk_tpu.env import EnvConfig
    from rl_selfplay_mnk_tpu.models.registry import (
        create_model_from_architecture,
        init_network,
        make_apply_fns,
    )
    from rl_selfplay_mnk_tpu.selfplay.policies import make_network_policy
    from rl_selfplay_mnk_tpu.utils.hardware import detect_hardware_config

    hw = detect_hardware_config()
    env_cfg = EnvConfig(9, 9, 5)
    module, _ = create_model_from_architecture(
        arch, (2, 9, 9), 81, dtype=hw.compute_dtype
    )
    variables = init_network(module, (2, 9, 9), jax.random.PRNGKey(0))
    eval_apply, _ = make_apply_fns(module)
    policy_act = make_network_policy(eval_apply)
    config = PPOConfig(
        env=env_cfg,
        num_envs=num_envs,
        n_steps=n_steps,
        batch_size=8192,
        ppo_epochs=4,
        shuffle="grouped" if hw.is_accelerator else "global",
        group_size=pick_group_size(8192),
        # one program per epoch so the trace shows a single-epoch module
        update_chunks=4,
    )
    optimizer = optax.flatten(
        optax.chain(
            optax.clip_by_global_norm(0.5),
            optax.adamw(5e-4, eps=1e-5, weight_decay=0.01),
        )
    )
    learner = PPOLearner(module, config, optimizer, variables, jax.random.PRNGKey(1))
    opponent = learner.variables

    # warm: compile everything outside the trace window
    learner.learn(policy_act, opponent, entropy_coef=0.01)
    jax.profiler.start_trace(trace_dir)
    learner.learn(policy_act, opponent, entropy_coef=0.01)
    jax.profiler.stop_trace()


def analyze(trace_dir: str):
    """Aggregate the device "XLA Ops" lane by HLO category and by tf_op.

    Every op event carries ``hlo_category``, ``tf_op`` (the full jax source
    scope, so forward vs backward [transpose(jvp(...))] and module names are
    distinguishable), ``model_flops`` and ``raw_bytes_accessed`` — enough to
    print achieved TFLOP/s / GB/s per category. ``while``/control events are
    containers that double-count their bodies and are excluded.
    """
    paths = sorted(glob.glob(os.path.join(trace_dir, "**/*.trace.json.gz"),
                             recursive=True))
    if not paths:
        sys.exit("no trace captured")
    with gzip.open(paths[-1]) as f:
        t = json.load(f)
    ev = t.get("traceEvents", [])
    pids, tids = {}, {}
    for e in ev:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pids[e["pid"]] = e["args"]["name"]
        if e.get("ph") == "M" and e.get("name") == "thread_name":
            tids[(e["pid"], e["tid"])] = e["args"]["name"]

    modules = collections.Counter()
    mod_counts = collections.Counter()
    cats = collections.Counter()
    cat_flops = collections.Counter()
    cat_bytes = collections.Counter()
    ops = collections.Counter()
    for e in ev:
        if e.get("ph") != "X" or "TPU" not in pids.get(e["pid"], ""):
            continue
        lane = tids.get((e["pid"], e["tid"]), "")
        dur = e.get("dur", 0.0)
        if lane == "XLA Modules":
            name = re.sub(r"\(\d+\)$", "", e["name"])
            modules[name] += dur
            mod_counts[name] += 1
        elif lane == "XLA Ops":
            a = e.get("args") or {}
            hc = a.get("hlo_category", "?")
            if hc == "control flow" or e["name"].startswith(
                ("while", "condition", "body")
            ):
                continue
            tf_op = a.get("tf_op", "?")
            # fwd vs bwd: jax marks cotangent computations transpose(jvp(..))
            direction = "bwd" if "transpose(jvp" in tf_op else "fwd"
            cats[(hc, direction)] += dur
            cat_flops[(hc, direction)] += float(a.get("model_flops", 0) or 0)
            cat_bytes[(hc, direction)] += float(
                a.get("raw_bytes_accessed", 0) or 0
            )
            ops[(hc, tf_op[:100])] += dur

    print("\n== XLA Modules (device-side wall, ms) ==")
    for name, d in modules.most_common(12):
        print(f"  {d/1e3:9.2f} ms  x{mod_counts[name]:<4d} {name}")

    total = sum(cats.values())
    print(f"\n== XLA Ops by (category, direction) — total {total/1e3:.1f} ms ==")
    for key, d in cats.most_common():
        hc, direction = key
        tf = cat_flops[key] / (d * 1e-6) / 1e12 if d else 0.0
        gb = cat_bytes[key] / (d * 1e-6) / 1e9 if d else 0.0
        print(f"  {d/1e3:9.2f} ms {100*d/total:5.1f}%  {hc:24s} {direction}"
              f"  {tf:7.1f} TF/s {gb:8.1f} GB/s")

    print("\n== Top 25 op sites ==")
    for (hc, tf_op), d in ops.most_common(25):
        print(f"  {d/1e3:9.2f} ms  {hc:22s} {tf_op}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--arch", default="resnet_b_s")
    ap.add_argument("--num-envs", type=int, default=8192)
    ap.add_argument("--n-steps", type=int, default=256)
    ap.add_argument("--keep-trace", action="store_true")
    ap.add_argument("--trace-dir", default=None)
    args = ap.parse_args()

    trace_dir = args.trace_dir or tempfile.mkdtemp(prefix="xla_trace_")
    try:
        capture(args.arch, args.num_envs, args.n_steps, trace_dir)
        analyze(trace_dir)
        if args.keep_trace:
            print(f"\ntrace kept at {trace_dir}")
    finally:
        if not args.keep_trace and args.trace_dir is None:
            shutil.rmtree(trace_dir, ignore_errors=True)


if __name__ == "__main__":
    main()
