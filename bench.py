"""Headline benchmark: env-steps/s for 9x9x5 self-play PPO (one chip).

Measures the full training iteration (self-play rollout + PPO update) on
the reference's default workload — 9x9x5 board, resnet_b_s — at a
TPU-appropriate env count, and prints ONE JSON line.

``vs_baseline`` divides by the reference's measured throughput on this
machine (273 env-steps/s — its torch-CPU path, the only one it can run
here; measured by tools/reference_baseline.py through the reference's own
unmodified code — the reference publishes no numbers of its own, see
BASELINE.md). ``vs_north_star`` additionally reports the fraction of the
10M-aggregate multi-chip north star.
"""

REFERENCE_MEASURED_STEPS_PER_SEC = 273.0  # tools/reference_baseline.py
NORTH_STAR_STEPS_PER_SEC = 10_000_000.0

import argparse
import json
import sys
import time

import jax
import jax.numpy as jnp
import optax


def run_bench(
    num_envs: int,
    n_steps: int,
    iters: int,
    warmup: int,
    arch: str,
    use_pallas: bool = False,
    update_chunks: int = 0,
    mnk=(9, 9, 5),
    batch_size: int = 8192,
):
    from rl_selfplay_mnk_tpu.alg import PPOConfig, PPOLearner
    from rl_selfplay_mnk_tpu.env import EnvConfig
    from rl_selfplay_mnk_tpu.models.registry import (
        create_model_from_architecture,
        init_network,
        make_apply_fns,
    )
    from rl_selfplay_mnk_tpu.selfplay.policies import make_network_policy
    from rl_selfplay_mnk_tpu.utils.hardware import detect_hardware_config

    hw = detect_hardware_config()
    m_, n_, k_ = mnk
    env_cfg = EnvConfig(m_, n_, k_, use_pallas=use_pallas)
    obs_shape = (2, m_, n_)
    module, _ = create_model_from_architecture(
        arch, obs_shape, m_ * n_, dtype=hw.compute_dtype
    )
    variables = init_network(module, obs_shape, jax.random.PRNGKey(0))
    eval_apply, _ = make_apply_fns(module)
    policy_act = make_network_policy(eval_apply)

    from rl_selfplay_mnk_tpu.alg.ppo import pick_group_size

    if update_chunks == 0:
        # auto: the 5-layer transformers' 4-epoch update exceeds the axon
        # tunnel's ~90s single-execution deadline at bench scale; per-epoch
        # dispatch is bit-identical and costs ~3 extra round trips/iter.
        update_chunks = 4 if "transformer" in arch else 1
    config = PPOConfig(
        env=env_cfg,
        num_envs=num_envs,
        n_steps=n_steps,
        batch_size=batch_size,
        ppo_epochs=4,
        shuffle="grouped" if hw.is_accelerator else "global",
        group_size=pick_group_size(batch_size),
        update_chunks=update_chunks,
    )
    optimizer = optax.flatten(
        optax.chain(
            optax.clip_by_global_norm(0.5),
            optax.adamw(5e-4, eps=1e-5, weight_decay=0.01),
        )
    )
    learner = PPOLearner(module, config, optimizer, variables, jax.random.PRNGKey(1))

    # Self-play vs a snapshot of the network — the 85% branch of the
    # reference's opponent schedule, i.e. the steady-state workload.
    opponent = learner.variables

    for _ in range(warmup):
        learner.learn(policy_act, opponent, entropy_coef=0.01)

    # one precisely-timed iteration for the phase split...
    m = learner.learn(policy_act, opponent, entropy_coef=0.01)
    rollout_t = m.rollout_time * iters
    learn_t = m.learn_time * iters

    # ...then the throughput measurement with no mid-iteration syncs
    steps_per_iter = num_envs * n_steps
    t0 = time.perf_counter()
    for _ in range(iters):
        learner.learn(policy_act, opponent, entropy_coef=0.01, precise_timing=False)
    total = time.perf_counter() - t0

    throughput = steps_per_iter * iters / total
    rollout_fps = steps_per_iter * iters / rollout_t if rollout_t else 0.0
    return {
        "throughput": throughput,
        "rollout_fps": rollout_fps,
        "rollout_time_per_iter": rollout_t / iters,
        "learn_time_per_iter": learn_t / iters,
        "steps_per_iter": steps_per_iter,
    }


def run_bench_fused(
    num_envs: int,
    n_steps: int,
    iters: int,
    warmup: int,
    arch: str,
    use_pallas: bool = False,
):
    """Throughput of the device-resident fused pipeline (alg/fused.py),
    dispatch auto-selected like train_fused: the scanned single-program
    block at small per-iteration work, per-iteration host-dispatched
    programs (fetch-free) at bench scale — the mode that matches the
    host-loop's buffer aliasing (evidence/fused_ablation_8192.log)."""
    from rl_selfplay_mnk_tpu.alg import PPOConfig, PPOLearner
    from rl_selfplay_mnk_tpu.alg.fused import train_block, train_step_iteration
    from rl_selfplay_mnk_tpu.alg.ppo import pick_group_size
    from rl_selfplay_mnk_tpu.alg.schedules import make_entropy_coef_fn
    from rl_selfplay_mnk_tpu.env import EnvConfig
    from rl_selfplay_mnk_tpu.models.registry import (
        create_model_from_architecture,
        init_network,
        make_apply_fns,
    )
    from rl_selfplay_mnk_tpu.selfplay.opponent_pool import pool_add, pool_init
    from rl_selfplay_mnk_tpu.selfplay.policies import make_network_policy
    from rl_selfplay_mnk_tpu.utils.hardware import detect_hardware_config

    hw = detect_hardware_config()
    env_cfg = EnvConfig(9, 9, 5, use_pallas=use_pallas)
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
    )
    optimizer = optax.flatten(
        optax.chain(
            optax.clip_by_global_norm(0.5),
            optax.adamw(5e-4, eps=1e-5, weight_decay=0.01),
        )
    )
    learner = PPOLearner(module, config, optimizer, variables, jax.random.PRNGKey(1))
    learner.reset_envs(policy_act, learner.variables)
    pool = jax.jit(pool_init, static_argnames=("max_size",))(
        learner.variables, max_size=20
    )
    pool = jax.jit(pool_add)(pool, learner.variables, 1.0)
    entropy_fn = make_entropy_coef_fn(0.01, None, num_envs, n_steps)

    state = (
        learner.params, learner.batch_stats, learner.opt_state, pool,
        learner._sp_state, learner._obs, learner._ep_rew, learner._ep_len,
    )
    rng = jax.random.PRNGKey(2)

    step_dispatch = num_envs * n_steps >= 1_000_000  # train_fused "auto"

    def block(state, rng, it0, length):
        rng, k = jax.random.split(rng)
        if step_dispatch:
            carry = state[:8] + (k,)
            outs = []
            for j in range(length):
                carry, m = train_step_iteration(
                    module, config, optimizer, policy_act, entropy_fn,
                    0.15, 20, carry, it0 + j, jnp.float32(1.0),
                )
                outs.append(m)  # futures — fetched by the caller
            return carry[:8], rng, outs
        carry, stacked = train_block(
            module, config, optimizer, policy_act, entropy_fn,
            length, 0.15, 20,
            *state[:8], k, jnp.int32(it0), jnp.float32(1.0),
        )
        return carry[:8], rng, stacked

    it0 = 0
    for _ in range(max(warmup, 1)):
        state, rng, stacked = block(state, rng, it0, iters)
        # device_get, not block_until_ready: the latter returns early on the
        # tunnel backend and the warmup block would still be executing when
        # the timed block starts (PERFORMANCE.md "Measurement notes")
        jax.device_get(stacked)
        it0 += iters

    steps_per_iter = num_envs * n_steps
    t0 = time.perf_counter()
    state, rng, stacked = block(state, rng, it0, iters)
    # a host fetch of the stacked metrics is part of the contract
    jax.device_get(stacked)
    total = time.perf_counter() - t0
    return {
        "throughput": steps_per_iter * iters / total,
        "rollout_fps": 0.0,
        "rollout_time_per_iter": 0.0,
        "learn_time_per_iter": total / iters,
        "steps_per_iter": steps_per_iter,
    }


def run_learning_bench_fused(iters: int, arch: str, seed: int = 0, block: int = 25):
    """Learning bench through the device-resident fused pipeline: the full
    opponent schedule (draws, pool inserts, entropy decay) runs on device in
    blocks of ``block`` iterations; same final metric as run_learning_bench."""
    from rl_selfplay_mnk_tpu.alg import PPOConfig, PPOLearner
    from rl_selfplay_mnk_tpu.alg.fused import train_block
    from rl_selfplay_mnk_tpu.alg.ppo import pick_group_size
    from rl_selfplay_mnk_tpu.alg.schedules import make_entropy_coef_fn, make_lr_schedule
    from rl_selfplay_mnk_tpu.env import EnvConfig
    from rl_selfplay_mnk_tpu.models.registry import (
        create_model_from_architecture,
        init_network,
        make_apply_fns,
    )
    from rl_selfplay_mnk_tpu.selfplay import RandomPolicy, validate
    from rl_selfplay_mnk_tpu.selfplay.opponent_pool import pool_add, pool_init
    from rl_selfplay_mnk_tpu.selfplay.policies import make_network_policy
    from rl_selfplay_mnk_tpu.utils.hardware import detect_hardware_config

    hw = detect_hardware_config()
    env_cfg = EnvConfig(9, 9, 5)
    num_envs, n_steps, batch = 384, 256, 8192
    module, _ = create_model_from_architecture(
        arch, (2, 9, 9), 81, dtype=hw.compute_dtype
    )
    variables = init_network(module, (2, 9, 9), jax.random.PRNGKey(seed))
    eval_apply, _ = make_apply_fns(module)
    policy_act = make_network_policy(eval_apply)
    config = PPOConfig(
        env=env_cfg,
        num_envs=num_envs,
        n_steps=n_steps,
        batch_size=batch,
        ppo_epochs=4,
        shuffle="grouped" if hw.is_accelerator else "global",
        group_size=pick_group_size(batch),
    )
    lr_schedule = make_lr_schedule(
        5e-4, 5_000_000, iters * num_envs * n_steps, num_envs, n_steps,
        config.updates_per_iteration,
    )
    optimizer = optax.flatten(
        optax.chain(
            optax.clip_by_global_norm(0.5),
            optax.adamw(lr_schedule, eps=1e-5, weight_decay=0.01),
        )
    )
    learner = PPOLearner(
        module, config, optimizer, variables, jax.random.PRNGKey(seed + 1)
    )
    learner.reset_envs(policy_act, learner.variables)
    pool = jax.jit(pool_init, static_argnames=("max_size",))(
        learner.variables, max_size=20
    )
    pool = jax.jit(pool_add)(pool, learner.variables, 1.0)
    entropy_fn = make_entropy_coef_fn(
        0.04,
        {"type": "linear", "params": {"final_coef": 0.001,
                                      "total_steps": 125_000_000}},
        num_envs, n_steps,
    )

    state = (
        learner.params, learner.batch_stats, learner.opt_state, pool,
        learner._sp_state, learner._obs, learner._ep_rew, learner._ep_len,
    )
    rng = jax.random.PRNGKey(seed + 2)
    t0 = time.perf_counter()
    i = 0
    while i < iters:
        length = min(block, iters - i)
        rng, k = jax.random.split(rng)
        carry, stacked = train_block(
            module, config, optimizer, policy_act, entropy_fn,
            length, 0.15, 20,
            *state, k, jnp.int32(i), jnp.float32(1.0),
        )
        state = carry[:8]
        rew = jax.device_get(stacked["fin_reward"]).sum()
        cnt = jax.device_get(stacked["fin_count"]).sum()
        i += length
        print(
            f"# fused iters {i}: mean reward {rew / max(cnt, 1):+.3f} "
            f"({time.perf_counter() - t0:.0f}s)",
            file=sys.stderr,
        )
    train_time = time.perf_counter() - t0

    rp = RandomPolicy()
    res = validate(
        env_cfg, policy_act,
        {"params": state[0], "batch_stats": state[1]},
        rp.apply, rp.params, 1024, jax.random.PRNGKey(seed + 99),
    )
    return {
        "win_rate": res["validation/vs_benchmark/win_rate"],
        "score_rate": res["validation/vs_benchmark/score_rate"],
        "train_time": train_time,
        "iters": iters,
    }


def run_learning_bench(iters: int, arch: str, seed: int = 0):
    """Train the reference default config (9x9x5, 384 envs) for ``iters``
    iterations of full self-play PPO (opponent schedule included), then
    report win rate vs a random policy — the second tracked metric
    (BASELINE.md: win-rate vs random at 500 iters)."""
    import random as _random

    from rl_selfplay_mnk_tpu.alg import PPOConfig, PPOLearner
    from rl_selfplay_mnk_tpu.alg.ppo import pick_group_size
    from rl_selfplay_mnk_tpu.alg.schedules import entropy_coef_at, make_lr_schedule
    from rl_selfplay_mnk_tpu.env import EnvConfig
    from rl_selfplay_mnk_tpu.models.registry import (
        create_model_from_architecture,
        init_network,
        make_apply_fns,
    )
    from rl_selfplay_mnk_tpu.selfplay import RandomPolicy, validate
    from rl_selfplay_mnk_tpu.selfplay.opponent_pool import OpponentPool
    from rl_selfplay_mnk_tpu.selfplay.policies import make_network_policy
    from rl_selfplay_mnk_tpu.utils.hardware import detect_hardware_config

    hw = detect_hardware_config()
    env_cfg = EnvConfig(9, 9, 5)
    num_envs, n_steps, batch = 384, 256, 8192
    module, _ = create_model_from_architecture(
        arch, (2, 9, 9), 81, dtype=hw.compute_dtype
    )
    variables = init_network(module, (2, 9, 9), jax.random.PRNGKey(seed))
    eval_apply, _ = make_apply_fns(module)
    policy_act = make_network_policy(eval_apply)

    config = PPOConfig(
        env=env_cfg,
        num_envs=num_envs,
        n_steps=n_steps,
        batch_size=batch,
        ppo_epochs=4,
        shuffle="grouped" if hw.is_accelerator else "global",
        group_size=pick_group_size(batch),
    )
    lr_schedule = make_lr_schedule(
        5e-4, 5_000_000, iters * num_envs * n_steps, num_envs, n_steps,
        config.updates_per_iteration,
    )
    optimizer = optax.flatten(
        optax.chain(
            optax.clip_by_global_norm(0.5),
            optax.adamw(lr_schedule, eps=1e-5, weight_decay=0.01),
        )
    )
    learner = PPOLearner(
        module, config, optimizer, variables, jax.random.PRNGKey(seed + 1)
    )
    pool = OpponentPool(max_size=20, seed=seed)
    pool.add_opponent(learner.variables)
    ent_schedule = {
        "type": "linear",
        "params": {"final_coef": 0.001, "total_steps": 125_000_000},
    }
    host_rng = _random.Random(seed)

    t0 = time.perf_counter()
    for i in range(iters):
        opponent = (
            pool.get_random_opponent()
            if host_rng.random() < 0.15
            else learner.variables
        )
        ent = entropy_coef_at(0.04, ent_schedule, i, num_envs, n_steps)
        m = learner.learn(policy_act, opponent, ent)
        if i % 20 == 0:
            pool.add_opponent(learner.variables)
        if i % 25 == 0:
            print(
                f"# iter {i}: reward {m.mean_reward:+.3f} len {m.mean_length:.1f} "
                f"ent {-m.entropy_loss:.3f} ({time.perf_counter()-t0:.0f}s)",
                file=sys.stderr,
            )
    train_time = time.perf_counter() - t0

    rp = RandomPolicy()
    res = validate(
        env_cfg, policy_act, learner.variables, rp.apply, rp.params,
        1024, jax.random.PRNGKey(seed + 99),
    )
    return {
        "win_rate": res["validation/vs_benchmark/win_rate"],
        "score_rate": res["validation/vs_benchmark/score_rate"],
        "train_time": train_time,
        "iters": iters,
    }


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--mode", choices=["throughput", "learning"],
                        default="throughput")
    parser.add_argument("--num-envs", type=int, default=8192)
    parser.add_argument("--n-steps", type=int, default=256)
    parser.add_argument("--iters", type=int, default=3)
    parser.add_argument("--warmup", type=int, default=1)
    parser.add_argument("--arch", default="resnet_b_s")
    parser.add_argument("--use-pallas", action="store_true",
                        help="fused Pallas env-step kernel")
    parser.add_argument("--fused", action="store_true",
                        help="device-resident fused iteration blocks "
                        "(alg/fused.py) for the throughput mode")
    parser.add_argument("--learn-iters", type=int, default=500,
                        help="training iterations for --mode learning")
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--update-chunks", type=int, default=0,
                        help="epoch-scan dispatch granularity (0 = auto: "
                        "per-epoch for transformers, monolithic otherwise)")
    parser.add_argument("--mnk", type=int, nargs=3, default=[9, 9, 5],
                        metavar=("M", "N", "K"),
                        help="board size (13 13 5 = the reference's "
                        "big-board recipe; throughput mode only)")
    parser.add_argument("--batch-size", type=int, default=8192,
                        help="PPO minibatch (the 13x13 recipe uses 4096; "
                        "throughput mode only)")
    args = parser.parse_args()

    if args.mode == "learning":
        # Every throughput-only flag is rejected when moved off its default
        # (ADVICE round-3: run_learning_bench hardcodes the reference
        # workload — a silently-ignored flag here is a lying benchmark).
        ignored = [
            name for name, val, default in (
                ("--mnk", tuple(args.mnk), (9, 9, 5)),
                ("--batch-size", args.batch_size, 8192),
                ("--update-chunks", args.update_chunks, 0),
                ("--num-envs", args.num_envs, 8192),
                ("--n-steps", args.n_steps, 256),
                ("--iters", args.iters, 3),
                ("--warmup", args.warmup, 1),
                ("--use-pallas", args.use_pallas, False),
            ) if val != default
        ]
        if ignored:
            sys.exit(
                "--mode learning is the fixed 9x9x5 reference-default "
                f"workload; {', '.join(ignored)} are throughput-mode flags "
                "and would be silently ignored"
            )
        learn_fn = run_learning_bench_fused if args.fused else run_learning_bench
        res = learn_fn(args.learn_iters, args.arch, seed=args.seed)
        print(
            f"# trained {res['iters']} iters in {res['train_time']:.0f}s; "
            f"score_rate vs random {res['score_rate']:.3f}",
            file=sys.stderr,
        )
        print(
            json.dumps(
                {
                    "metric": f"win_rate_vs_random_{res['iters']}iters",
                    "value": round(res["win_rate"], 4),
                    "unit": "fraction",
                    "vs_baseline": round(res["win_rate"], 4),
                }
            )
        )
        return

    if args.fused and args.update_chunks not in (0, 1):
        sys.exit(
            "the fused BENCH path does not thread --update-chunks; drop one "
            "of the flags (the fused TRAIN driver does honor update_chunks "
            "via its step dispatch — train.py --fused --update-chunks N)"
        )
    if args.fused and (tuple(args.mnk) != (9, 9, 5) or args.batch_size != 8192):
        sys.exit("--fused bench is the 9x9x5 headline only; drop --mnk/--batch-size")
    bench_fn = run_bench_fused if args.fused else run_bench
    kwargs = (
        {}
        if args.fused
        else {
            "update_chunks": args.update_chunks,
            "mnk": tuple(args.mnk),
            "batch_size": args.batch_size,
        }
    )
    res = bench_fn(
        args.num_envs, args.n_steps, args.iters, args.warmup, args.arch,
        use_pallas=args.use_pallas, **kwargs,
    )
    print(
        f"# rollout fps {res['rollout_fps']:.0f} | "
        f"rollout {res['rollout_time_per_iter']:.3f}s | "
        f"learn {res['learn_time_per_iter']:.3f}s per iter "
        f"({res['steps_per_iter']} steps)",
        file=sys.stderr,
    )
    print(
        json.dumps(
            {
                "metric": "env_steps_per_sec",
                "value": round(res["throughput"], 1),
                "unit": "steps/s",
                "vs_baseline": round(
                    res["throughput"] / REFERENCE_MEASURED_STEPS_PER_SEC, 2
                ),
                "vs_north_star": round(
                    res["throughput"] / NORTH_STAR_STEPS_PER_SEC, 4
                ),
            }
        )
    )


if __name__ == "__main__":
    main()
