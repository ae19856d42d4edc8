"""Fused-block training driver: device-resident iteration loop.

Same training semantics as ``train.train_mnk`` (reference src/train.py:
86-166) — opponent schedule, pool cadence, validation/promotion threshold,
exports, checkpointing — but the per-iteration work runs as fused blocks
(``alg/fused.train_block``): the opponent pool lives on device as a
``DevicePool`` ring buffer, opponent draws / pool inserts / entropy
scheduling happen inside the compiled program, and the host only
intervenes at validation boundaries. Blocks are sized so every boundary
lands exactly on the reference's validation cadence (after iteration i
with i % validation_interval == 0, reference train.py:125), so
validation/export/promotion happen at identical iteration numbers.

Intended for pod runs where host round trips stall all chips; on a
latency-bound dev link it also removes the per-iteration dispatch cost.

Documented deviations from the host-loop driver (both extensions, not
parity breaks — the parity path remains ``train.train_mnk``):
  * opponent draws use device RNG (jax.random) instead of host
    ``random.Random`` — the schedule's distribution (15% pool) is
    identical, the stream differs;
  * fault handling is per-block rather than per-iteration (a failed block
    is logged and skipped, reference :162-164 semantics at block
    granularity);
  * checkpoints are written at block boundaries (the nearest boundary at
    or after the configured interval) and DO carry the mid-episode env
    state + episode accumulators — fused resume continues bit-exactly from
    the boundary, like the host-loop driver's;
  * chunked update dispatch (``update_chunks``) is honored by the "step"
    dispatch mode (auto-selected when chunking is requested) — only an
    explicit ``fused_dispatch='scan'`` conflicts with it;
  * league/PFSP matchmaking runs DEVICE-SIDE (per-slot score EMAs in the
    DevicePool; PFSP draws and result records inside the compiled
    iteration) with the same weight formulas/prior/EMA as the host
    League — the draw stream uses device RNG, so it matches the host loop
    in semantics, not draw-for-draw;
  * mixed-opponent batches (opponents_per_iteration > 1) are NOT supported
    here — the driver rejects that config up front; use the host-loop
    driver (train.train_mnk) for it.
"""

from __future__ import annotations

import time
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as _np

from .alg.fused import train_block, train_step_iteration
from .alg.ppo import TrainingMetrics
from .alg.schedules import make_entropy_coef_fn
from .models.fold_bn import fold_batchnorm
from .models.registry import make_apply_fns
from .selfplay.opponent_pool import DevicePool, pool_add, pool_init
from .selfplay.policies import make_network_policy
from .selfplay.validation import validate
from .train import create_learner, handle_training_error, log_training_metrics
from .utils.checkpoint import restore_checkpoint, save_checkpoint
from .utils.hardware import detect_hardware_config
from .utils.metrics import MetricsLogger
from .utils.model_export import ModelExporter

POOL_PROB = 0.15  # reference train.py:108 — 15% historical opponent
POOL_INSERT_INTERVAL = 20  # reference train.py:122


def _block_end(start: int, validation_interval: int, total: int) -> int:
    """Last iteration of the block starting at ``start``: the next multiple
    of ``validation_interval`` (so validation runs after it, reference
    train.py:125 ``i % validation_interval == 0``), clamped to the run end."""
    next_boundary = ((start // validation_interval) + 1) * validation_interval
    return min(next_boundary, total - 1)


def train_mnk_fused(
    config: Dict[str, Any], logger: Optional[MetricsLogger] = None
) -> None:
    # Distributed init BEFORE any logger/exporter construction (same
    # process-0-only I/O contract as train.train_mnk: exports, metric
    # streams and stdout belong to the coordinator; see train.py).
    if config.get("multihost"):
        from .parallel.mesh import init_distributed

        init_distributed(
            coordinator_address=config.get("coordinator_address"),
            num_processes=config.get("num_processes"),
            process_id=config.get("process_id"),
        )

    from .parallel.mesh import is_coordinator

    coordinator = is_coordinator()
    if config.get("multihost") and not config.get("run_name"):
        # Required whether or not a logger was passed: per-process logger
        # objects default to timestamped (divergent) run names, and the
        # checkpoint dir below is keyed by the shared name.
        raise ValueError(
            "multihost train_mnk_fused needs config['run_name'] (all "
            "processes must agree on checkpoint/export paths)"
        )
    if logger is None:
        if coordinator:
            logger = MetricsLogger(
                project="mnk", config=config, run_name=config.get("run_name")
            )
        else:
            from .utils.metrics import NullMetricsLogger

            logger = NullMetricsLogger(
                run_name=config.get("run_name"), config=config
            )
    elif not coordinator:
        from .utils.metrics import NullMetricsLogger

        logger = NullMetricsLogger(run_name=logger.run_name, config=config)

    def say(*args, **kwargs):
        if coordinator:
            print(*args, **kwargs)

    # watch-mode per-layer grad trees don't stack across the fused
    # iteration scan; the host-loop driver is the watch surface.
    if config.get("watch_interval"):
        config = {**config, "watch_interval": 0}

    hw = detect_hardware_config()
    mesh = None
    if config.get("use_mesh", True) and hw.num_devices > 1:
        from .parallel.mesh import make_mesh

        mesh = make_mesh()
        assert config["num_envs"] % hw.num_devices == 0

    if coordinator:
        exporter = ModelExporter(logger.run_name)
    else:
        from .utils.model_export import NullModelExporter

        exporter = NullModelExporter(logger.run_name)
    learner, module, env_cfg, arch_params, lr_schedule = create_learner(
        config, hw, mesh
    )
    # Machine-checkable learner-mode marker (same key as train.train_mnk).
    logger.log({"learner/zero_sharded": int(learner.config.zero_update)}, step=0)
    # League/PFSP matchmaking runs DEVICE-SIDE here: per-slot score EMAs in
    # the DevicePool, PFSP draws and result records inside the compiled
    # iteration (alg/fused.py + selfplay/opponent_pool.py — the League twin
    # with the same weight formulas, prior and EMA factor).
    matchmaking = config.get("matchmaking") or None
    pfsp_power = float(config.get("pfsp_power", 2.0))
    league_ema = float(config.get("league_ema", 0.3))
    if matchmaking:
        from .selfplay.league import MATCHMAKING_MODES

        if matchmaking not in MATCHMAKING_MODES:
            raise ValueError(
                f"unknown matchmaking mode {matchmaking!r}; choose from "
                f"{MATCHMAKING_MODES}"
            )
    if config.get("opponents_per_iteration", 1) > 1:
        raise ValueError(
            "fused training does not implement mixed-opponent batches "
            "(opponents_per_iteration > 1). Drop --fused or the option."
        )
    eviction = config.get("pool_eviction", "fifo")
    if eviction not in ("fifo", "adaptive"):
        raise ValueError(
            f"unknown pool_eviction {eviction!r}; choose 'fifo' or 'adaptive'"
        )
    if (
        learner.config.zero_update
        and config.get("fused_dispatch", "auto") == "scan"
    ):
        # The scanned block cannot host the ZeRO shard_map epoch schedule
        # (one program per block; alg/fused.train_block raises too). Only
        # an explicit scan request conflicts — "auto" resolves to the step
        # dispatch below, which routes through zero_update_chunked.
        raise ValueError(
            "fused_dispatch='scan' cannot run the ZeRO sharded learner "
            "(zero_sharded_optimizer): use fused_dispatch='auto'/'step'"
        )
    if (
        learner.config.update_chunks > 1
        and config.get("fused_dispatch", "auto") == "scan"
    ):
        # The SCANNED block is by construction one program per validation
        # interval and cannot honor chunked update dispatch; only an
        # explicit scan request conflicts — "auto" resolves to the step
        # dispatch below, which chunks fine.
        raise ValueError(
            "fused_dispatch='scan' cannot honor update_chunks "
            f"({learner.config.update_chunks}): the whole block is one "
            "compiled program. Use fused_dispatch='auto'/'step' or drop "
            "--update-chunks."
        )
    eval_apply, _ = make_apply_fns(module)
    policy_act = make_network_policy(eval_apply)
    entropy_fn = make_entropy_coef_fn(
        config["entropy_coef"],
        config["entropy_coef_schedule"],
        config["num_envs"],
        config["n_steps"],
    )

    # Device pool seeded with the untrained snapshot (reference :98-99);
    # benchmark starts as the untrained network (:96, quirk 4 preserved).
    fold_jit = jax.jit(fold_batchnorm)
    benchmark_variables = fold_jit(learner.variables)
    pool = jax.jit(pool_init, static_argnames=("max_size",))(
        learner.variables, max_size=config["opponent_pool"]
    )
    pool = jax.jit(pool_add)(pool, learner.variables, 1.0)
    last_score_rate = 1.0

    steps_per_iteration = config["num_envs"] * config["n_steps"]
    total_iterations = config["total_environment_steps"] // steps_per_iteration
    vint = config["validation_interval"]

    # Prefer the explicitly shared run_name for the checkpoint path: the
    # coordinator's logger may carry a backend-assigned name (wandb) that
    # non-coordinator processes never see, and orbax checkpoints are
    # cooperative — every process must resolve the SAME directory.
    ckpt_dir = config.get("checkpoint_dir") or (
        f"checkpoints/{config.get('run_name') or logger.run_name}"
    )
    ckpt_interval = config.get("checkpoint_interval", 0)

    # Materialize the self-play env state BEFORE the checkpoint template is
    # built so mid-episode boards/sides/episode accumulators are part of the
    # checkpoint pytree — fused resume then continues the exact env state it
    # stopped with, matching the host-loop driver's bit-exactness (blocks
    # used to re-reset envs on resume; round-2 VERDICT item 3).
    learner.reset_envs(policy_act, learner.variables)

    def checkpoint_state(iteration: int) -> dict:
        return {
            "params": learner.params,
            "batch_stats": learner.batch_stats,
            "opt_state": learner.opt_state,
            "benchmark": benchmark_variables,
            "pool": pool._asdict(),
            "rng": learner.rng,
            "sp_state": learner._sp_state,
            "obs": learner._obs,
            "ep_rew": learner._ep_rew,
            "ep_len": learner._ep_len,
            "iteration": iteration,
        }

    start_iteration = 0
    if config.get("resume"):
        state, step = restore_checkpoint(ckpt_dir, checkpoint_state(0))
        if state is not None:
            # Same mesh re-placement rule as train.train_mnk's restore:
            # orbax restores to one device; replicated leaves must be
            # re-placed and env-state leaves re-sharded before jit sees
            # them next to mesh-placed arrays.
            if learner.mesh is not None:
                from .parallel.mesh import replicate as _rep
                from .parallel.mesh import shard_batched as _shard

                def rep(tree):
                    return _rep(tree, learner.mesh)

                def shard_env(tree):
                    return _shard(tree, learner.mesh, learner.config.num_envs)

            else:

                def rep(tree):
                    return tree

                def shard_env(tree):
                    return tree

            learner.params = rep(state["params"])
            learner.batch_stats = rep(state["batch_stats"])
            learner.opt_state = rep(state["opt_state"])
            learner.rng = rep(state["rng"])
            benchmark_variables = rep(state["benchmark"])
            pool = DevicePool(**rep(state["pool"]))
            learner._sp_state = shard_env(state["sp_state"])
            learner._obs = shard_env(state["obs"])
            learner._ep_rew = shard_env(state["ep_rew"])
            learner._ep_len = shard_env(state["ep_len"])
            start_iteration = int(state["iteration"]) + 1
            learner.iteration = start_iteration
            say(f"Resumed from checkpoint at iteration {start_iteration}")

    # Dispatch strategy for a block of iterations (same math either way —
    # pinned bit-identical by tests/test_fused.py):
    #   "scan" — ONE XLA execution per block; wins when per-iteration wall
    #            time is small (the reference's 384-env scale: every host
    #            round trip is ~10% of an iteration).
    #   "step" — one fused program per iteration, host-dispatched without
    #            fetches; standalone-program buffer aliasing applies, which
    #            the outer scan's conservative loop-carry assignment loses
    #            ~8% to at bench scale (evidence/fused_ablation_8192.log),
    #            and no single execution can hit an RPC deadline.
    # "auto" picks by per-iteration work (threshold from the ablation).
    dispatch = config.get("fused_dispatch", "auto")
    if dispatch == "auto":
        if learner.config.zero_update:
            # Only the step dispatch composes with the ZeRO epoch path.
            dispatch = "step"
        elif learner.config.update_chunks > 1:
            # Only the step dispatch can split the update into chunk
            # programs (the scan is one execution per block) — chunking is
            # requested exactly when single executions must stay short.
            dispatch = "step"
        else:
            dispatch = (
                "step"
                if config["num_envs"] * config["n_steps"] >= 1_000_000
                else "scan"
            )
    say(
        f"Starting fused training for {total_iterations} iterations "
        f"(validation every {vint}, dispatch={dispatch})"
    )

    i = start_iteration
    last_ckpt = start_iteration - 1
    while i < total_iterations:
        end = _block_end(i, vint, total_iterations)
        block_len = end - i + 1
        current_env_steps = (end + 1) * steps_per_iteration
        try:
            learner.rng, k_block = jax.random.split(learner.rng)
            t0 = time.perf_counter()
            # Uniform pool sampling is the reference behavior; score-
            # weighted insertion only under the explicit extension flag
            # (train_block contract: "score rate in weighted-pool mode;
            # 1.0 otherwise").
            insert_w = jnp.float32(
                max(last_score_rate, 1e-3)
                if config.get("pool_weighted")
                else 1.0
            )
            if dispatch == "step":
                # Per-iteration host-dispatched programs (the host-loop's
                # own donated rollout/update programs + tiny pool ops),
                # fetch-free within the block — bit-identical to the
                # scanned block (tests/test_fused.py).
                carry = (
                    learner.params, learner.batch_stats,
                    learner.opt_state, pool, learner._sp_state,
                    learner._obs, learner._ep_rew, learner._ep_len, k_block,
                )
                outs = []
                for j in range(block_len):
                    carry, m = train_step_iteration(
                        module, learner.config, learner.optimizer,
                        policy_act, entropy_fn, POOL_PROB,
                        POOL_INSERT_INTERVAL, carry, i + j, insert_w,
                        matchmaking, pfsp_power, league_ema, eviction,
                        learner.mesh,
                    )
                    outs.append(m)  # futures — one batched fetch below
                outs_host = jax.device_get(outs)
                stacked_host = {
                    k: _np.asarray([m[k] for m in outs_host])
                    for k in outs_host[0]
                }
            else:
                carry, stacked = train_block(
                    module,
                    learner.config,
                    learner.optimizer,
                    policy_act,
                    entropy_fn,
                    block_len,
                    POOL_PROB,
                    POOL_INSERT_INTERVAL,
                    learner.params,
                    learner.batch_stats,
                    learner.opt_state,
                    pool,
                    learner._sp_state,
                    learner._obs,
                    learner._ep_rew,
                    learner._ep_len,
                    k_block,
                    jnp.int32(i),
                    insert_w,
                    matchmaking,
                    pfsp_power,
                    league_ema,
                    eviction,
                )
                stacked_host = jax.device_get(stacked)
            (
                learner.params,
                learner.batch_stats,
                learner.opt_state,
                pool,
                learner._sp_state,
                learner._obs,
                learner._ep_rew,
                learner._ep_len,
                _,
            ) = carry
            block_time = time.perf_counter() - t0
            per_iter = block_time / block_len

            for j in range(block_len):
                it = i + j
                cnt = float(stacked_host["fin_count"][j])
                metrics = TrainingMetrics(
                    mean_reward=float(stacked_host["fin_reward"][j]) / cnt
                    if cnt
                    else 0.0,
                    mean_length=float(stacked_host["fin_length"][j]) / cnt
                    if cnt
                    else 0.0,
                    actor_loss=float(stacked_host["actor_loss"][j]),
                    critic_loss=float(stacked_host["critic_loss"][j]),
                    entropy_loss=float(stacked_host["entropy_loss"][j]),
                    grad_norm=float(stacked_host["grad_norm"][j]),
                    clip_fraction=float(stacked_host["clip_fraction"][j]),
                    explained_variance=float(
                        stacked_host["explained_variance"][j]
                    ),
                    approx_kl=float(stacked_host["approx_kl"][j]),
                    fps=steps_per_iteration / per_iter,
                    rollout_time=per_iter,
                    learn_time=per_iter,
                )
                env_steps = (it + 1) * steps_per_iteration
                logger.log(
                    {
                        "training/opponent_source": "historical"
                        if bool(stacked_host["historical_opponent"][j])
                        else "current_agent"
                    },
                    step=env_steps,
                )
                current_lr = float(
                    lr_schedule(
                        (it + 1) * learner.config.updates_per_iteration - 1
                    )
                )
                log_training_metrics(
                    logger,
                    metrics,
                    it,
                    env_steps,
                    float(stacked_host["entropy_coef"][j]),
                    current_lr,
                    echo=coordinator,
                )
            learner.iteration = end + 1

            if end > 0 and end % vint == 0:
                say(
                    f"--- Running validation at step {end} "
                    f"({current_env_steps:,} env steps) ---"
                )
                validation_res = validate(
                    env_cfg,
                    policy_act,
                    learner.variables,
                    policy_act,
                    benchmark_variables,
                    config["validation_episodes"],
                    jax.random.fold_in(
                        jax.random.PRNGKey(config["seed"]), end
                    ),
                )
                logger.log(validation_res, step=current_env_steps)
                score_rate = validation_res[
                    "validation/vs_benchmark/score_rate"
                ]
                last_score_rate = max(score_rate, 1e-3)
                say(
                    f"Score: {score_rate:.2f} | "
                    f"W: {validation_res['validation/vs_benchmark/win_rate']:.2f} | "
                    f"D: {validation_res['validation/vs_benchmark/draw_rate']:.2f} | "
                    f"L: {validation_res['validation/vs_benchmark/loss_rate']:.2f}"
                )
                breaker = score_rate > config["benchmark_update_threshold_score"]
                if breaker:
                    say(f"--- New benchmark agent at step {end}! ---")
                    benchmark_variables = fold_jit(learner.variables)
                    logger.log(
                        {"validation/new_benchmark_step": 1},
                        step=current_env_steps,
                    )
                exporter.export_model(
                    learner.variables,
                    config["architecture_name"],
                    arch_params,
                    end,
                    is_benchmark_breaker=breaker,
                )

            if ckpt_interval and end - last_ckpt >= ckpt_interval:
                save_checkpoint(ckpt_dir, end, checkpoint_state(end))
                last_ckpt = end

        except Exception as e:  # reference :162-164 at block granularity
            handle_training_error(
                logger, e, i, current_env_steps, echo=coordinator
            )
            # train_block donates opt_state, the pool and env state (params/
            # batch_stats deliberately are not donated — they are the one
            # thing recovery could not rebuild); restore whatever a
            # post-dispatch failure consumed so later blocks can run.
            recovered = learner.recover()
            if learner._sp_state is None:
                learner.reset_envs(policy_act, learner.variables)
            if any(
                getattr(leaf, "is_deleted", lambda: False)()
                for leaf in jax.tree.leaves(pool)
            ):
                pool = jax.jit(pool_init, static_argnames=("max_size",))(
                    learner.variables, max_size=config["opponent_pool"]
                )
                pool = jax.jit(pool_add)(pool, learner.variables, 1.0)
                recovered.append("pool")
            if recovered:
                say(f"Recovered learner state: {', '.join(recovered)}")
        i = end + 1

    exporter.export_model(
        learner.variables,
        config["architecture_name"],
        arch_params,
        total_iterations,
        is_benchmark_breaker=False,
    )
