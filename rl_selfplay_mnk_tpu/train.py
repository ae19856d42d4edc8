"""Self-play PPO training orchestration.

Parity with reference ``train_mnk`` (src/train.py:86-166) and its default
config (:229-258):

  * opponent schedule: 15% historical from the pool / 85% fresh snapshot of
    the current network (:108-114) — a params-pytree handoff here, not a
    module deepcopy;
  * pool insert every 20 iterations, FIFO eviction (:122-123);
  * benchmark validation every ``validation_interval`` iterations; promote
    the benchmark + export with ``is_benchmark_breaker=True`` when
    score_rate > 0.60 (:125-160); benchmark starts as the UNTRAINED
    network (:96 — SURVEY.md §7 quirk 4, preserved);
  * per-iteration fault handling: log the error, continue (:162-164);
  * final export (:166).

Improvements over the reference (explicit, documented):
  * full train-state checkpoint/resume via orbax (the reference cannot
    resume at all — SURVEY.md §5);
  * metrics go to wandb when available, JSONL always;
  * runs on CPU/TPU/multi-chip unmodified (reference requires CUDA).
"""

from __future__ import annotations

import argparse
import random as _random
import sys as _sys
import traceback
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import optax

from .alg.ppo import PPOConfig, PPOLearner, TrainingMetrics, pick_group_size
from .alg.schedules import entropy_coef_at, make_lr_schedule
from .env.mnk_env import EnvConfig
from .models.registry import (
    create_model_from_architecture,
    init_network,
    make_apply_fns,
)
from .parallel.mesh import make_mesh
from .selfplay.opponent_pool import OpponentPool
from .selfplay.policies import make_network_policy
from .selfplay.validation import validate
from .utils.checkpoint import restore_checkpoint, save_checkpoint
from .utils.hardware import detect_hardware_config
from .utils.metrics import MetricsLogger
from .utils.model_export import ModelExporter


def get_default_config() -> Dict[str, Any]:
    """Reference defaults (src/train.py:229-258) plus framework-side knobs."""
    return {
        "mnk": (9, 9, 5),
        # lr
        "learning_rate": 5e-4,
        "lr_warmup_steps": 5_000_000,
        "lr_decay": False,
        # entropy
        "entropy_coef": 0.04,
        "entropy_coef_schedule": {
            "type": "linear",
            "params": {"final_coef": 0.001, "total_steps": 125_000_000},
        },
        # ppo
        "gamma": 0.99,
        "clip_range": 0.2,
        "batch_size": 8192,
        "n_steps": 256,
        "ppo_epochs": 4,
        "total_environment_steps": 300_000_000,
        "num_envs": 384,
        # validation
        "benchmark_update_threshold_score": 0.60,
        "validation_interval": 5,
        "validation_episodes": 256,
        # selfplay
        "opponent_pool": 20,
        #
        "architecture_name": "resnet_b_s",
        # framework-side additions
        "seed": 0,
        "checkpoint_interval": 0,  # iterations; 0 = disabled
        "checkpoint_dir": None,  # default: checkpoints/<run_name>
        "resume": False,
        "use_mesh": True,  # shard envs over all local devices when >1
        "use_pallas": False,  # fused Pallas env-step kernel
        # ZeRO-1 sharded learner (parallel/zero.py): optimizer moments +
        # step sharded over the env axis, grads reduce-scattered, updates
        # all-gathered. Opt-in: at this model scale the replicated learner
        # measures equal (PERFORMANCE.md "Sharded learner (ZeRO-1)").
        "zero_sharded_optimizer": False,
        "pool_weighted": False,  # score-weighted opponent sampling (extension)
        "pool_eviction": "fifo",  # "adaptive" = evict weakest, not oldest
        # None = reference pool; "uniform"/"pfsp_hard"/"pfsp_even" = league
        # matchmaking with per-member result tracking (selfplay/league.py)
        "matchmaking": None,
        # >1 = mixed-opponent iterations: the env batch splits into K blocks,
        # each playing a different opponent gathered from the pool/snapshot
        # (device-side stacked params + vmap; extension beyond the reference)
        "opponents_per_iteration": 1,
        # run.watch parity (reference train.py:94): every N iterations log
        # per-layer gradient RMS norms (accumulated on-device across the
        # update) and parameter norms. 20 iters ~= wandb.watch's default
        # log_freq=1000 backward passes at 48 updates/iteration. 0 = off.
        "watch_interval": 20,
        "watch_histograms": False,  # also log 16-bin parameter histograms
        # run.watch logs gradient HISTOGRAMS (reference train.py:94): B
        # signed-log magnitude bins per sign + a near-zero bin, accumulated
        # on-device across every update and fetched at watch cadence.
        # 0 disables (grad RMS norms still log).
        "watch_grad_hist_bins": 6,
    }


def create_learner(config: Dict[str, Any], hw, mesh=None):
    """Network + optimizer + PPO learner (reference create_agent, train.py:36-83)."""
    m, n, k = config["mnk"]
    env_cfg = EnvConfig(
        m, n, k, use_pallas=config.get("use_pallas", False)
    ).validate()
    obs_shape = (2, m, n)
    action_dim = m * n

    module, arch_params = create_model_from_architecture(
        config["architecture_name"], obs_shape, action_dim, dtype=hw.compute_dtype
    )
    rng = jax.random.PRNGKey(config["seed"])
    rng, k_init, k_learn = jax.random.split(rng, 3)
    variables = init_network(module, obs_shape, k_init)

    num_devices = mesh.devices.size if mesh is not None else 1
    shuffle = config.get("shuffle", "auto")
    if shuffle == "auto":
        # accelerator: group-gather DMAs (row gathers are latency-bound on
        # TPU), shard-local when the mesh has >1 device; multi-device CPU:
        # shard-local row tiles; single CPU: exact reference global shuffle.
        if hw.is_accelerator:
            shuffle = "grouped"
        elif num_devices > 1:
            shuffle = "tiled"
        else:
            shuffle = "global"
    # ZeRO sharded learner eligibility: the full shard_map collective
    # schedule (alg/zero_epochs.py — reduce-scatter grads / all-gather
    # updates, sharded moments) needs a >1-device mesh, the shard-local
    # grouped shuffle, and a batch-stat-free architecture; BN architectures
    # fall back to GSPMD optimizer-state sharding (parallel/zero.py).
    zero_requested = bool(config.get("zero_sharded_optimizer")) and mesh is not None
    zero_full = (
        zero_requested
        and num_devices > 1
        and shuffle == "grouped"
        and not variables.get("batch_stats")
    )
    ppo_cfg = PPOConfig(
        env=env_cfg,
        zero_update=zero_full,
        num_envs=config["num_envs"],
        n_steps=config["n_steps"],
        gamma=config["gamma"],
        gae_lambda=0.95,
        clip_range=config["clip_range"],
        ppo_epochs=config["ppo_epochs"],
        batch_size=config["batch_size"],
        shuffle=shuffle,
        shard_groups=num_devices,
        group_size=pick_group_size(config["batch_size"] // num_devices),
        update_chunks=config.get("update_chunks", 1),
        watch=config.get("watch_interval", 0) > 0,
        watch_hist_bins=config.get("watch_grad_hist_bins", 0),
        # Mixed-opponent iterations: per-block episode accounting so league
        # scores attribute each block's outcome to its own pool member.
        fin_blocks=(
            int(config.get("opponents_per_iteration", 1))
            if int(config.get("opponents_per_iteration", 1)) > 1
            else 0
        ),
    )
    lr_schedule = make_lr_schedule(
        base_lr=config["learning_rate"],
        warmup_env_steps=config["lr_warmup_steps"],
        total_env_steps=config["total_environment_steps"],
        num_envs=config["num_envs"],
        n_steps=config["n_steps"],
        updates_per_iteration=ppo_cfg.updates_per_iteration,
        decay=config["lr_decay"],
    )
    if zero_full:
        # Full ZeRO epoch path: ELEMENTWISE inner optimizer only — the
        # global-norm clip runs in-body on the gradient shard with a scalar
        # psum (alg/zero_epochs.py; PPOConfig.zero_clip_norm = 0.5).
        print(
            f"ZeRO sharded learner engaged: moments sharded over "
            f"{num_devices} devices (reduce-scatter/all-gather epoch path)"
        )
        optimizer = optax.adamw(lr_schedule, eps=1e-5, weight_decay=0.01)
    else:
        if zero_requested:
            # The GSPMD state-sharding variant (parallel/zero.py) is NOT
            # wired here: its flat-vector sharding constraints leak into
            # the partitioner's activation layouts ("involuntary full
            # rematerialization", measured on the virtual mesh —
            # PERFORMANCE.md "Sharded learner"). Ineligible configs get
            # the replicated learner, loudly.
            print(
                "zero_sharded_optimizer requested but ineligible "
                f"(devices={num_devices}, shuffle={shuffle!r}, "
                f"batch_stats={bool(variables.get('batch_stats'))}): "
                "the ZeRO epoch path needs a >1-device mesh, the grouped "
                "shuffle, and a batch-stat-free architecture — using the "
                "replicated data-parallel learner instead"
            )
        # optax.flatten collapses the per-tensor optimizer update into one
        # flat vector — one fused kernel instead of ~60 tiny ones per step.
        optimizer = optax.flatten(
            optax.chain(
                optax.clip_by_global_norm(0.5),
                optax.adamw(lr_schedule, eps=1e-5, weight_decay=0.01),
            )
        )
    learner = PPOLearner(module, ppo_cfg, optimizer, variables, k_learn, mesh=mesh)
    return learner, module, env_cfg, arch_params, lr_schedule


def train_mnk(config: Dict[str, Any], logger: Optional[MetricsLogger] = None) -> None:
    """The training loop (reference train_mnk, src/train.py:86-166)."""
    # Multi-host bring-up (TPU pods): one process per host, envs sharded
    # over the global device set. No-op single-process / already-initialized.
    # Must run BEFORE any logger/exporter construction so non-coordinators
    # never open run files or derive a timestamped (i.e. per-process) name.
    if config.get("multihost"):
        from .parallel.mesh import init_distributed

        init_distributed(
            coordinator_address=config.get("coordinator_address"),
            num_processes=config.get("num_processes"),
            process_id=config.get("process_id"),
        )

    # Process-0-only host I/O: every process drives the identical train loop
    # (same seeds -> same opponent draws/promotions), but exports, metric
    # streams and stdout belong to the coordinator. Orbax checkpoints stay
    # COOPERATIVE (all processes participate below — required for globally
    # sharded env state).
    from .parallel.mesh import is_coordinator

    coordinator = is_coordinator()
    if config.get("multihost") and not config.get("run_name"):
        # A timestamp-derived default diverges across processes, which
        # would split the (shared-name-keyed) checkpoint dir. This holds
        # whether the logger is built here or passed in: per-process logger
        # objects default to timestamped names too, and orbax checkpoints
        # are cooperative — every process must resolve the SAME directory.
        raise ValueError(
            "multihost train_mnk needs config['run_name'] (all "
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

    hw = detect_hardware_config()
    mesh = None
    if config.get("use_mesh", True) and hw.num_devices > 1:
        mesh = make_mesh()
        assert config["num_envs"] % hw.num_devices == 0, (
            "num_envs must divide evenly over devices"
        )

    if coordinator:
        exporter = ModelExporter(logger.run_name)
    else:
        from .utils.model_export import NullModelExporter

        exporter = NullModelExporter(logger.run_name)
    learner, module, env_cfg, arch_params, lr_schedule = create_learner(
        config, hw, mesh
    )
    # Machine-checkable learner-mode marker (the "ZeRO sharded learner
    # engaged" stdout line is prose; tests/tools assert on this key).
    logger.log({"learner/zero_sharded": int(learner.config.zero_update)}, step=0)
    eval_apply, _ = make_apply_fns(module)
    policy_act = make_network_policy(eval_apply)

    k_opponents = int(config.get("opponents_per_iteration", 1))
    if k_opponents > 1:
        from .selfplay.policies import make_block_pooled_policy

        assert config["num_envs"] % k_opponents == 0
        opponent_act = make_block_pooled_policy(eval_apply, k_opponents)
        stack_params = jax.jit(
            lambda sets: jax.tree.map(lambda *xs: jnp.stack(xs), *sets)
        )
    else:
        opponent_act = policy_act

    # Benchmark starts as the UNTRAINED network (reference :96) and the pool
    # is seeded with one snapshot (:98-99). Benchmarks only ever run
    # eval-mode forwards, so their BN is folded into the convs.
    from .models.fold_bn import fold_batchnorm

    fold_jit = jax.jit(fold_batchnorm)
    benchmark_variables = fold_jit(learner.variables)
    matchmaking = config.get("matchmaking")
    if matchmaking:
        from .selfplay.league import League

        pool = League(
            max_size=config["opponent_pool"],
            mode=matchmaking,
            seed=config["seed"],
        )
    else:
        pool = OpponentPool(
            max_size=config["opponent_pool"],
            seed=config["seed"],
            weighted=config.get("pool_weighted", False),
            eviction=config.get("pool_eviction", "fifo"),
        )
    pool.add_opponent(learner.variables)
    last_score_rate = 1.0  # weight for score-weighted pool insertion

    steps_per_iteration = config["num_envs"] * config["n_steps"]
    total_iterations = config["total_environment_steps"] // steps_per_iteration

    # Prefer the explicitly shared run_name for the checkpoint path: the
    # coordinator's logger may carry a backend-assigned name (wandb) that
    # non-coordinator processes never see, and orbax checkpoints are
    # cooperative — every process must resolve the SAME directory.
    ckpt_dir = config.get("checkpoint_dir") or (
        f"checkpoints/{config.get('run_name') or logger.run_name}"
    )
    ckpt_interval = config.get("checkpoint_interval", 0)

    # Host-side RNG for the opponent schedule, created before the
    # checkpoint template so its state is part of the checkpoint: a resumed
    # run continues the exact draw sequence of the uninterrupted one.
    host_rng = _random.Random(config["seed"])

    # Materialize the self-play env state up front so it is part of the
    # checkpoint pytree (orbax needs a fixed template): a resumed run
    # continues mid-episode from the exact boards/sides/episode accumulators
    # it stopped with, instead of re-resetting the envs.
    learner.reset_envs(policy_act, learner.variables)

    def _mt_state(rng: _random.Random):
        import numpy as _np

        return _np.asarray(rng.getstate()[1], _np.uint32)

    def _set_mt_state(rng: _random.Random, arr) -> None:
        rng.setstate((3, tuple(int(x) for x in arr), None))

    def checkpoint_state(iteration: int) -> dict:
        """Fixed-structure train-state pytree (orbax restore requires a
        static template, so the pool is padded to max_size)."""
        if matchmaking:
            entries = [e.params for e in pool.entries]
            weights = [float(e.score_ema) for e in pool.entries]
            ids = [int(e.entry_id) for e in pool.entries]
            games = [int(e.games) for e in pool.entries]
            count = len(pool.entries)
            next_id = pool._next_id
        else:
            entries = list(pool.pool)
            weights = list(pool.weights)
            ids = [0] * len(entries)
            games = [0] * len(entries)
            count = len(pool.pool)
            next_id = 0
        while len(entries) < pool.max_size:
            entries.append(learner.variables)
            weights.append(1.0)
            ids.append(0)
            games.append(0)
        return {
            "params": learner.params,
            "batch_stats": learner.batch_stats,
            "opt_state": learner.opt_state,
            "benchmark": benchmark_variables,
            "pool": entries,
            "pool_weights": weights,
            "pool_ids": ids,
            "pool_games": games,
            "pool_next_id": next_id,
            "pool_count": count,
            "rng": learner.rng,
            "host_rng_state": _mt_state(host_rng),
            "pool_rng_state": _mt_state(pool._rng),
            "last_score_rate": float(last_score_rate),
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
            # restore_checkpoint hands orbax an abstract target carrying
            # the TEMPLATE's shardings, so restored arrays normally land
            # already mesh-placed. The rep()/shard_batched pass below is a
            # cheap belt-and-braces no-op in that case (device_put with an
            # unchanged sharding) and still matters when a template leaf
            # was host-built (e.g. a pool slot padded from fresh values) or
            # the process topology changed since the save — a single-device
            # array next to mesh-placed ones fails jit with "incompatible
            # devices".
            if learner.mesh is not None:
                from .parallel.mesh import replicate as _rep

                def rep(tree):
                    return _rep(tree, learner.mesh)

            else:

                def rep(tree):
                    return tree

            learner.params = rep(state["params"])
            learner.batch_stats = rep(state["batch_stats"])
            learner.opt_state = rep(state["opt_state"])
            learner.rng = rep(state["rng"])
            benchmark_variables = rep(state["benchmark"])
            count = int(state["pool_count"])
            if matchmaking:
                pool.entries.clear()
                for entry, w, pid, g in zip(
                    state["pool"][:count],
                    state["pool_weights"][:count],
                    state["pool_ids"][:count],
                    state["pool_games"][:count],
                ):
                    pool.add_opponent(rep(entry))
                    member = pool.entries[-1]
                    member.entry_id = int(pid)
                    member.score_ema = float(w)
                    member.games = int(g)
                pool._next_id = int(state["pool_next_id"])
            else:
                pool.pool.clear()
                pool.weights.clear()
                for entry, w in zip(
                    state["pool"][:count], state["pool_weights"][:count]
                ):
                    pool.add_opponent(rep(entry), weight=float(w))
            _set_mt_state(host_rng, state["host_rng_state"])
            _set_mt_state(pool._rng, state["pool_rng_state"])
            last_score_rate = float(state["last_score_rate"])
            learner._sp_state = state["sp_state"]
            learner._obs = state["obs"]
            learner._ep_rew = state["ep_rew"]
            learner._ep_len = state["ep_len"]
            if learner.mesh is not None:
                from .parallel.mesh import shard_batched

                e = learner.config.num_envs
                learner._sp_state = shard_batched(
                    learner._sp_state, learner.mesh, e
                )
                learner._obs = shard_batched(learner._obs, learner.mesh, e)
                learner._ep_rew = shard_batched(learner._ep_rew, learner.mesh, e)
                learner._ep_len = shard_batched(learner._ep_len, learner.mesh, e)
            start_iteration = int(state["iteration"]) + 1
            learner.iteration = start_iteration
            say(f"Resumed from checkpoint at iteration {start_iteration}")

    say(f"Starting training for {total_iterations} iterations")

    current_env_steps = start_iteration * steps_per_iteration
    for i in range(start_iteration, total_iterations):
        try:
            # 15% historical opponent / 85% current snapshot (reference :108-114).
            def draw_opponent():
                if host_rng.random() < 0.15:
                    if matchmaking:
                        entry_id, params = pool.get_opponent()
                        return params, "historical", entry_id
                    return pool.get_random_opponent(), "historical", None
                return learner.variables, "current_agent", None

            if k_opponents > 1:
                draws = [draw_opponent() for _ in range(k_opponents)]
                opponent_variables = stack_params([d[0] for d in draws])
                source = ",".join(d[1] for d in draws)
                # Positional: block_ids[b] is the pool member playing env
                # block b (None for current-agent blocks) — consumed by the
                # per-block attribution below.
                block_ids = [d[2] for d in draws]
                drawn_ids = [x for x in block_ids if x is not None]
            else:
                opponent_variables, source, drawn_id = draw_opponent()
                block_ids = None
                drawn_ids = [drawn_id] if drawn_id is not None else []
            # Keyed at THIS iteration's final env-step count so it joins the
            # iteration's other metrics (and matches the fused driver).
            logger.log(
                {"training/opponent_source": source},
                step=(i + 1) * steps_per_iteration,
            )

            ent_coef = entropy_coef_at(
                config["entropy_coef"],
                config["entropy_coef_schedule"],
                i,
                config["num_envs"],
                config["n_steps"],
            )
            watch_interval = config.get("watch_interval", 0)
            watch_now = bool(watch_interval) and i % watch_interval == 0
            metrics = learner.learn(
                opponent_act, opponent_variables, ent_coef,
                fetch_watch=watch_now,
            )
            current_env_steps = (i + 1) * steps_per_iteration

            # League matchmaking: fold the iteration outcome vs each drawn
            # historical member into its score EMA. Rewards ∈ [-1, 1] from
            # the learner's perspective -> score ∈ [0, 1]. With
            # mixed-opponent batches (opponents_per_iteration > 1) the env
            # batch is split into K opponent blocks and the rollout reports
            # per-block episode rewards (PPOConfig.fin_blocks), so each
            # drawn member is scored on ITS block's outcome only; blocks
            # that finished no episode record nothing.
            if matchmaking and drawn_ids:
                if block_ids is not None and metrics.block_rewards is not None:
                    for entry_id, br in zip(block_ids, metrics.block_rewards):
                        if entry_id is not None and br is not None:
                            pool.record_result(entry_id, (br + 1.0) / 2.0)
                else:
                    iteration_score = (metrics.mean_reward + 1.0) / 2.0
                    for entry_id in drawn_ids:
                        pool.record_result(entry_id, iteration_score)

            current_lr = float(
                lr_schedule((i + 1) * learner.config.updates_per_iteration - 1)
            )
            log_training_metrics(
                logger, metrics, i, current_env_steps, ent_coef, current_lr,
                echo=coordinator,
            )

            # run.watch parity (reference train.py:94): per-layer gradient
            # RMS norms came back with this iteration's metrics; parameter
            # norms (+ optional histograms) are one extra jitted program.
            if watch_now:
                watch_rec = dict(metrics.layer_grad_norms or {})
                watch_rec.update(
                    learner.param_stats(
                        16 if config.get("watch_histograms") else 0
                    )
                )
                logger.log(watch_rec, step=current_env_steps)

            if i % 20 == 0:
                pool.add_opponent(learner.variables, weight=last_score_rate)

            if i > 0 and i % config["validation_interval"] == 0:
                say(
                    f"--- Running validation at step {i} "
                    f"({current_env_steps:,} env steps) ---"
                )
                validation_res = validate(
                    env_cfg,
                    policy_act,
                    learner.variables,
                    policy_act,
                    benchmark_variables,
                    config["validation_episodes"],
                    jax.random.fold_in(jax.random.PRNGKey(config["seed"]), i),
                )
                logger.log(validation_res, step=current_env_steps)

                score_rate = validation_res["validation/vs_benchmark/score_rate"]
                last_score_rate = max(score_rate, 1e-3)
                win_rate = validation_res["validation/vs_benchmark/win_rate"]
                draw_rate = validation_res["validation/vs_benchmark/draw_rate"]
                loss_rate = validation_res["validation/vs_benchmark/loss_rate"]
                say(
                    f"Score: {score_rate:.2f} | W: {win_rate:.2f} | "
                    f"D: {draw_rate:.2f} | L: {loss_rate:.2f}"
                )

                if score_rate > config["benchmark_update_threshold_score"]:
                    say(f"--- New benchmark agent at step {i}! ---")
                    benchmark_variables = fold_jit(learner.variables)
                    exporter.export_model(
                        learner.variables,
                        config["architecture_name"],
                        arch_params,
                        i,
                        is_benchmark_breaker=True,
                    )
                    logger.log(
                        {"validation/new_benchmark_step": 1}, step=current_env_steps
                    )
                else:
                    exporter.export_model(
                        learner.variables,
                        config["architecture_name"],
                        arch_params,
                        i,
                        is_benchmark_breaker=False,
                    )

            if ckpt_interval and i > 0 and i % ckpt_interval == 0:
                save_checkpoint(ckpt_dir, i, checkpoint_state(i))

        except Exception as e:  # reference :162-164: log and continue
            handle_training_error(
                logger, e, i, current_env_steps, echo=coordinator
            )
            # A failure after dispatch may have consumed donated device
            # state; rebuild it so "continue" actually can (PPOLearner.recover).
            recovered = learner.recover()
            if recovered:
                say(f"Recovered learner state: {', '.join(recovered)}")
            continue

    exporter.export_model(
        learner.variables,
        config["architecture_name"],
        arch_params,
        total_iterations,
        is_benchmark_breaker=False,
    )


def log_training_metrics(
    logger: MetricsLogger,
    metrics: TrainingMetrics,
    iteration: int,
    env_steps: int,
    entropy_coef: float,
    current_lr: float,
    echo: bool = True,
) -> None:
    """Stdout + tracker logging (reference train.py:169-210, same keys).

    ``echo=False`` suppresses the stdout line (multihost non-coordinator
    processes — stdout belongs to the coordinator; the logger they pass is
    already a NullMetricsLogger)."""
    if echo:
        _print_training_line(metrics, iteration, env_steps, entropy_coef, current_lr)
    logger.log(
        {
            "training/mean_reward": metrics.mean_reward,
            "training/mean_length": metrics.mean_length,
            "training/actor_loss": metrics.actor_loss,
            "training/critic_loss": metrics.critic_loss,
            "training/entropy_loss": metrics.entropy_loss,
            "training/entropy_coef": entropy_coef,
            "training/learning_rate": current_lr,
            "training/grad_norm": metrics.grad_norm,
            "training/clip_fraction": metrics.clip_fraction,
            "training/explained_variance": metrics.explained_variance,
            "training/approx_kl": metrics.approx_kl,
            "training/fps": metrics.fps,
        },
        step=env_steps,
    )


def _print_training_line(
    metrics: TrainingMetrics,
    iteration: int,
    env_steps: int,
    entropy_coef: float,
    current_lr: float,
) -> None:
    print(
        f"Iter {iteration} | {env_steps:,} steps | "
        f"reward: {metrics.mean_reward:.3f} | "
        f"length: {metrics.mean_length:.1f} | "
        f"entropy: {metrics.entropy_loss:.4f} | "
        f"entropy_coef: {entropy_coef:.4f} | "
        f"lr: {current_lr:.6f} | "
        f"grad_norm: {metrics.grad_norm:.3f} | "
        f"clip: {metrics.clip_fraction:.3f} | "
        f"explained_var: {metrics.explained_variance:.3f} | "
        f"approx_kl: {metrics.approx_kl:.4f} | "
        f"fps: {metrics.fps:.1f} | "
        f"rollout_time: {metrics.rollout_time:.3f}s | "
        f"learn_time: {metrics.learn_time:.3f}s"
    )


def handle_training_error(
    logger: MetricsLogger,
    error: Exception,
    iteration: int,
    env_steps: int,
    echo: bool = True,
) -> None:
    """Log the failure and move on (reference train.py:213-226).

    ``echo=False`` only moves the report to stderr with a process prefix —
    a non-coordinator failure must never be invisible (its logger is a
    NullMetricsLogger, and a per-process divergence that silently
    "recovers" would desync subsequent collectives with no trace)."""
    if echo:
        print(f"Error in iteration {iteration}: {error}")
        traceback.print_exc()
    else:
        print(
            f"[process {jax.process_index()}] Error in iteration "
            f"{iteration}: {error}\n{traceback.format_exc()}",
            file=_sys.stderr,
            flush=True,
        )
    logger.log(
        {
            "error/iteration": iteration,
            "error/message": str(error),
            "error/traceback": traceback.format_exc(),
        },
        step=env_steps,
    )


def main(argv=None) -> None:
    parser = argparse.ArgumentParser(description="Train self-play PPO on MNK")
    parser.add_argument("--arch", default=None, help="architecture registry name")
    parser.add_argument("--m", type=int, default=None)
    parser.add_argument("--n", type=int, default=None)
    parser.add_argument("--k", type=int, default=None)
    parser.add_argument("--num-envs", type=int, default=None)
    parser.add_argument("--total-steps", type=int, default=None)
    parser.add_argument("--seed", type=int, default=None)
    parser.add_argument("--run-name", default=None)
    parser.add_argument("--resume", action="store_true")
    parser.add_argument("--checkpoint-interval", type=int, default=None)
    parser.add_argument(
        "--matchmaking",
        choices=["uniform", "pfsp_hard", "pfsp_even"],
        default=None,
        help="league matchmaking over the opponent pool (selfplay/league.py)",
    )
    parser.add_argument(
        "--pool-eviction",
        choices=["fifo", "adaptive"],
        default=None,
        help="opponent-pool eviction once full: fifo = oldest (reference "
        "deque semantics), adaptive = lowest-weight (README-promised "
        "extension) — honored by both the host loop and --fused",
    )
    parser.add_argument(
        "--pool-weighted",
        action="store_true",
        help="weighted opponent sampling: draw probability proportional to "
        "each snapshot's validation score rate at insertion",
    )
    parser.add_argument(
        "--fused",
        action="store_true",
        help="device-resident iteration loop (train_fused): opponent pool, "
        "draws and entropy schedule run inside one compiled program per "
        "validation block — for pod runs / latency-bound hosts",
    )
    parser.add_argument(
        "--update-chunks",
        type=int,
        default=None,
        help="split the PPO update's epoch scan into N host-dispatched "
        "programs (bit-identical math) — keeps single-program execution "
        "under RPC deadlines for big models at large env counts",
    )
    parser.add_argument(
        "--watch-interval",
        type=int,
        default=None,
        help="log per-layer gradient/parameter norms every N iterations "
        "(run.watch parity; 0 disables)",
    )
    parser.add_argument(
        "--watch-histograms",
        action="store_true",
        help="also log 16-bin parameter histograms at the watch cadence",
    )
    parser.add_argument(
        "--zero-opt",
        action="store_true",
        help="ZeRO-1 sharded learner: optimizer moments + step sharded "
        "over the env mesh axis (reduce-scatter grads / all-gather "
        "updates — parallel/zero.py); needs a >1-device mesh",
    )
    parser.add_argument(
        "--multihost",
        action="store_true",
        help="initialize jax.distributed (TPU pods autodetect; manual "
        "bring-up takes the three flags below)",
    )
    parser.add_argument("--coordinator-address", default=None)
    parser.add_argument("--num-processes", type=int, default=None)
    parser.add_argument("--process-id", type=int, default=None)
    args = parser.parse_args(argv)

    config = get_default_config()
    if args.arch:
        config["architecture_name"] = args.arch
    board_flags = (args.m, args.n, args.k)
    if any(v is not None for v in board_flags):
        if any(v is None for v in board_flags):
            parser.error(
                "--m/--n/--k must be given together (partial board specs "
                "would silently train the default board)"
            )
        config["mnk"] = (args.m, args.n, args.k)
    if args.num_envs:
        config["num_envs"] = args.num_envs
    if args.total_steps:
        config["total_environment_steps"] = args.total_steps
    if args.seed is not None:
        config["seed"] = args.seed
    if args.resume:
        config["resume"] = True
    if args.checkpoint_interval is not None:
        config["checkpoint_interval"] = args.checkpoint_interval
    if args.matchmaking:
        config["matchmaking"] = args.matchmaking
    if args.pool_eviction is not None:
        config["pool_eviction"] = args.pool_eviction
    if args.pool_weighted:
        config["pool_weighted"] = True
    if args.update_chunks is not None:
        config["update_chunks"] = args.update_chunks
    if args.watch_interval is not None:
        config["watch_interval"] = args.watch_interval
    if args.watch_histograms:
        config["watch_histograms"] = True
    if args.zero_opt:
        config["zero_sharded_optimizer"] = True
    if args.multihost:
        if not args.run_name:
            parser.error(
                "--multihost needs --run-name (all processes must agree on "
                "export/checkpoint paths; a timestamp default could differ "
                "between hosts)"
            )
        config["multihost"] = True
        config["coordinator_address"] = args.coordinator_address
        config["num_processes"] = args.num_processes
        config["process_id"] = args.process_id
        # Initialize BEFORE any logger/backend touch so only process 0
        # creates the metric stream and backends see the global topology.
        from .parallel.mesh import init_distributed, is_coordinator

        init_distributed(
            coordinator_address=args.coordinator_address,
            num_processes=args.num_processes,
            process_id=args.process_id,
        )
        if not is_coordinator():
            from .utils.metrics import NullMetricsLogger

            with NullMetricsLogger(run_name=args.run_name, config=config) as logger:
                if args.fused:
                    from .train_fused import train_mnk_fused

                    train_mnk_fused(config, logger)
                else:
                    train_mnk(config, logger)
            return

    with MetricsLogger(
        project="mnk",
        run_name=args.run_name,
        config=config,
        group="main_run_small_board",
        tags=["main_experiment"],
    ) as logger:
        if args.fused:
            from .train_fused import train_mnk_fused

            train_mnk_fused(config, logger)
        else:
            train_mnk(config, logger)


if __name__ == "__main__":
    main()
