"""Device-resident fused training: whole iterations scanned in one program.

The host loop in ``train.py`` (mirroring reference src/train.py:106-164)
dispatches two programs per iteration and draws opponents with host RNG —
at least one host round trip per iteration. That is fine on one chip where
an iteration takes seconds, but on a pod every round trip stalls every
chip, and on latency-bound links each dispatch costs milliseconds. This
module moves the WHOLE iteration loop into one compiled program:

  * opponent draws happen on device — 15% a (weighted) sample from the
    ``DevicePool`` ring buffer, 85% the live parameters (reference
    train.py:108-114), selected with a dense ``where`` so shapes stay
    static;
  * pool insertion every ``insert_interval`` iterations (reference
    :122-123) is a masked ring-buffer write;
  * the entropy coefficient is computed on device from the iteration index
    (``schedules.make_entropy_coef_fn``);
  * per-iteration metrics come back STACKED — one host fetch per block.

Validation, benchmark promotion, export and checkpointing stay host-side
at block boundaries; ``train_fused.train_mnk_fused`` sizes blocks so the
boundaries land exactly on the reference's validation cadence.

Execution-length caveat: a SCANNED block is ONE XLA execution of
``block_len`` whole iterations, so it cannot honor
``PPOConfig.update_chunks`` and is inappropriate where a single execution
has a wall-clock deadline (the axon dev tunnel kills ~90 s executions —
CLAUDE.md). The "step" dispatch mode below has no such limit: it
dispatches standalone programs per iteration and honors update_chunks
(the driver auto-selects it when chunking is requested), so big models
run fused too.
"""

from __future__ import annotations

import functools
from typing import Any, Callable

import jax
import jax.numpy as jnp

from ..selfplay.opponent_pool import (
    DevicePool,
    pool_add_if,
    pool_record_result_if,
    pool_sample,
    pool_sample_league,
)
from .ppo import PPOConfig, rollout_impl, update_impl


def _select(pred: jax.Array, a: Any, b: Any) -> Any:
    """Dense pytree select on a traced scalar predicate."""
    return jax.tree.map(lambda x, y: jnp.where(pred, x, y), a, b)


@functools.partial(
    jax.jit,
    static_argnames=(
        "module",
        "config",
        "optimizer",
        "opponent_apply",
        "entropy_fn",
        "block_len",
        "pool_prob",
        "insert_interval",
        "matchmaking",
        "pfsp_power",
        "league_ema",
        "eviction",
    ),
    # params/batch_stats are deliberately NOT donated (same rule as the
    # host-path update): they are the only state a failed block cannot
    # rebuild — keeping them alive means a post-dispatch failure (e.g. an
    # RPC execution-deadline kill) loses at most one block, never the run.
    # They are a few MB; the donated buffers below are the bulky ones.
    donate_argnames=(
        "opt_state",
        "pool",
        "sp_state",
        "obs",
        "ep_rew",
        "ep_len",
    ),
)
def train_block(
    module,
    config: PPOConfig,
    optimizer,
    opponent_apply: Callable,
    entropy_fn: Callable,
    block_len: int,
    pool_prob: float,
    insert_interval: int,
    params: Any,
    batch_stats: Any,
    opt_state: Any,
    pool: DevicePool,
    sp_state,
    obs: dict,
    ep_rew: jax.Array,
    ep_len: jax.Array,
    rng: jax.Array,
    iteration0: jax.Array,
    insert_weight: jax.Array,
    matchmaking: str = None,
    pfsp_power: float = 2.0,
    league_ema: float = 0.3,
    eviction: str = "fifo",
):
    """Run iterations [iteration0, iteration0 + block_len) on device.

    ``pool`` holds full variables dicts ({"params", "batch_stats"}).
    ``insert_weight`` is the sampling weight attached to pool insertions
    inside this block (the host passes the latest validation score rate in
    weighted-pool mode; 1.0 otherwise — train.py:216,302 equivalent).

    ``matchmaking`` (None | "uniform" | "pfsp_hard" | "pfsp_even") turns on
    device-side league play: opponents are PFSP-drawn from the pool's
    per-slot score EMAs, and each historical iteration's outcome is folded
    back into the drawn slot's EMA inside the program — the DevicePool twin
    of selfplay/league.py with the same weight formulas, prior, and EMA
    factor (host-loop semantic parity, round-3 VERDICT item 5).

    ``ep_rew``/``ep_len`` are the per-env in-progress episode accumulators
    carried across blocks (reference ppo.py:81-89 semantics — see
    rollout_impl).

    Returns ``(params, batch_stats, opt_state, pool, sp_state, obs, ep_rew,
    ep_len, rng), stacked`` where ``stacked`` maps metric name ->
    (block_len,) array:
    the update diagnostics plus ``entropy_coef``, ``historical_opponent``
    and the finished-episode sums (``fin_reward/fin_length/fin_count``)
    from which the host derives mean_reward/mean_length per iteration.

    ``eviction`` ("fifo" | "adaptive") selects the pool-insert slot policy,
    matching the host loop's ``pool_eviction`` config (train.py:335 /
    opponent_pool._insert_slot).
    """
    if config.zero_update:
        # The scanned block is ONE compiled program; the ZeRO epoch path
        # (alg/zero_epochs.py) is a host-dispatched prepare + shard_map
        # chunk schedule and cannot run inside this scan body. The step
        # dispatch (train_step_iteration) composes with it — never fall
        # back to the replicated update silently.
        raise ValueError(
            "train_block (scanned fused dispatch) cannot run the ZeRO "
            "sharded learner (PPOConfig.zero_update): use the 'step' "
            "dispatch (train_step_iteration / fused_dispatch='step')"
        )

    def body(carry, i):
        return _iteration_impl(
            module, config, optimizer, opponent_apply, entropy_fn,
            pool_prob, insert_interval, carry, iteration0 + i, insert_weight,
            matchmaking, pfsp_power, league_ema, eviction,
        )

    carry = (
        params, batch_stats, opt_state, pool, sp_state, obs,
        ep_rew, ep_len, rng,
    )
    carry, stacked = jax.lax.scan(
        body, carry, jnp.arange(block_len, dtype=jnp.int32)
    )
    return carry, stacked


def _iteration_impl(
    module, config, optimizer, opponent_apply, entropy_fn,
    pool_prob, insert_interval, carry, it, insert_weight,
    matchmaking=None, pfsp_power=2.0, league_ema=0.3, eviction="fifo",
):
    """One whole device-resident iteration: opponent draw -> rollout ->
    update -> league result record -> masked pool insert. Shared by the
    scanned block (above) and the per-iteration dispatch
    (``train_iteration`` below)."""
    (
        params, batch_stats, opt_state, pool, sp_state, obs,
        ep_rew, ep_len, rng,
    ) = carry
    rng, k_draw, k_pick, k_roll, k_upd = jax.random.split(rng, 5)

    # Opponent schedule (reference train.py:108-114): 15% historical
    # from the pool, else a snapshot of the current network. The pool
    # sample is a gather; both branches are merged with a dense select.
    current = {"params": params, "batch_stats": batch_stats}
    if matchmaking:
        drawn_idx, sampled = pool_sample_league(
            pool, k_pick, matchmaking, pfsp_power
        )
    else:
        drawn_idx = jnp.int32(0)
        sampled = pool_sample(pool, k_pick)
    historical = (jax.random.uniform(k_draw) < pool_prob) & (pool.size > 0)
    opponent = _select(historical, sampled, current)

    sp_state, obs, batch_stats, traj, fin, (ep_rew, ep_len), _ = rollout_impl(
        module,
        config,
        opponent_apply,
        params,
        batch_stats,
        opponent,
        sp_state,
        obs,
        ep_rew,
        ep_len,
        k_roll,
    )
    ent_coef = entropy_fn(it)
    params, batch_stats, opt_state, metrics = update_impl(
        module,
        config,
        optimizer,
        params,
        batch_stats,
        opt_state,
        traj,
        obs,
        ent_coef,
        k_upd,
    )

    # League result record (host-loop train.py order: record, THEN the
    # cadence insert): fold the iteration's mean finished-episode reward vs
    # the drawn member into its slot EMA — only on historical iterations.
    if matchmaking:
        mean_rew = jnp.where(
            fin[2] > 0, fin[0] / jnp.maximum(fin[2], 1.0), 0.0
        )
        pool = pool_record_result_if(
            pool, drawn_idx, (mean_rew + 1.0) / 2.0, historical,
            ema=league_ema,
        )

    # Pool insertion cadence (reference :122-123): every
    # ``insert_interval`` iterations, post-update snapshot. The masked
    # insert touches only the written slot, not the whole stacked pool.
    do_insert = (it % insert_interval) == 0
    pool = pool_add_if(
        pool,
        {"params": params, "batch_stats": batch_stats},
        insert_weight,
        do_insert,
        eviction,
    )

    out = dict(metrics)
    out["entropy_coef"] = ent_coef
    out["historical_opponent"] = historical
    out["fin_reward"], out["fin_length"], out["fin_count"] = fin
    return (
        params, batch_stats, opt_state, pool, sp_state, obs,
        ep_rew, ep_len, rng,
    ), out


# ---------------------------------------------------------------------------
# Dispatch mode "step": the same iteration as a handful of HOST-DISPATCHED
# programs instead of one scanned/merged program. Measured motivation
# (evidence/fused_ablation_8192.log, resnet_b_s @ 8192 envs):
#
#   standalone rollout + update programs : 7.80 s/iter   (host-loop core)
#   rollout+update merged into ONE program: 8.26 s/iter  (+6%)
#   whole block scanned (train_block)    : 9.00 s/iter   (+15%)
#
# XLA's buffer assignment is strictly worse once the two phases share a
# program (and worse again under the outer scan's conservative loop-carry
# copies), so the fast large-scale dispatch is the host-loop's OWN donated
# rollout/update programs — plus two tiny device programs for the opponent
# draw and the pool insert, and NO fetches inside a block (metric handles
# stay futures until the validation boundary). Bit-identical to the
# scanned block: same RNG split structure, same masked-insert semantics
# (tests/test_fused.py::test_step_dispatch_matches_scanned_block_bitwise).


@functools.partial(
    jax.jit,
    static_argnames=("entropy_fn", "pool_prob", "matchmaking", "pfsp_power"),
)
def _draw_program(
    entropy_fn, pool_prob, pool, params, batch_stats, rng, it,
    matchmaking=None, pfsp_power=2.0,
):
    """Opponent draw + per-iteration keys + entropy coef, on device (one
    tiny program; consumes RNG exactly like train_block's scan body)."""
    rng, k_draw, k_pick, k_roll, k_upd = jax.random.split(rng, 5)
    current = {"params": params, "batch_stats": batch_stats}
    if matchmaking:
        drawn_idx, sampled = pool_sample_league(
            pool, k_pick, matchmaking, pfsp_power
        )
    else:
        drawn_idx = jnp.int32(0)
        sampled = pool_sample(pool, k_pick)
    historical = (jax.random.uniform(k_draw) < pool_prob) & (pool.size > 0)
    opponent = _select(historical, sampled, current)
    return rng, k_roll, k_upd, opponent, historical, drawn_idx, entropy_fn(it)


_pool_insert = jax.jit(
    pool_add_if, donate_argnames=("pool",), static_argnames=("eviction",)
)
_pool_record = jax.jit(
    pool_record_result_if, donate_argnames=("pool",), static_argnames=("ema",)
)


def train_step_iteration(
    module, config, optimizer, opponent_apply, entropy_fn,
    pool_prob, insert_interval, carry, it: int, insert_weight,
    matchmaking=None, pfsp_power=2.0, league_ema=0.3, eviction="fifo",
    mesh=None,
):
    """One fused-driver iteration as host-dispatched standalone programs.

    Threads the same carry tuple as one ``train_block`` scan step and
    returns the same per-iteration metrics dict (as device futures — the
    caller fetches once per block). ``it`` is a HOST int: the pool-insert
    cadence check happens host-side, so 19 of 20 iterations skip the insert
    program entirely (the masked on-device insert with do_insert=False is
    an identity, so this is bit-equivalent). With ``matchmaking`` set, the
    league record is one extra tiny program per iteration — same math and
    order as the scanned body (record, then cadence insert).

    Honors ``PPOConfig.update_chunks``: the update phase dispatches through
    the shared ``update_chunked`` (prepare + epoch-chunk programs, math
    bit-identical to the monolithic ``update``) — this is what lets the
    5-layer transformers, whose monolithic update exceeds RPC execution
    deadlines, run fused at all (round-2 VERDICT item 3).

    With ``config.zero_update`` the update phase routes through the ZeRO
    collective epoch schedule (``zero_epochs.zero_update_chunked``) over
    ``mesh`` — the two pod-shaped features (fused dispatch, sharded
    learner) compose here; passing ``zero_update`` without a mesh is a
    loud error, never a silent replicated fallback."""
    from .ppo import rollout, update_chunked

    if config.zero_update and mesh is None:
        raise ValueError(
            "train_step_iteration: PPOConfig.zero_update needs the device "
            "mesh the learner was built with (pass mesh=learner.mesh)"
        )

    (
        params, batch_stats, opt_state, pool, sp_state, obs,
        ep_rew, ep_len, rng,
    ) = carry
    rng, k_roll, k_upd, opponent, historical, drawn_idx, ent_coef = (
        _draw_program(
            entropy_fn, pool_prob, pool, params, batch_stats, rng,
            jnp.int32(it), matchmaking, pfsp_power,
        )
    )
    sp_state, obs, batch_stats, traj, fin, (ep_rew, ep_len), _ = rollout(
        module, config, opponent_apply, params, batch_stats, opponent,
        sp_state, obs, ep_rew, ep_len, k_roll,
    )
    # Prepare+epochs dispatch even at update_chunks=1: bit-identical to the
    # monolithic program, and the prepare program's traj donation reclaims
    # the trajectory's HBM for the flats (see ppo.update_prepare).
    if config.zero_update:
        from .zero_epochs import zero_update_chunked

        params, batch_stats, opt_state, metrics = zero_update_chunked(
            module, config, optimizer, mesh, params, batch_stats, opt_state,
            traj, obs, ent_coef, k_upd,
        )
    else:
        params, batch_stats, opt_state, metrics = update_chunked(
            module, config, optimizer, params, batch_stats, opt_state,
            traj, obs, ent_coef, k_upd,
        )
    if matchmaking:
        mean_rew = jnp.where(
            fin[2] > 0, fin[0] / jnp.maximum(fin[2], 1.0), 0.0
        )
        pool = _pool_record(
            pool, drawn_idx, (mean_rew + 1.0) / 2.0, historical,
            ema=league_ema,
        )
    if it % insert_interval == 0:
        pool = _pool_insert(
            pool, {"params": params, "batch_stats": batch_stats},
            insert_weight, jnp.bool_(True), eviction=eviction,
        )
    out = dict(metrics)
    out["entropy_coef"] = ent_coef
    out["historical_opponent"] = historical
    out["fin_reward"], out["fin_length"], out["fin_count"] = fin
    return (
        params, batch_stats, opt_state, pool, sp_state, obs,
        ep_rew, ep_len, rng,
    ), out
