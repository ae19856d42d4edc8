"""Fused device-resident training blocks (alg/fused.py, train_fused.py).

Pins: block semantics (pool insert cadence, on-device opponent draws,
entropy schedule values), stacked metric shapes, micro end-to-end run of
the fused driver with validation/export/promotion, and checkpoint/resume
through the DevicePool."""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.flatten_util import ravel_pytree
import optax
import pytest

from rl_selfplay_mnk_tpu.alg.fused import train_block
from rl_selfplay_mnk_tpu.alg.ppo import PPOConfig, pick_group_size
from rl_selfplay_mnk_tpu.alg.schedules import (
    entropy_coef_at,
    make_entropy_coef_fn,
)
from rl_selfplay_mnk_tpu.env import EnvConfig
from rl_selfplay_mnk_tpu.models.registry import (
    create_model_from_architecture,
    init_network,
    make_apply_fns,
)
from rl_selfplay_mnk_tpu.selfplay.opponent_pool import pool_add, pool_init
from rl_selfplay_mnk_tpu.selfplay.policies import make_network_policy
from rl_selfplay_mnk_tpu.selfplay.wrapper import selfplay_reset


def _setup(num_envs=8, n_steps=8, batch=32):
    env_cfg = EnvConfig(3, 3, 3)
    module, _ = create_model_from_architecture("cnn_b_s", (2, 3, 3), 9)
    variables = init_network(module, (2, 3, 3), jax.random.PRNGKey(0))
    eval_apply, _ = make_apply_fns(module)
    policy_act = make_network_policy(eval_apply)
    config = PPOConfig(
        env=env_cfg,
        num_envs=num_envs,
        n_steps=n_steps,
        batch_size=batch,
        ppo_epochs=1,
        shuffle="global",
        group_size=pick_group_size(batch),
    )
    optimizer = optax.flatten(
        optax.chain(
            optax.clip_by_global_norm(0.5),
            optax.adamw(1e-3, eps=1e-5, weight_decay=0.01),
        )
    )
    opt_state = jax.jit(optimizer.init)(variables["params"])
    sp_state, obs = jax.jit(
        selfplay_reset, static_argnames=("cfg", "opponent_apply", "num_envs")
    )(env_cfg, policy_act, variables, num_envs, jax.random.PRNGKey(1))
    return module, config, optimizer, policy_act, variables, opt_state, sp_state, obs


ENT_SCHEDULE = {
    "type": "linear",
    "params": {"final_coef": 0.001, "total_steps": 8 * 8 * 10},
}


def test_entropy_coef_fn_matches_host_schedule():
    fn = make_entropy_coef_fn(0.04, ENT_SCHEDULE, 8, 8)
    for it in [0, 1, 3, 7, 10, 25]:
        host = entropy_coef_at(0.04, ENT_SCHEDULE, it, 8, 8)
        np.testing.assert_allclose(float(fn(jnp.int32(it))), host, rtol=1e-6)
    # exponential flavor
    sched = {"type": "exponential", "params": {"decay_rate": 0.9}}
    fn = make_entropy_coef_fn(0.05, sched, 8, 8)
    for it in [0, 2, 9]:
        host = entropy_coef_at(0.05, sched, it, 8, 8)
        np.testing.assert_allclose(float(fn(jnp.int32(it))), host, rtol=1e-5)
    # constant / no schedule
    fn = make_entropy_coef_fn(0.02, None, 8, 8)
    assert float(fn(jnp.int32(5))) == pytest.approx(0.02)


def test_train_block_runs_and_stacks_metrics():
    (
        module, config, optimizer, policy_act, variables, opt_state,
        sp_state, obs,
    ) = _setup()
    pool = pool_init(variables, max_size=3)
    pool = pool_add(pool, variables, 1.0)
    entropy_fn = make_entropy_coef_fn(0.04, ENT_SCHEDULE, 8, 8)
    flat0 = np.asarray(ravel_pytree(variables["params"])[0])

    block_len = 4
    ep0 = jnp.zeros((config.num_envs,), jnp.float32)
    ep1 = jnp.zeros((config.num_envs,), jnp.float32)
    carry, stacked = train_block(
        module, config, optimizer, policy_act, entropy_fn,
        block_len, 0.15, 20,
        variables["params"], variables["batch_stats"], opt_state, pool,
        sp_state, obs, ep0, ep1,
        jax.random.PRNGKey(2), jnp.int32(0), jnp.float32(1.0),
    )
    params, batch_stats, opt_state, pool, sp_state, obs, _, _, _ = carry

    for key in (
        "actor_loss", "critic_loss", "entropy_loss", "grad_norm",
        "clip_fraction", "approx_kl", "explained_variance", "entropy_coef",
        "fin_reward", "fin_length", "fin_count",
    ):
        assert stacked[key].shape == (block_len,), key
        assert np.all(np.isfinite(np.asarray(stacked[key], np.float32))), key
    assert stacked["historical_opponent"].shape == (block_len,)

    # pool insert cadence: iteration 0 inserts (0 % 20 == 0) on top of the
    # seed entry -> size 2; no other iteration in [0,4) is a multiple of 20
    assert int(pool.size) == 2
    # entropy coef follows the schedule per iteration
    expected = [entropy_coef_at(0.04, ENT_SCHEDULE, it, 8, 8) for it in range(4)]
    np.testing.assert_allclose(
        np.asarray(stacked["entropy_coef"]), expected, rtol=1e-5
    )
    # parameters actually changed
    flat1 = np.asarray(ravel_pytree(params)[0])
    assert np.abs(flat1 - flat0).max() > 0


def test_step_dispatch_matches_scanned_block_bitwise():
    """Per-iteration dispatch (train_step_iteration x L: the host-loop's
    own rollout/update programs + device pool ops) must be bit-identical to
    the scanned block — the two are alternative dispatch strategies for the
    SAME math (dispatch mode selection must never change results)."""
    from rl_selfplay_mnk_tpu.alg.fused import train_step_iteration

    (
        module, config, optimizer, policy_act, variables, opt_state,
        sp_state, obs,
    ) = _setup()
    entropy_fn = make_entropy_coef_fn(0.04, ENT_SCHEDULE, 8, 8)
    block_len = 3

    def fresh():
        pool = pool_init(variables, max_size=3)
        pool = pool_add(pool, variables, 1.0)
        ep0 = jnp.zeros((config.num_envs,), jnp.float32)
        ep1 = jnp.zeros((config.num_envs,), jnp.float32)
        return jax.tree.map(
            jnp.copy,
            (variables["params"], variables["batch_stats"], opt_state, pool,
             jax.tree.map(jnp.copy, sp_state), obs, ep0, ep1,
             jax.random.PRNGKey(2)),
        )

    carry_a, stacked = train_block(
        module, config, optimizer, policy_act, entropy_fn,
        block_len, 0.15, 20, *fresh(), jnp.int32(0), jnp.float32(1.0),
    )

    carry_b = fresh()
    outs = []
    for i in range(block_len):
        carry_b, m = train_step_iteration(
            module, config, optimizer, policy_act, entropy_fn, 0.15, 20,
            carry_b, i, jnp.float32(1.0),
        )
        outs.append(m)

    for a, b in zip(jax.tree.leaves(carry_a), jax.tree.leaves(carry_b)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for key in stacked:
        got = np.stack([np.asarray(m[key]) for m in outs])
        np.testing.assert_array_equal(np.asarray(stacked[key]), got)


def test_train_block_iteration_offset_controls_cadence():
    """With iteration0=19 the second iteration (it=20) triggers the pool
    insert, not the first."""
    (
        module, config, optimizer, policy_act, variables, opt_state,
        sp_state, obs,
    ) = _setup()
    pool = pool_init(variables, max_size=3)
    pool = pool_add(pool, variables, 1.0)
    entropy_fn = make_entropy_coef_fn(0.04, None, 8, 8)

    ep0 = jnp.zeros((config.num_envs,), jnp.float32)
    ep1 = jnp.zeros((config.num_envs,), jnp.float32)
    carry, _ = train_block(
        module, config, optimizer, policy_act, entropy_fn,
        2, 0.15, 20,
        variables["params"], variables["batch_stats"], opt_state, pool,
        sp_state, obs, ep0, ep1,
        jax.random.PRNGKey(3), jnp.int32(19), jnp.float32(0.7),
    )
    pool = carry[3]
    assert int(pool.size) == 2  # seed + the it=20 insert
    # the inserted slot carries the insert weight
    assert float(pool.weights[1]) == pytest.approx(0.7)


def test_train_block_on_mesh():
    """The fused block compiles and executes with envs sharded over the
    virtual 8-device mesh and params/pool replicated — the pod-mode layout
    it exists for."""
    from jax.sharding import PartitionSpec as P

    from rl_selfplay_mnk_tpu.parallel import make_mesh, replicate, shard_batched

    (
        module, config, optimizer, policy_act, variables, opt_state,
        sp_state, obs,
    ) = _setup(num_envs=16, n_steps=8, batch=32)
    mesh = make_mesh(num_devices=8)
    params = replicate(variables["params"], mesh)
    batch_stats = replicate(variables["batch_stats"], mesh)
    opt_state = replicate(opt_state, mesh)
    pool = pool_init(variables, max_size=3)
    pool = pool_add(pool, variables, 1.0)
    pool = replicate(pool, mesh)
    sp_state = shard_batched(sp_state, mesh)
    obs = shard_batched(obs, mesh)
    entropy_fn = make_entropy_coef_fn(0.04, None, 16, 8)

    ep0 = shard_batched(jnp.zeros((config.num_envs,), jnp.float32), mesh)
    ep1 = shard_batched(jnp.zeros((config.num_envs,), jnp.float32), mesh)
    carry, stacked = train_block(
        module, config, optimizer, policy_act, entropy_fn,
        3, 0.15, 20,
        params, batch_stats, opt_state, pool, sp_state, obs, ep0, ep1,
        jax.random.PRNGKey(4), jnp.int32(0), jnp.float32(1.0),
    )
    assert np.all(np.isfinite(np.asarray(stacked["actor_loss"])))
    # env state stayed sharded, params replicated
    assert carry[4].env.boards.sharding.spec == P("env")
    leaf = jax.tree.leaves(carry[0])[0]
    assert leaf.sharding.spec in (P(), P(None), P(*(None,) * leaf.ndim))


def test_train_mnk_fused_micro_end_to_end(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    from rl_selfplay_mnk_tpu.train import get_default_config
    from rl_selfplay_mnk_tpu.train_fused import train_mnk_fused
    from rl_selfplay_mnk_tpu.utils.metrics import MetricsLogger

    config = get_default_config()
    config.update(
        mnk=(3, 3, 3),
        num_envs=16,
        n_steps=16,
        batch_size=64,
        ppo_epochs=1,
        total_environment_steps=16 * 16 * 6,  # 6 iterations
        validation_interval=2,
        validation_episodes=32,
        lr_warmup_steps=0,
        architecture_name="cnn_b_s",
        opponent_pool=3,
        use_mesh=False,
        entropy_coef_schedule=None,
    )
    logger = MetricsLogger(
        run_name="fusedmicro", config=config, out_dir=str(tmp_path / "runs"),
        use_wandb=False,
    )
    train_mnk_fused(config, logger)
    logger.finish()

    lines = [json.loads(ln) for ln in open(tmp_path / "runs" / "fusedmicro.jsonl")]
    keys = {k for rec in lines for k in rec}
    assert "training/mean_reward" in keys
    assert "validation/vs_benchmark/score_rate" in keys
    assert not any(k.startswith("error/") for k in keys)
    # one training record per iteration (0..5)
    steps = sorted(
        r["_step"] for r in lines if "training/mean_reward" in r
    )
    assert steps == [16 * 16 * (i + 1) for i in range(6)]
    # validations after iterations 2 and 4 exported models; final export too
    exported = os.listdir(tmp_path / "models" / "fusedmicro")
    assert "model_00006.msgpack" in exported
    assert len([f for f in exported if f.endswith(".json")]) >= 3


def test_train_mnk_fused_resume_roundtrip(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    from rl_selfplay_mnk_tpu.train import get_default_config
    from rl_selfplay_mnk_tpu.train_fused import train_mnk_fused
    from rl_selfplay_mnk_tpu.utils.metrics import MetricsLogger

    config = get_default_config()
    config.update(
        mnk=(3, 3, 3),
        num_envs=8,
        n_steps=8,
        batch_size=32,
        ppo_epochs=1,
        total_environment_steps=8 * 8 * 5,  # 5 iterations
        validation_interval=2,
        validation_episodes=16,
        lr_warmup_steps=0,
        architecture_name="cnn_b_s",
        opponent_pool=2,
        use_mesh=False,
        checkpoint_interval=2,
        checkpoint_dir=str(tmp_path / "ckpt"),
        entropy_coef_schedule=None,
    )
    logger = MetricsLogger(
        run_name="f1", config=config, out_dir=str(tmp_path / "runs"),
        use_wandb=False,
    )
    train_mnk_fused(config, logger)
    logger.finish()

    config["resume"] = True
    config["total_environment_steps"] = 8 * 8 * 7
    logger2 = MetricsLogger(
        run_name="f2", config=config, out_dir=str(tmp_path / "runs"),
        use_wandb=False,
    )
    train_mnk_fused(config, logger2)
    logger2.finish()

    lines = [json.loads(ln) for ln in open(tmp_path / "runs" / "f2.jsonl")]
    steps = [r["_step"] for r in lines if "training/mean_reward" in r]
    assert steps and min(steps) >= 8 * 8 * 5
    assert not any(k.startswith("error/") for rec in lines for k in rec)


def test_step_dispatch_chunked_update_matches_monolithic_bitwise():
    """The step dispatch honors PPOConfig.update_chunks (round-2 VERDICT
    item 3): routing the update through update_prepare/update_epochs chunk
    programs must be bit-identical to the monolithic update program —
    chunking exists for RPC execution deadlines, never for different math."""
    import dataclasses

    from rl_selfplay_mnk_tpu.alg.fused import train_step_iteration

    (
        module, config, optimizer, policy_act, variables, opt_state,
        sp_state, obs,
    ) = _setup()
    config = dataclasses.replace(config, ppo_epochs=2)
    config_chunked = dataclasses.replace(config, update_chunks=2)
    entropy_fn = make_entropy_coef_fn(0.04, ENT_SCHEDULE, 8, 8)

    def run(cfg):
        pool = pool_init(variables, max_size=3)
        pool = pool_add(pool, variables, 1.0)
        ep0 = jnp.zeros((cfg.num_envs,), jnp.float32)
        ep1 = jnp.zeros((cfg.num_envs,), jnp.float32)
        carry = jax.tree.map(
            jnp.copy,
            (variables["params"], variables["batch_stats"], opt_state, pool,
             jax.tree.map(jnp.copy, sp_state), obs, ep0, ep1,
             jax.random.PRNGKey(2)),
        )
        outs = []
        for i in range(2):
            carry, m = train_step_iteration(
                module, cfg, optimizer, policy_act, entropy_fn, 0.15, 20,
                carry, i, jnp.float32(1.0),
            )
            outs.append(m)
        return carry, outs

    carry_a, outs_a = run(config)
    carry_b, outs_b = run(config_chunked)
    for a, b in zip(jax.tree.leaves(carry_a), jax.tree.leaves(carry_b)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for ma, mb in zip(outs_a, outs_b):
        assert set(ma) == set(mb)
        for key in ma:
            np.testing.assert_array_equal(np.asarray(ma[key]), np.asarray(mb[key]))


def test_train_mnk_fused_chunked_micro_end_to_end(tmp_path, monkeypatch):
    """The fused driver accepts update_chunks now (it used to reject it):
    auto dispatch resolves to 'step', training completes with no error
    records; an explicit 'scan' request still conflicts."""
    monkeypatch.chdir(tmp_path)
    from rl_selfplay_mnk_tpu.train import get_default_config
    from rl_selfplay_mnk_tpu.train_fused import train_mnk_fused
    from rl_selfplay_mnk_tpu.utils.metrics import MetricsLogger

    config = get_default_config()
    config.update(
        mnk=(3, 3, 3),
        num_envs=8,
        n_steps=8,
        batch_size=32,
        ppo_epochs=2,
        update_chunks=2,
        total_environment_steps=8 * 8 * 4,
        validation_interval=2,
        validation_episodes=16,
        lr_warmup_steps=0,
        architecture_name="cnn_b_s",
        opponent_pool=2,
        use_mesh=False,
        entropy_coef_schedule=None,
    )
    logger = MetricsLogger(
        run_name="fusedchunk", config=config, out_dir=str(tmp_path / "runs"),
        use_wandb=False,
    )
    train_mnk_fused(config, logger)
    logger.finish()

    lines = [json.loads(ln) for ln in open(tmp_path / "runs" / "fusedchunk.jsonl")]
    keys = {k for rec in lines for k in rec}
    assert "training/mean_reward" in keys
    assert not any(k.startswith("error/") for k in keys)
    exported = os.listdir(tmp_path / "models" / "fusedchunk")
    assert "model_00004.msgpack" in exported

    # explicit scan + chunks is a config error, caught up front
    config["fused_dispatch"] = "scan"
    with MetricsLogger(
        run_name="fusedscan", config=config, out_dir=str(tmp_path / "runs"),
        use_wandb=False,
    ) as logger3:
        with pytest.raises(ValueError, match="scan"):
            train_mnk_fused(config, logger3)


def test_fused_resume_is_bit_exact(tmp_path, monkeypatch):
    """Fused checkpoints now carry mid-episode env state + episode
    accumulators (round-2 VERDICT item 3): an interrupted-then-resumed
    fused run produces EXACTLY the parameters of an uninterrupted one."""
    monkeypatch.chdir(tmp_path)
    from flax import serialization
    from rl_selfplay_mnk_tpu.train import get_default_config
    from rl_selfplay_mnk_tpu.train_fused import train_mnk_fused
    from rl_selfplay_mnk_tpu.utils.metrics import MetricsLogger

    def base_config(total_iters, ckpt_dir):
        config = get_default_config()
        config.update(
            mnk=(3, 3, 3),
            num_envs=8,
            n_steps=8,
            batch_size=32,
            ppo_epochs=1,
            total_environment_steps=8 * 8 * total_iters,
            validation_interval=2,
            validation_episodes=8,
            lr_warmup_steps=0,
            architecture_name="cnn_b_s",
            opponent_pool=2,
            use_mesh=False,
            checkpoint_interval=2,
            checkpoint_dir=ckpt_dir,
            entropy_coef_schedule=None,
            seed=3,
        )
        return config

    def final_weights(run):
        path = tmp_path / "models" / run / "model_00006.msgpack"
        with open(path, "rb") as f:
            return f.read()

    cfg = base_config(6, str(tmp_path / "ckptA"))
    with MetricsLogger(run_name="fstraight", config=cfg,
                       out_dir=str(tmp_path / "runs"), use_wandb=False) as lg:
        train_mnk_fused(cfg, lg)

    cfg = base_config(4, str(tmp_path / "ckptB"))
    with MetricsLogger(run_name="fpart1", config=cfg,
                       out_dir=str(tmp_path / "runs"), use_wandb=False) as lg:
        train_mnk_fused(cfg, lg)
    cfg = base_config(6, str(tmp_path / "ckptB"))
    cfg["resume"] = True
    with MetricsLogger(run_name="fpart2", config=cfg,
                       out_dir=str(tmp_path / "runs"), use_wandb=False) as lg:
        train_mnk_fused(cfg, lg)

    a = serialization.msgpack_restore(final_weights("fstraight"))
    b = serialization.msgpack_restore(final_weights("fpart2"))
    flat_a = jax.tree_util.tree_leaves(a)
    flat_b = jax.tree_util.tree_leaves(b)
    assert len(flat_a) == len(flat_b)
    for la, lb in zip(flat_a, flat_b):
        np.testing.assert_array_equal(np.asarray(la), np.asarray(lb))


def test_device_league_mirrors_host_league_semantics():
    """DevicePool league ops are the exact device twin of selfplay/league.py
    on a scripted sequence: same even-match prior on insert, same pfsp
    weight formulas (incl. the 1e-3 floor), same EMA fold on record, FIFO
    roster parity, and score-prior reset when a slot is overwritten."""
    from rl_selfplay_mnk_tpu.selfplay.league import League, pfsp_weight
    from rl_selfplay_mnk_tpu.selfplay.opponent_pool import (
        pfsp_slot_weights,
        pool_add,
        pool_init,
        pool_record_result_if,
        pool_sample_league,
    )

    # weight formula parity across the modes and the score range
    scores = np.linspace(-0.2, 1.2, 17)
    for mode in ("uniform", "pfsp_hard", "pfsp_even"):
        dev = np.asarray(pfsp_slot_weights(jnp.asarray(scores, jnp.float32), mode))
        host = [pfsp_weight(float(s), mode) for s in scores]
        np.testing.assert_allclose(dev, host, rtol=1e-6)

    # scripted roster: insert A, B; record results; EMA parity with League
    league = League(max_size=2, mode="pfsp_hard", ema=0.3, seed=0)
    a = league.add_opponent("A")
    b = league.add_opponent("B")
    template = {"x": jnp.zeros((2,))}
    pool = pool_init(template, max_size=2)
    pool = pool_add(pool, {"x": jnp.ones((2,))})       # slot 0 = A
    pool = pool_add(pool, {"x": jnp.full((2,), 2.0)})  # slot 1 = B
    for entry_id, slot, score in [(a, 0, 1.0), (b, 1, 0.0), (a, 0, 0.25)]:
        league.record_result(entry_id, score)
        pool = pool_record_result_if(
            pool, jnp.int32(slot), jnp.float32(score), jnp.bool_(True),
            ema=0.3,
        )
    host_scores = {e.entry_id: e.score_ema for e in league.entries}
    np.testing.assert_allclose(float(pool.scores[0]), host_scores[a], rtol=1e-6)
    np.testing.assert_allclose(float(pool.scores[1]), host_scores[b], rtol=1e-6)
    assert float(pool.games[0]) == 2.0 and float(pool.games[1]) == 1.0

    # masked record is an identity; non-finite scores record nothing
    before = np.asarray(pool.scores)
    pool = pool_record_result_if(
        pool, jnp.int32(0), jnp.float32(0.9), jnp.bool_(False), ema=0.3
    )
    pool = pool_record_result_if(
        pool, jnp.int32(0), jnp.float32(np.nan), jnp.bool_(True), ema=0.3
    )
    np.testing.assert_array_equal(np.asarray(pool.scores), before)

    # FIFO overwrite resets the slot to the even-match prior (League parity:
    # a fresh snapshot's strength vs the CURRENT learner is unknown)
    pool = pool_add(pool, {"x": jnp.full((2,), 3.0)})  # overwrites slot 0
    assert float(pool.scores[0]) == 0.5 and float(pool.games[0]) == 0.0

    # pfsp_hard sampling prefers the member the learner loses to
    pool = pool_record_result_if(
        pool, jnp.int32(0), jnp.float32(1.0), jnp.bool_(True), ema=1.0
    )  # slot 0: always beaten
    pool = pool_record_result_if(
        pool, jnp.int32(1), jnp.float32(0.0), jnp.bool_(True), ema=1.0
    )  # slot 1: nemesis
    draws = [
        int(pool_sample_league(
            pool, jax.random.PRNGKey(i), "pfsp_hard", 2.0
        )[0])
        for i in range(200)
    ]
    assert draws.count(1) > 170


def test_device_pool_adaptive_eviction():
    """pool_add(eviction='adaptive') overwrites the LOWEST-weight slot once
    full (host OpponentPool(eviction='adaptive') parity) while FIFO keeps
    ring order."""
    from rl_selfplay_mnk_tpu.selfplay.opponent_pool import pool_add, pool_init

    template = {"x": jnp.zeros(())}
    pool = pool_init(template, max_size=2)
    pool = pool_add(pool, {"x": jnp.float32(1.0)}, weight=0.9,
                    eviction="adaptive")
    pool = pool_add(pool, {"x": jnp.float32(2.0)}, weight=0.1,
                    eviction="adaptive")
    # full: next adaptive insert must evict slot 1 (weight 0.1), not slot 0
    pool = pool_add(pool, {"x": jnp.float32(3.0)}, weight=0.5,
                    eviction="adaptive")
    assert float(pool.stacked["x"][0]) == 1.0
    assert float(pool.stacked["x"][1]) == 3.0
    np.testing.assert_allclose(np.asarray(pool.weights), [0.9, 0.5])


def test_fused_league_step_matches_scanned_block_bitwise():
    """--fused --matchmaking: the scanned block and the step dispatch run
    the SAME league math (PFSP draw from score EMAs, in-program result
    record, record-then-insert order) — bit-identical carries, metrics, and
    pool score/game state."""
    from rl_selfplay_mnk_tpu.alg.fused import train_block, train_step_iteration

    (
        module, config, optimizer, policy_act, variables, opt_state,
        sp_state, obs,
    ) = _setup()
    entropy_fn = make_entropy_coef_fn(0.04, ENT_SCHEDULE, 8, 8)
    block_len = 4
    mm = ("pfsp_hard", 2.0, 0.3)

    def fresh_carry():
        pool = pool_init(variables, max_size=3)
        pool = pool_add(pool, variables, 1.0)
        ep0 = jnp.zeros((config.num_envs,), jnp.float32)
        ep1 = jnp.zeros((config.num_envs,), jnp.float32)
        return jax.tree.map(
            jnp.copy,
            (variables["params"], variables["batch_stats"], opt_state, pool,
             sp_state, obs, ep0, ep1, jax.random.PRNGKey(2)),
        )

    carry = fresh_carry()
    carry_scan, stacked = train_block(
        module, config, optimizer, policy_act, entropy_fn,
        block_len, 0.9, 2, *carry, jnp.int32(0), jnp.float32(1.0), *mm,
    )

    carry_step = fresh_carry()
    outs = []
    for i in range(block_len):
        carry_step, m = train_step_iteration(
            module, config, optimizer, policy_act, entropy_fn, 0.9, 2,
            carry_step, i, jnp.float32(1.0), *mm,
        )
        outs.append(m)

    for a, b in zip(jax.tree.leaves(carry_scan), jax.tree.leaves(carry_step)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for key in stacked:
        step_vals = np.asarray([np.asarray(m[key]) for m in outs])
        np.testing.assert_array_equal(np.asarray(stacked[key]), step_vals, err_msg=key)

    # with pool_prob 0.9 and 4 iterations, historical draws actually
    # happened and recorded results into score EMAs
    pool_after = carry_scan[3]
    assert float(pool_after.games.sum()) > 0
    assert not np.allclose(np.asarray(pool_after.scores), 0.5)


def test_train_mnk_fused_league_micro_end_to_end(tmp_path, monkeypatch):
    """--fused --matchmaking pfsp_hard end-to-end: the driver accepts the
    config (it used to reject it), trains with no error records, validates,
    exports, and the run completes under both dispatch modes."""
    monkeypatch.chdir(tmp_path)
    from rl_selfplay_mnk_tpu.train import get_default_config
    from rl_selfplay_mnk_tpu.train_fused import train_mnk_fused
    from rl_selfplay_mnk_tpu.utils.metrics import MetricsLogger

    for dispatch, name in (("scan", "flg_scan"), ("step", "flg_step")):
        config = get_default_config()
        config.update(
            mnk=(3, 3, 3),
            num_envs=8,
            n_steps=8,
            batch_size=32,
            ppo_epochs=1,
            total_environment_steps=8 * 8 * 4,
            validation_interval=2,
            validation_episodes=16,
            lr_warmup_steps=0,
            architecture_name="cnn_b_s",
            opponent_pool=2,
            use_mesh=False,
            entropy_coef_schedule=None,
            matchmaking="pfsp_hard",
            fused_dispatch=dispatch,
        )
        logger = MetricsLogger(
            run_name=name, config=config, out_dir=str(tmp_path / "runs"),
            use_wandb=False,
        )
        train_mnk_fused(config, logger)
        logger.finish()
        lines = [json.loads(ln) for ln in open(tmp_path / "runs" / f"{name}.jsonl")]
        keys = {k for rec in lines for k in rec}
        assert "training/mean_reward" in keys
        assert not any(k.startswith("error/") for k in keys)
        assert "model_00004.msgpack" in os.listdir(tmp_path / "models" / name)

    # unknown mode is still rejected up front
    config["matchmaking"] = "nope"
    with MetricsLogger(
        run_name="flg_bad", config=config, out_dir=str(tmp_path / "runs"),
        use_wandb=False,
    ) as logger_bad:
        with pytest.raises(ValueError, match="matchmaking"):
            train_mnk_fused(config, logger_bad)
