"""League matchmaking (selfplay/league.py): PFSP weight math, roster
FIFO/result-tracking semantics, and the train-loop integration including
checkpoint/resume of league state."""

import json

import pytest

from rl_selfplay_mnk_tpu.selfplay.league import League, pfsp_weight


def test_pfsp_weight_shapes():
    # hard mode: monotone decreasing in the learner's score
    hard = [pfsp_weight(s, "pfsp_hard") for s in (0.0, 0.25, 0.5, 0.75, 1.0)]
    assert hard == sorted(hard, reverse=True)
    assert hard[0] == pytest.approx(1.0)
    # even mode: peaks at 0.5, symmetric, floored at the extremes
    assert pfsp_weight(0.5, "pfsp_even") == pytest.approx(1.0)
    assert pfsp_weight(0.2, "pfsp_even") == pytest.approx(
        pfsp_weight(0.8, "pfsp_even")
    )
    assert pfsp_weight(1.0, "pfsp_even") == pytest.approx(1e-3)
    # uniform mode: constant
    assert pfsp_weight(0.1, "uniform") == pfsp_weight(0.9, "uniform") == 1.0
    with pytest.raises(ValueError):
        pfsp_weight(0.5, "nope")


def test_league_fifo_and_result_tracking():
    league = League(max_size=2, mode="pfsp_hard", seed=0)
    a = league.add_opponent("A")
    b = league.add_opponent("B")
    assert league.size() == 2
    c = league.add_opponent("C")  # evicts A
    assert [e.params for e in league.entries] == ["B", "C"]

    # results fold into the EMA; evicted ids are ignored silently
    league.record_result(b, 1.0)
    league.record_result(a, 0.0)  # evicted — no-op
    entry_b = next(e for e in league.entries if e.entry_id == b)
    assert entry_b.games == 1
    assert entry_b.score_ema > 0.5
    league.record_result(c, 0.0)
    entry_c = next(e for e in league.entries if e.entry_id == c)
    assert entry_c.score_ema < 0.5


def test_pfsp_hard_prefers_unbeaten_members():
    league = League(max_size=3, mode="pfsp_hard", power=2.0, ema=1.0, seed=1)
    beaten = league.add_opponent("beaten")
    nemesis = league.add_opponent("nemesis")
    league.record_result(beaten, 1.0)  # learner always wins
    league.record_result(nemesis, 0.0)  # learner always loses
    draws = [league.get_opponent()[1] for _ in range(300)]
    assert draws.count("nemesis") > 250


def test_train_mnk_league_per_block_attribution(tmp_path, monkeypatch):
    """Mixed-opponent league iterations (opponents_per_iteration > 1)
    attribute each env block's OWN outcome to its pool member: record_result
    receives per-block scores (PPOConfig.fin_blocks plumbing), never one
    aggregate folded into every drawn member, and blocks played by the
    current agent record nothing."""
    monkeypatch.chdir(tmp_path)
    from rl_selfplay_mnk_tpu.selfplay.league import League
    from rl_selfplay_mnk_tpu.train import get_default_config, train_mnk
    from rl_selfplay_mnk_tpu.utils.metrics import MetricsLogger

    calls = []
    orig = League.record_result

    def spy(self, entry_id, score):
        calls.append((entry_id, score))
        return orig(self, entry_id, score)

    monkeypatch.setattr(League, "record_result", spy)

    config = get_default_config()
    config.update(
        mnk=(3, 3, 3),
        num_envs=16,
        n_steps=8,
        batch_size=32,
        ppo_epochs=1,
        total_environment_steps=16 * 8 * 30,
        validation_interval=100,
        lr_warmup_steps=0,
        architecture_name="cnn_b_s",
        opponent_pool=3,
        use_mesh=False,
        entropy_coef_schedule=None,
        matchmaking="pfsp_even",
        opponents_per_iteration=2,
        seed=0,
    )
    logger = MetricsLogger(
        run_name="lgblk", config=config, out_dir=str(tmp_path / "runs"),
        use_wandb=False,
    )
    train_mnk(config, logger)
    logger.finish()
    lines = [json.loads(ln) for ln in open(tmp_path / "runs" / "lgblk.jsonl")]
    assert not any(k.startswith("error/") for rec in lines for k in rec)

    # With seed 0 the 15%-per-block draw schedule hits historical members
    # within 30 iterations x 2 blocks (deterministic: host_rng drives it).
    assert calls, "no historical opponent drawn — seed/schedule changed?"
    for _, score in calls:
        assert 0.0 <= score <= 1.0
    # Per-block attribution: scores are per-block episode means of {-1,0,1}
    # rewards over <= n_steps-worth of episodes, so distinct blocks in the
    # same iteration can and do record distinct scores; with the aggregate
    # fold they would all be identical whenever 2 members are drawn
    # together. Assert at least two different recorded scores overall.
    assert len({round(s, 9) for _, s in calls}) > 1


def test_train_mnk_league_micro(tmp_path, monkeypatch):
    """Full train loop with pfsp_even matchmaking + checkpoint/resume of
    league state."""
    monkeypatch.chdir(tmp_path)
    from rl_selfplay_mnk_tpu.train import get_default_config, train_mnk
    from rl_selfplay_mnk_tpu.utils.metrics import MetricsLogger

    config = get_default_config()
    config.update(
        mnk=(3, 3, 3),
        num_envs=8,
        n_steps=8,
        batch_size=32,
        ppo_epochs=1,
        total_environment_steps=8 * 8 * 5,
        validation_interval=100,
        lr_warmup_steps=0,
        architecture_name="cnn_b_s",
        opponent_pool=2,
        use_mesh=False,
        checkpoint_interval=2,
        checkpoint_dir=str(tmp_path / "ckpt"),
        entropy_coef_schedule=None,
        matchmaking="pfsp_even",
    )
    logger = MetricsLogger(
        run_name="lg1", config=config, out_dir=str(tmp_path / "runs"),
        use_wandb=False,
    )
    train_mnk(config, logger)
    logger.finish()
    lines = [json.loads(ln) for ln in open(tmp_path / "runs" / "lg1.jsonl")]
    assert not any(k.startswith("error/") for rec in lines for k in rec)

    # resume restores league members, EMAs and the id counter
    config["resume"] = True
    config["total_environment_steps"] = 8 * 8 * 7
    logger2 = MetricsLogger(
        run_name="lg2", config=config, out_dir=str(tmp_path / "runs"),
        use_wandb=False,
    )
    train_mnk(config, logger2)
    logger2.finish()
    lines = [json.loads(ln) for ln in open(tmp_path / "runs" / "lg2.jsonl")]
    assert not any(k.startswith("error/") for rec in lines for k in rec)
    steps = [r["_step"] for r in lines if "training/mean_reward" in r]
    assert steps and min(steps) >= 8 * 8 * 5
