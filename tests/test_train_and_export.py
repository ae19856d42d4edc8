"""Orchestration tests: export/import round-trip, metadata schema parity,
device pool FIFO semantics, checkpoint/resume, and a micro end-to-end
train_mnk run exercising the full loop (pool, validation, promotion,
export, error handling)."""

import json
import os

import numpy as np
import jax
import jax.numpy as jnp

from rl_selfplay_mnk_tpu.models.registry import (
    create_model_from_architecture,
    init_network,
    make_apply_fns,
)
from rl_selfplay_mnk_tpu.selfplay.opponent_pool import (
    OpponentPool,
    pool_add,
    pool_init,
    pool_sample,
)
from rl_selfplay_mnk_tpu.utils.model_export import (
    ModelExporter,
    get_models_from_directory,
    load_any_model,
)


def test_export_import_roundtrip(tmp_path):
    module, arch_params = create_model_from_architecture("cnn_b_s", (2, 5, 5), 25)
    variables = init_network(module, (2, 5, 5), jax.random.PRNGKey(0))
    exporter = ModelExporter("testrun", base_dir=str(tmp_path))
    model_id = exporter.export_model(variables, "cnn_b_s", arch_params, 42, True)
    assert model_id == "model_00042"

    # metadata schema parity (reference model_export.py:60-72)
    with open(tmp_path / "testrun" / "model_00042.json") as f:
        meta = json.load(f)
    assert meta["model_id"] == "model_00042"
    assert meta["iteration"] == 42
    assert meta["architecture"]["name"] == "cnn_b_s"
    assert meta["architecture"]["params"] == {"obs_shape": [2, 5, 5], "action_dim": 25}
    assert meta["is_benchmark_breaker"] is True
    assert meta["run_name"] == "testrun"
    assert "export_timestamp" in meta

    module2, variables2, metadata = load_any_model(
        str(tmp_path / "testrun"), "model_00042"
    )
    eval1, _ = make_apply_fns(module)
    eval2, _ = make_apply_fns(module2)
    obs = jax.random.normal(jax.random.PRNGKey(1), (3, 2, 5, 5))
    l1, v1 = eval1(variables, obs)
    l2, v2 = eval2(variables2, obs)
    np.testing.assert_allclose(np.asarray(l1), np.asarray(l2), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(v1), np.asarray(v2), rtol=1e-6)

    listing = get_models_from_directory(str(tmp_path / "testrun"))
    assert len(listing) == 1 and listing[0]["iteration"] == 42


def test_device_pool_fifo_and_sampling():
    template = {"w": jnp.zeros((2, 2)), "b": jnp.zeros((3,))}
    pool = pool_init(template, max_size=3)
    assert int(pool.size) == 0

    def entry(v):
        return {"w": jnp.full((2, 2), float(v)), "b": jnp.full((3,), float(v))}

    for v in [1, 2, 3]:
        pool = pool_add(pool, entry(v))
    assert int(pool.size) == 3
    # FIFO eviction: adding a 4th overwrites the oldest (slot of value 1)
    pool = pool_add(pool, entry(4))
    slot_values = sorted(float(pool.stacked["w"][i, 0, 0]) for i in range(3))
    assert slot_values == [2.0, 3.0, 4.0]

    # uniform sampling covers all current entries
    seen = set()
    for s in range(40):
        drawn = pool_sample(pool, jax.random.PRNGKey(s))
        seen.add(float(drawn["w"][0, 0]))
    assert seen == {2.0, 3.0, 4.0}


def test_host_pool_matches_reference_api():
    pool = OpponentPool(max_size=2, seed=0)
    assert pool.get_random_opponent() is None
    pool.add_opponent("a")
    pool.add_opponent("b")
    pool.add_opponent("c")  # evicts "a"
    assert pool.size() == 2
    assert set(pool.pool) == {"b", "c"}
    assert pool.get_random_opponent() in {"b", "c"}


def test_checkpoint_roundtrip(tmp_path):
    from rl_selfplay_mnk_tpu.utils.checkpoint import (
        latest_checkpoint_step,
        restore_checkpoint,
        save_checkpoint,
    )

    state = {
        "params": {"w": jnp.arange(6.0).reshape(2, 3)},
        "iteration": 7,
        "rng": jax.random.PRNGKey(3),
    }
    ckpt_dir = str(tmp_path / "ckpt")
    save_checkpoint(ckpt_dir, 7, jax.device_get(state))
    assert latest_checkpoint_step(ckpt_dir) == 7
    template = jax.tree.map(lambda x: jnp.zeros_like(x), state)
    restored, step = restore_checkpoint(ckpt_dir, jax.device_get(template))
    assert step == 7
    np.testing.assert_array_equal(
        np.asarray(restored["params"]["w"]), np.asarray(state["params"]["w"])
    )
    assert int(restored["iteration"]) == 7


def test_train_mnk_mixed_opponents(tmp_path, monkeypatch):
    """opponents_per_iteration=2: env blocks play different opponents."""
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
        total_environment_steps=8 * 8 * 3,
        validation_interval=100,
        lr_warmup_steps=0,
        architecture_name="cnn_b_s",
        opponent_pool=2,
        use_mesh=False,
        entropy_coef_schedule=None,
        opponents_per_iteration=2,
    )
    logger = MetricsLogger(
        run_name="mixed", config=config, out_dir=str(tmp_path / "runs"),
        use_wandb=False,
    )
    train_mnk(config, logger)
    logger.finish()
    lines = [json.loads(ln) for ln in open(tmp_path / "runs" / "mixed.jsonl")]
    assert not any(k.startswith("error/") for rec in lines for k in rec)
    sources = [
        r["training/opponent_source"]
        for r in lines
        if "training/opponent_source" in r
    ]
    assert sources and all("," in s for s in sources)  # two draws per iter


def test_weighted_pool_sampling():
    pool = OpponentPool(max_size=4, seed=0, weighted=True)
    pool.add_opponent("weak", weight=0.01)
    pool.add_opponent("strong", weight=10.0)
    draws = [pool.get_random_opponent() for _ in range(200)]
    assert draws.count("strong") > 150


def test_train_mnk_resume_roundtrip(tmp_path, monkeypatch):
    """Checkpoint mid-run, then resume: training continues from the saved
    iteration (capability the reference lacks)."""
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
        total_environment_steps=8 * 8 * 5,  # 5 iterations
        validation_interval=100,
        lr_warmup_steps=0,
        architecture_name="cnn_b_s",
        opponent_pool=2,
        use_mesh=False,
        checkpoint_interval=2,
        checkpoint_dir=str(tmp_path / "ckpt"),
        entropy_coef_schedule=None,
    )
    logger = MetricsLogger(
        run_name="r1", config=config, out_dir=str(tmp_path / "runs"),
        use_wandb=False,
    )
    train_mnk(config, logger)
    logger.finish()

    # resume: should start at iteration 5 (after checkpoint at 4) and only
    # run iteration 5 of 6 when total steps extended
    config["resume"] = True
    config["total_environment_steps"] = 8 * 8 * 7  # 7 iterations now
    logger2 = MetricsLogger(
        run_name="r2", config=config, out_dir=str(tmp_path / "runs"),
        use_wandb=False,
    )
    train_mnk(config, logger2)
    logger2.finish()

    lines = [json.loads(ln) for ln in open(tmp_path / "runs" / "r2.jsonl")]
    steps = [r["_step"] for r in lines if "training/mean_reward" in r]
    # resumed run starts past the checkpointed iteration (4): first logged
    # training step is for iteration 5 (step 6*64) or later
    assert steps and min(steps) >= 8 * 8 * 5
    assert not any(k.startswith("error/") for rec in lines for k in rec)


def test_train_mnk_micro_end_to_end(tmp_path, monkeypatch):
    """Full loop on 3x3x3 for a handful of iterations: metrics written,
    models exported, validation executed."""
    monkeypatch.chdir(tmp_path)
    from rl_selfplay_mnk_tpu.train import get_default_config, train_mnk
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
        checkpoint_interval=0,
        entropy_coef_schedule=None,
        watch_interval=3,  # run.watch parity: grad/param norms every 3 iters
        watch_histograms=True,
    )
    logger = MetricsLogger(
        run_name="micro", config=config, out_dir=str(tmp_path / "runs"),
        use_wandb=False,
    )
    train_mnk(config, logger)
    logger.finish()

    # training metrics were written
    lines = [
        json.loads(line)
        for line in open(tmp_path / "runs" / "micro.jsonl")
    ]
    keys = {k for rec in lines for k in rec}
    assert "training/mean_reward" in keys
    assert "validation/vs_benchmark/score_rate" in keys
    assert not any(k.startswith("error/") for k in keys)

    # run.watch parity: per-layer grad + param norms and histograms landed
    grad_keys = [k for k in keys if k.startswith("gradients/")]
    param_keys = [k for k in keys if k.startswith("parameters/")]
    assert any(k.endswith("/norm") for k in grad_keys), grad_keys
    assert any(k.endswith("/norm") for k in param_keys)
    hists = [
        rec[k] for rec in lines for k in rec
        if k.startswith("parameters/") and k.endswith("/hist")
    ]
    assert hists and len(hists[0]["counts"]) == 16
    assert len(hists[0]["edges"]) == 17
    # gradient HISTOGRAMS too (run.watch logs both — reference train.py:94):
    # default 6 bins/sign -> 13 fixed signed-log bins, counts summed over
    # every update of the iteration (updates_per_iteration * leaf size)
    grad_hists = [
        rec[k] for rec in lines for k in rec
        if k.startswith("gradients/") and k.endswith("/hist")
    ]
    assert grad_hists and len(grad_hists[0]["counts"]) == 13
    assert len(grad_hists[0]["edges"]) == 14
    assert all(c >= 0 for c in grad_hists[0]["counts"])
    assert sum(grad_hists[0]["counts"]) > 0
    watch_vals = [
        v for rec in lines for k, v in rec.items()
        if k.startswith(("gradients/", "parameters/")) and k.endswith("/norm")
    ]
    assert all(isinstance(v, float) and v >= 0 for v in watch_vals)

    # exports happened: validations at i=2,4 plus the final export at i=6
    exported = os.listdir(tmp_path / "models" / "micro")
    assert "model_00006.msgpack" in exported
    assert len([f for f in exported if f.endswith(".json")]) >= 3


def test_resume_is_bit_exact(tmp_path, monkeypatch):
    """An interrupted-then-resumed run produces EXACTLY the parameters of
    an uninterrupted run: the checkpoint carries device RNG, host RNG
    streams, pool state, mid-episode env state and episode accumulators."""
    monkeypatch.chdir(tmp_path)
    import numpy as np
    from flax import serialization
    from rl_selfplay_mnk_tpu.train import get_default_config, train_mnk
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
            validation_interval=3,
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

    # Uninterrupted: 6 iterations in one go.
    cfg = base_config(6, str(tmp_path / "ckptA"))
    with MetricsLogger(run_name="straight", config=cfg,
                       out_dir=str(tmp_path / "runs"), use_wandb=False) as lg:
        train_mnk(cfg, lg)

    # Interrupted: 4 iterations (checkpoint lands at iteration 4), then
    # resume to 6.
    cfg = base_config(4, str(tmp_path / "ckptB"))
    with MetricsLogger(run_name="part1", config=cfg,
                       out_dir=str(tmp_path / "runs"), use_wandb=False) as lg:
        train_mnk(cfg, lg)
    cfg = base_config(6, str(tmp_path / "ckptB"))
    cfg["resume"] = True
    with MetricsLogger(run_name="part2", config=cfg,
                       out_dir=str(tmp_path / "runs"), use_wandb=False) as lg:
        train_mnk(cfg, lg)

    a = serialization.msgpack_restore(final_weights("straight"))
    b = serialization.msgpack_restore(final_weights("part2"))
    flat_a = jax.tree_util.tree_leaves(a)
    flat_b = jax.tree_util.tree_leaves(b)
    assert len(flat_a) == len(flat_b)
    for la, lb in zip(flat_a, flat_b):
        np.testing.assert_array_equal(np.asarray(la), np.asarray(lb))


def test_sweep_micro_two_trials(tmp_path, monkeypatch):
    """The local random-search sweep drives the train_short target with the
    reference's search space; two tiny-board trials run clean end-to-end."""
    monkeypatch.chdir(tmp_path)
    from rl_selfplay_mnk_tpu.sweep import main as sweep_main

    sweep_main(
        [
            "--trials", "2", "--seed", "1",
            "--mnk", "3", "3", "3",
            "--num-envs", "8", "--n-steps", "8", "--batch-size", "32",
            "--total-steps", str(8 * 8 * 2),
        ]
    )
    runs = sorted(os.listdir(tmp_path / "runs"))
    assert [r for r in runs if r.startswith("sweep_1_")]  # JSONL per trial
    for r in runs:
        lines = [json.loads(ln) for ln in open(tmp_path / "runs" / r)]
        assert not any(k.startswith("error/") for rec in lines for k in rec)


def test_adaptive_eviction_keeps_strongest():
    """eviction="adaptive": a full pool drops its weakest member, not its
    oldest (the reference README's promised-but-unimplemented behavior)."""
    pool = OpponentPool(max_size=3, seed=0, eviction="adaptive")
    pool.add_opponent("old_strong", weight=0.9)
    pool.add_opponent("weak", weight=0.1)
    pool.add_opponent("mid", weight=0.5)
    pool.add_opponent("new", weight=0.7)  # evicts "weak", not "old_strong"
    assert set(pool.pool) == {"old_strong", "mid", "new"}
    assert pool.size() == 3

    # fifo default unchanged: oldest goes
    fifo = OpponentPool(max_size=3, seed=0)
    for name, w in [("a", 0.9), ("b", 0.1), ("c", 0.5), ("d", 0.7)]:
        fifo.add_opponent(name, weight=w)
    assert list(fifo.pool) == ["b", "c", "d"]


def test_sweep_wandb_agent_wiring(tmp_path, monkeypatch):
    """The wandb sweep-agent path (reference workflow: sweep_config.yaml +
    `wandb agent`) is wired correctly — verified with a mock wandb module
    since this image has no egress: the sweep is created from the YAML
    search space, the agent drives the trial function, and the trial reads
    its hyperparameters from run.config into train_short."""
    import sys
    import types

    monkeypatch.chdir(tmp_path)
    from rl_selfplay_mnk_tpu import sweep as sweep_mod

    calls = {}

    class _Run:
        config = {
            "learning_rate": 3e-4,
            "entropy_coef": 0.02,
            "architecture_name": "cnn_b_s",
        }

    mock = types.ModuleType("wandb")
    mock.init = lambda *a, **k: _Run()
    def _sweep(cfg, project=None):
        calls["sweep_cfg"] = cfg
        calls["project"] = project
        return "sweep-xyz"
    def _agent(sweep_id, function=None, count=None):
        calls["sweep_id"] = sweep_id
        calls["count"] = count
        function()  # one trial
    mock.sweep = _sweep
    mock.agent = _agent
    monkeypatch.setitem(sys.modules, "wandb", mock)

    trial_args = {}

    def fake_train_short(argv):
        trial_args["argv"] = argv

    monkeypatch.setattr(sweep_mod, "train_short_main", fake_train_short)
    sweep_mod.main(["--wandb", "--trials", "3"])

    # sweep created from the repo's sweep_config.yaml (reference parity:
    # same search space)
    params = calls["sweep_cfg"]["parameters"]
    assert set(params) == {
        "learning_rate", "entropy_coef", "architecture_name"
    }
    assert calls["sweep_id"] == "sweep-xyz"
    assert calls["count"] == 3
    # the trial function passed run.config's sampled values to train_short
    argv = trial_args["argv"]
    assert argv[argv.index("--learning_rate") + 1] == "0.0003"
    assert argv[argv.index("--architecture_name") + 1] == "cnn_b_s"

    # joining an existing sweep skips creation
    calls.clear()
    sweep_mod.main(["--wandb", "--trials", "1", "--sweep-id", "abc"])
    assert calls["sweep_id"] == "abc"
    assert "sweep_cfg" not in calls
