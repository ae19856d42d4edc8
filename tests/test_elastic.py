"""Elastic failure-recovery drill (ROADMAP capability item).

SIGKILL a live training process mid-run — no cleanup, no atexit — then
resume from the last durable orbax checkpoint and verify training
continues from the checkpointed iteration with no error records. The
reference has no recovery story at all (SURVEY.md §5: export-only
checkpoints, no resume path); this pins ours end-to-end, including
checkpoint-write atomicity under hard kills (orbax commits via tmp dir +
rename, so a kill mid-write can never corrupt "latest")."""

import json
import os
import signal
import subprocess
import sys
import time

from rl_selfplay_mnk_tpu.utils.checkpoint import latest_checkpoint_step

VICTIM = """
import sys
from rl_selfplay_mnk_tpu.train import get_default_config, train_mnk
from rl_selfplay_mnk_tpu.utils.metrics import MetricsLogger

config = get_default_config()
config.update(
    mnk=(3, 3, 3),
    num_envs=8,
    n_steps=8,
    batch_size=32,
    ppo_epochs=1,
    total_environment_steps=8 * 8 * 10_000,  # far more than we let it run
    validation_interval=10_000,
    lr_warmup_steps=0,
    architecture_name="cnn_b_s",
    opponent_pool=2,
    use_mesh=False,
    checkpoint_interval=1,
    checkpoint_dir={ckpt_dir!r},
    entropy_coef_schedule=None,
)
logger = MetricsLogger(
    run_name="victim", config=config, out_dir={out_dir!r}, use_wandb=False
)
train_mnk(config, logger)
"""


def test_kill_and_resume_drill(tmp_path, monkeypatch):
    ckpt_dir = str(tmp_path / "ckpt")
    out_dir = str(tmp_path / "runs")

    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("XLA_FLAGS", None)
    env["PYTHONPATH"] = repo_root + os.pathsep + env.get("PYTHONPATH", "")
    proc = subprocess.Popen(
        [sys.executable, "-c", VICTIM.format(ckpt_dir=ckpt_dir, out_dir=out_dir)],
        cwd=str(tmp_path),
        env=env,
        stdout=subprocess.DEVNULL,
        stderr=subprocess.DEVNULL,
    )
    try:
        # Wait until at least two checkpoints committed (proves steady
        # progress), then hard-kill with no warning.
        # Deliberately huge deadline: this host has few cores and the
        # victim's first iteration includes cold XLA compiles; both 300 s
        # and 600 s budgets were exceeded under full-suite load (plus a
        # concurrent TPU bench) — observed flakes. The loop exits the
        # moment checkpoints appear, so the cap only bites on real hangs.
        deadline = time.time() + 1800
        step = None
        while time.time() < deadline:
            step = latest_checkpoint_step(ckpt_dir)
            if step is not None and step >= 2:
                break
            if proc.poll() is not None:
                raise AssertionError(
                    f"victim exited early with code {proc.returncode}"
                )
            time.sleep(1.0)
        assert step is not None and step >= 2, "no checkpoint appeared in time"
        os.kill(proc.pid, signal.SIGKILL)
        proc.wait(timeout=30)
    finally:
        if proc.poll() is None:
            proc.kill()
            proc.wait(timeout=30)

    # The kill may have raced a checkpoint write; orbax atomicity means the
    # latest COMMITTED step is intact regardless.
    survived = latest_checkpoint_step(ckpt_dir)
    assert survived is not None and survived >= 2

    # Resume in-process on CPU and run a few more iterations to completion.
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
        total_environment_steps=8 * 8 * (survived + 3),
        validation_interval=10_000,
        lr_warmup_steps=0,
        architecture_name="cnn_b_s",
        opponent_pool=2,
        use_mesh=False,
        checkpoint_interval=1,
        checkpoint_dir=ckpt_dir,
        entropy_coef_schedule=None,
        resume=True,
    )
    logger = MetricsLogger(
        run_name="resumed", config=config, out_dir=out_dir, use_wandb=False
    )
    train_mnk(config, logger)
    logger.finish()

    lines = [json.loads(ln) for ln in open(tmp_path / "runs" / "resumed.jsonl")]
    assert not any(k.startswith("error/") for rec in lines for k in rec)
    steps = [r["_step"] for r in lines if "training/mean_reward" in r]
    # resumed past the surviving checkpoint: first trained iteration is
    # survived+1 (logged at env-step (survived+2)*64)
    assert steps and min(steps) >= 8 * 8 * (survived + 1)
    assert max(steps) == 8 * 8 * (survived + 3)
