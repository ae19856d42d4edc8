"""Subprocess entry for the multi-process training tests.

Launched by tests/test_multiprocess.py: N copies of this script form one
logical multi-host training run (jax.distributed over localhost, virtual CPU
devices per process, gloo cross-process collectives). Each process drives
the SAME train_mnk loop; process 0 owns metrics/export, checkpoints are
cooperative — exactly the TPU-pod execution model (SURVEY.md §2.3 /
VERDICT.md round-1 item 1).
"""

import argparse
import os
import sys


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--process-id", type=int, required=True)
    ap.add_argument("--num-processes", type=int, required=True)
    ap.add_argument("--port", type=int, required=True)
    ap.add_argument("--iters", type=int, default=4)
    ap.add_argument("--resume", action="store_true")
    ap.add_argument("--checkpoint-interval", type=int, default=0)
    ap.add_argument("--run-name", required=True)
    ap.add_argument("--workdir", required=True)
    ap.add_argument("--fused", action="store_true")
    ap.add_argument(
        "--checkpoint-dir", default=None,
        help="override ckpt/<run_name> (topology-change resume tests share "
        "one checkpoint dir across runs with different names/topologies)",
    )
    ap.add_argument(
        "--preset", default="tiny", choices=["tiny", "config5"],
        help="tiny: 3x3x3/16-env micro run; config5: BASELINE configs[4] "
        "SHAPE — 13x13x5, 32768 envs, recipe minibatch 4096, grouped "
        "shuffle, ZeRO sharded learner (reduced n_steps; a 2-core-budget "
        "conv body stands in for the recipe network so the run is about "
        "the shapes, not the FLOPs)",
    )
    args = ap.parse_args()
    os.chdir(args.workdir)

    import jax

    from rl_selfplay_mnk_tpu.parallel.mesh import init_distributed

    if args.num_processes > 1:
        init_distributed(
            coordinator_address=f"localhost:{args.port}",
            num_processes=args.num_processes,
            process_id=args.process_id,
        )

    from rl_selfplay_mnk_tpu.train import get_default_config, train_mnk
    from rl_selfplay_mnk_tpu.utils.metrics import MetricsLogger, NullMetricsLogger

    config = get_default_config()
    if args.preset == "config5":
        import flax.linen as nn
        import jax.numpy as jnp

        from rl_selfplay_mnk_tpu.models.common import ActorCriticHeads, to_nhwc
        from rl_selfplay_mnk_tpu.models.registry import ARCHITECTURE_REGISTRY

        class _TinyConvNet(nn.Module):
            """Norm-free conv body (ZeRO-eligible) small enough to step
            32k envs on the 2-core CI host; the production shapes (env
            axis, board, minibatch, groups) are the test's subject."""

            action_dim: int

            @nn.compact
            def __call__(self, obs, train: bool = False):
                del train
                x = to_nhwc(obs, jnp.float32)
                x = nn.relu(nn.Conv(8, (3, 3), padding="SAME")(x))
                x = nn.relu(nn.Conv(8, (3, 3), padding="SAME")(x))
                return ActorCriticHeads(action_dim=self.action_dim, hidden=16)(x)

        ARCHITECTURE_REGISTRY.setdefault(
            "_test_tiny_cnn",
            lambda action_dim, dtype: _TinyConvNet(action_dim=action_dim),
        )
        # BASELINE configs[4] shape: 13x13x5, 32k envs (4096/device on the
        # 8-device global mesh), train_all_13 recipe minibatch 4096,
        # grouped shuffle, sharded learner via collectives. n_steps
        # reduced per the verdict's allowance — buffer 131072 rows, 32
        # production-size minibatches per epoch.
        config.update(
            mnk=(13, 13, 5),
            num_envs=32768,
            n_steps=4,
            batch_size=4096,
            ppo_epochs=1,
            total_environment_steps=32768 * 4 * args.iters,
            validation_interval=2,
            validation_episodes=16,
            lr_warmup_steps=0,
            architecture_name="_test_tiny_cnn",
            shuffle="grouped",
            zero_sharded_optimizer=True,
            opponent_pool=2,
            use_mesh=True,
            checkpoint_interval=args.checkpoint_interval,
            checkpoint_dir=args.checkpoint_dir
            or os.path.join(args.workdir, "ckpt", args.run_name),
            resume=args.resume,
            entropy_coef_schedule=None,
            watch_interval=0,
        )
    else:
        config.update(
            mnk=(3, 3, 3),
            num_envs=16,
            n_steps=8,
            batch_size=32,
            ppo_epochs=2,
            total_environment_steps=16 * 8 * args.iters,
            validation_interval=2,
            validation_episodes=16,
            lr_warmup_steps=0,
            architecture_name="cnn_b_s",
            opponent_pool=2,
            use_mesh=True,
            checkpoint_interval=args.checkpoint_interval,
            checkpoint_dir=args.checkpoint_dir
            or os.path.join(args.workdir, "ckpt", args.run_name),
            resume=args.resume,
            entropy_coef_schedule=None,
            watch_interval=0,
        )
    if jax.process_index() == 0:
        logger = MetricsLogger(
            run_name=args.run_name, config=config, out_dir="runs",
            use_wandb=False,
        )
    else:
        logger = NullMetricsLogger(run_name=args.run_name, config=config)
    with logger:
        if args.fused:
            from rl_selfplay_mnk_tpu.train_fused import train_mnk_fused

            train_mnk_fused(config, logger)
        else:
            train_mnk(config, logger)
    print(f"runner process {args.process_id} done", flush=True)


if __name__ == "__main__":
    sys.exit(main())
