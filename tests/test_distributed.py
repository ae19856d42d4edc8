"""Multi-chip sharding tests on the virtual 8-device CPU mesh.

Validates that the full training step (rollout scan + update) compiles and
executes with envs sharded over a mesh and params replicated — the scaling
design of SURVEY.md §7 step 6 — without a real TPU pod.
"""

import numpy as np
import jax
import jax.numpy as jnp
import optax
import flax.linen as nn
import pytest

from jax.sharding import PartitionSpec as P

from rl_selfplay_mnk_tpu.env import EnvConfig
from rl_selfplay_mnk_tpu.alg import PPOConfig, PPOLearner
from rl_selfplay_mnk_tpu.models.common import ActorCriticHeads
from rl_selfplay_mnk_tpu.parallel import make_mesh, shard_batched, replicate
from rl_selfplay_mnk_tpu.selfplay import RandomPolicy


class TinyMLP(nn.Module):
    action_dim: int

    @nn.compact
    def __call__(self, obs, train: bool = False):
        del train
        b = obs.shape[0]
        x = nn.relu(nn.Dense(32)(obs.reshape(b, -1)))
        return ActorCriticHeads(action_dim=self.action_dim, hidden=32)(x[:, None, :])


def _learner(mesh, num_envs, shuffle, shard_groups, seed=0, group_size=8):
    env_cfg = EnvConfig(3, 3, 3)
    module = TinyMLP(action_dim=9)
    variables = dict(module.init(jax.random.PRNGKey(seed), jnp.zeros((1, 2, 3, 3))))
    variables.setdefault("batch_stats", {})
    config = PPOConfig(
        env=env_cfg,
        num_envs=num_envs,
        n_steps=8,
        batch_size=num_envs * 8 // 4,
        ppo_epochs=2,
        shuffle=shuffle,
        shard_groups=shard_groups,
        group_size=group_size,
    )
    optimizer = optax.chain(
        optax.clip_by_global_norm(0.5), optax.adamw(1e-3, eps=1e-5)
    )
    return PPOLearner(
        module, config, optimizer, variables, jax.random.PRNGKey(seed + 1), mesh=mesh
    )


@pytest.mark.parametrize("n_devices", [2, 8])
def test_full_train_step_on_mesh(n_devices):
    mesh = make_mesh(num_devices=n_devices)
    learner = _learner(mesh, num_envs=16, shuffle="tiled", shard_groups=n_devices)
    rp = RandomPolicy()
    m = learner.learn(rp.apply, rp.params, entropy_coef=0.01)
    assert np.isfinite(m.actor_loss)
    # env state stayed sharded over the env axis
    assert learner._sp_state.env.boards.sharding.spec == P("env")
    # params stayed replicated
    leaf = jax.tree.leaves(learner.params)[0]
    assert leaf.sharding.spec in (P(), P(None), P(*(None,) * leaf.ndim))
    # a second iteration reuses the compiled programs
    m2 = learner.learn(rp.apply, rp.params, entropy_coef=0.01)
    assert np.isfinite(m2.actor_loss)


def test_sharded_matches_unsharded_rollout():
    """Rollout trajectories must be identical under sharding (same seed):
    layout cannot change environment dynamics."""
    from rl_selfplay_mnk_tpu.alg.ppo import rollout
    from rl_selfplay_mnk_tpu.selfplay.wrapper import selfplay_reset

    env_cfg = EnvConfig(3, 3, 3)
    module = TinyMLP(action_dim=9)
    variables = dict(module.init(jax.random.PRNGKey(0), jnp.zeros((1, 2, 3, 3))))
    variables.setdefault("batch_stats", {})
    config = PPOConfig(env=env_cfg, num_envs=16, n_steps=8, batch_size=32)
    rp = RandomPolicy()

    def run(shard):
        state, obs = jax.jit(
            selfplay_reset, static_argnames=("cfg", "opponent_apply", "num_envs")
        )(env_cfg, rp.apply, None, 16, jax.random.PRNGKey(5))
        params, bs = variables["params"], variables["batch_stats"]
        ep0 = jnp.zeros((16,), jnp.float32)
        ep1 = jnp.zeros((16,), jnp.float32)
        if shard:
            mesh = make_mesh(num_devices=8)
            state = shard_batched(state, mesh)
            obs = shard_batched(obs, mesh)
            ep0 = shard_batched(ep0, mesh)
            ep1 = shard_batched(ep1, mesh)
            params = replicate(params, mesh)
        _, _, _, traj, fin, _, _ = rollout(
            module, config, rp.apply, params, bs, None, state, obs,
            ep0, ep1, jax.random.PRNGKey(6),
        )
        return jax.device_get(traj), jax.device_get(fin)

    traj_a, fin_a = run(shard=False)
    traj_b, fin_b = run(shard=True)
    for key in ("actions", "rewards", "dones"):
        np.testing.assert_array_equal(traj_a[key], traj_b[key])
    np.testing.assert_allclose(fin_a, fin_b, rtol=1e-6)


def test_train_mnk_full_driver_on_mesh(tmp_path, monkeypatch):
    """The complete training driver — opponent schedule, validation,
    promotion, export, checkpoint AND resume — runs with envs sharded over
    the virtual 8-device mesh (use_mesh=True, the pod-mode default)."""
    import json

    monkeypatch.chdir(tmp_path)
    from rl_selfplay_mnk_tpu.train import get_default_config, train_mnk
    from rl_selfplay_mnk_tpu.utils.metrics import MetricsLogger

    config = get_default_config()
    config.update(
        mnk=(3, 3, 3),
        num_envs=16,  # 2 per virtual device
        n_steps=8,
        batch_size=32,
        ppo_epochs=1,
        total_environment_steps=16 * 8 * 5,
        validation_interval=2,
        validation_episodes=16,
        lr_warmup_steps=0,
        architecture_name="cnn_b_s",
        opponent_pool=2,
        use_mesh=True,
        checkpoint_interval=2,
        checkpoint_dir=str(tmp_path / "ckpt"),
        entropy_coef_schedule=None,
    )
    with MetricsLogger(run_name="mesh1", config=config,
                       out_dir=str(tmp_path / "runs"), use_wandb=False) as lg:
        train_mnk(config, lg)

    lines = [json.loads(ln) for ln in open(tmp_path / "runs" / "mesh1.jsonl")]
    keys = {k for rec in lines for k in rec}
    assert "training/mean_reward" in keys
    assert "validation/vs_benchmark/score_rate" in keys
    assert not any(k.startswith("error/") for k in keys)

    # resume on the mesh: restored env state / params get re-placed
    config["resume"] = True
    config["total_environment_steps"] = 16 * 8 * 7
    with MetricsLogger(run_name="mesh2", config=config,
                       out_dir=str(tmp_path / "runs"), use_wandb=False) as lg:
        train_mnk(config, lg)
    lines = [json.loads(ln) for ln in open(tmp_path / "runs" / "mesh2.jsonl")]
    assert not any(k.startswith("error/") for rec in lines for k in rec)
    steps = [r["_step"] for r in lines if "training/mean_reward" in r]
    assert steps and min(steps) >= 16 * 8 * 5


def test_scaling_bench_smoke():
    """tools/scaling_bench.py runs on the virtual CPU mesh and reports a
    sane weak-scaling efficiency (the harness that produces BASELINE.md's
    scaling number on a real pod — keep it from bit-rotting)."""
    import sys
    sys.path.insert(0, str(__import__("pathlib").Path(__file__).parents[1]))
    from tools.scaling_bench import run_scaling

    points = run_scaling(
        [1, 2], envs_per_device=8, n_steps=4, batch_per_device=16,
        iters=1, warmup=1, arch="resnet_b_s",
    )
    assert [p["devices"] for p in points] == [1, 2]
    assert points[0]["efficiency"] == 1.0
    assert points[1]["num_envs"] == 16
    assert all(p["steps_per_sec"] > 0 for p in points)


def test_scaling_bench_rejects_oversubscribed_mesh():
    """Requesting more devices than exist must fail loudly, not silently
    mislabel the point (ADVICE.md round-1 finding 2)."""
    from tools.scaling_bench import run_point

    with pytest.raises(ValueError, match="available"):
        run_point(999, 8, 4, 16, 1, 0, "resnet_b_s")


@pytest.mark.parametrize("shuffle", ["grouped", "tiled"])
def test_full_train_step_on_mesh_shard_local_shuffles(shuffle):
    """Both shard-local shuffle modes run the full train step on the mesh
    (grouped = the production TPU mode used by the weak-scaling sweep)."""
    n_devices = 4
    mesh = make_mesh(num_devices=n_devices)
    learner = _learner(
        mesh, num_envs=16, shuffle=shuffle, shard_groups=n_devices
    )
    rp = RandomPolicy()
    m = learner.learn(rp.apply, rp.params, entropy_coef=0.01)
    assert np.isfinite(m.actor_loss)


def test_put_global_forced_assembly_matches_fast_path(monkeypatch):
    """MNK_FORCE_SHARD_ASSEMBLY=1 routes device-resident single-process
    values through the pod-style per-device shard assembly; the result must
    be indistinguishable from the on-device fast path (ADVICE.md round-2
    finding 3: keep the pod construction exercised on cheap virtual meshes)."""
    from rl_selfplay_mnk_tpu.parallel.mesh import env_sharding, put_global

    mesh = make_mesh(num_devices=8)
    value = jnp.arange(16 * 3, dtype=jnp.float32).reshape(16, 3)

    fast = put_global(value, env_sharding(mesh))
    monkeypatch.setenv("MNK_FORCE_SHARD_ASSEMBLY", "1")
    assembled = put_global(value, env_sharding(mesh))

    assert assembled.sharding == fast.sharding
    np.testing.assert_array_equal(np.asarray(assembled), np.asarray(fast))
    # replicated layout too (params/pool entries take this path)
    rep_fast = jax.device_get(replicate(value, mesh))
    monkeypatch.delenv("MNK_FORCE_SHARD_ASSEMBLY")
    np.testing.assert_array_equal(rep_fast, np.asarray(value))


@pytest.mark.parametrize("driver", ["host", "fused"])
def test_multihost_requires_run_name_even_with_logger(driver, tmp_path, monkeypatch):
    """The multihost run_name guard fires whether or not a caller passes a
    logger: per-process logger objects default to timestamped (divergent)
    names, and the checkpoint dir is keyed by the shared name (ADVICE.md
    round-2 finding 1)."""
    monkeypatch.chdir(tmp_path)
    from rl_selfplay_mnk_tpu.train import get_default_config, train_mnk
    from rl_selfplay_mnk_tpu.train_fused import train_mnk_fused
    from rl_selfplay_mnk_tpu.utils.metrics import MetricsLogger

    config = get_default_config()
    config["multihost"] = True
    config["num_processes"] = 1  # init_distributed no-ops; guard still applies
    train = train_mnk if driver == "host" else train_mnk_fused
    with MetricsLogger(project="t", run_name="per_process_name") as logger:
        with pytest.raises(ValueError, match="run_name"):
            train(config, logger)


def test_shard_batched_ambiguous_pytree_raises():
    """Round-3 VERDICT weakness 6: without batch_size, a pytree holding
    two distinct mesh-divisible leading dims is ambiguous (a non-batch
    table could silently shard) — it must raise instead; batch_size
    disambiguates."""
    mesh = make_mesh(num_devices=8)
    tree = {"batch": jnp.zeros((16, 3)), "table": jnp.zeros((8, 3))}
    with pytest.raises(ValueError, match="pass batch_size"):
        shard_batched(tree, mesh)

    placed = shard_batched(tree, mesh, batch_size=16)
    assert placed["batch"].sharding.spec == P("env")
    assert placed["table"].sharding.is_fully_replicated

    # homogeneous pytrees keep the convenient no-batch_size form
    homog = shard_batched({"a": jnp.zeros((16,)), "b": jnp.zeros((16, 2))}, mesh)
    assert homog["a"].sharding.spec == P("env")

    # round-4 ADVICE: the single-dim form of the ambiguity — a divisible
    # table next to a NON-divisible true batch must raise, not silently
    # shard the table while replicating the batch
    with pytest.raises(ValueError, match="batch_size"):
        shard_batched(
            {"batch": jnp.zeros((10, 3)), "table": jnp.zeros((8, 3))}, mesh
        )
    # nothing divisible at all: the call would be a silent no-op — raise
    with pytest.raises(ValueError, match="divides"):
        shard_batched({"batch": jnp.zeros((10, 3))}, mesh)
    # round-4 ADVICE finding 2: a non-array tree LEAF (no .ndim until
    # asarray — e.g. a range) must be seen by the guard exactly as
    # placement sees it; it used to bypass the dims scan yet still shard
    with pytest.raises(ValueError, match="batch_size"):
        shard_batched({"batch": jnp.zeros((16, 3)), "r": range(8)}, mesh)
