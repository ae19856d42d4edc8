"""ZeRO sharded-learner tests (alg/zero_epochs.py + parallel/zero.py).

The north-star's "sharded learner via psum/all_gather collectives"
(BASELINE.json): the full shard_map path must (1) train equivalently to the
replicated data-parallel learner, (2) emit literal reduce-scatter +
all-gather collectives in its compiled HLO on the 8-device virtual mesh
with no rollout-buffer traffic, and (3) keep run.watch accumulators
faithful. The GSPMD state-sharding wrapper (parallel/zero.py) must match
the replicated optimizer numerically with provably sharded moments.
"""

import numpy as np
import jax
import jax.numpy as jnp
import optax
import flax.linen as nn

from rl_selfplay_mnk_tpu.env import EnvConfig
from rl_selfplay_mnk_tpu.alg import PPOConfig, PPOLearner
from rl_selfplay_mnk_tpu.models.common import ActorCriticHeads
from rl_selfplay_mnk_tpu.parallel import make_mesh, replicate
from rl_selfplay_mnk_tpu.selfplay import RandomPolicy


class _MLP(nn.Module):
    """BN-free actor-critic (zero_update supports batch-stat-free archs)."""

    action_dim: int

    @nn.compact
    def __call__(self, obs, train: bool = False):
        del train
        b = obs.shape[0]
        x = nn.relu(nn.Dense(48)(obs.reshape(b, -1)))
        return ActorCriticHeads(action_dim=self.action_dim, hidden=32)(
            x[:, None, :]
        )


def _make_pair(seed=0, watch=False, hist_bins=0, update_chunks=1,
               opt="adamw"):
    """(zero learner, replicated learner) with identical seeds/config."""
    env_cfg = EnvConfig(3, 3, 3)
    module = _MLP(action_dim=9)
    variables = dict(
        module.init(jax.random.PRNGKey(seed), jnp.zeros((1, 2, 3, 3)))
    )
    variables.setdefault("batch_stats", {})
    mesh = make_mesh(num_devices=8)
    base = dict(
        env=env_cfg, num_envs=16, n_steps=8, batch_size=32, ppo_epochs=2,
        shuffle="grouped", shard_groups=8, group_size=4,
        watch=watch, watch_hist_bins=hist_bins, update_chunks=update_chunks,
    )
    lr = 3e-3
    # zero_update needs an ELEMENTWISE inner optimizer (clip runs in-body)
    inner = (
        optax.adamw(lr, eps=1e-5, weight_decay=0.01)
        if opt == "adamw" else optax.sgd(lr)
    )
    zero = PPOLearner(
        _MLP(action_dim=9),
        PPOConfig(**base, zero_update=True),
        inner,
        jax.tree.map(lambda x: x, variables),
        jax.random.PRNGKey(seed + 1),
        mesh=mesh,
    )
    repl = PPOLearner(
        _MLP(action_dim=9),
        PPOConfig(**base),
        optax.flatten(
            optax.chain(optax.clip_by_global_norm(0.5), inner)
        ),
        jax.tree.map(lambda x: x, variables),
        jax.random.PRNGKey(seed + 1),
        mesh=mesh,
    )
    return zero, repl, mesh


def test_zero_learner_matches_replicated_sgd_tight():
    """Machinery parity at f32-rounding tolerance: with a LINEAR optimizer
    (SGD — no rounding amplification) the ZeRO schedule must track the
    replicated learner's parameters to ~1e-6 over two iterations: same
    per-shard sample selection, gradient psum_scatter == all-reduce up to
    summation order, same clip, same apply."""
    zero, repl, _ = _make_pair(seed=3, opt="sgd")
    rp = RandomPolicy()
    for _ in range(2):
        mz = zero.learn(rp.apply, rp.params, entropy_coef=0.01)
        mr = repl.learn(rp.apply, rp.params, entropy_coef=0.01)
    for field in ("actor_loss", "critic_loss", "entropy_loss", "grad_norm",
                  "approx_kl", "explained_variance", "mean_reward"):
        assert np.isfinite(getattr(mz, field)), field
        np.testing.assert_allclose(
            getattr(mz, field), getattr(mr, field), rtol=2e-4, atol=2e-5,
            err_msg=field,
        )
    for a, b in zip(jax.tree.leaves(zero.params), jax.tree.leaves(repl.params)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6
        )


def test_zero_learner_matches_replicated():
    """Production-optimizer (AdamW) parity: near-zero gradient elements are
    sign-amplified by Adam (update ~ lr*sign(g) at step 1), so cross-device
    summation-order noise legitimately moves individual parameters by
    O(lr * rounding-flips) — bound the drift rather than demand rounding
    equality (the SGD twin test above pins the machinery tightly)."""
    zero, repl, _ = _make_pair(seed=3)
    rp = RandomPolicy()
    for _ in range(2):
        mz = zero.learn(rp.apply, rp.params, entropy_coef=0.01)
        mr = repl.learn(rp.apply, rp.params, entropy_coef=0.01)
    for field in ("actor_loss", "critic_loss", "entropy_loss", "grad_norm",
                  "approx_kl", "explained_variance", "mean_reward"):
        assert np.isfinite(getattr(mz, field)), field
        np.testing.assert_allclose(
            getattr(mz, field), getattr(mr, field), rtol=2e-4, atol=2e-5,
            err_msg=field,
        )
    for a, b in zip(jax.tree.leaves(zero.params), jax.tree.leaves(repl.params)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-2, atol=1e-3
        )
    # moments really live sharded: every moment leaf is the flat padded
    # vector split over the env axis
    from jax.sharding import PartitionSpec as P

    moment_leaves = [
        l for l in jax.tree.leaves(zero.opt_state)
        if getattr(l, "ndim", 0) == 1 and l.size > 1
    ]
    assert moment_leaves, "expected flat moment vectors in the zero state"
    for l in moment_leaves:
        assert l.sharding.spec == P("env"), l.sharding


def test_zero_chunked_dispatch_equivalent():
    """update_chunks splits the ZeRO epoch scan across host dispatches with
    identical results (the same carry contract as ppo.update_epochs)."""
    a, _, _ = _make_pair(seed=5)
    b, _, _ = _make_pair(seed=5, update_chunks=2)
    rp = RandomPolicy()
    ma = a.learn(rp.apply, rp.params, entropy_coef=0.01)
    mb = b.learn(rp.apply, rp.params, entropy_coef=0.01)
    assert ma.actor_loss == mb.actor_loss
    assert ma.grad_norm == mb.grad_norm
    for x, y in zip(jax.tree.leaves(a.params), jax.tree.leaves(b.params)):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_zero_update_hlo_reduce_scatter_allgather():
    """The compiled ZeRO epoch program's collective inventory: at least one
    reduce-scatter (gradient) and one all-gather (update vector), scalar
    psums for clip/metrics — and NO rollout-buffer traffic (u8/pred/s32)
    and no full-gradient all-reduce (that is exactly what ZeRO removes)."""
    from rl_selfplay_mnk_tpu.alg.ppo import update_prepare, zero_metric_sums
    from rl_selfplay_mnk_tpu.alg.zero_epochs import zero_update_epochs
    from rl_selfplay_mnk_tpu.parallel.audit import (
        _f32_operand_sizes,
        collective_defs,
    )

    zero, _, mesh = _make_pair(seed=7)
    rp = RandomPolicy()
    zero.learn(rp.apply, rp.params, entropy_coef=0.01)  # builds env state
    # one more rollout to get a trajectory for lowering the update
    from rl_selfplay_mnk_tpu.alg.ppo import rollout

    cfg = zero.config
    zero.rng, k_roll, k_upd = jax.random.split(zero.rng, 3)
    (_, obs, _, traj, _, _, _) = rollout(
        zero.module, cfg, rp.apply, zero.params, zero.batch_stats, rp.params,
        zero._sp_state, zero._obs, zero._ep_rew, zero._ep_len, k_roll,
    )
    _, flats = update_prepare(
        zero.module, cfg, zero.params, zero.batch_stats,
        {k: v for k, v in traj.items() if k != "dones"}, traj["dones"], obs,
    )
    hlo = zero_update_epochs.lower(
        zero.module, cfg, zero.optimizer, mesh, zero.params, zero.opt_state,
        flats, jnp.float32(0.01), jax.random.split(k_upd, cfg.ppo_epochs),
        zero_metric_sums(cfg, zero.params),
    ).compile().as_text()

    defs = collective_defs(hlo)
    kinds = {k for k, _ in defs}
    assert "reduce-scatter" in kinds, defs
    assert "all-gather" in kinds, defs
    n_params = sum(int(np.prod(l.shape)) for l in jax.tree.leaves(zero.params))
    for kind, rtype in defs:
        assert "u8[" not in rtype and "pred[" not in rtype \
            and "s32[" not in rtype, f"buffer traffic leaked: {rtype}"
        if kind == "all-reduce":
            # only clip-norm / metric scalars may all-reduce — the gradient
            # itself must travel via reduce-scatter
            for n in _f32_operand_sizes(rtype):
                assert n <= 64, f"full-size all-reduce survived: {rtype}"
        if kind == "reduce-scatter":
            for n in _f32_operand_sizes(rtype):
                # each device receives <= ceil(N/d) gradient elements
                assert n <= -(-(n_params + 7) // 8) + 8, rtype


def test_zero_watch_parity():
    """run.watch accumulators under the ZeRO path: per-layer gradient RMS
    norms and signed-log histograms recovered from the flat shard via layer
    segments must match the replicated per-leaf accumulators. SGD pair —
    with a linear optimizer the two learners' parameters track to ~1e-6, so
    later-minibatch gradients (and hence the accumulators) stay comparable
    at rounding tolerance (AdamW's sign-amplification would compound a
    legitimate 0.1%-level drift into them)."""
    zero, repl, _ = _make_pair(seed=11, watch=True, hist_bins=4, opt="sgd")
    rp = RandomPolicy()
    mz = zero.learn(rp.apply, rp.params, entropy_coef=0.01)
    mr = repl.learn(rp.apply, rp.params, entropy_coef=0.01)
    norms_z = {k: v for k, v in mz.layer_grad_norms.items()
               if k.endswith("/norm")}
    norms_r = {k: v for k, v in mr.layer_grad_norms.items()
               if k.endswith("/norm")}
    assert norms_z and set(norms_z) == set(norms_r)
    for k in norms_z:
        np.testing.assert_allclose(norms_z[k], norms_r[k],
                                   rtol=2e-4, atol=1e-7, err_msg=k)
    hists_z = {k: v for k, v in mz.layer_grad_norms.items()
               if k.endswith("/hist")}
    hists_r = {k: v for k, v in mr.layer_grad_norms.items()
               if k.endswith("/hist")}
    assert hists_z and set(hists_z) == set(hists_r)
    for k in hists_z:
        assert hists_z[k]["edges"] == hists_r[k]["edges"]
        # identical total mass; per-bin counts may differ by edge-straddling
        # values under f32 reassociation — bound the disagreement
        assert sum(hists_z[k]["counts"]) == sum(hists_r[k]["counts"])
        diff = sum(abs(a - b) for a, b in
                   zip(hists_z[k]["counts"], hists_r[k]["counts"]))
        assert diff <= max(2, sum(hists_z[k]["counts"]) // 100), k


def test_gspmd_zero_wrapper_matches_flatten():
    """parallel/zero.py (GSPMD ZeRO-1 state sharding, any architecture):
    multi-step numeric parity with optax.flatten of the same chain, and the
    moment leaves provably sharded over the env axis."""
    from jax.sharding import NamedSharding, PartitionSpec as P
    from rl_selfplay_mnk_tpu.parallel.zero import zero_sharded

    mesh = make_mesh(num_devices=8)
    params = {
        "w": jnp.linspace(-1, 1, 13 * 7).reshape(13, 7),
        "b": jnp.zeros((7,)),
    }
    params_a = replicate(params, mesh)
    params_b = replicate(params, mesh)
    inner = optax.chain(
        optax.clip_by_global_norm(0.5),
        optax.adamw(1e-2, eps=1e-5, weight_decay=0.01),
    )
    zo = zero_sharded(inner, mesh)
    fo = optax.flatten(inner)
    so_a = jax.jit(zo.init)(params_a)
    so_b = jax.jit(fo.init)(params_b)

    x = jax.device_put(
        jnp.linspace(0, 1, 16 * 13).reshape(16, 13),
        NamedSharding(mesh, P("env")),
    )

    def loss(p, x):
        return jnp.sum(jnp.tanh(x @ p["w"]).mean(0) + p["b"] ** 2)

    @jax.jit
    def step_a(p, s):
        g = jax.grad(loss)(p, x)
        u, s = zo.update(g, s, p)
        return optax.apply_updates(p, u), s

    @jax.jit
    def step_b(p, s):
        g = jax.grad(loss)(p, x)
        u, s = fo.update(g, s, p)
        return optax.apply_updates(p, u), s

    for _ in range(3):
        params_a, so_a = step_a(params_a, so_a)
        params_b, so_b = step_b(params_b, so_b)
    for a, b in zip(jax.tree.leaves(params_a), jax.tree.leaves(params_b)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-7)
    sharded = [l for l in jax.tree.leaves(so_a)
               if getattr(l, "ndim", 0) == 2]
    assert sharded and all(
        l.sharding.spec == P("env") for l in sharded
    ), [getattr(l, "sharding", None) for l in sharded]
