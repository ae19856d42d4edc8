"""HLO-level communication audit of the sharded training step.

BASELINE.md's scaling claim ("zero-communication rollout, psum-only
update") can't be measured on a real pod in this environment — so pin it at
the artifact level instead (VERDICT.md round-1 item 6): compile the
env-sharded rollout and update on the virtual 8-device mesh and assert the
collective inventory of the optimized HLO:

  * rollout: the ONLY collective is the final episode-stat reduction
    (3 fused f32 scalars) — env stepping and both network forwards are
    communication-free;
  * update: no all-gather / all-to-all / collective-permute /
    reduce-scatter at all, and every all-reduce operand is f32 (gradients,
    BN batch stats, loss/advantage scalars). In particular NO collective
    touches the rollout buffers (u8 observations, bool masks, s32 actions):
    the shard-local grouped shuffle's batched per-shard gather keeps
    minibatch assembly on-device (a flat global gather lowers to a masked
    all-reduce of every minibatch — the round-2 audit caught exactly that).
"""


import jax
import jax.numpy as jnp
import flax.linen as nn
import optax
import pytest

from rl_selfplay_mnk_tpu.env import EnvConfig
from rl_selfplay_mnk_tpu.alg import PPOConfig
from rl_selfplay_mnk_tpu.alg.ppo import rollout_impl, update_impl
from rl_selfplay_mnk_tpu.models.common import ActorCriticHeads
from rl_selfplay_mnk_tpu.parallel import make_mesh, replicate, shard_batched
from rl_selfplay_mnk_tpu.selfplay import RandomPolicy
from rl_selfplay_mnk_tpu.selfplay.wrapper import selfplay_reset

class _MLP(nn.Module):
    action_dim: int

    @nn.compact
    def __call__(self, obs, train: bool = False):
        del train
        b = obs.shape[0]
        x = nn.relu(nn.Dense(32)(obs.reshape(b, -1)))
        return ActorCriticHeads(action_dim=self.action_dim, hidden=32)(x[:, None, :])


# the parser + canned assertions live in parallel/audit.py so the
# driver-visible dryrun (__graft_entry__.dryrun_multichip) runs the same
# audit on its own compiled programs
from rl_selfplay_mnk_tpu.parallel.audit import collective_defs as _collective_defs


@pytest.fixture(scope="module")
def sharded_programs():
    env_cfg = EnvConfig(3, 3, 3)
    module = _MLP(action_dim=9)
    variables = dict(module.init(jax.random.PRNGKey(0), jnp.zeros((1, 2, 3, 3))))
    variables.setdefault("batch_stats", {})
    cfg = PPOConfig(
        env=env_cfg, num_envs=16, n_steps=8, batch_size=32, ppo_epochs=2,
        shuffle="grouped", shard_groups=8, group_size=2,
    )
    mesh = make_mesh(num_devices=8)
    rp = RandomPolicy()
    state, obs = jax.jit(
        selfplay_reset, static_argnames=("cfg", "opponent_apply", "num_envs")
    )(env_cfg, rp.apply, None, 16, jax.random.PRNGKey(5))
    state = shard_batched(state, mesh)
    obs = shard_batched(obs, mesh)
    params = replicate(variables["params"], mesh)
    bs = replicate(variables["batch_stats"], mesh)
    ep0 = shard_batched(jnp.zeros((16,), jnp.float32), mesh)
    ep1 = shard_batched(jnp.zeros((16,), jnp.float32), mesh)

    roll = jax.jit(
        rollout_impl, static_argnames=("module", "config", "opponent_apply")
    )
    roll_args = (module, cfg, rp.apply, params, bs, None, state, obs,
                 ep0, ep1, jax.random.PRNGKey(6))
    roll_hlo = roll.lower(*roll_args).compile().as_text()

    outs = roll(*roll_args)
    _, final_obs, _, traj, _, _, _ = outs
    opt = optax.flatten(
        optax.chain(optax.clip_by_global_norm(0.5), optax.adamw(1e-3, eps=1e-5))
    )
    opt_state = replicate(jax.jit(opt.init)(params), mesh)
    upd = jax.jit(
        update_impl, static_argnames=("module", "config", "optimizer")
    )
    upd_hlo = upd.lower(
        module, cfg, opt, params, bs, opt_state, traj, final_obs,
        jnp.float32(0.01), jax.random.PRNGKey(7),
    ).compile().as_text()
    return roll_hlo, upd_hlo


def test_rollout_hlo_is_communication_free(sharded_programs):
    roll_hlo, _ = sharded_programs
    defs = _collective_defs(roll_hlo)
    # exactly one collective: the fused (reward, length, count) episode-stat
    # reduction at the rollout tail
    assert len(defs) == 1, defs
    kind, rtype = defs[0]
    assert kind == "all-reduce"
    assert rtype == "(f32[], f32[], f32[])", rtype


def test_update_hlo_is_gradient_psum_only(sharded_programs):
    _, upd_hlo = sharded_programs
    defs = _collective_defs(upd_hlo)
    assert defs, "update must communicate (gradient psum)"
    for kind, rtype in defs:
        # data-parallel update: reductions only, no re-layout collectives
        assert kind == "all-reduce", (kind, rtype)
        # every reduced operand is f32 (grads / BN stats / loss scalars);
        # the rollout buffers (u8 obs, pred masks, s32 actions) never
        # travel — minibatch assembly is shard-local
        assert "u8[" not in rtype and "pred[" not in rtype and "s32[" not in rtype, (
            f"non-f32 collective (buffer traffic leaked into the update): {rtype}"
        )


def test_update_collective_bytes_are_param_scale(sharded_programs):
    """The per-minibatch all-reduce volume must scale with PARAMS, not with
    the minibatch: every reduced tensor is no bigger than the largest
    parameter (so communication is the gradient psum, not data movement)."""
    from rl_selfplay_mnk_tpu.parallel.audit import _f32_operand_sizes

    _, upd_hlo = sharded_programs
    biggest = 32 * 18  # largest param leaf of _MLP: Dense(32) over 18 inputs
    for kind, rtype in _collective_defs(upd_hlo):
        for n in _f32_operand_sizes(rtype):
            assert n <= biggest, f"oversized collective operand: {rtype}"


def test_collective_defs_parses_async_and_root_forms():
    """The inventory must see collectives in every spelling XLA emits:
    sync, ROOT-prefixed, and async -start/-done pairs (counted once, at
    the -done, whose result type equals the sync op's). A missed spelling
    would let the psum-only/communication-free asserts false-pass."""
    hlo = "\n".join([
        "  %all-reduce.1 = (f32[], f32[], f32[]) all-reduce(...)",
        "  ROOT %all-reduce.9 = f32[576] all-reduce(...)",
        "  %all-gather-start.2 = (f32[128], f32[512]) all-gather-start(...)",
        "  %all-gather-done.2 = f32[512] all-gather-done(...)",
        "  %get-tuple-element.3 = f32[512] get-tuple-element(...)",
        "  %collective-permute-start.4 = (u8[64], u8[64]) collective-permute-start(...)",
        "  %collective-permute-done.4 = u8[64] collective-permute-done(...)",
    ])
    defs = _collective_defs(hlo)
    assert defs == [
        ("all-reduce", "(f32[], f32[], f32[])"),
        ("all-reduce", "f32[576]"),
        ("all-gather", "f32[512]"),
        ("collective-permute", "u8[64]"),
    ], defs
