"""Per-env-block pooled-opponent policy tests."""

import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn

from rl_selfplay_mnk_tpu.env import EnvConfig
from rl_selfplay_mnk_tpu.models.common import ActorCriticHeads
from rl_selfplay_mnk_tpu.selfplay.policies import make_block_pooled_policy
from rl_selfplay_mnk_tpu.selfplay.opponent_pool import pool_add, pool_init, pool_sample
from rl_selfplay_mnk_tpu.selfplay.wrapper import selfplay_reset, selfplay_step


class Tiny(nn.Module):
    action_dim: int

    @nn.compact
    def __call__(self, obs, train=False):
        del train
        b = obs.shape[0]
        x = nn.relu(nn.Dense(16)(obs.reshape(b, -1)))
        return ActorCriticHeads(action_dim=self.action_dim, hidden=16)(x[:, None, :])


def _apply(variables, obs, mask, train=False):
    module = Tiny(action_dim=9)
    return module.apply(
        {"params": variables["params"]}, obs, train=False
    )


def test_block_pooled_matches_per_block_single():
    """K-block pooled forward == running each block's params separately."""
    module = Tiny(action_dim=9)
    k_sets = []
    for s in range(4):
        v = dict(module.init(jax.random.PRNGKey(s), jnp.zeros((1, 2, 3, 3))))
        k_sets.append({"params": v["params"]})
    stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *k_sets)

    e = 16
    obs = {
        "observation": jax.random.normal(jax.random.PRNGKey(9), (e, 2, 3, 3)),
        "action_mask": jnp.ones((e, 9), bool),
    }
    act = make_block_pooled_policy(_apply, 4)
    actions = act(stacked, jax.random.PRNGKey(1), obs, True)  # deterministic

    per = e // 4
    expected = []
    for i in range(4):
        logits, _ = _apply(
            k_sets[i],
            obs["observation"][i * per : (i + 1) * per],
            obs["action_mask"][i * per : (i + 1) * per],
        )
        expected.append(np.argmax(np.asarray(logits), axis=-1))
    np.testing.assert_array_equal(np.asarray(actions), np.concatenate(expected))


def test_block_pooled_drives_selfplay_wrapper():
    """The pooled policy plugs straight into the wrapper as an opponent."""
    module = Tiny(action_dim=9)
    template = {"params": dict(module.init(jax.random.PRNGKey(0), jnp.zeros((1, 2, 3, 3))))["params"]}
    pool = pool_init(template, max_size=4)
    for s in range(3):
        v = dict(module.init(jax.random.PRNGKey(10 + s), jnp.zeros((1, 2, 3, 3))))
        pool = pool_add(pool, {"params": v["params"]})

    # gather 2 opponents from the device pool (device-side sampling)
    k1, k2 = jax.random.split(jax.random.PRNGKey(5))
    stacked = jax.tree.map(
        lambda *xs: jnp.stack(xs), pool_sample(pool, k1), pool_sample(pool, k2)
    )

    act = make_block_pooled_policy(_apply, 2)
    cfg = EnvConfig(3, 3, 3)
    state, obs = selfplay_reset(cfg, act, stacked, 8, jax.random.PRNGKey(0))
    for t in range(12):
        actions = jnp.zeros((8,), jnp.int32)
        mask = np.asarray(obs["action_mask"])
        actions = jnp.asarray(
            [int(np.flatnonzero(m)[0]) if m.any() else 0 for m in mask],
            dtype=jnp.int32,
        )
        state, obs, rewards, dones = selfplay_step(
            cfg, act, stacked, state, actions, jax.random.PRNGKey(t + 1)
        )
    assert np.isfinite(np.asarray(rewards)).all()
