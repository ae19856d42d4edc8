"""Pallas attention kernels under mesh sharding (VERDICT.md round-1 item 9).

The CPU backend runs the kernels in interpret mode (same kernel program the
TPU Mosaic compiler lowers), so this pins the previously-untested
combination: batch-sharded global arrays flowing THROUGH the attention
custom-vjp on a multi-device mesh.

Pinned here:
  * forward and backward of both kernel layouts (packed dh>=32, folded
    dh<32) produce identical results sharded vs unsharded vs plain XLA
    math;
  * GSPMD partitions the opaque pallas_call along the sharded batch axis
    with ZERO collectives (no all-gather of q/k/v);
  * the full transformer PPO train step runs on the 8-device mesh with the
    kernel path forced (not the CPU XLA fallback).
"""

import functools
import re

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from jax.sharding import NamedSharding, PartitionSpec as P

from rl_selfplay_mnk_tpu.ops.pallas_attention import tiny_head_attention
from rl_selfplay_mnk_tpu.parallel import make_mesh

_COLLECTIVE = re.compile(
    r"%(all-reduce|all-gather|all-to-all|collective-permute|reduce-scatter)"
    r"[.\d]* ="
)


def _ref_attention(q, k, v):
    dh = q.shape[-1]
    s = jnp.einsum("blhd,bmhd->bhlm", q, k) / np.sqrt(dh)
    p = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("bhlm,bmhd->blhd", p, v)


def _qkv(b, l, h, dh, seed=0):
    ks = jax.random.split(jax.random.PRNGKey(seed), 3)
    return tuple(jax.random.normal(k, (b, l, h, dh), jnp.float32) for k in ks)


@pytest.mark.parametrize(
    "h, dh",
    [
        (2, 64),  # packed layout (the _w speed tiers)
        (4, 14),  # folded layout (the reference d56/H4 shape)
    ],
)
def test_sharded_kernel_matches_unsharded_and_xla(h, dh):
    mesh = make_mesh(num_devices=8)
    es = NamedSharding(mesh, P("env"))
    q, k, v = _qkv(16, 81, h, dh)

    def loss(q, k, v):
        return (tiny_head_attention(q, k, v, interpret=True) ** 2).sum()

    f = jax.jit(jax.value_and_grad(loss, argnums=(0, 1, 2)))
    out_plain, grads_plain = f(q, k, v)
    out_shard, grads_shard = f(*(jax.device_put(t, es) for t in (q, k, v)))

    np.testing.assert_allclose(
        float(out_plain), float(out_shard), rtol=1e-5
    )
    for a, b in zip(grads_plain, grads_shard):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-5)

    # and both equal the reference math (fwd + grads)
    fr = jax.jit(jax.value_and_grad(
        lambda q, k, v: (_ref_attention(q, k, v) ** 2).sum(), argnums=(0, 1, 2)
    ))
    out_ref, grads_ref = fr(q, k, v)
    np.testing.assert_allclose(float(out_plain), float(out_ref), rtol=1e-4)
    for a, b in zip(grads_plain, grads_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-3, atol=2e-4)


@pytest.mark.parametrize("h, dh", [(2, 64), (4, 14)])
def test_sharded_kernel_hlo_has_no_collectives(h, dh):
    """The opaque pallas_call must partition along the sharded batch axis —
    an all-gather of q/k/v would silently serialize a pod."""
    mesh = make_mesh(num_devices=8)
    es = NamedSharding(mesh, P("env"))
    q, k, v = _qkv(16, 81, h, dh)
    qs, ks, vs = (jax.device_put(t, es) for t in (q, k, v))

    def loss(q, k, v):
        return (tiny_head_attention(q, k, v, interpret=True) ** 2).sum()

    fwd_txt = (
        jax.jit(lambda a, b, c: tiny_head_attention(a, b, c, interpret=True))
        .lower(qs, ks, vs).compile().as_text()
    )
    assert not _COLLECTIVE.search(fwd_txt), "forward kernel gathered inputs"

    grad_txt = (
        jax.jit(jax.grad(loss, argnums=(0, 1, 2)))
        .lower(qs, ks, vs).compile().as_text()
    )
    # backward may reduce the scalar loss but must not move q/k/v
    for line in grad_txt.splitlines():
        m = _COLLECTIVE.search(line)
        if m:
            assert "f32[]" in line, f"tensor-sized collective in bwd: {line.strip()[:120]}"


def test_transformer_train_step_on_mesh_with_kernels(monkeypatch):
    """Full transformer PPO train step, envs sharded over the 8-device mesh,
    attention running THROUGH the kernel path (interpret mode on CPU) — the
    combination the round-1 review flagged as never executed."""
    import optax

    import rl_selfplay_mnk_tpu.models.transformer as tf_mod
    from rl_selfplay_mnk_tpu.alg import PPOConfig, PPOLearner
    from rl_selfplay_mnk_tpu.env import EnvConfig
    from rl_selfplay_mnk_tpu.models.registry import (
        create_model_from_architecture,
        init_network,
    )
    from rl_selfplay_mnk_tpu.selfplay import RandomPolicy

    monkeypatch.setattr(
        tf_mod, "tiny_head_attention",
        functools.partial(tiny_head_attention, interpret=True),
    )

    mesh = make_mesh(num_devices=8)
    env_cfg = EnvConfig(3, 3, 3)
    module, _ = create_model_from_architecture("transformer_b_s", (2, 3, 3), 9)
    variables = init_network(module, (2, 3, 3), jax.random.PRNGKey(0))
    config = PPOConfig(
        env=env_cfg, num_envs=16, n_steps=8, batch_size=32, ppo_epochs=1,
        shuffle="grouped", shard_groups=8, group_size=2,
    )
    optimizer = optax.chain(optax.clip_by_global_norm(0.5), optax.adamw(1e-3))
    learner = PPOLearner(
        module, config, optimizer, variables, jax.random.PRNGKey(1), mesh=mesh
    )
    rp = RandomPolicy()
    m = learner.learn(rp.apply, rp.params, entropy_coef=0.01)
    assert np.isfinite(m.actor_loss) and np.isfinite(m.approx_kl)
    assert learner._sp_state.env.boards.sharding.spec == P("env")
