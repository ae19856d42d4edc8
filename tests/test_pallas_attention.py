"""Tiny-head fused attention: kernel equivalence (interpret mode), flax MHA
drop-in parity, and gradient flow through the custom_vjp."""

import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn

from rl_selfplay_mnk_tpu.ops.pallas_attention import (
    _attention_fwd_pallas,
    _attention_xla,
    tiny_head_attention,
)


def test_kernel_matches_xla_interpret():
    rng = np.random.default_rng(0)
    bh, l, dh = 24, 81, 14
    q, k, v = (
        jnp.asarray(rng.normal(size=(bh, dh, l)).astype(np.float32)) for _ in range(3)
    )
    got = _attention_fwd_pallas(q, k, v, tile_heads=8, interpret=True)
    want = _attention_xla(q, k, v)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-5, atol=2e-5)


def test_bwd_kernel_matches_xla_vjp_interpret():
    from rl_selfplay_mnk_tpu.ops.pallas_attention import _attention_bwd_pallas

    rng = np.random.default_rng(1)
    bh, l, dh = 8, 25, 14
    q, k, v, g = (
        jnp.asarray(rng.normal(size=(bh, dh, l)).astype(np.float32))
        for _ in range(4)
    )
    dq, dk, dv = _attention_bwd_pallas(q, k, v, g, tile_heads=4, interpret=True)
    _, vjp = jax.vjp(_attention_xla, q, k, v)
    wdq, wdk, wdv = vjp(g)
    np.testing.assert_allclose(np.asarray(dq), np.asarray(wdq), rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(dk), np.asarray(wdk), rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(dv), np.asarray(wdv), rtol=2e-4, atol=2e-4)


def test_flax_mha_dropin_parity():
    rng = jax.random.PRNGKey(0)
    b, l, d, h = 4, 25, 56, 4
    x = jax.random.normal(jax.random.PRNGKey(1), (b, l, d))

    base = nn.MultiHeadDotProductAttention(num_heads=h, qkv_features=d)
    fused = nn.MultiHeadDotProductAttention(
        num_heads=h, qkv_features=d, attention_fn=tiny_head_attention
    )
    variables = base.init(rng, x, x)
    out_base = base.apply(variables, x, x)
    out_fused = fused.apply(variables, x, x)
    np.testing.assert_allclose(
        np.asarray(out_base), np.asarray(out_fused), rtol=2e-4, atol=2e-4
    )


def test_gradients_flow_through_custom_vjp():
    b, l, d, h = 2, 9, 16, 2
    fused = nn.MultiHeadDotProductAttention(
        num_heads=h, qkv_features=d, attention_fn=tiny_head_attention
    )
    x = jax.random.normal(jax.random.PRNGKey(1), (b, l, d))
    variables = fused.init(jax.random.PRNGKey(0), x, x)

    def loss(params, x):
        return fused.apply({"params": params}, x, x).sum()

    g = jax.grad(loss)(variables["params"], x)
    leaves = jax.tree.leaves(g)
    assert leaves and all(np.isfinite(np.asarray(leaf)).all() for leaf in leaves)
    assert any(float(jnp.abs(leaf).max()) > 0 for leaf in leaves)

    # grads must match the stock attention's grads (same math)
    base = nn.MultiHeadDotProductAttention(num_heads=h, qkv_features=d)

    def loss_base(params, x):
        return base.apply({"params": params}, x, x).sum()

    g_base = jax.grad(loss_base)(variables["params"], x)
    for a, b_ in zip(jax.tree.leaves(g), jax.tree.leaves(g_base)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), rtol=2e-3, atol=2e-3)


def test_pick_tile_respects_vmem_budget():
    from rl_selfplay_mnk_tpu.ops.pallas_attention import _VMEM_BUDGET, _pick_tile

    # (bh, dh, lp) shapes that OOMed or would OOM scoped VMEM at tile=128:
    # 9x9 board batch 8192 (Lp=96) and 13x13 (L=169 -> Lp=176).
    for bh, dh, lp in [(65536, 16, 96), (8192, 128, 96), (32768, 14, 176)]:
        for n_io, n_lxl in [(4, 2), (7, 4)]:  # fwd and bwd kernel loads
            tile = _pick_tile(128, bh, dh, lp, n_io=n_io, n_lxl=n_lxl)
            assert tile >= 1 and bh % tile == 0
            dhp = max(32, ((dh + 15) // 16) * 16)
            per_head = 2 * n_io * dhp * lp * 2 + n_lxl * lp * lp * 4
            assert tile * per_head <= _VMEM_BUDGET or tile == 1


def test_kernel_matches_xla_interpret_13x13():
    # 13x13 board: L=169 pads to Lp=176 — the shape the budget-aware tile
    # picker exists to keep compilable.
    rng = np.random.default_rng(3)
    bh, l, dh = 16, 169, 14
    q, k, v = (
        jnp.asarray(rng.normal(size=(bh, dh, l)).astype(np.float32)) for _ in range(3)
    )
    got = _attention_fwd_pallas(q, k, v, tile_heads=8, interpret=True)
    want = _attention_xla(q, k, v)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-5, atol=2e-5)
