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


def _xla_mha_packed(q, k, v, h, dh):
    """Reference math for the packed (B, L, D) layout: per-head softmax
    attention via einsum on the unpacked (B, L, H, Dh) view."""
    b, l, d = q.shape
    qh, kh, vh = (t.reshape(b, l, h, dh).astype(jnp.float32) for t in (q, k, v))
    s = jnp.einsum("bihd,bjhd->bhij", qh, kh) / (dh**0.5)
    p = jax.nn.softmax(s, axis=-1)
    o = jnp.einsum("bhij,bjhd->bihd", p, vh)
    return o.reshape(b, l, d).astype(q.dtype)


def test_packed_fwd_matches_xla_interpret():
    from rl_selfplay_mnk_tpu.ops.pallas_attention import _attention_packed_fwd_pallas

    rng = np.random.default_rng(5)
    # production shapes: d56/H4/dh14 (transformer_b_s), d96/H8 @ 13x13
    # (transformer_b_l), d128/H2/dh64 (the _w speed tier)
    for b, l, h, dh in [(4, 81, 4, 14), (2, 169, 8, 12), (3, 81, 2, 64)]:
        d = h * dh
        q, k, v = (
            jnp.asarray(rng.normal(size=(b, l, d)).astype(np.float32))
            for _ in range(3)
        )
        got = _attention_packed_fwd_pallas(
            q, k, v, h=h, dh=dh, tile_batch=2, interpret=True
        )
        want = _xla_mha_packed(q, k, v, h, dh)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), rtol=2e-5, atol=2e-5
        )


def test_packed_bwd_matches_xla_vjp_interpret():
    from rl_selfplay_mnk_tpu.ops.pallas_attention import _attention_packed_bwd_pallas

    rng = np.random.default_rng(6)
    for b, l, h, dh in [(2, 25, 4, 14), (2, 25, 2, 64)]:
        d = h * dh
        q, k, v, g = (
            jnp.asarray(rng.normal(size=(b, l, d)).astype(np.float32))
            for _ in range(4)
        )
        dq, dk, dv = _attention_packed_bwd_pallas(
            q, k, v, g, h=h, dh=dh, tile_batch=2, interpret=True
        )
        _, vjp = jax.vjp(lambda *a: _xla_mha_packed(*a, h, dh), q, k, v)
        wdq, wdk, wdv = vjp(g)
        np.testing.assert_allclose(np.asarray(dq), np.asarray(wdq), rtol=2e-4, atol=2e-4)
        np.testing.assert_allclose(np.asarray(dk), np.asarray(wdk), rtol=2e-4, atol=2e-4)
        np.testing.assert_allclose(np.asarray(dv), np.asarray(wdv), rtol=2e-4, atol=2e-4)


def test_packed_dropin_parity_interpret():
    # Full tiny_head_attention path (packed kernels via custom_vjp) against
    # flax's stock attention math, forced through the kernel with
    # interpret=True so the CPU test suite exercises the packed path.
    from rl_selfplay_mnk_tpu.ops.pallas_attention import tiny_head_attention

    b, l, h, dh = 3, 25, 4, 14
    key = jax.random.PRNGKey(2)
    q, k, v = (
        jax.random.normal(jax.random.fold_in(key, i), (b, l, h, dh))
        for i in range(3)
    )
    got = tiny_head_attention(q, k, v, interpret=True)
    want = nn.dot_product_attention(q, k, v)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-4, atol=2e-4)

    # gradient path through the packed custom_vjp
    def loss(q, k, v):
        return jnp.sum(tiny_head_attention(q, k, v, interpret=True) ** 2)

    def loss_ref(q, k, v):
        return jnp.sum(nn.dot_product_attention(q, k, v) ** 2)

    got_g = jax.grad(loss, argnums=(0, 1, 2))(q, k, v)
    want_g = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b_ in zip(got_g, want_g):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), rtol=2e-3, atol=2e-3)


def test_pick_tile_batch_respects_vmem_budget():
    from rl_selfplay_mnk_tpu.ops.pallas_attention import _VMEM_BUDGET, _pick_tile_batch

    for b, l, d in [(8192, 81, 56), (8192, 81, 128), (4096, 169, 96), (384, 81, 256)]:
        for n_io, n_lxl, n_acc in [(4, 2, 2), (7, 4, 4)]:
            tile = _pick_tile_batch(32, b, l, d, 2, n_io, n_lxl, n_acc)
            assert tile >= 1 and b % tile == 0
            lp_sub = ((l + 15) // 16) * 16
            lp_lane = ((l + 127) // 128) * 128
            dp = ((d + 127) // 128) * 128
            per_b = (
                2 * n_io * lp_sub * dp * 2
                + n_lxl * lp_sub * lp_lane * 4
                + n_acc * lp_sub * dp * 4
            )
            assert tile * per_b <= _VMEM_BUDGET or tile == 1


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


def test_infold_kernels_match_xla_interpret():
    """Round-2 layout-study kernels (kept as measured negatives on TPU, but
    the infold path IS the interpret-mode route for dh<32 under sharding
    tests — keep it correct): fwd + bwd vs the packed-layout reference."""
    from rl_selfplay_mnk_tpu.ops.pallas_attention import (
        _attention_infold_bwd_pallas,
        _attention_infold_fwd_pallas,
        _attention_lane_slice_fwd_pallas,
    )

    rng = np.random.default_rng(7)
    for b, l, h, dh in [(4, 81, 8, 12), (2, 25, 4, 14)]:
        d = h * dh
        q, k, v, g = (
            jnp.asarray(rng.normal(size=(b, l, d)).astype(np.float32))
            for _ in range(4)
        )
        want = _xla_mha_packed(q, k, v, h, dh)
        got = _attention_infold_fwd_pallas(
            q, k, v, h=h, dh=dh, tile_batch=2, interpret=True
        )
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), rtol=2e-5, atol=2e-5
        )
        got_lane = _attention_lane_slice_fwd_pallas(
            q, k, v, h=h, dh=dh, tile_batch=2, interpret=True
        )
        np.testing.assert_allclose(
            np.asarray(got_lane), np.asarray(want), rtol=2e-5, atol=2e-5
        )

        dq, dk, dv = _attention_infold_bwd_pallas(
            q, k, v, g, h=h, dh=dh, tile_batch=2, interpret=True
        )
        _, vjp = jax.vjp(lambda *a: _xla_mha_packed(*a, h, dh), q, k, v)
        for got_g, want_g in zip((dq, dk, dv), vjp(g)):
            np.testing.assert_allclose(
                np.asarray(got_g), np.asarray(want_g), rtol=2e-4, atol=2e-4
            )


def test_overlap_pipeline_bodies_match_full_kernel():
    """The Lq-tiled softmax/matmul overlap candidates (round-2 VERDICT
    item 7, tools/attn_kernel_ablation.py) compute the same attention as
    the single-pass kernel body — interpret-mode oracle before any
    hardware A/B. Covers both the odd real length (81 -> tiles 32/32/17)
    and an aligned one."""
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).parents[1]))
    from tools.attn_kernel_ablation import (
        body_full,
        build,
        make_overlap_body,
        make_overlap_tiled_scores_body,
    )

    for l in (81, 64):
        key = jax.random.PRNGKey(l)
        kq, kk, kv = jax.random.split(key, 3)
        q = jax.random.normal(kq, (8, 14, l), jnp.float32)
        k = jax.random.normal(kk, (8, 14, l), jnp.float32)
        v = jax.random.normal(kv, (8, 14, l), jnp.float32)
        ref = build(body_full, q, l, tile=4, interpret=True)(q, k, v)
        for lq_tile in (8, 16, 32):
            for maker in (make_overlap_body, make_overlap_tiled_scores_body):
                got = build(maker(lq_tile), q, l, tile=4, interpret=True)(
                    q, k, v
                )
                np.testing.assert_allclose(
                    np.asarray(got), np.asarray(ref), rtol=1e-5, atol=1e-5,
                    err_msg=f"{maker.__name__}({lq_tile}) at L={l}",
                )


def test_lq_tiled_kernel_paths_match_untiled():
    """The in-kernel lq_tile overlap paths (retained measured negatives at
    production shapes — PERFORMANCE.md "softmax/matmul overlap") stay
    equivalent to the untiled defaults: per-row math is identical (measured
    bit-exact on TPU hardware; interpret mode's XLA-CPU dots reduce in a
    shape-dependent order, so compare at f32 rounding tolerance here), bwd
    additionally tolerates the dk/dv tile accumulation order. Odd L
    exercises the ragged last tile."""
    from rl_selfplay_mnk_tpu.ops.pallas_attention import _attention_bwd_pallas

    rng = np.random.default_rng(7)
    bh, l, dh = 8, 81, 14
    q, k, v, g = (
        jnp.asarray(rng.normal(size=(bh, dh, l)).astype(np.float32))
        for _ in range(4)
    )
    fwd_ref = _attention_fwd_pallas(q, k, v, tile_heads=4, interpret=True)
    bwd_ref = _attention_bwd_pallas(q, k, v, g, tile_heads=4, interpret=True)
    for lq_tile in (16, 32):
        fwd = _attention_fwd_pallas(
            q, k, v, tile_heads=4, interpret=True, lq_tile=lq_tile
        )
        np.testing.assert_allclose(
            np.asarray(fwd), np.asarray(fwd_ref), rtol=2e-6, atol=2e-6
        )
        bwd = _attention_bwd_pallas(
            q, k, v, g, tile_heads=4, interpret=True, lq_tile=lq_tile
        )
        for got, want in zip(bwd, bwd_ref):
            np.testing.assert_allclose(
                np.asarray(got), np.asarray(want), rtol=2e-4, atol=2e-4
            )
