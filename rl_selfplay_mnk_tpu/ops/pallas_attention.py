"""Pallas TPU kernel: fused attention for tiny heads on board-length tokens.

The reference transformers use head_dim 14-32 over 81-169 board tokens
(SURVEY.md §2.2: d56/H4, d96/H8...). XLA's stock attention materializes the
(B, H, L, L) score tensor in HBM three times over (scores, softmax,
probs@V) — ~GBs per call at B=8192 — and the K=head_dim batched matmuls run
at a few percent of the MXU. This kernel computes one (heads-batch, L, L)
score block per grid step entirely in VMEM: QK^T, padding mask, f32
softmax, and P@V fused, with only Q/K/V/O touching HBM (~8x less traffic).

L fits VMEM whole, so no online/streaming softmax is needed — this is the
degenerate (single-block) case of flash attention.

Forward only; the backward pass is a custom_vjp that recomputes with plain
XLA einsums (rollout/eval forwards dominate the transformer's cost, and
the bwd einsums reuse XLA's fused softmax-grad path).

Integration: drop-in ``attention_fn`` for
``flax.linen.MultiHeadDotProductAttention`` — parameter trees unchanged.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30

# Scoped-VMEM budget for one grid step (the hardware limit is 16 MiB; leave
# headroom for Mosaic's own temporaries). Tiles are sized so the per-step
# working set — double-buffered I/O blocks plus the f32 L x L score/prob
# intermediates — stays under this.
_VMEM_BUDGET = 10 * 1024 * 1024


def _pick_tile(requested: int, bh: int, dh: int, lp: int, n_io: int, n_lxl: int) -> int:
    """Largest head-tile <= requested that divides bh and fits the budget.

    n_io: number of (tile, dh, lp) bf16 blocks (double-buffered by Mosaic).
    n_lxl: number of live f32 (tile, lp, lp) intermediates in the kernel.
    """
    dhp = max(32, ((dh + 15) // 16) * 16)  # Mosaic pads the sublane axis
    per_head = 2 * n_io * dhp * lp * 2 + n_lxl * lp * lp * 4
    tile = min(requested, bh)
    while tile > 1 and (bh % tile or tile * per_head > _VMEM_BUDGET):
        tile //= 2
    return tile


def _attn_kernel(l_real, scale, q_ref, k_ref, v_ref, o_ref):
    # refs: (TBH, Dh, Lp) — head_dim on the SUBLANE axis so the tiny Dh
    # isn't padded to 128 lanes (6x VMEM saving vs (Lp, Dh) layout).
    q = q_ref[:]
    k = k_ref[:]
    v = v_ref[:]
    s = jax.lax.dot_general(
        q,
        k,
        dimension_numbers=(((1,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )  # (TBH, Lp_q, Lp_k)
    s = s * scale
    col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 2)
    s = jnp.where(col < l_real, s, NEG_INF)
    s = s - s.max(axis=-1, keepdims=True)
    p = jnp.exp(s)
    p = p / p.sum(axis=-1, keepdims=True)
    o = jax.lax.dot_general(
        v,
        p.astype(v.dtype),
        dimension_numbers=(((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )  # (TBH, Dh, Lp_q)
    o_ref[:] = o.astype(q.dtype)


@functools.partial(
    jax.jit, static_argnames=("tile_heads", "interpret")
)
def _attention_fwd_pallas(
    q: jax.Array,  # (BH, Dh, L) — transposed head layout
    k: jax.Array,
    v: jax.Array,
    tile_heads: int = 128,
    interpret: bool = False,
) -> jax.Array:
    bh, dh, l = q.shape
    scale = 1.0 / (dh**0.5)
    # No explicit L padding: Mosaic pads the lane/sublane tiles internally
    # and keeps reductions/contractions to the logical extents, and the
    # kernel's col < l mask guards the softmax columns regardless. An
    # explicit jnp.pad would materialize 3 padded HBM copies (plus an
    # output slice copy) per call that XLA cannot fuse into the
    # custom-call — measured ~10% of transformer_b_s update time.
    tile = _pick_tile(tile_heads, bh, dh, l, n_io=4, n_lxl=2)

    out = pl.pallas_call(
        functools.partial(_attn_kernel, l, scale),
        grid=(bh // tile,),
        in_specs=[
            pl.BlockSpec((tile, dh, l), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
        ]
        * 3,
        out_specs=pl.BlockSpec(
            (tile, dh, l), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((bh, dh, l), q.dtype),
        interpret=interpret,
    )(q, k, v)
    return out


def _attn_bwd_kernel(l_real, scale, q_ref, k_ref, v_ref, do_ref, dq_ref, dk_ref, dv_ref):
    # All refs (TBH, Dh, Lp). Recomputes p in VMEM (flash-style), then the
    # standard softmax-attention gradients — five batched MXU matmuls with
    # zero HBM traffic for the L x L intermediates.
    q = q_ref[:]
    k = k_ref[:]
    v = v_ref[:]
    do = do_ref[:]

    s = jax.lax.dot_general(
        q, k, dimension_numbers=(((1,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )
    s = s * scale
    col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 2)
    s = jnp.where(col < l_real, s, NEG_INF)
    s = s - s.max(axis=-1, keepdims=True)
    p = jnp.exp(s)
    p = p / p.sum(axis=-1, keepdims=True)  # (T, Lq, Lk)

    dp = jax.lax.dot_general(
        do, v, dimension_numbers=(((1,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )  # (T, Lq, Lk)
    row = (dp * p).sum(axis=-1, keepdims=True)
    ds = (p * (dp - row) * scale).astype(q.dtype)  # (T, Lq, Lk)

    dq_ref[:] = jax.lax.dot_general(
        k, ds, dimension_numbers=(((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    ).astype(q.dtype)
    dk_ref[:] = jax.lax.dot_general(
        q, ds, dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    ).astype(q.dtype)
    dv_ref[:] = jax.lax.dot_general(
        do, p.astype(q.dtype), dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    ).astype(q.dtype)


@functools.partial(jax.jit, static_argnames=("tile_heads", "interpret"))
def _attention_bwd_pallas(q, k, v, do, tile_heads: int = 32, interpret: bool = False):
    bh, dh, l = q.shape
    scale = 1.0 / (dh**0.5)
    # Unpadded logical shapes end-to-end (see the forward's note): saves 4
    # padded input copies + 3 sliced output copies per backward call.
    tile = _pick_tile(tile_heads, bh, dh, l, n_io=7, n_lxl=4)

    spec = pl.BlockSpec((tile, dh, l), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    shape = jax.ShapeDtypeStruct((bh, dh, l), q.dtype)
    dq, dk, dv = pl.pallas_call(
        functools.partial(_attn_bwd_kernel, l, scale),
        grid=(bh // tile,),
        in_specs=[spec] * 4,
        out_specs=(spec, spec, spec),
        out_shape=(shape, shape, shape),
        interpret=interpret,
    )(q, k, v, do)
    return dq, dk, dv


def _attention_xla(q, k, v):
    """Plain-XLA reference path in the transposed (BH, Dh, L) layout (also
    the recompute for the backward)."""
    dh = q.shape[1]
    s = jnp.einsum("bdi,bdj->bij", q, k, preferred_element_type=jnp.float32)
    s = s * (1.0 / (dh**0.5))
    p = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("bdj,bij->bdi", v, p.astype(v.dtype)).astype(q.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def _attention(q, k, v, tile_heads, interpret):
    return _attention_fwd_pallas(q, k, v, tile_heads=tile_heads, interpret=interpret)


def _attention_fwd_rule(q, k, v, tile_heads, interpret):
    return (
        _attention_fwd_pallas(q, k, v, tile_heads=tile_heads, interpret=interpret),
        (q, k, v),
    )


def _attention_bwd_rule(tile_heads, interpret, res, g):
    q, k, v = res
    return _attention_bwd_pallas(
        q, k, v, g.astype(q.dtype),
        tile_heads=min(tile_heads, 32), interpret=interpret,
    )


_attention.defvjp(_attention_fwd_rule, _attention_bwd_rule)


def tiny_head_attention(
    query: jax.Array,  # (B, L, H, Dh) — flax MHA layout
    key: jax.Array,
    value: jax.Array,
    tile_heads: int = 128,
    interpret: bool | None = None,
    **unused_kwargs,
):
    """``attention_fn`` drop-in for ``nn.MultiHeadDotProductAttention``.

    Ignores bias/mask kwargs (board attention is dense, dropout 0 —
    reference transformer.py:18-25).
    """
    b, l, h, dh = query.shape

    def fold(t):  # (B, L, H, Dh) -> (BH, Dh, L)
        return jnp.transpose(t, (0, 2, 3, 1)).reshape(b * h, dh, l)

    def unfold(o):  # (BH, Dh, L) -> (B, L, H, Dh)
        return jnp.transpose(o.reshape(b, h, dh, l), (0, 3, 1, 2))

    if interpret is None and jax.default_backend() == "cpu":
        # CPU: skip the (interpreted, slow) kernel — same math via XLA.
        return unfold(_attention_xla(fold(query), fold(key), fold(value)))

    out = _attention(
        fold(query), fold(key), fold(value), tile_heads, bool(interpret)
    )
    return unfold(out)
