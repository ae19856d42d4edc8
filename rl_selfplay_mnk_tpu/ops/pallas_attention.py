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


def _attn_kernel(l_real, scale, lq_tile, q_ref, k_ref, v_ref, o_ref):
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
    if not lq_tile or lq_tile >= s.shape[1]:
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
        return
    # Overlap pipeline (round-2 VERDICT item 7, MEASURED NEGATIVE at
    # production shapes — default off): softmax and P@V alternate over
    # query-row tiles in an UNROLLED loop — tile t's P@V (MXU) is
    # independent of tile t+1's softmax (VPU), so Mosaic's scheduler can
    # overlap the two units. Row tiles slice the SUBLANE axis of s (cheap);
    # per-tile outputs concatenate back on the output's lane axis. Per-row
    # math is identical to the untiled path, so results are bit-exact.
    # Measured: −17% ONLY against explicitly padded Lp=96 input blocks
    # (tools/attn_kernel_ablation.py); at the production UNPADDED L=81
    # blocks the untiled kernel already runs at the overlapped speed
    # (5.78 vs 5.76 ms at d56/H4 — PERFORMANCE.md "softmax/matmul
    # overlap"), so the two optimizations do not compose.
    outs = []
    for a in range(0, s.shape[1], lq_tile):
        st = s[:, a : a + lq_tile, :]
        st = st - st.max(axis=-1, keepdims=True)
        p = jnp.exp(st)
        p = p / p.sum(axis=-1, keepdims=True)
        outs.append(
            jax.lax.dot_general(
                v,
                p.astype(v.dtype),
                dimension_numbers=(((2,), (2,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            )
        )  # (TBH, Dh, tile)
    o_ref[:] = jnp.concatenate(outs, axis=2).astype(q.dtype)


@functools.partial(
    jax.jit, static_argnames=("tile_heads", "interpret", "lq_tile")
)
def _attention_fwd_pallas(
    q: jax.Array,  # (BH, Dh, L) — transposed head layout
    k: jax.Array,
    v: jax.Array,
    tile_heads: int = 128,
    interpret: bool = False,
    lq_tile: int = 0,
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
        functools.partial(_attn_kernel, l, scale, lq_tile),
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


def _attn_bwd_kernel(
    l_real, scale, lq_tile, q_ref, k_ref, v_ref, do_ref, dq_ref, dk_ref, dv_ref
):
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

    if not lq_tile or lq_tile >= s.shape[1]:
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
        return

    # Query-row-tiled overlap pipeline (see _attn_kernel; MEASURED NEGATIVE
    # at the reference shapes — 12.3 -> 13.3 ms at d56/H4, default off):
    # each tile's VPU phase (softmax recompute, dp*p row-sum, ds
    # elementwise) interleaves with four MXU matmuls of neighbouring tiles.
    # dq rows concatenate; dk/dv contract over Lq, so per-tile
    # contributions accumulate in f32.
    # Bit-exactness caveat: the dk/dv accumulation order changes (tile-major
    # f32 adds instead of one long MXU contraction), so gradients match the
    # untiled kernel only to f32 rounding — the oracle tests compare against
    # XLA at kernel tolerance either way.
    dqs = []
    dk_acc = jnp.zeros(k.shape, jnp.float32)
    dv_acc = jnp.zeros(v.shape, jnp.float32)
    for a in range(0, s.shape[1], lq_tile):
        st = s[:, a : a + lq_tile, :]
        st = st - st.max(axis=-1, keepdims=True)
        p = jnp.exp(st)
        p = p / p.sum(axis=-1, keepdims=True)  # (T, tl, Lk)

        dot = do[:, :, a : a + lq_tile]  # (T, Dh, tl)
        qt = q[:, :, a : a + lq_tile]
        dp = jax.lax.dot_general(
            dot, v, dimension_numbers=(((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )  # (T, tl, Lk)
        row = (dp * p).sum(axis=-1, keepdims=True)
        ds = (p * (dp - row) * scale).astype(q.dtype)  # (T, tl, Lk)

        dqs.append(jax.lax.dot_general(
            k, ds, dimension_numbers=(((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        ))  # (T, Dh, tl)
        dk_acc = dk_acc + jax.lax.dot_general(
            qt, ds, dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )
        dv_acc = dv_acc + jax.lax.dot_general(
            dot, p.astype(q.dtype), dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )
    dq_ref[:] = jnp.concatenate(dqs, axis=2).astype(q.dtype)
    dk_ref[:] = dk_acc.astype(q.dtype)
    dv_ref[:] = dv_acc.astype(q.dtype)


@functools.partial(jax.jit, static_argnames=("tile_heads", "interpret", "lq_tile"))
def _attention_bwd_pallas(
    q, k, v, do, tile_heads: int = 32, interpret: bool = False, lq_tile: int = 0
):
    bh, dh, l = q.shape
    scale = 1.0 / (dh**0.5)
    # Unpadded logical shapes end-to-end (see the forward's note): saves 4
    # padded input copies + 3 sliced output copies per backward call.
    tile = _pick_tile(tile_heads, bh, dh, l, n_io=7, n_lxl=4)

    spec = pl.BlockSpec((tile, dh, l), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    shape = jax.ShapeDtypeStruct((bh, dh, l), q.dtype)
    dq, dk, dv = pl.pallas_call(
        functools.partial(_attn_bwd_kernel, l, scale, lq_tile),
        grid=(bh // tile,),
        in_specs=[spec] * 4,
        out_specs=(spec, spec, spec),
        out_shape=(shape, shape, shape),
        interpret=interpret,
    )(q, k, v, do)
    return dq, dk, dv


# ---------------------------------------------------------------------------
# Packed-head layout kernels (round-2 layout work).
#
# The folded (BH, Dh, L) kernels above need (B, L, H, Dh) <-> (BH, Dh, L)
# transposes around every custom-call, which XLA must materialize in HBM
# because it cannot fuse layout ops into an opaque custom-call boundary —
# measured ~20% of transformer op time (PERFORMANCE.md "Transformer layout
# costs"). These kernels instead consume (B, L, D) blocks, which is a FREE
# reshape of flax's natural (B, L, H, Dh) q/k/v (contiguous collapse of the
# trailing dims — XLA cancels it against the producing projection).
#
# Heads are separated by LANE MASKS, not layout: the per-head score
# contraction over dh<=64 underfills the MXU's 128-deep K axis anyway
# (PERFORMANCE.md "Where transformer time goes": dh=16 fills 12.5% and pays
# for 128), so contracting the full padded D with non-head lanes zeroed
# costs the same MXU passes — and removes every transpose from the graph.
# ---------------------------------------------------------------------------


def _pick_tile_batch(
    requested: int, b: int, l: int, d: int, itemsize: int,
    n_io: int, n_lxl: int, n_acc: int,
) -> int:
    """Largest batch-tile <= requested that divides b and fits the budget.

    n_io: (tile, L, D) I/O blocks (double-buffered by Mosaic);
    n_lxl: live f32 (tile, L, L) score-shaped intermediates;
    n_acc: live f32 (tile, L, D) accumulators/temporaries.
    """
    lp_sub = ((l + 15) // 16) * 16      # sublane padding (bf16 tile)
    lp_lane = ((l + 127) // 128) * 128  # lane padding of the L x L blocks
    dp = ((d + 127) // 128) * 128
    per_b = (
        2 * n_io * lp_sub * dp * itemsize
        + n_lxl * lp_sub * lp_lane * 4
        + n_acc * lp_sub * dp * 4
    )
    tile = min(requested, b)
    while tile > 1 and (b % tile or tile * per_b > _VMEM_BUDGET):
        tile //= 2
    return tile


def _packed_fwd_kernel(l_real, h, dh, q_ref, k_ref, v_ref, o_ref):
    # refs: (TB, L, D) with D = h*dh — heads packed on the lane axis.
    q = q_ref[:]
    k = k_ref[:]
    v = v_ref[:]
    scale = 1.0 / (dh**0.5)
    head_of_lane = jax.lax.broadcasted_iota(jnp.int32, q.shape, 2) // dh
    o = jnp.zeros(q.shape, jnp.float32)
    for head in range(h):
        hmask = head_of_lane == head
        qh = jnp.where(hmask, q, 0)
        s = jax.lax.dot_general(
            qh, k,
            dimension_numbers=(((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )  # (TB, Lq, Lk) — only head-h lanes contribute
        s = s * scale
        col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 2)
        s = jnp.where(col < l_real, s, NEG_INF)
        s = s - s.max(axis=-1, keepdims=True)
        p = jnp.exp(s)
        p = p / p.sum(axis=-1, keepdims=True)
        oh = jax.lax.dot_general(
            p.astype(v.dtype), v,
            dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )  # (TB, Lq, D); valid only on head-h lanes
        o = jnp.where(hmask, oh, o)
    o_ref[:] = o.astype(q.dtype)


def _lane_slice_fwd_kernel(l_real, h, dh, q_ref, k_ref, v_ref, o_ref):
    # refs (TB, L, D): per-head LANE slices contracted directly over the
    # minor axis — no transposes anywhere (experimental variant (c) of the
    # b_l layout study).
    scale = 1.0 / (dh**0.5)
    q = q_ref[:]
    k = k_ref[:]
    v = v_ref[:]
    outs = []
    for head in range(h):
        sl = slice(head * dh, (head + 1) * dh)
        qh = q[:, :, sl]  # (TB, L, dh)
        kh = k[:, :, sl]
        vh = v[:, :, sl]
        s = jax.lax.dot_general(
            qh, kh,
            dimension_numbers=(((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )  # (TB, Lq, Lk)
        s = s * scale
        col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 2)
        s = jnp.where(col < l_real, s, NEG_INF)
        s = s - s.max(axis=-1, keepdims=True)
        p = jnp.exp(s)
        p = p / p.sum(axis=-1, keepdims=True)
        oh = jax.lax.dot_general(
            p.astype(vh.dtype), vh,
            dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )  # (TB, Lq, dh)
        outs.append(oh)
    o_ref[:] = jnp.concatenate(outs, axis=2).astype(q_ref.dtype)


@functools.partial(jax.jit, static_argnames=("h", "dh", "tile_batch", "interpret"))
def _attention_lane_slice_fwd_pallas(
    q, k, v, h: int, dh: int, tile_batch: int = 32, interpret: bool = False
):
    b, l, d = q.shape
    tile = _pick_tile_batch(
        tile_batch, b, l, d, q.dtype.itemsize, n_io=7, n_lxl=2, n_acc=2
    )
    spec = pl.BlockSpec((tile, l, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_lane_slice_fwd_kernel, l, h, dh),
        grid=(b // tile,),
        in_specs=[spec] * 3,
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((b, l, d), q.dtype),
        interpret=interpret,
    )(q, k, v)


def _infold_fwd_kernel(l_real, h, dh, q_ref, k_ref, v_ref, o_ref):
    # refs (TB, L, D) — heads packed on lanes, SAME HBM layout as the packed
    # kernel (a free reshape of flax's (B, L, H, Dh)). One in-VMEM
    # swapaxes per operand puts dh on the SUBLANE axis; per-head sublane
    # slices then run the folded kernel's exact matmuls. This trades the
    # XLA-materialized HBM fold/unfold transposes (measured 24% of
    # transformer_b_l device time — PERFORMANCE.md round-2 b_l study) for
    # VMEM-local shuffles, without the packed kernel's H full-(L,D)
    # lane-mask passes.
    scale = 1.0 / (dh**0.5)
    q = jnp.swapaxes(q_ref[:], 1, 2)  # (TB, D, L)
    k = jnp.swapaxes(k_ref[:], 1, 2)
    v = jnp.swapaxes(v_ref[:], 1, 2)
    outs = []
    for head in range(h):
        sl = slice(head * dh, (head + 1) * dh)
        qh = q[:, sl, :]
        kh = k[:, sl, :]
        vh = v[:, sl, :]
        s = jax.lax.dot_general(
            qh, kh,
            dimension_numbers=(((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )  # (TB, Lq, Lk)
        s = s * scale
        col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 2)
        s = jnp.where(col < l_real, s, NEG_INF)
        s = s - s.max(axis=-1, keepdims=True)
        p = jnp.exp(s)
        p = p / p.sum(axis=-1, keepdims=True)
        oh = jax.lax.dot_general(
            vh, p.astype(vh.dtype),
            dimension_numbers=(((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )  # (TB, dh, Lq)
        outs.append(oh)
    o = jnp.concatenate(outs, axis=1)  # (TB, D, L)
    o_ref[:] = jnp.swapaxes(o, 1, 2).astype(q_ref.dtype)


def _infold_bwd_kernel(
    l_real, h, dh, q_ref, k_ref, v_ref, do_ref, dq_ref, dk_ref, dv_ref
):
    scale = 1.0 / (dh**0.5)
    q = jnp.swapaxes(q_ref[:], 1, 2)  # (TB, D, L)
    k = jnp.swapaxes(k_ref[:], 1, 2)
    v = jnp.swapaxes(v_ref[:], 1, 2)
    do = jnp.swapaxes(do_ref[:], 1, 2)
    dqs, dks, dvs = [], [], []
    for head in range(h):
        sl = slice(head * dh, (head + 1) * dh)
        qh = q[:, sl, :]
        kh = k[:, sl, :]
        vh = v[:, sl, :]
        doh = do[:, sl, :]
        s = jax.lax.dot_general(
            qh, kh, dimension_numbers=(((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )
        s = s * scale
        col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 2)
        s = jnp.where(col < l_real, s, NEG_INF)
        s = s - s.max(axis=-1, keepdims=True)
        p = jnp.exp(s)
        p = p / p.sum(axis=-1, keepdims=True)  # (TB, Lq, Lk)

        dp = jax.lax.dot_general(
            doh, vh, dimension_numbers=(((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )  # (TB, Lq, Lk)
        row = (dp * p).sum(axis=-1, keepdims=True)
        ds = (p * (dp - row) * scale).astype(q_ref.dtype)

        dqs.append(jax.lax.dot_general(
            kh, ds, dimension_numbers=(((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        ))
        dks.append(jax.lax.dot_general(
            qh, ds, dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        ))
        dvs.append(jax.lax.dot_general(
            doh, p.astype(q_ref.dtype),
            dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        ))
    dtype = q_ref.dtype
    dq_ref[:] = jnp.swapaxes(jnp.concatenate(dqs, axis=1), 1, 2).astype(dtype)
    dk_ref[:] = jnp.swapaxes(jnp.concatenate(dks, axis=1), 1, 2).astype(dtype)
    dv_ref[:] = jnp.swapaxes(jnp.concatenate(dvs, axis=1), 1, 2).astype(dtype)


@functools.partial(jax.jit, static_argnames=("h", "dh", "tile_batch", "interpret"))
def _attention_infold_fwd_pallas(
    q: jax.Array,  # (B, L, D)
    k: jax.Array,
    v: jax.Array,
    h: int,
    dh: int,
    tile_batch: int = 32,
    interpret: bool = False,
) -> jax.Array:
    b, l, d = q.shape
    # transposed working copies live alongside the I/O blocks
    tile = _pick_tile_batch(
        tile_batch, b, l, d, q.dtype.itemsize, n_io=7, n_lxl=2, n_acc=2
    )
    spec = pl.BlockSpec((tile, l, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_infold_fwd_kernel, l, h, dh),
        grid=(b // tile,),
        in_specs=[spec] * 3,
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((b, l, d), q.dtype),
        interpret=interpret,
    )(q, k, v)


@functools.partial(jax.jit, static_argnames=("h", "dh", "tile_batch", "interpret"))
def _attention_infold_bwd_pallas(
    q, k, v, do, h: int, dh: int, tile_batch: int = 32, interpret: bool = False
):
    b, l, d = q.shape
    tile = _pick_tile_batch(
        tile_batch, b, l, d, q.dtype.itemsize, n_io=12, n_lxl=4, n_acc=3
    )
    spec = pl.BlockSpec((tile, l, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    shape = jax.ShapeDtypeStruct((b, l, d), q.dtype)
    return pl.pallas_call(
        functools.partial(_infold_bwd_kernel, l, h, dh),
        grid=(b // tile,),
        in_specs=[spec] * 4,
        out_specs=(spec, spec, spec),
        out_shape=(shape, shape, shape),
        interpret=interpret,
    )(q, k, v, do)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6))
def _attention_infold(q, k, v, h, dh, tile_batch, interpret):
    return _attention_infold_fwd_rule(q, k, v, h, dh, tile_batch, interpret)[0]


def _attention_infold_fwd_rule(q, k, v, h, dh, tile_batch, interpret):
    fwd = _batch_partitioned(
        _attention_infold_fwd_pallas, 3, 1,
        h=h, dh=dh, tile_batch=tile_batch, interpret=interpret,
    )
    return fwd(q, k, v), (q, k, v)


def _attention_infold_bwd_rule(h, dh, tile_batch, interpret, res, g):
    q, k, v = res
    bwd = _batch_partitioned(
        _attention_infold_bwd_pallas, 4, 3,
        h=h, dh=dh, tile_batch=tile_batch, interpret=interpret,
    )
    return bwd(q, k, v, g.astype(q.dtype))


_attention_infold.defvjp(_attention_infold_fwd_rule, _attention_infold_bwd_rule)


@functools.partial(jax.jit, static_argnames=("h", "dh", "tile_batch", "interpret"))
def _attention_packed_fwd_pallas(
    q: jax.Array,  # (B, L, D) — free reshape of flax's (B, L, H, Dh)
    k: jax.Array,
    v: jax.Array,
    h: int,
    dh: int,
    tile_batch: int = 32,
    interpret: bool = False,
) -> jax.Array:
    b, l, d = q.shape
    tile = _pick_tile_batch(
        tile_batch, b, l, d, q.dtype.itemsize, n_io=4, n_lxl=2, n_acc=2
    )
    spec = pl.BlockSpec((tile, l, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_packed_fwd_kernel, l, h, dh),
        grid=(b // tile,),
        in_specs=[spec] * 3,
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((b, l, d), q.dtype),
        interpret=interpret,
    )(q, k, v)


def _packed_bwd_kernel(
    l_real, h, dh, q_ref, k_ref, v_ref, do_ref, dq_ref, dk_ref, dv_ref
):
    # All refs (TB, L, D). Per head: recompute p in VMEM, then the standard
    # softmax-attention gradients via full-D masked contractions. dq needs a
    # lane select (ds @ k has garbage on foreign lanes); dk/dv accumulate —
    # their q/do operand is already lane-masked so foreign lanes are zero.
    q = q_ref[:]
    k = k_ref[:]
    v = v_ref[:]
    do = do_ref[:]
    scale = 1.0 / (dh**0.5)
    head_of_lane = jax.lax.broadcasted_iota(jnp.int32, q.shape, 2) // dh
    dq = jnp.zeros(q.shape, jnp.float32)
    dk = jnp.zeros(q.shape, jnp.float32)
    dv = jnp.zeros(q.shape, jnp.float32)
    for head in range(h):
        hmask = head_of_lane == head
        qh = jnp.where(hmask, q, 0)
        s = jax.lax.dot_general(
            qh, k,
            dimension_numbers=(((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )
        s = s * scale
        col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 2)
        s = jnp.where(col < l_real, s, NEG_INF)
        s = s - s.max(axis=-1, keepdims=True)
        p = jnp.exp(s)
        p = p / p.sum(axis=-1, keepdims=True)  # (TB, Lq, Lk)

        doh = jnp.where(hmask, do, 0)
        dp = jax.lax.dot_general(
            doh, v,
            dimension_numbers=(((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )  # (TB, Lq, Lk)
        row = (dp * p).sum(axis=-1, keepdims=True)
        ds = (p * (dp - row) * scale).astype(q.dtype)

        dqh = jax.lax.dot_general(
            ds, k,
            dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )  # (TB, Lq, D)
        dq = jnp.where(hmask, dqh, dq)
        dk = dk + jax.lax.dot_general(
            ds, qh,
            dimension_numbers=(((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )  # (TB, Lk, D)
        dv = dv + jax.lax.dot_general(
            p.astype(q.dtype), doh,
            dimension_numbers=(((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )
    dq_ref[:] = dq.astype(q.dtype)
    dk_ref[:] = dk.astype(q.dtype)
    dv_ref[:] = dv.astype(q.dtype)


@functools.partial(jax.jit, static_argnames=("h", "dh", "tile_batch", "interpret"))
def _attention_packed_bwd_pallas(
    q, k, v, do, h: int, dh: int, tile_batch: int = 32, interpret: bool = False
):
    b, l, d = q.shape
    tile = _pick_tile_batch(
        tile_batch, b, l, d, q.dtype.itemsize, n_io=7, n_lxl=4, n_acc=4
    )
    spec = pl.BlockSpec((tile, l, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    shape = jax.ShapeDtypeStruct((b, l, d), q.dtype)
    return pl.pallas_call(
        functools.partial(_packed_bwd_kernel, l, h, dh),
        grid=(b // tile,),
        in_specs=[spec] * 4,
        out_specs=(spec, spec, spec),
        out_shape=(shape, shape, shape),
        interpret=interpret,
    )(q, k, v, do)


# --- mesh partitioning -----------------------------------------------------
# pallas_call is an opaque custom-call: without a rule, GSPMD/Shardy must
# all-gather batch-sharded q/k/v around every attention (measured in the
# round-2 HLO audit — tests/test_pallas_sharding.py). Every kernel here is
# embarrassingly parallel over dim 0 (the grid tiles it; L and D stay
# whole), so each entry is wrapped in custom_partitioning with the SDY rule
# "batch shardable, L/D replicated": each device runs the kernel on its own
# shard, zero communication — on the CPU test mesh and on a pod alike.


@functools.lru_cache(maxsize=None)
def _batch_partitioned(pallas_entry, n_in: int, n_out: int, **statics):
    from jax.experimental.custom_partitioning import custom_partitioning

    def impl(*args):
        return pallas_entry(*args, **statics)

    f = custom_partitioning(impl)

    def partition(mesh, arg_shapes, result_shape):
        arg_sh = tuple(s.sharding for s in arg_shapes)
        out_sh = jax.tree.map(lambda s: s.sharding, result_shape)
        return mesh, impl, out_sh, arg_sh

    ins = ", ".join(["b x y"] * n_in)
    outs = ", ".join(["b x y"] * n_out)
    f.def_partition(
        partition=partition,
        sharding_rule=f"{ins} -> {outs}",
        need_replication_factors=("x", "y"),
    )
    return f


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6))
def _attention_packed(q, k, v, h, dh, tile_batch, interpret):
    return _attention_packed_fwd_rule(q, k, v, h, dh, tile_batch, interpret)[0]


def _attention_packed_fwd_rule(q, k, v, h, dh, tile_batch, interpret):
    fwd = _batch_partitioned(
        _attention_packed_fwd_pallas, 3, 1,
        h=h, dh=dh, tile_batch=tile_batch, interpret=interpret,
    )
    return fwd(q, k, v), (q, k, v)


def _attention_packed_bwd_rule(h, dh, tile_batch, interpret, res, g):
    q, k, v = res
    bwd = _batch_partitioned(
        _attention_packed_bwd_pallas, 4, 3,
        h=h, dh=dh, tile_batch=tile_batch, interpret=interpret,
    )
    return bwd(q, k, v, g.astype(q.dtype))


_attention_packed.defvjp(_attention_packed_fwd_rule, _attention_packed_bwd_rule)


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
    return _attention_fwd_rule(q, k, v, tile_heads, interpret)[0]


def _attention_fwd_rule(q, k, v, tile_heads, interpret):
    fwd = _batch_partitioned(
        _attention_fwd_pallas, 3, 1, tile_heads=tile_heads, interpret=interpret
    )
    return fwd(q, k, v), (q, k, v)


def _attention_bwd_rule(tile_heads, interpret, res, g):
    q, k, v = res
    bwd = _batch_partitioned(
        _attention_bwd_pallas, 4, 3,
        tile_heads=min(tile_heads, 32), interpret=interpret,
    )
    return bwd(q, k, v, g.astype(q.dtype))


_attention.defvjp(_attention_fwd_rule, _attention_bwd_rule)


def tiny_head_attention(
    query: jax.Array,  # (B, L, H, Dh) — flax MHA layout
    key: jax.Array,
    value: jax.Array,
    tile_batch: int = 32,
    interpret: bool | None = None,
    **unused_kwargs,
):
    """``attention_fn`` drop-in for ``nn.MultiHeadDotProductAttention``.

    For fat heads (dh >= 32 — the `_w` speed tiers) this uses the
    packed-head (B, L, D) kernels: the only layout ops around the
    custom-calls are contiguous reshapes, which XLA cancels against the
    neighbouring q/k/v/out projections (the fold/unfold transposes of the
    earlier (BH, Dh, L) path cost ~20% of transformer op time —
    PERFORMANCE.md "Transformer layout costs"; measured end-to-end +27%
    on transformer_b_s_w). For many tiny heads (dh <= 16: the reference
    d56/H4 and d96/H8 shapes) the packed kernels' per-head lane-mask and
    f32-accumulator VPU work exceeds the transpose savings (measured -5%
    end-to-end on transformer_b_s), so those keep the folded path.

    Ignores bias/mask kwargs (board attention is dense, dropout 0 —
    reference transformer.py:18-25).
    """
    b, l, h, dh = query.shape
    d = h * dh

    if interpret is None and jax.default_backend() == "cpu":
        # CPU: skip the (interpreted, slow) kernel — same math via XLA.
        def fold(t):  # (B, L, H, Dh) -> (BH, Dh, L)
            return jnp.transpose(t, (0, 2, 3, 1)).reshape(b * h, dh, l)

        out = _attention_xla(fold(query), fold(key), fold(value))
        return jnp.transpose(out.reshape(b, h, dh, l), (0, 3, 1, 2))

    if dh < 32 and not interpret:
        # interpret None (default) or an explicit interpret=False both mean
        # "real kernels on hardware" here — only forced-interpret (True)
        # may take the infold path below.
        # Tiny heads keep the folded kernels + XLA transposes: every
        # in-kernel alternative measured WORSE on hardware (round-2 b_l
        # layout study, PERFORMANCE.md): packed lane-masking +9%, in-VMEM
        # fold (_attention_infold) 2.3x, per-head lane slices
        # (_attention_lane_slice_fwd_pallas) 3.4x — Mosaic lane<->sublane
        # relayouts inside the kernel cost far more than the ~8% the
        # XLA-side HBM transposes cost around it. Both losers are kept as
        # measured negative experiments.
        return tiny_head_attention_folded(query, key, value)

    if dh < 32:
        # forced-interpret (CPU mesh tests): exercise the packed-interface
        # kernel path under sharding
        out = _attention_infold(
            query.reshape(b, l, d),
            key.reshape(b, l, d),
            value.reshape(b, l, d),
            h, dh, tile_batch, bool(interpret),
        )
        return out.reshape(b, l, h, dh)

    out = _attention_packed(
        query.reshape(b, l, d),
        key.reshape(b, l, d),
        value.reshape(b, l, d),
        h, dh, tile_batch, bool(interpret),
    )
    return out.reshape(b, l, h, dh)


def tiny_head_attention_folded(
    query: jax.Array,  # (B, L, H, Dh) — flax MHA layout
    key: jax.Array,
    value: jax.Array,
    tile_heads: int = 128,
    interpret: bool | None = None,
    **unused_kwargs,
):
    """Earlier integration path: folded (BH, Dh, L) kernels plus explicit
    fold/unfold transposes. Kept for A/B measurement and as a fallback."""
    b, l, h, dh = query.shape

    def fold(t):  # (B, L, H, Dh) -> (BH, Dh, L)
        return jnp.transpose(t, (0, 2, 3, 1)).reshape(b * h, dh, l)

    def unfold(o):  # (BH, Dh, L) -> (B, L, H, Dh)
        return jnp.transpose(o.reshape(b, h, dh, l), (0, 3, 1, 2))

    if interpret is None and jax.default_backend() == "cpu":
        return unfold(_attention_xla(fold(query), fold(key), fold(value)))

    out = _attention(
        fold(query), fold(key), fold(value), tile_heads, bool(interpret)
    )
    return unfold(out)
