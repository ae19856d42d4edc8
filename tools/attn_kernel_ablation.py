"""In-kernel cost attribution for the tiny-head attention forward.

attention_microbench.py put the kernel at ~9.4 ms fwd for 38 GFLOP at
batch 8192 x H8/dh16 (~2% MXU) — this ablates the kernel body to find
whether the matmuls (K=dh contraction underfill) or the VPU softmax
(f32 exp/max/sum over L x L) is binding:

  python tools/attn_kernel_ablation.py [--batch 8192] [--heads 8]
"""

from __future__ import annotations

import argparse
import functools
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from rl_selfplay_mnk_tpu.ops import pallas_attention as pa


def make_kernel(body):
    def kernel(l_real, scale, q_ref, k_ref, v_ref, o_ref):
        q, k, v = q_ref[:], k_ref[:], v_ref[:]
        o_ref[:] = body(l_real, scale, q, k, v).astype(q.dtype)

    return kernel


def scores(q, k, scale):
    s = jax.lax.dot_general(
        q, k, dimension_numbers=(((1,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )
    return s * scale


def pv(v, p):
    return jax.lax.dot_general(
        v, p.astype(v.dtype),
        dimension_numbers=(((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )


def body_full(l_real, scale, q, k, v):
    s = scores(q, k, scale)
    col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 2)
    s = jnp.where(col < l_real, s, pa.NEG_INF)
    s = s - s.max(axis=-1, keepdims=True)
    p = jnp.exp(s)
    p = p / p.sum(axis=-1, keepdims=True)
    return pv(v, p)


def body_matmuls_only(l_real, scale, q, k, v):
    return pv(v, scores(q, k, scale))


def body_no_max(l_real, scale, q, k, v):
    # LN'd inputs bound |s| <= scale*|q||k|; skip the max-subtraction pass
    s = scores(q, k, scale)
    col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 2)
    p = jnp.where(col < l_real, jnp.exp(s), 0.0)
    return pv(v, p / p.sum(axis=-1, keepdims=True))


def body_exp_only(l_real, scale, q, k, v):
    return pv(v, jnp.exp(scores(q, k, scale)))


def body_mask_only(l_real, scale, q, k, v):
    s = scores(q, k, scale)
    col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 2)
    return pv(v, jnp.where(col < l_real, s, 0.0))


def make_overlap_body(lq_tile: int):
    """Lq-tiled softmax/matmul pipeline (round-2 VERDICT item 7): the score
    matmul runs whole (one MXU op), then softmax and P@V alternate over
    query-row tiles in an UNROLLED loop — tile t's P@V (MXU) is independent
    of tile t+1's softmax (VPU), so Mosaic's scheduler may overlap the two
    units instead of serializing the ~40%-of-kernel VPU phase after the
    matmuls. Row tiles slice the SUBLANE axis (cheap at multiples of 8);
    per-tile outputs concatenate back on the lane axis."""

    def body(l_real, scale, q, k, v):
        s = scores(q, k, scale)  # (T, Lq, Lk)
        col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 2)
        s = jnp.where(col < l_real, s, pa.NEG_INF)
        outs = []
        for a in range(0, s.shape[1], lq_tile):
            st = s[:, a : a + lq_tile, :]
            st = st - st.max(axis=-1, keepdims=True)
            p = jnp.exp(st)
            p = p / p.sum(axis=-1, keepdims=True)
            outs.append(pv(v, p))  # (T, Dh, tl)
        return jnp.concatenate(outs, axis=2)

    return body


def make_overlap_tiled_scores_body(lq_tile: int):
    """Fully Lq-tiled pipeline: scores, softmax AND P@V all per tile — three
    independent chains per tile for the scheduler, and no full LxL f32
    intermediate alive (smaller VMEM footprint; q is lane-sliced, which may
    relayout — that cost is what this variant measures)."""

    def body(l_real, scale, q, k, v):
        outs = []
        for a in range(0, q.shape[2], lq_tile):
            qt = q[:, :, a : a + lq_tile]
            st = scores(qt, k, scale)  # (T, tl, Lk)
            col = jax.lax.broadcasted_iota(jnp.int32, st.shape, 2)
            st = jnp.where(col < l_real, st, pa.NEG_INF)
            st = st - st.max(axis=-1, keepdims=True)
            p = jnp.exp(st)
            p = p / p.sum(axis=-1, keepdims=True)
            outs.append(pv(v, p))
        return jnp.concatenate(outs, axis=2)

    return body


def build(body, q, l, tile, interpret=False):
    bh, dh, lp = q.shape
    f = pl.pallas_call(
        functools.partial(make_kernel(body), l, 1.0 / dh**0.5),
        grid=(bh // tile,),
        in_specs=[
            pl.BlockSpec((tile, dh, lp), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
        ] * 3,
        out_specs=pl.BlockSpec(
            (tile, dh, lp), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((bh, dh, lp), q.dtype),
        interpret=interpret,
    )
    return jax.jit(f)


def run(body, q, k, v, l, tile):
    f = build(body, q, l, tile)
    out = f(q, k, v)
    float(jnp.float32(out[0, 0, 0]))
    t0 = time.perf_counter()
    for _ in range(16):
        out = f(q, k, v)
    float(jnp.float32(out[0, 0, 0]))
    return (time.perf_counter() - t0) / 16 * 1e3


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=8192)
    p.add_argument("--heads", type=int, default=8)
    p.add_argument("--d", type=int, default=128)
    p.add_argument("--l", type=int, default=81)
    args = p.parse_args()
    dh = args.d // args.heads
    bh = args.batch * args.heads
    l, lp = args.l, ((args.l + 15) // 16) * 16
    key = jax.random.PRNGKey(0)
    q = jax.random.normal(key, (bh, dh, lp), jnp.bfloat16)
    tile = pa._pick_tile(128, bh, dh, lp, n_io=4, n_lxl=2)
    print(f"bh={bh} dh={dh} lp={lp} tile={tile}")
    for name, body in [
        ("full kernel", body_full),
        ("matmuls only (no mask/softmax)", body_matmuls_only),
        ("matmuls + mask", body_mask_only),
        ("matmuls + exp", body_exp_only),
        ("softmax without max-subtract", body_no_max),
        ("overlap pipeline lq_tile=32", make_overlap_body(32)),
        ("overlap pipeline lq_tile=16", make_overlap_body(16)),
        ("overlap pipeline lq_tile=8", make_overlap_body(8)),
        ("overlap fully-tiled lq_tile=32", make_overlap_tiled_scores_body(32)),
        ("overlap fully-tiled lq_tile=16", make_overlap_tiled_scores_body(16)),
    ]:
        print(f"{name:34s} {run(body, q, q, q, l, tile):8.2f} ms")


if __name__ == "__main__":
    main()
