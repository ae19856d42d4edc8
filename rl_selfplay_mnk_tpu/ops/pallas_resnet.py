"""Pallas TPU kernel: fused residual block (eval mode, BN pre-folded).

Computes  y = relu( conv2(relu(conv1(x))) + x )  for 3x3 SAME convs on an
MxN board, entirely within VMEM for a tile of boards: patches are built
on-chip from the resident activation (no HBM im2col), both matmuls run on
the MXU back-to-back, and the skip-add/ReLU fuse in between.

Weights arrive in im2col layout (9*C, C) with BatchNorm already folded
(models/fold_bn.py) — eval-mode forwards only.

MEASURED RESULT (v5e, batch 8192, C=32, 9x9 board): 4.29 ms/block vs XLA's
0.385 ms/block — the roll/mask/concat patch construction on 32-wide lanes
swamps the VPU while XLA's native conv keeps the MXU fed. This kernel is
retained as a validated negative experiment (bit-accurate vs the XLA block,
tested in interpret mode): for small-channel convs on tiny boards, XLA's
conv is the right tool and the framework deliberately keeps the model
compute on the XLA path (see PERFORMANCE.md ceiling analysis).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _build_patches(h: jax.Array, m: int, n: int) -> jax.Array:
    """(TB, P, C) -> (TB, P, 9C) 3x3 SAME patches, zero-padded.

    ``P >= M*N`` is the sublane-aligned padded spatial length. Patches are
    built with flat-index circular rolls along the spatial axis plus
    validity masks (Mosaic supports neither 3D<->4D shape casts nor
    unaligned dimension collapses, so the board never un-flattens and the
    spatial axis stays padded)."""
    p_len = h.shape[1]
    pos = jax.lax.broadcasted_iota(jnp.int32, h.shape, 1)
    row = pos // n
    col = pos % n
    parts = []
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            off = dy * n + dx
            rolled = jnp.roll(h, -off % p_len, axis=1) if off else h
            valid = (
                (row + dy >= 0)
                & (row + dy < m)
                & (col + dx >= 0)
                & (col + dx < n)
            )
            parts.append(rolled * valid.astype(h.dtype))
    return jnp.concatenate(parts, axis=-1)


def _matmul3(p: jax.Array, w: jax.Array) -> jax.Array:
    """(TB, MN, K) @ (K, C) -> (TB, MN, C) f32 on the MXU."""
    return jax.lax.dot_general(
        p,
        w,
        dimension_numbers=(((2,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


def _resblock_kernel(m, n, x_ref, w1_ref, b1_ref, w2_ref, b2_ref, out_ref):
    x = x_ref[:]  # (TB, P, C), P = padded spatial length

    p1 = _build_patches(x, m, n)  # (TB, P, 9C)
    h = jnp.maximum(_matmul3(p1, w1_ref[:]) + b1_ref[:], 0.0).astype(x.dtype)

    p2 = _build_patches(h, m, n)
    y = _matmul3(p2, w2_ref[:]) + b2_ref[:] + x.astype(jnp.float32)
    # zero the spatial padding so chained blocks stay clean
    pos = jax.lax.broadcasted_iota(jnp.int32, y.shape, 1)
    y = jnp.where(pos < m * n, y, 0.0)
    out_ref[:] = jnp.maximum(y, 0.0).astype(x.dtype)


@functools.partial(
    jax.jit, static_argnames=("m", "n", "tile_boards", "interpret")
)
def fused_residual_block(
    x: jax.Array,  # (B, M*N, C) activation, channels-last
    w1: jax.Array,  # (9C, C) im2col kernel, BN folded
    b1: jax.Array,  # (C,)
    w2: jax.Array,
    b2: jax.Array,
    m: int,
    n: int,
    tile_boards: int = 128,
    interpret: bool = False,
) -> jax.Array:
    b_, mn, c = x.shape
    assert mn == m * n
    tile = min(tile_boards, b_)
    while tile > 1 and b_ % tile:
        tile //= 2
    grid = (b_ // tile,)

    # Pad the spatial axis to the bf16 sublane tile (16) so in-kernel
    # dimension collapses are aligned; padding is masked inside the kernel.
    p_len = ((mn + 15) // 16) * 16
    if p_len != mn:
        x = jnp.pad(x, ((0, 0), (0, p_len - mn), (0, 0)))

    kernel = functools.partial(_resblock_kernel, m, n)
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (tile, p_len, c), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec((9 * c, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((9 * c, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (tile, p_len, c), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((b_, p_len, c), x.dtype),
        interpret=interpret,
    )(x, w1, b1[None, :], w2, b2[None, :])
    return out[:, :mn, :]


def conv_kernel_to_im2col(kernel: jax.Array) -> jax.Array:
    """flax Conv kernel (3, 3, Cin, Cout) -> (9*Cin, Cout) matching
    ``_build_patches`` channel ordering (dy-major, dx, then cin)."""
    kh, kw, cin, cout = kernel.shape
    assert kh == 3 and kw == 3
    return kernel.reshape(kh * kw * cin, cout)
