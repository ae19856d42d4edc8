"""Line-incidence operator for K-in-a-row win detection.

The reference detects wins by convolving the mover's plane with four kernels
(1xK row of ones, Kx1 column, KxK identity, KxK flipped identity) and
thresholding at K - 0.1 (reference src/env/torch_vector_mnk_env.py:26-32,
106-119). On TPU the idiomatic formulation is a single MXU matmul: enumerate
every possible winning line once at trace time, build a {0,1} incidence
matrix ``L`` of shape (M*N, n_lines) where ``L[cell, line] = 1`` iff the cell
lies on that line, and compute per-board line occupancy counts as

    counts = plane_flat @ L          # (E, M*N) @ (M*N, n_lines) -> (E, n_lines)

A board wins iff any count reaches K. The matmul has a large batch dimension
(num_envs), maps directly onto the systolic array, and XLA fuses the
threshold/any-reduction into its epilogue.
"""

from __future__ import annotations

import functools

import numpy as np


@functools.lru_cache(maxsize=None)
def line_cells(m: int, n: int, k: int) -> tuple[tuple[int, ...], ...]:
    """Enumerate all K-in-a-row lines as tuples of flat cell indices.

    Directions: horizontal, vertical, main diagonal, anti-diagonal — the same
    four the reference's conv kernels cover.
    """
    lines: list[tuple[int, ...]] = []
    for r in range(m):
        for c in range(n):
            # horizontal →
            if c + k <= n:
                lines.append(tuple(r * n + (c + i) for i in range(k)))
            # vertical ↓
            if r + k <= m:
                lines.append(tuple((r + i) * n + c for i in range(k)))
            # main diagonal ↘
            if r + k <= m and c + k <= n:
                lines.append(tuple((r + i) * n + (c + i) for i in range(k)))
            # anti diagonal ↙
            if r + k <= m and c - k + 1 >= 0:
                lines.append(tuple((r + i) * n + (c - i) for i in range(k)))
    return tuple(lines)


@functools.lru_cache(maxsize=None)
def line_matrix(m: int, n: int, k: int) -> np.ndarray:
    """(M*N, n_lines) float32 incidence matrix, cached per board geometry."""
    lines = line_cells(m, n, k)
    mat = np.zeros((m * n, len(lines)), dtype=np.float32)
    for j, cells in enumerate(lines):
        for cell in cells:
            mat[cell, j] = 1.0
    return mat


def num_lines(m: int, n: int, k: int) -> int:
    return len(line_cells(m, n, k))
