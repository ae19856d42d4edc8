"""Parameter accounting across the model zoo.

Parity with reference src/count_params.py:15-194: per-layer and per-type
parameter breakdowns for one model, plus a cross-architecture comparison
table.

Usage:
    python -m rl_selfplay_mnk_tpu.count_params --arch resnet_b_s --m 9 --n 9
    python -m rl_selfplay_mnk_tpu.count_params --all --m 9 --n 9
"""

from __future__ import annotations

import argparse
from typing import Dict

import jax
import numpy as np

from .models.registry import (
    ARCHITECTURE_REGISTRY,
    create_model_from_architecture,
)


def param_counts(name: str, m: int, n: int) -> Dict[str, int]:
    """Flat {path: count} for one architecture.

    jax.eval_shape: shape accounting needs no device work — an actual init
    would compile and run an orthogonal-init program per architecture
    (10-40 s each over the remote-TPU tunnel)."""
    module, _ = create_model_from_architecture(name, (2, m, n), m * n)
    import jax.numpy as jnp

    dummy = jnp.zeros((1, 2, m, n), jnp.float32)
    variables = jax.eval_shape(
        lambda r: module.init(r, dummy, train=False), jax.random.PRNGKey(0)
    )
    flat = jax.tree_util.tree_flatten_with_path(variables["params"])[0]
    out = {}
    for path, leaf in flat:
        key = "/".join(
            p.key if hasattr(p, "key") else str(p) for p in path
        )
        out[key] = int(np.prod(leaf.shape))
    return out


def print_model_breakdown(name: str, m: int, n: int) -> int:
    counts = param_counts(name, m, n)
    total = sum(counts.values())
    print(f"\n=== {name} @ {m}x{n} — {total:,} parameters ===")
    by_group: Dict[str, int] = {}
    for path, cnt in counts.items():
        group = path.split("/")[0]
        by_group[group] = by_group.get(group, 0) + cnt
    for group, cnt in sorted(by_group.items(), key=lambda kv: -kv[1]):
        print(f"  {group:<40} {cnt:>10,}  ({100 * cnt / total:5.1f}%)")
    return total


def print_comparison(m: int, n: int) -> None:
    print(f"\n=== Architecture comparison @ {m}x{n} ===")
    rows = []
    for name in sorted(ARCHITECTURE_REGISTRY):
        counts = param_counts(name, m, n)
        rows.append((name, sum(counts.values())))
    width = max(len(r[0]) for r in rows)
    for name, total in sorted(rows, key=lambda r: r[1]):
        print(f"  {name:<{width}} {total:>12,}")


def main(argv=None) -> None:
    parser = argparse.ArgumentParser(description="Count model parameters")
    parser.add_argument("--arch", default=None)
    parser.add_argument("--all", action="store_true")
    parser.add_argument("--m", type=int, default=9)
    parser.add_argument("--n", type=int, default=9)
    args = parser.parse_args(argv)

    if args.all or args.arch is None:
        print_comparison(args.m, args.n)
    if args.arch:
        print_model_breakdown(args.arch, args.m, args.n)


if __name__ == "__main__":
    main()
