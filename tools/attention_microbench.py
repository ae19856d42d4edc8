"""Attribute the transformer encoder-layer cost at training batch sizes.

tools/transformer_ablation.py showed the d=128 L1 encoder layer costs
~30 ms fwd+bwd at batch 8192 nearly independent of head count, while the
body-free model costs 3.8 ms — so the binding cost is per-layer fixed work
(layout transposes, layernorm, projections), not the attention grid. This
times each candidate in isolation (jitted fwd+bwd, scalar-fetch fenced —
CLAUDE.md measurement notes):

  python tools/attention_microbench.py [--batch 8192] [--heads 8]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import flax.linen as nn

from rl_selfplay_mnk_tpu.ops import pallas_attention as pa


def time_fn(fn, *args, steps=16):
    f = jax.jit(fn)
    out = f(*args)
    jax.block_until_ready(out)
    float(jnp.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[0])
    t0 = time.perf_counter()
    for _ in range(steps):
        out = f(*args)
    float(jnp.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[0])
    return (time.perf_counter() - t0) / steps * 1e3


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=8192)
    p.add_argument("--heads", type=int, default=8)
    p.add_argument("--d", type=int, default=128)
    p.add_argument("--l", type=int, default=81)
    args = p.parse_args()
    b, h, d, l = args.batch, args.heads, args.d, args.l
    dh = d // h
    key = jax.random.PRNGKey(0)
    dt = jnp.bfloat16

    x = jax.random.normal(key, (b, l, d), dt)  # token activations
    qf = jax.random.normal(key, (b, l, h, dh), dt)  # flax MHA layout
    qt = jax.random.normal(key, (b * h, dh, l), dt)  # folded kernel layout

    def grad_of(fn):
        return lambda *a: jax.grad(lambda *aa: jnp.sum(fn(*aa).astype(jnp.float32)))(*a)

    # 1. attention kernel alone, already-folded layout
    attn_folded = lambda q: pa._attention(q, q, q, 128, False)
    # 2a. earlier integration path: folded kernel + fold/unfold transposes
    attn_flax = lambda q: pa.tiny_head_attention_folded(q, q, q)
    # 2b. packed-head integration path (free reshapes, lane-masked heads)
    attn_packed = lambda q: pa.tiny_head_attention(q, q, q)
    # 3. the transposes alone (fold + unfold round trip)
    def fold_roundtrip(q):
        t = jnp.transpose(q, (0, 2, 3, 1)).reshape(b * h, dh, l)
        t = t * 1.000001  # keep XLA from cancelling the round trip
        return jnp.transpose(t.reshape(b, h, dh, l), (0, 3, 1, 2))
    # 4. layernorm on tokens
    ln = nn.LayerNorm(dtype=dt)
    ln_vars = ln.init(key, x)
    ln_fn = lambda xx: ln.apply(ln_vars, xx)
    # 5. qkv + out projection
    dense = nn.Dense(3 * d, dtype=dt)
    dv = dense.init(key, x)
    out_p = nn.Dense(d, dtype=dt)
    ov = out_p.init(key, x)
    proj = lambda xx: out_p.apply(ov, dense.apply(dv, xx)[..., :d])

    rows = [
        ("attn kernel fwd (folded layout)", attn_folded, qt),
        ("attn kernel fwd+bwd (folded)", grad_of(attn_folded), qt),
        ("attn fwd (flax layout, fold+unfold)", attn_flax, qf),
        ("attn fwd+bwd (flax layout)", grad_of(attn_flax), qf),
        ("attn fwd (packed-head layout)", attn_packed, qf),
        ("attn fwd+bwd (packed-head layout)", grad_of(attn_packed), qf),
        ("fold/unfold transposes alone", fold_roundtrip, qf),
        ("fold/unfold fwd+bwd", grad_of(fold_roundtrip), qf),
        ("layernorm fwd+bwd", grad_of(ln_fn), x),
        ("qkv+out projections fwd+bwd", grad_of(proj), x),
    ]
    for name, fn, arg in rows:
        print(f"{name:42s} {time_fn(fn, arg):8.2f} ms")


if __name__ == "__main__":
    main()
