"""Where does the transformer update step spend its time?

The bench showed transformer_b_s_w (1 layer, d=128) updating no faster than
transformer_b_s (2 layers, d=56) despite ~3x fewer body FLOPs — the update
is not FLOP bound. This tool times a jitted fwd+bwd+AdamW step on a
synthetic minibatch for ablated variants to attribute the cost:

  python tools/transformer_ablation.py [--batch 8192] [--steps 16]

Variants: full model / XLA attention instead of the Pallas kernel /
heads-only body (num_layers=0) / resnet_b_s for scale.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import optax

from rl_selfplay_mnk_tpu.models import registry as registry_mod
from rl_selfplay_mnk_tpu.models import transformer as tfm_mod
from rl_selfplay_mnk_tpu.ops import pallas_attention


def time_update(module, batch: int, steps: int, obs_shape=(2, 9, 9)) -> float:
    variables = registry_mod.init_network(
        module, obs_shape, jax.random.PRNGKey(0)
    )
    tx = optax.adamw(3e-4, eps=1e-5)
    opt_state = jax.jit(tx.init)(variables["params"])
    obs = jax.random.normal(
        jax.random.PRNGKey(1), (batch,) + obs_shape, jnp.float32
    )

    def loss_fn(params, batch_stats, obs):
        (logits, value), new_bs = module.apply(
            {"params": params, "batch_stats": batch_stats},
            obs,
            train=True,
            mutable=["batch_stats"],
        )
        return jnp.mean(logits**2) + jnp.mean(value**2), new_bs

    @jax.jit
    def step(params, batch_stats, opt_state, obs):
        (loss, new_bs), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params, batch_stats, obs
        )
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, new_bs.get("batch_stats", {}), opt_state, loss

    params, bs = variables["params"], variables.get("batch_stats", {})
    # warmup (compile) + forced fetch so the timed loop doesn't overlap it
    params, bs, opt_state, loss = step(params, bs, opt_state, obs)
    float(loss)
    t0 = time.perf_counter()
    for _ in range(steps):
        params, bs, opt_state, loss = step(params, bs, opt_state, obs)
    float(loss)
    return (time.perf_counter() - t0) / steps * 1e3  # ms/step


def run_bl_preset(args, dtype):
    """Attribute transformer_b_l's update cost (d96 L5 H8 dh12, the slowest
    family member: 8.3k env-steps/s round 1 — VERDICT item 4)."""

    def tfm(**kw):
        base = dict(
            action_dim=81, embed_dim=96, num_layers=5, num_heads=8,
            head_hidden=128, ffn_dim=None, dtype=dtype,
        )
        base.update(kw)
        return tfm_mod.TransformerActorCritic(**base)

    def xla_attention(query, key, value, **kw):
        b, l, h, dh = query.shape

        def fold(t):
            return jnp.transpose(t, (0, 2, 3, 1)).reshape(b * h, dh, l)

        out = pallas_attention._attention_xla(
            fold(query), fold(key), fold(value)
        )
        return jnp.transpose(out.reshape(b, h, dh, l), (0, 3, 1, 2))

    variants = [
        ("b_l full (d96 L5 H8 dh12, pallas)", tfm(), None),
        ("b_l XLA attention", tfm(), xla_attention),
        ("L1 (layer-count scaling)", tfm(num_layers=1), None),
        ("L5 no FFN", tfm(ffn_dim=0), None),
        ("L5 H4 (dh24)", tfm(num_heads=4), None),
        ("L5 H2 (dh48)", tfm(num_heads=2), None),
        ("L5 H1 (dh96)", tfm(num_heads=1), None),
        ("heads only (num_layers=0)", tfm(num_layers=0), None),
    ]
    orig = tfm_mod.tiny_head_attention
    for name, module, attn in variants:
        tfm_mod.tiny_head_attention = attn or orig
        try:
            ms = time_update(module, args.batch, args.steps)
        finally:
            tfm_mod.tiny_head_attention = orig
        print(f"{name:45s} {ms:8.2f} ms/step", flush=True)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=8192)
    p.add_argument("--steps", type=int, default=16)
    p.add_argument("--dtype", default="bfloat16")
    p.add_argument(
        "--preset", default="b_s_w", choices=["b_s_w", "b_l"],
        help="b_l = the 5-layer d96/H8 budget-L shape (round-2 target)",
    )
    args = p.parse_args()
    dtype = jnp.dtype(args.dtype)

    if args.preset == "b_l":
        run_bl_preset(args, dtype)
        return

    def tfm(**kw):
        base = dict(
            action_dim=81, embed_dim=128, num_layers=1, num_heads=8,
            head_hidden=128, ffn_dim=0, dtype=dtype,
        )
        base.update(kw)
        return tfm_mod.TransformerActorCritic(**base)

    variants = {
        "transformer_b_s (d56 L2 ffn4x, pallas attn)": tfm(
            embed_dim=56, num_layers=2, num_heads=4, ffn_dim=None
        ),
        "transformer_b_s_w (d128 L1 no-ffn, pallas attn)": tfm(),
        # the attention kernel cost is ~linear in B*H (each head streams an
        # L-row matmul through the MXU regardless of head_dim) — fewer,
        # fatter heads at the same d should be near-linearly faster:
        "d128 L1 H4 (dh=32)": tfm(num_heads=4),
        "d128 L1 H2 (dh=64)": tfm(num_heads=2),
        "d128 L1 H1 (dh=128)": tfm(num_heads=1),
        "heads only (num_layers=0)": tfm(num_layers=0),
        "resnet_b_s (reference default)": registry_mod.ARCHITECTURE_REGISTRY[
            "resnet_b_s"
        ](81, dtype),
    }
    for name, module in variants.items():
        ms = time_update(module, args.batch, args.steps)
        print(f"{name:50s} {ms:8.2f} ms/step")

    # the same two transformers with the XLA fallback attention math
    orig = tfm_mod.tiny_head_attention

    def xla_attention(query, key, value, **kw):
        b, l, h, dh = query.shape

        def fold(t):
            return jnp.transpose(t, (0, 2, 3, 1)).reshape(b * h, dh, l)

        out = pallas_attention._attention_xla(
            fold(query), fold(key), fold(value)
        )
        return jnp.transpose(out.reshape(b, h, dh, l), (0, 3, 1, 2))

    tfm_mod.tiny_head_attention = xla_attention
    try:
        for name, module in {
            "transformer_b_s (XLA attn)": tfm(
                embed_dim=56, num_layers=2, num_heads=4, ffn_dim=None
            ),
            "transformer_b_s_w (XLA attn)": tfm(),
        }.items():
            ms = time_update(module, args.batch, args.steps)
            print(f"{name:50s} {ms:8.2f} ms/step")
    finally:
        tfm_mod.tiny_head_attention = orig


if __name__ == "__main__":
    main()
