"""True ZeRO sharded-learner update: explicit reduce-scatter / all-gather
epoch programs under ``shard_map`` (the north-star's "sharded learner via
psum/all_gather collectives", BASELINE.json).

The replicated data-parallel update (alg/ppo._update_epochs_impl) lets
GSPMD insert a full gradient all-reduce per minibatch and keeps optimizer
moments replicated. parallel/zero.py shards the moments but — measured on
the virtual mesh — the partitioner still materializes the gradient sum as
a full all-reduce before the shard slice (flatten ops sit between the psum
and the slice, and XLA:CPU runs no reduce-scatter-creator pass). This
module instead hand-schedules the collectives the ZeRO way:

  * each device computes gradients of ITS minibatch shard only (the
    shard-local grouped-shuffle layout guarantees its samples are local);
  * the flat gradient is ``lax.psum_scatter``-ed — each device receives
    only its 1/d slice of the summed gradient (half the all-reduce bytes);
  * global-norm clip = shard-local square-sum + scalar ``lax.psum``;
  * the inner (elementwise) optimizer steps on the 1/d shard — moments
    live sharded, 2N/d per device;
  * the update vector is ``lax.all_gather``-ed and applied to the
    replicated parameters.

Per-minibatch communication: reduce_scatter(N) + all_gather(N) + O(1)
scalars — byte-identical to the single all-reduce it replaces (an
all-reduce IS reduce-scatter + all-gather on a ring), with 2N·(d-1)/d
optimizer HBM and (d-1)/d optimizer FLOPs saved. Loss/metric math matches
alg/ppo bit-for-meaning (same minibatch selection per shard, same
formulas; reductions reassociate across devices, so metrics agree to f32
rounding rather than bitwise).

Constraints (asserted): grouped shuffle with shard_groups == mesh size
(the production multi-chip layout), and a batch-stat-free architecture
(BatchNorm's cross-shard stat sync is GSPMD-managed in the replicated
path; under shard_map it would silently become shard-local). The
transformer families — the 13x13 scale models — are LayerNorm-only and
qualify; BN architectures keep the replicated or parallel/zero.py path.

Watch mode (run.watch parity) is fully supported: per-layer gradient
square-sums and signed-log histograms are recovered from the flat shard
via a static layer-segment map + ``segment_sum`` + psum, reproducing the
per-leaf accumulators of the replicated path.
"""

from __future__ import annotations

import functools
from typing import Any

import jax
import jax.numpy as jnp
import optax
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops.masked import entropy as masked_entropy
from ..ops.masked import log_prob, mask_logits
from ..parallel.mesh import ENV_AXIS
from .ppo import (
    PPOConfig,
    _grad_hist_counts,
    _METRIC_KEYS,
    _train_forward,
)


def _flat_layout(params: Any, n_devices: int):
    """(treedef, shapes, sizes, dtypes, padded_total) for the flat vector."""
    leaves, treedef = jax.tree.flatten(params)
    shapes = tuple(l.shape for l in leaves)
    sizes = tuple(int(jnp.size(l)) for l in leaves)
    dtypes = tuple(l.dtype for l in leaves)
    total = sum(sizes)
    padded = -(-total // n_devices) * n_devices
    return treedef, shapes, sizes, dtypes, padded


def _flatten_tree(tree: Any, padded: int) -> jax.Array:
    flat = jnp.concatenate(
        [l.astype(jnp.float32).ravel() for l in jax.tree.leaves(tree)]
    )
    return jnp.pad(flat, (0, padded - flat.shape[0]))


def _unflatten_vec(vec, treedef, shapes, sizes, dtypes):
    leaves, off = [], 0
    for shape, size, dtype in zip(shapes, sizes, dtypes):
        leaves.append(vec[off:off + size].reshape(shape).astype(dtype))
        off += size
    return jax.tree.unflatten(treedef, leaves)


def zero_opt_init(optimizer, params: Any, mesh: Mesh):
    """Inner-optimizer state over the flat padded parameter vector, sharded
    over the env axis (moments: N/d per device)."""
    _, _, _, _, padded = _flat_layout(params, mesh.devices.size)
    flat = jax.lax.with_sharding_constraint(
        _flatten_tree(params, padded), NamedSharding(mesh, P(ENV_AXIS))
    )
    return optimizer.init(flat)


def _opt_state_specs(opt_state: Any, padded: int):
    """Moment-shaped leaves ride the env axis; counts/scalars replicate."""
    return jax.tree.map(
        lambda l: (
            P(ENV_AXIS)
            if getattr(l, "ndim", 0) == 1 and l.shape == (padded,)
            else P()
        ),
        opt_state,
    )


def zero_update_epochs_impl(
    module,
    config: PPOConfig,
    optimizer,
    mesh: Mesh,
    params: Any,
    opt_state: Any,
    flats: dict,
    entropy_coef: jax.Array,
    epoch_keys: jax.Array,
    sums: dict,
):
    """A chunk of the epoch scan with the ZeRO collective schedule. Drop-in
    replacement for alg/ppo._update_epochs_impl (minus batch_stats — BN-free
    architectures only); same carry contract so host chunking and metric
    finalization are shared."""
    d = mesh.devices.size
    assert config.shuffle == "grouped" and config.shard_groups == d, (
        "zero_update needs the shard-local grouped shuffle over the mesh "
        f"(shuffle={config.shuffle!r}, shard_groups={config.shard_groups}, "
        f"mesh={d})"
    )
    assert config.batch_size % d == 0 and config.total_batch % d == 0
    treedef, shapes, sizes, dtypes, padded = _flat_layout(params, d)
    per = padded // d
    n_groups = config.total_batch // config.group_size
    local_groups = n_groups // d
    mb_groups_local = config.batch_size // config.group_size // d
    local_bs = config.batch_size // d
    global_bs = float(config.batch_size)
    num_minibatches = config.num_minibatches
    n_layers = len(sizes)
    # element -> layer-id map for watch-mode per-layer accumulators
    # (padding elements get segment id n_layers and are dropped)
    seg_full = jnp.concatenate(
        [jnp.full((s,), i, jnp.int32) for i, s in enumerate(sizes)]
        + [jnp.full((padded - sum(sizes),), n_layers, jnp.int32)]
    )

    flats_specs = {k: P(ENV_AXIS) for k in flats}
    sums_specs = jax.tree.map(lambda _: P(), sums)
    state_specs = _opt_state_specs(opt_state, padded)

    @functools.partial(
        shard_map,
        mesh=mesh,
        in_specs=(P(), state_specs, flats_specs, P(), P(), sums_specs),
        out_specs=(P(), state_specs, sums_specs),
        check_vma=False,
    )
    def run(params, opt_state, flats, entropy_coef, epoch_keys, sums):
        my = jax.lax.axis_index(ENV_AXIS)
        seg_shard = jax.lax.dynamic_slice(seg_full, (my * per,), (per,))

        def take(x, idx):
            picked = jnp.take(x, idx, axis=0)
            return picked.reshape((local_bs,) + x.shape[2:])

        def loss_fn(p, idx):
            obs = take(flats["obs"], idx)
            mask = take(flats["mask"], idx)
            actions = take(flats["actions"], idx)
            old_logp = take(flats["old_logp"], idx)
            rets = take(flats["returns"], idx)
            adv = take(flats["adv"], idx)

            logits, value, _ = _train_forward(module, p, {}, obs)
            mlogits = mask_logits(logits, mask)
            new_logp = log_prob(mlogits, actions)
            ent_sum = masked_entropy(mlogits).sum()

            log_ratio = new_logp - old_logp
            ratio = jnp.exp(log_ratio)
            surr1 = ratio * adv
            surr2 = jnp.clip(
                ratio, 1.0 - config.clip_range, 1.0 + config.clip_range
            ) * adv
            # local PARTIAL losses: sum/global_B, so per-device partials sum
            # to the global minibatch means (grad of the partial = this
            # device's contribution; psum_scatter completes the sum)
            actor_p = -jnp.minimum(surr1, surr2).sum() / global_bs
            values = value[:, 0]
            critic_p = jnp.sum((values - rets) ** 2) / global_bs
            ent_p = ent_sum / global_bs
            total = (
                actor_p
                + config.value_coef * critic_p
                + entropy_coef * (-ent_p)
            )
            aux = {
                "actor_loss": actor_p,
                "critic_loss": critic_p,
                "entropy_loss": -ent_p,
                "clip_fraction": (
                    jnp.abs(ratio - 1.0) > config.clip_range
                ).sum() / global_bs,
                "approx_kl": ((ratio - 1.0) - log_ratio).sum() / global_bs,
                # raw moments for the global Bessel variance of returns
                "_ret_sum": rets.sum(),
                "_ret_sq": jnp.sum(rets**2),
            }
            return total, aux

        def mb_body(carry, idx):
            params, opt_state, sums = carry
            (_, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                params, idx
            )
            gflat = _flatten_tree(grads, padded)  # local partial (padded,)
            gshard_raw = jax.lax.psum_scatter(
                gflat, ENV_AXIS, scatter_dimension=0, tiled=True
            )  # summed gradient, this device's (per,) slice
            gnorm = jnp.sqrt(
                jax.lax.psum(jnp.sum(jnp.square(gshard_raw)), ENV_AXIS)
            )
            # optax.clip_by_global_norm: g * clip / max(norm, clip)
            clip = jnp.float32(config.zero_clip_norm)
            gshard = gshard_raw * (clip / jnp.maximum(gnorm, clip))

            pflat = _flatten_tree(params, padded)
            pshard = jax.lax.dynamic_slice(pflat, (my * per,), (per,))
            upd_shard, opt_state = optimizer.update(
                gshard, opt_state, pshard
            )
            upd_full = jax.lax.all_gather(upd_shard, ENV_AXIS, tiled=True)
            params = optax.apply_updates(
                params, _unflatten_vec(upd_full, treedef, shapes, sizes, dtypes)
            )

            # global metric means: psum the local partial sums
            g = {
                k: jax.lax.psum(aux[k], ENV_AXIS)
                for k in (
                    "actor_loss", "critic_loss", "entropy_loss",
                    "clip_fraction", "approx_kl", "_ret_sum", "_ret_sq",
                )
            }
            b = global_bs
            rvar = (g["_ret_sq"] - g["_ret_sum"] ** 2 / b) / (b - 1.0)
            explained = jnp.where(
                rvar > 1e-8, 1.0 - g["critic_loss"] / rvar, 0.0
            )
            metric = {k: g[k] for k in _METRIC_KEYS if k in g}
            metric["grad_norm"] = gnorm
            metric["explained_variance"] = explained
            new_sums = {k: sums[k] + metric[k] for k in _METRIC_KEYS}
            if config.watch:
                # per-layer square-sums of the SUMMED gradient, recovered
                # from the shard by layer segments (replicated-path parity)
                seg_sq = jax.ops.segment_sum(
                    jnp.square(gshard_raw), seg_shard,
                    num_segments=n_layers + 1,
                )[:n_layers]
                seg_sq = jax.lax.psum(seg_sq, ENV_AXIS)
                old = jax.tree.leaves(sums["layer_grad_sq"])
                new_sums["layer_grad_sq"] = jax.tree.unflatten(
                    jax.tree.structure(sums["layer_grad_sq"]),
                    [o + seg_sq[i] for i, o in enumerate(old)],
                )
                if config.watch_hist_bins:
                    nb = 2 * config.watch_hist_bins + 1
                    counts = _grad_hist_counts_rows(
                        gshard_raw, config.watch_hist_bins
                    )  # (per, nb) one-hot rows
                    seg_counts = jax.ops.segment_sum(
                        counts, seg_shard, num_segments=n_layers + 1
                    )[:n_layers]  # (L, nb)
                    seg_counts = jax.lax.psum(seg_counts, ENV_AXIS)
                    oldh = jax.tree.leaves(sums["layer_grad_hist"])
                    new_sums["layer_grad_hist"] = jax.tree.unflatten(
                        jax.tree.structure(sums["layer_grad_hist"]),
                        [o + seg_counts[i] for i, o in enumerate(oldh)],
                    )
            return (params, opt_state, new_sums), None

        def epoch_body(carry, k_epoch):
            # identical permutation semantics to _minibatch_indices'
            # sharded-grouped mode: shard s permutes ITS local groups with
            # split(k_epoch, d)[s]
            k_local = jax.random.split(k_epoch, d)[my]
            perm = jax.random.permutation(k_local, local_groups)
            idx = perm.reshape(num_minibatches, mb_groups_local)
            return jax.lax.scan(mb_body, carry, idx)[0], None

        (params, opt_state, sums), _ = jax.lax.scan(
            epoch_body, (params, opt_state, sums), epoch_keys
        )
        return params, opt_state, sums

    return run(params, opt_state, flats, entropy_coef, epoch_keys, sums)


def _grad_hist_counts_rows(g: jax.Array, bins_per_sign: int) -> jax.Array:
    """Per-ELEMENT one-hot histogram rows (n, 2B+1) in the signed-log
    layout of alg.ppo._grad_hist_counts (which returns the summed counts —
    here the per-row form feeds a layer-segmented sum)."""
    from .ppo import _GRAD_HIST_HI, _GRAD_HIST_LO

    x = g.astype(jnp.float32).ravel()
    span = _GRAD_HIST_HI - _GRAD_HIST_LO
    mag = jnp.log10(jnp.maximum(jnp.abs(x), jnp.float32(1e-30)))
    k = jnp.clip(
        jnp.floor((mag - _GRAD_HIST_LO) / span * bins_per_sign),
        0,
        bins_per_sign - 1,
    ).astype(jnp.int32)
    near_zero = mag < _GRAD_HIST_LO
    idx = jnp.where(
        near_zero,
        bins_per_sign,
        jnp.where(x < 0.0, bins_per_sign - 1 - k, bins_per_sign + 1 + k),
    )
    nb = 2 * bins_per_sign + 1
    return (
        idx[:, None] == jnp.arange(nb, dtype=jnp.int32)[None, :]
    ).astype(jnp.float32)


# Jitted entry: Mesh is hashable, so it rides as a static argument next to
# module/config/optimizer. opt_state+sums are donated (same carry rule as
# ppo.update_epochs); flats persist across chunk calls.
zero_update_epochs = jax.jit(
    zero_update_epochs_impl,
    static_argnames=("module", "config", "optimizer", "mesh"),
    donate_argnames=("opt_state", "sums"),
)


def zero_update_chunked(
    module,
    config: PPOConfig,
    optimizer,
    mesh: Mesh,
    params: Any,
    batch_stats: Any,
    opt_state: Any,
    traj: dict,
    final_obs: dict,
    entropy_coef,
    rng: jax.Array,
):
    """prepare + ZeRO epoch chunks — the sharded-learner twin of
    ppo.update_chunked (same dispatch shape, same return contract)."""
    from .ppo import (
        finalize_metric_sums,
        update_prepare,
        zero_metric_sums,
    )

    assert not jax.tree.leaves(batch_stats), (
        "zero_update supports batch-stat-free architectures only (BN stat "
        "sync is GSPMD-managed in the replicated path)"
    )
    batch_stats, flats = update_prepare(
        module, config, params, batch_stats,
        {k: v for k, v in traj.items() if k != "dones"}, traj["dones"],
        final_obs,
    )
    epoch_keys = jax.random.split(rng, config.ppo_epochs)
    n_chunks = min(config.update_chunks, config.ppo_epochs)
    base, rem = divmod(config.ppo_epochs, n_chunks)
    sums = zero_metric_sums(config, params)
    ec = jnp.asarray(entropy_coef, jnp.float32)
    start = 0
    for i in range(n_chunks):
        size = base + (1 if i < rem else 0)
        params, opt_state, sums = zero_update_epochs(
            module, config, optimizer, mesh, params, opt_state,
            flats, ec, epoch_keys[start : start + size], sums,
        )
        start += size
    return params, batch_stats, opt_state, finalize_metric_sums(config, sums)
