"""PPO self-play learner: rollout + GAE + clipped-surrogate update, jitted.

Capability parity with the reference ``PPOAgent`` (src/alg/ppo.py:27-262)
and ``RolloutBuffer`` (src/alg/rollout_buffer.py:4-113), re-designed
TPU-first:

  * The reference's Python rollout loop (256 iterations of
    forward/sample/env.step, ppo.py:93-122) is ONE ``lax.scan`` compiled
    into a single XLA program — no host round-trips inside the hot loop.
  * The RolloutBuffer's pre-allocated tensors + ``add()`` copies become the
    scan's stacked outputs; no copies at all.
  * The epochs x shuffled-minibatch update (ppo.py:180-191) is a nested
    ``lax.scan`` with ``jax.random.permutation`` index gathers.
  * AMP autocast + GradScaler (ppo.py:194, 219-226) are replaced by bf16
    compute / f32 params+optimizer — the TPU-native mixed-precision recipe
    (no loss scaling needed for bf16's exponent range).
  * Losses and diagnostics match the reference exactly: clipped surrogate
    (ppo.py:201-208), value MSE vs Tanh-bounded critic (:210), entropy bonus
    (:199, 211), 0.5 global-norm clip (:222), clip_fraction / approx-KL /
    explained-variance (:240-252), buffer-global advantage normalization
    with Bessel-corrected std (rollout_buffer.py:94-97).

Timing contract (reference ppo.py:79, 126-140): ``rollout_time`` covers
sampling+env stepping only; bootstrap+GAE+update run in the learn phase.
``fps`` = n_steps * num_envs / rollout_time.
"""

from __future__ import annotations

import dataclasses
import functools
import time
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
import optax

from ..env.mnk_env import EnvConfig
from ..ops.masked import entropy as masked_entropy
from ..ops.masked import log_prob, mask_logits, masked_sample
from ..selfplay.wrapper import selfplay_reset, selfplay_step
from .gae import compute_gae


@dataclasses.dataclass(frozen=True)
class PPOConfig:
    """Static PPO hyperparameters (hashable -> usable as a jit static arg).

    Defaults mirror reference ``PPOAgent.__init__`` (ppo.py:29-47).
    ``shuffle``:
      * "global"  — exact reference semantics: one permutation over the
        flattened (num_envs * n_steps) batch per epoch. Row-level random
        gathers — fine on CPU/GPU, latency-bound (~1us/row DMA) on TPU.
      * "grouped" — TPU-native: the flat buffer is treated as contiguous
        groups of ``group_size`` samples and the per-epoch permutation
        shuffles GROUPS; each minibatch gathers batch_size/group_size
        large contiguous chunks (big DMAs, ~10x faster than row gathers).
        With time-major flattening a group = ``group_size`` adjacent envs
        at one timestep — envs are independent games, so within-group
        samples are nearly i.i.d. and the shuffle is statistically
        equivalent to "global". With ``shard_groups`` > 1 (an env-sharded
        mesh) the flatten is shard-major (each device's rows stay local —
        the global transpose is a per-device reshape) and the group
        permutation is drawn independently per shard, so group gathers
        never cross shard boundaries: the same mode serves 1 chip and a
        pod with identical per-device behavior (weak-scaling sweeps stay
        apples-to-apples — ADVICE.md round-1 medium finding).
      * "tiled"   — communication-free multi-chip variant of "global":
        independent ROW permutations within ``shard_groups`` contiguous
        env blocks, so minibatch gathers never cross shard boundaries on
        an env-sharded mesh. Statistically equivalent; row gathers are
        latency-bound on TPU — prefer "grouped" there.
    """

    env: EnvConfig
    num_envs: int
    n_steps: int
    gamma: float = 0.99
    gae_lambda: float = 0.95
    clip_range: float = 0.2
    ppo_epochs: int = 4
    batch_size: int = 64
    value_coef: float = 0.5
    shuffle: str = "global"
    shard_groups: int = 1
    group_size: int = 128
    # Update dispatch granularity: 1 = the whole update (bootstrap + GAE +
    # ppo_epochs x minibatch SGD) is ONE XLA program; N>1 = the epoch scan
    # is split into N host-dispatched chunks (bit-identical math — the
    # per-epoch permutation keys do not depend on the chunking). Use when a
    # single update program's execution would exceed an environment's RPC
    # deadline (the axon TPU tunnel kills executions around ~90s; the
    # 5-layer transformers' 4-epoch update at 256 minibatches is >70s).
    update_chunks: int = 1
    # Parity with the reference's ``run.watch(network)`` (train.py:94):
    # when True the update additionally accumulates PER-LAYER squared
    # gradient norms on-device (a handful of tiny fused reductions per
    # minibatch) and reports sqrt(mean-over-updates) per layer in
    # TrainingMetrics.layer_grad_norms. Cadence is the host loop's concern
    # (train.py watch_interval).
    watch: bool = False
    # Gradient histograms — the other half of ``run.watch`` (wandb logs
    # gradient histograms, reference train.py:94). When watch=True and
    # this is > 0, the update also accumulates a fixed-bin signed-log
    # histogram of every layer's gradient values on-device: bins_per_sign
    # magnitude bins per sign spanning |g| in [1e-10, 1e2) plus a near-zero
    # bin (2*B+1 bins total, static edges — accumulation across the
    # minibatch scan requires data-independent bin edges, unlike the
    # one-shot parameter histograms which can use jnp.histogram).
    watch_hist_bins: int = 0
    # True = ZeRO sharded-learner update (alg/zero_epochs.py): explicit
    # reduce-scatter/all-gather epoch programs under shard_map — optimizer
    # moments and step sharded over the env mesh axis. Needs a >1-device
    # mesh, the shard-local grouped shuffle, a batch-stat-free architecture
    # and an ELEMENTWISE optimizer (global-norm clip runs in-body with
    # zero_clip_norm; do not chain optax.clip_by_global_norm).
    zero_update: bool = False
    zero_clip_norm: float = 0.5
    # >0 = per-block finished-episode accounting: the env batch is treated
    # as ``fin_blocks`` contiguous blocks (the mixed-opponent layout of
    # selfplay.policies.make_block_pooled_policy) and the rollout's ``fin``
    # accumulators come back as (fin_blocks,) vectors instead of scalars.
    # This is what lets league matchmaking attribute each opponent block's
    # OWN outcome to its pool member instead of folding the aggregate
    # iteration reward into every drawn member (round-3 VERDICT weakness 5).
    fin_blocks: int = 0
    # Loop-structure knobs for the update's nested scans (round-4 VERDICT
    # item 6: ~5% of the bench-shape update is loop-carry copies XLA's
    # conservative scan buffer assignment inserts). epoch_unroll unrolls
    # the OUTER epoch scan (trip count = epochs per chunk, so compile cost
    # is bounded); mb_unroll > 1 unrolls the minibatch scan by that factor
    # (any factor — lax.scan emits a remainder epilogue when it does not
    # divide the trip count). Same math either way — scan unrolling is a
    # scheduling choice, pinned by test_ppo unroll-equivalence.
    epoch_unroll: bool = False
    mb_unroll: int = 1

    @property
    def total_batch(self) -> int:
        return self.num_envs * self.n_steps

    @property
    def num_minibatches(self) -> int:
        assert self.total_batch % self.batch_size == 0, (
            "num_envs * n_steps must be divisible by batch_size "
            f"({self.total_batch} % {self.batch_size})"
        )
        return self.total_batch // self.batch_size

    @property
    def updates_per_iteration(self) -> int:
        return self.ppo_epochs * self.num_minibatches


def pick_group_size(batch_size: int, target: int = 128) -> int:
    """Largest power-of-two divisor of ``batch_size`` not exceeding
    ``target`` — the "grouped" shuffle's DMA chunk length."""
    g = 1
    while g * 2 <= target and batch_size % (g * 2) == 0:
        g *= 2
    return g


@dataclasses.dataclass
class TrainingMetrics:
    """Per-iteration metrics; field-for-field parity with reference
    ``TrainingMetrics`` (ppo.py:11-24)."""

    mean_reward: float
    mean_length: float
    actor_loss: float
    critic_loss: float
    entropy_loss: float
    grad_norm: float
    clip_fraction: float
    explained_variance: float
    approx_kl: float
    fps: float
    rollout_time: float
    learn_time: float
    # watch mode (PPOConfig.watch): {"Layer_0/kernel": rms-grad-norm, ...}
    layer_grad_norms: Optional[dict] = None
    # PPOConfig.fin_blocks > 0: per-opponent-block mean finished-episode
    # reward, one entry per block (None where a block finished no episode
    # this iteration — no outcome to attribute).
    block_rewards: Optional[list] = None


# ---------------------------------------------------------------------------
# pure programs
# ---------------------------------------------------------------------------


def _train_forward(module, params, batch_stats, observation):
    """Train-mode forward: batch-stat BN + running-stat update (the
    reference keeps the network in train mode for rollout, bootstrap and
    update forwards alike — ppo.py:97, 131, 195)."""
    (logits, value), updated = module.apply(
        {"params": params, "batch_stats": batch_stats},
        observation,
        train=True,
        mutable=["batch_stats"],
    )
    return logits, value, updated.get("batch_stats", batch_stats)


def rollout_impl(
    module,
    config: PPOConfig,
    opponent_apply: Callable,
    params: Any,
    batch_stats: Any,
    opponent_params: Any,
    sp_state,
    obs: dict,
    ep_rew: jax.Array,
    ep_len: jax.Array,
    rng: jax.Array,
):
    """Collect ``n_steps`` vectorized self-play steps (reference ppo.py:93-122).

    ``ep_rew``/``ep_len`` are the per-env in-progress episode accumulators;
    the reference stores them on the agent and carries them ACROSS learn()
    calls (ppo.py:81-89 ``self._current_ep_reward/_current_ep_len``), so
    episodes spanning an iteration boundary report their full length —
    they are threaded in and out here for the same semantics.

    Returns (sp_state, obs, batch_stats, traj, fin, (ep_rew, ep_len), rng')
    where traj is a dict of (T, E, ...) arrays and fin = (finished_reward_sum,
    finished_length_sum, finished_count) for the reference's mean episode
    metrics (ppo.py:110-120, 150-151).
    """

    def body(carry, _):
        sp_state, obs, batch_stats, rng, ep_rew, ep_len, fin = carry
        rng, k_sample, k_step = jax.random.split(rng, 3)
        logits, value, batch_stats = _train_forward(
            module, params, batch_stats, obs["observation"]
        )
        mlogits = mask_logits(logits, obs["action_mask"])
        actions = masked_sample(k_sample, mlogits)
        logp = log_prob(mlogits, actions)
        sp_state, next_obs, rewards, dones = selfplay_step(
            config.env, opponent_apply, opponent_params, sp_state, actions, k_step
        )
        ep_rew = ep_rew + rewards
        ep_len = ep_len + 1.0
        d = dones.astype(jnp.float32)
        if config.fin_blocks:
            # Per-opponent-block sums: block i = envs [i*E/B, (i+1)*E/B)
            # (the make_block_pooled_policy layout). A (B,) stat-scale
            # reduction — on an env-sharded mesh this is the same tiny
            # all-reduce class as the scalar fin.
            def finsum(x):
                return x.reshape(config.fin_blocks, -1).sum(axis=1)
        else:
            finsum = jnp.sum
        fin = (
            fin[0] + finsum(ep_rew * d),
            fin[1] + finsum(ep_len * d),
            fin[2] + finsum(d),
        )
        ep_rew = ep_rew * (1.0 - d)
        ep_len = ep_len * (1.0 - d)
        out = {
            # Board planes are exactly 0/1 — store the (T, E, 2, M, N)
            # trajectory as uint8 (4x less HBM than f32 for the largest
            # buffer; exact, since every model casts obs to its compute
            # dtype on entry). At 8192 envs this is the difference between
            # the 5-layer transformers fitting HBM in the update and the
            # worker OOM-crashing.
            "obs": obs["observation"].astype(jnp.uint8),
            "mask": obs["action_mask"],
            "actions": actions,
            "log_probs": logp,
            "rewards": rewards,
            "values": value[:, 0],
            "dones": dones,
        }
        return (sp_state, next_obs, batch_stats, rng, ep_rew, ep_len, fin), out

    fin_shape = (config.fin_blocks,) if config.fin_blocks else ()
    fin0 = (jnp.zeros(fin_shape, jnp.float32),) * 3
    (sp_state, obs, batch_stats, rng, ep_rew, ep_len, fin), traj = jax.lax.scan(
        body,
        (sp_state, obs, batch_stats, rng, ep_rew, ep_len, fin0),
        None,
        length=config.n_steps,
    )
    return sp_state, obs, batch_stats, traj, fin, (ep_rew, ep_len), rng


# Jitted entry (host-driven loops); ``rollout_impl`` stays callable from
# inside larger programs (alg/fused.py scans whole iterations around it).
rollout = jax.jit(
    rollout_impl,
    static_argnames=("module", "config", "opponent_apply"),
    donate_argnames=("sp_state", "obs", "ep_rew", "ep_len"),
)


def _minibatch_indices(config: PPOConfig, rng: jax.Array) -> jax.Array:
    """Per-epoch shuffled index matrix.

    (num_minibatches, batch_size) row indices for "global"/"tiled", or
    (num_minibatches, batch_size // group_size) GROUP indices for "grouped".
    """
    if config.shuffle == "grouped":
        n_groups = config.total_batch // config.group_size
        mb_groups = config.batch_size // config.group_size
        if config.shard_groups > 1:
            # Shard-local group shuffle: shard s owns group block
            # [s*per, (s+1)*per) of the shard-major flatten (see
            # _update_prepare_impl); each minibatch takes mb_groups/d
            # groups from every shard. Indices are returned PER-SHARD —
            # (num_minibatches, d, mb_groups/d) LOCAL group ids — so the
            # minibatch gather is a batched gather whose batch axis is the
            # shard axis: GSPMD partitions it with zero communication
            # (a flat global gather would lower to a masked all-reduce of
            # every minibatch — measured in the round-2 HLO audit).
            d = config.shard_groups
            assert n_groups % d == 0 and mb_groups % d == 0, (
                f"grouped shuffle over {d} shards needs group counts "
                f"divisible by the shard count (total {n_groups}, "
                f"per-minibatch {mb_groups})"
            )
            per = n_groups // d
            keys = jax.random.split(rng, d)
            perms = jax.vmap(lambda k: jax.random.permutation(k, per))(keys)
            mb = mb_groups // d
            # (d, per) -> (d, num_minibatches, mb) -> (num_minibatches, d, mb)
            return perms.reshape(d, config.num_minibatches, mb).transpose(
                1, 0, 2
            )
        perm = jax.random.permutation(rng, n_groups)
        return perm.reshape(config.num_minibatches, mb_groups)
    n = config.total_batch
    if config.shuffle == "tiled" and config.shard_groups > 1:
        g = config.shard_groups
        assert n % g == 0 and config.batch_size % g == 0
        per_group = n // g
        keys = jax.random.split(rng, g)
        perms = jax.vmap(
            lambda k: jax.random.permutation(k, per_group)
        )(keys)  # (G, n/G)
        perms = perms + jnp.arange(g)[:, None] * per_group
        # minibatch j takes batch_size/g consecutive entries from each group
        mb = config.batch_size // g
        idx = (
            perms.reshape(g, config.num_minibatches, mb)
            .transpose(1, 0, 2)
            .reshape(config.num_minibatches, config.batch_size)
        )
        return idx
    perm = jax.random.permutation(rng, n)
    return perm.reshape(config.num_minibatches, config.batch_size)


_METRIC_KEYS = (
    "actor_loss",
    "critic_loss",
    "entropy_loss",
    "grad_norm",
    "clip_fraction",
    "approx_kl",
    "explained_variance",
)


def zero_metric_sums(config: "PPOConfig" = None, params: Any = None) -> dict:
    sums = {k: jnp.zeros((), jnp.float32) for k in _METRIC_KEYS}
    if config is not None and config.watch:
        sums["layer_grad_sq"] = jax.tree.map(
            lambda p: jnp.zeros((), jnp.float32), params
        )
        if config.watch_hist_bins:
            nb = 2 * config.watch_hist_bins + 1
            sums["layer_grad_hist"] = jax.tree.map(
                lambda p: jnp.zeros((nb,), jnp.float32), params
            )
    return sums


# Signed-log gradient-histogram bin layout (PPOConfig.watch_hist_bins):
# |g| decade range covered by the magnitude bins; values below 10^LO land
# in the central near-zero bin, values above 10^HI clamp into the outermost
# magnitude bin.
_GRAD_HIST_LO = -10.0
_GRAD_HIST_HI = 2.0


def grad_hist_edges(bins_per_sign: int) -> list:
    """Static bin edges (value space) for the signed-log gradient
    histograms: [-10^HI ... -10^LO, 10^LO ... 10^HI], 2*B+2 edges."""
    step = (_GRAD_HIST_HI - _GRAD_HIST_LO) / bins_per_sign
    mags = [10.0 ** (_GRAD_HIST_LO + i * step) for i in range(bins_per_sign + 1)]
    return [-m for m in reversed(mags)] + mags


def _grad_hist_counts(g: jax.Array, bins_per_sign: int) -> jax.Array:
    """Bin one gradient leaf into the static signed-log layout. One
    compare-and-reduce per bin (TPU-friendly; no scatter)."""
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
    onehot = idx[:, None] == jnp.arange(nb, dtype=jnp.int32)[None, :]
    return jnp.sum(onehot, axis=0, dtype=jnp.float32)


def tree_path_norms(tree: Any) -> dict:
    """Flatten a pytree of scalars/arrays into {"Conv_0/kernel": float-array}
    with '/'-joined key paths (the wandb watch key layout)."""
    flat, _ = jax.tree_util.tree_flatten_with_path(tree)
    out = {}
    for path, leaf in flat:
        name = "/".join(
            str(getattr(p, "key", getattr(p, "idx", p))) for p in path
        )
        out[name] = leaf
    return out


def _update_prepare_impl(
    module,
    config: PPOConfig,
    params: Any,
    batch_stats: Any,
    traj: dict,
    dones: jax.Array,
    final_obs: dict,
):
    """Epoch-independent update prefix (one XLA program): bootstrap value,
    GAE, buffer-global advantage normalization, minibatch-layout flatten.

    ``dones`` is split out of ``traj`` so that the jitted entry can donate
    ``traj`` usefully: every donated leaf then has a size-matched program
    output (obs->obs, mask->mask, actions->actions, log_probs->old_logp,
    rewards->returns, values->adv) and becomes an XLA buffer donor, letting
    the compiler reuse the trajectory's HBM for the flats instead of holding
    both live. ``dones`` has no size-matched output (it is consumed by GAE
    only), so donating it would just trigger the "donated buffers were not
    usable" warning with zero benefit."""

    # Bootstrap value for GAE (ppo.py:131-133); train-mode forward like the
    # reference (network stays in train mode).
    _, last_value, batch_stats = _train_forward(
        module, params, batch_stats, final_obs["observation"]
    )
    advantages, returns = compute_gae(
        traj["rewards"],
        traj["values"],
        dones,
        last_value[:, 0],
        config.gamma,
        config.gae_lambda,
    )

    grouped = config.shuffle == "grouped"
    if grouped:
        assert config.total_batch % config.group_size == 0
        assert config.batch_size % config.group_size == 0
        n_groups = config.total_batch // config.group_size

        if config.shard_groups > 1:
            # Shard-major, then time-major flatten: group block s holds
            # exactly shard s's (T, E/d) slice, so on an env-sharded mesh
            # the global (T,d,E/d)->(d,T,E/d) transpose moves no bytes —
            # each device just reshapes its local block — and the
            # shard-local permutation (_minibatch_indices) keeps every
            # group gather on-device. Groups remain "adjacent envs at one
            # timestep" whenever group_size divides E/d.
            d = config.shard_groups

            def flat(x):
                t, e = x.shape[0], x.shape[1]
                y = jnp.swapaxes(
                    x.reshape((t, d, e // d) + x.shape[2:]), 0, 1
                )
                return y.reshape((n_groups, config.group_size) + x.shape[2:])

        else:
            # Time-major flatten (no transpose): row t*E+e, so a contiguous
            # group of ``group_size`` rows = adjacent envs at one timestep.
            # The buffers are then viewed as (n_groups, group_size, ...) and
            # minibatches gather whole groups — large contiguous DMAs
            # instead of latency-bound row gathers.
            def flat(x):
                return x.reshape(
                    (n_groups, config.group_size) + x.shape[2:]
                )

    else:
        # Flatten env-major so an env-sharded mesh keeps each env's samples
        # on its own shard: (T, E, ...) -> (E*T, ...).
        def flat(x):
            return jnp.swapaxes(x, 0, 1).reshape(
                (config.total_batch,) + x.shape[2:]
            )

    # Buffer-global advantage normalization with Bessel-corrected std
    # (rollout_buffer.py:94-97; torch .std() is ddof=1).
    advantages = (advantages - advantages.mean()) / (
        advantages.std(ddof=1) + 1e-8
    )

    return batch_stats, {
        "obs": flat(traj["obs"]),
        "mask": flat(traj["mask"]),
        "actions": flat(traj["actions"]),
        "old_logp": flat(traj["log_probs"]),
        "returns": flat(returns),
        "adv": flat(advantages),
    }


def _update_epochs_impl(
    module,
    config: PPOConfig,
    optimizer,
    params: Any,
    batch_stats: Any,
    opt_state: Any,
    flats: dict,
    entropy_coef: jax.Array,
    epoch_keys: jax.Array,
    sums: dict,
):
    """A chunk of the epoch scan (one XLA program): one epoch of minibatch
    SGD per key in ``epoch_keys``. Scanning a subset of the keys and
    carrying (params, batch_stats, opt_state, sums) across calls is
    bit-identical to scanning them all in one program — the permutation
    key of epoch i is epoch_keys[i] either way."""
    grouped = config.shuffle == "grouped"
    b_obs = flats["obs"]
    b_mask = flats["mask"]
    b_actions = flats["actions"]
    b_old_logp = flats["old_logp"]
    b_returns = flats["returns"]
    b_adv = flats["adv"]

    sharded_grouped = grouped and config.shard_groups > 1

    def loss_fn(params, batch_stats, idx):
        def take(x):
            if sharded_grouped:
                # idx: (d, mb) LOCAL group ids; x: (d*per, group, ...)
                # shard-major. Batched gather over the sharded shard axis —
                # provably communication-free under GSPMD.
                d = config.shard_groups
                xs = x.reshape((d, x.shape[0] // d) + x.shape[1:])
                picked = jax.vmap(lambda b, ii: jnp.take(b, ii, axis=0))(
                    xs, idx
                )
                return picked.reshape((config.batch_size,) + x.shape[2:])
            picked = jnp.take(x, idx, axis=0)
            return picked.reshape((config.batch_size,) + x.shape[2:]) if grouped \
                else picked

        obs = take(b_obs)
        mask = take(b_mask)
        actions = take(b_actions)
        old_logp = take(b_old_logp)
        rets = take(b_returns)
        adv = take(b_adv)

        logits, value, batch_stats = _train_forward(module, params, batch_stats, obs)
        mlogits = mask_logits(logits, mask)
        new_logp = log_prob(mlogits, actions)
        ent = masked_entropy(mlogits).mean()

        log_ratio = new_logp - old_logp
        ratio = jnp.exp(log_ratio)
        surr1 = ratio * adv
        surr2 = jnp.clip(ratio, 1.0 - config.clip_range, 1.0 + config.clip_range) * adv
        actor_loss = -jnp.minimum(surr1, surr2).mean()

        values = value[:, 0]
        critic_loss = jnp.mean((values - rets) ** 2)
        entropy_loss = -ent
        total = (
            actor_loss
            + config.value_coef * critic_loss
            + entropy_coef * entropy_loss
        )

        clip_frac = (jnp.abs(ratio - 1.0) > config.clip_range).mean()
        approx_kl = ((ratio - 1.0) - log_ratio).mean()
        rvar = rets.var(ddof=1)
        explained_var = jnp.where(rvar > 1e-8, 1.0 - critic_loss / rvar, 0.0)
        aux = {
            "batch_stats": batch_stats,
            "actor_loss": actor_loss,
            "critic_loss": critic_loss,
            "entropy_loss": entropy_loss,
            "clip_fraction": clip_frac,
            "approx_kl": approx_kl,
            "explained_variance": explained_var,
        }
        return total, aux

    def mb_body(carry, idx):
        params, batch_stats, opt_state, sums = carry
        (_, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params, batch_stats, idx
        )
        grad_norm = optax.global_norm(grads)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        batch_stats = aux["batch_stats"]
        aux["grad_norm"] = grad_norm
        new_sums = {k: sums[k] + aux[k] for k in _METRIC_KEYS}
        if config.watch:
            new_sums["layer_grad_sq"] = jax.tree.map(
                lambda s, g: s + jnp.sum(jnp.square(g.astype(jnp.float32))),
                sums["layer_grad_sq"],
                grads,
            )
            if config.watch_hist_bins:
                new_sums["layer_grad_hist"] = jax.tree.map(
                    lambda h, g: h + _grad_hist_counts(
                        g, config.watch_hist_bins
                    ),
                    sums["layer_grad_hist"],
                    grads,
                )
        return (params, batch_stats, opt_state, new_sums), None

    def epoch_body(carry, k_epoch):
        params, batch_stats, opt_state, sums = carry
        idx = _minibatch_indices(config, k_epoch)
        (params, batch_stats, opt_state, sums), _ = jax.lax.scan(
            mb_body, (params, batch_stats, opt_state, sums), idx,
            unroll=config.mb_unroll,
        )
        return (params, batch_stats, opt_state, sums), None

    (params, batch_stats, opt_state, sums), _ = jax.lax.scan(
        epoch_body, (params, batch_stats, opt_state, sums), epoch_keys,
        unroll=epoch_keys.shape[0] if config.epoch_unroll else 1,
    )
    return params, batch_stats, opt_state, sums


def update_impl(
    module,
    config: PPOConfig,
    optimizer,
    params: Any,
    batch_stats: Any,
    opt_state: Any,
    traj: dict,
    final_obs: dict,
    entropy_coef: jax.Array,
    rng: jax.Array,
):
    """Bootstrap + GAE + ppo_epochs x minibatch SGD (reference ppo.py:131-135,
    168-262). One XLA program (see PPOConfig.update_chunks for the
    host-chunked dispatch of the same math)."""
    batch_stats, flats = _update_prepare_impl(
        module, config, params, batch_stats,
        {k: v for k, v in traj.items() if k != "dones"}, traj["dones"],
        final_obs,
    )
    epoch_keys = jax.random.split(rng, config.ppo_epochs)
    params, batch_stats, opt_state, sums = _update_epochs_impl(
        module, config, optimizer, params, batch_stats, opt_state,
        flats, entropy_coef, epoch_keys, zero_metric_sums(config, params),
    )
    return params, batch_stats, opt_state, finalize_metric_sums(config, sums)


def finalize_metric_sums(config: PPOConfig, sums: dict) -> dict:
    """Average the per-update metric sums; per-layer grad accumulators
    become RMS-over-updates gradient norms (watch mode)."""
    n_updates = config.updates_per_iteration
    metrics = {k: sums[k] / n_updates for k in _METRIC_KEYS}
    if config.watch:
        metrics["layer_grad_norms"] = jax.tree.map(
            lambda s: jnp.sqrt(s / n_updates), sums["layer_grad_sq"]
        )
        if config.watch_hist_bins:
            # raw counts over every update this iteration (not averaged —
            # a histogram's natural accumulation is summation)
            metrics["layer_grad_hists"] = sums["layer_grad_hist"]
    return metrics


# Jitted entry for callers that want the whole update as ONE XLA program.
# params/batch_stats are deliberately NOT donated: opponent-pool and
# benchmark snapshots alias those buffers across iterations. traj is NOT
# donated here: none of this program's outputs size-match the (T, E, ...)
# trajectory leaves, so the donation would be unusable (warned and ignored
# by XLA) — the host loop routes through ``update_chunked`` instead, where
# the prepare program CAN reuse the trajectory's HBM for the flats.
update = jax.jit(
    update_impl,
    static_argnames=("module", "config", "optimizer"),
    donate_argnames=("opt_state",),
)

# Chunked-dispatch entries (the host-loop default; PPOConfig.update_chunks
# splits the epoch scan further): the prepare program runs once per
# iteration — donating traj, whose leaves all have size-matched flats
# outputs, so XLA reuses the trajectory's HBM — then the epoch scan runs as
# one or more ``update_epochs`` calls. ``flats`` persists across calls (not
# donated; it is the training data every epoch re-reads); params/batch_stats
# keep the no-donation rule above.
update_prepare = jax.jit(
    _update_prepare_impl,
    static_argnames=("module", "config"),
    donate_argnames=("traj",),
)
update_epochs = jax.jit(
    _update_epochs_impl,
    static_argnames=("module", "config", "optimizer"),
    donate_argnames=("opt_state", "sums"),
)


def update_chunked(
    module,
    config: PPOConfig,
    optimizer,
    params: Any,
    batch_stats: Any,
    opt_state: Any,
    traj: dict,
    final_obs: dict,
    entropy_coef,
    rng: jax.Array,
):
    """Same math as the monolithic ``update`` dispatched as
    1 + update_chunks programs (prepare, then epoch chunks), so no single
    execution outlives an RPC deadline (PPOConfig.update_chunks) and the
    trajectory's HBM is reclaimed for the flats (traj donation in the
    prepare program — see _update_prepare_impl).
    Bit-identical: epoch i's permutation key is epoch_keys[i] under either
    dispatch (pinned by test_chunked_update_matches_monolithic_bitwise and
    the fused step-dispatch equivalence tests). Shared by PPOLearner and
    the fused step dispatch (alg/fused.train_step_iteration)."""
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
        params, batch_stats, opt_state, sums = update_epochs(
            module,
            config,
            optimizer,
            params,
            batch_stats,
            opt_state,
            flats,
            ec,
            epoch_keys[start : start + size],
            sums,
        )
        start += size
    return params, batch_stats, opt_state, finalize_metric_sums(config, sums)


@functools.partial(jax.jit, static_argnames=("bins",))
def _param_stats_jit(params: Any, bins: int = 0):
    """Per-leaf L2 norms and optional fixed-bin histograms, one program
    (a per-leaf eager loop would pay one tunnel round trip per layer)."""
    f32 = lambda p: p.astype(jnp.float32)
    norms = jax.tree.map(lambda p: jnp.sqrt(jnp.sum(jnp.square(f32(p)))), params)
    hists = None
    if bins:
        def hist(p):
            counts, edges = jnp.histogram(f32(p).ravel(), bins=bins)
            return {"counts": counts, "edges": edges}

        hists = jax.tree.map(hist, params)
    return norms, hists


# ---------------------------------------------------------------------------
# host-side orchestration
# ---------------------------------------------------------------------------


class PPOLearner:
    """Host facade: owns train state and drives the two jitted phases.

    Mirrors the reference agent's ``learn(vec_env) -> TrainingMetrics``
    surface (ppo.py:78-166) but the "vec_env" is baked in as pure functions
    and the opponent arrives per-call as (apply_fn, params) — swapping
    opponents costs a pytree substitution, never a recompile (as long as the
    apply fn object is reused).
    """

    def __init__(
        self,
        module,
        config: PPOConfig,
        optimizer,
        variables: dict,
        rng: jax.Array,
        opt_state: Any = None,
        mesh: Any = None,
    ):
        self.module = module
        self.config = config
        self.optimizer = optimizer
        self.params = variables["params"]
        self.batch_stats = variables.get("batch_stats", {})
        if config.zero_update:
            assert mesh is not None, "zero_update needs a device mesh"
        self.opt_state = (
            self._init_opt_state(mesh) if opt_state is None else opt_state
        )
        self.rng = rng
        self.iteration = 0
        self._sp_state = None
        self._obs = None
        # In-progress per-env episode accumulators, carried across learn()
        # calls like the reference's self._current_ep_reward/_current_ep_len
        # (ppo.py:81-89) so boundary-spanning episodes report full lengths.
        self._ep_rew = None
        self._ep_len = None
        self.mesh = mesh
        if mesh is not None:
            from ..parallel.mesh import replicate

            self.params = replicate(self.params, mesh)
            self.batch_stats = replicate(self.batch_stats, mesh)
            self.opt_state = replicate(self.opt_state, mesh)
            # The RNG key must be a GLOBAL replicated array too: eager
            # jax.random.split keeps whatever placement the key has, and a
            # host-local single-device key cannot be serialized by orbax in
            # a multi-process run (cooperative checkpoints would fail —
            # caught by test_topology_change_resume, round 3).
            self.rng = replicate(self.rng, mesh)

    def _init_opt_state(self, mesh: Any = None):
        """Fresh optimizer state: over the params tree normally, over the
        env-sharded flat vector for the ZeRO update (zero_epochs)."""
        if self.config.zero_update:
            from .zero_epochs import zero_opt_init

            return jax.jit(
                zero_opt_init, static_argnames=("optimizer", "mesh")
            )(self.optimizer, self.params, mesh if mesh is not None else self.mesh)
        return jax.jit(self.optimizer.init)(self.params)

    @property
    def variables(self) -> dict:
        return {"params": self.params, "batch_stats": self.batch_stats}

    def reset_envs(self, opponent_apply: Callable, opponent_params: Any) -> None:
        self.rng, k = jax.random.split(self.rng)
        self._sp_state, self._obs = jax.jit(
            selfplay_reset, static_argnames=("cfg", "opponent_apply", "num_envs")
        )(self.config.env, opponent_apply, opponent_params, self.config.num_envs, k)
        # Two distinct buffers — both are donated to the rollout, and jax
        # rejects donating the same buffer twice.
        self._ep_rew = jnp.zeros((self.config.num_envs,), jnp.float32)
        self._ep_len = jnp.zeros((self.config.num_envs,), jnp.float32)
        if self.mesh is not None:
            from ..parallel.mesh import shard_batched

            e = self.config.num_envs
            self._sp_state = shard_batched(self._sp_state, self.mesh, e)
            self._obs = shard_batched(self._obs, self.mesh, e)
            self._ep_rew = shard_batched(self._ep_rew, self.mesh, e)
            self._ep_len = shard_batched(self._ep_len, self.mesh, e)

    def recover(self) -> list:
        """Restore learner invariants after a failed dispatch.

        The jitted phases donate device state (sp_state/obs/ep accumulators
        to the rollout, opt_state to the update); an exception after
        dispatch (e.g. an RPC deadline kill on a remote backend) can leave
        those buffers deleted, and the reference-parity log-and-continue
        loop (train.py, reference :162-164) would then fail every later
        iteration with "donated buffer was deleted". This probes each
        stateful buffer and rebuilds what was lost: env state is dropped
        (lazily re-reset by the next learn() — a legal env transition),
        a dead optimizer state is re-initialized from params (losing the
        moments — logged by the caller). params/batch_stats are never
        donated, so training itself continues from the last good values.
        Returns the names of recovered components (empty = nothing to do).
        """

        def dead(tree) -> bool:
            return any(
                getattr(leaf, "is_deleted", lambda: False)()
                for leaf in jax.tree.leaves(tree)
            )

        recovered = []
        if self._sp_state is not None and dead(
            (self._sp_state, self._obs, self._ep_rew, self._ep_len)
        ):
            self._sp_state = self._obs = None
            self._ep_rew = self._ep_len = None
            recovered.append("env_state")
        if dead(self.opt_state):
            self.opt_state = self._init_opt_state()
            if self.mesh is not None and not self.config.zero_update:
                from ..parallel.mesh import replicate

                self.opt_state = replicate(self.opt_state, self.mesh)
            recovered.append("opt_state")
        return recovered

    def learn(
        self,
        opponent_apply: Callable,
        opponent_params: Any,
        entropy_coef: float,
        precise_timing: bool = True,
        fetch_watch: bool = True,
    ) -> TrainingMetrics:
        """One training iteration (reference ppo.py:78-166).

        ``precise_timing=False`` skips the device sync between the rollout
        and update programs — both dispatch back-to-back and only the final
        result is awaited. rollout_time/learn_time then both report the
        combined pipeline time (fps stays correct as an aggregate rate).

        ``fetch_watch=False`` drops this iteration's per-layer grad-norm
        tree (watch mode) instead of fetching it — the host loop only
        consumes it every ``watch_interval`` iterations, and on the
        latency-bound tunnel backend shipping ~60 small arrays per
        iteration just to discard them is pure overhead.
        """
        cfg = self.config
        if self._sp_state is None:
            self.reset_envs(opponent_apply, opponent_params)

        t0 = time.perf_counter()
        self.rng, k_roll, k_upd = jax.random.split(self.rng, 3)
        (
            self._sp_state,
            self._obs,
            self.batch_stats,
            traj,
            fin,
            (self._ep_rew, self._ep_len),
            _,
        ) = rollout(
            self.module,
            cfg,
            opponent_apply,
            self.params,
            self.batch_stats,
            opponent_params,
            self._sp_state,
            self._obs,
            self._ep_rew,
            self._ep_len,
            k_roll,
        )
        total_steps = cfg.n_steps * cfg.num_envs
        if precise_timing:
            # Scalar fetch, not block_until_ready: the latter can return
            # before the program finishes on the axon tunnel backend and the
            # update would overlap into the rollout window (CLAUDE.md
            # "Measurement notes"). fin are () outputs of the rollout
            # program, so fetching one awaits the whole program.
            jax.device_get(fin[2])
            rollout_time = time.perf_counter() - t0
            fps = total_steps / rollout_time if rollout_time > 0 else 0.0
        else:
            rollout_time = 0.0
            fps = 0.0

        t1 = time.perf_counter()
        # Always the prepare+epochs dispatch (update_chunks=1 => exactly two
        # programs): bit-identical to the monolithic ``update`` program, and
        # the only dispatch under which the trajectory donation is usable —
        # the prepare program's flats outputs size-match the donated traj
        # leaves, so XLA reuses their HBM instead of holding trajectory AND
        # flats live through the epoch phase (~2x the trajectory footprint
        # at 8192 envs; the round-3 bench's "donated buffers were not
        # usable" warning was the monolithic path wasting exactly this).
        metrics = self._update_chunked(traj, entropy_coef, k_upd)
        del traj
        # One batched host fetch resolves everything (and forces the whole
        # pipeline to completion — float conversions are device syncs).
        if cfg.watch and not fetch_watch:
            metrics = dict(metrics)
            metrics.pop("layer_grad_norms")
            metrics.pop("layer_grad_hists", None)
        fin_dev, metrics_dev = jax.device_get((fin, metrics))
        block_rewards = None
        if cfg.fin_blocks:
            block_rewards = [
                float(r) / float(c) if c else None
                for r, c in zip(fin_dev[0], fin_dev[2])
            ]
            fin_host = [float(x.sum()) for x in fin_dev]
        else:
            fin_host = [float(x) for x in fin_dev]
        layer_grad_norms = None
        if cfg.watch and fetch_watch:
            layer_grad_norms = {
                f"gradients/{name}/norm": float(v)
                for name, v in tree_path_norms(
                    metrics_dev.pop("layer_grad_norms")
                ).items()
            }
            if cfg.watch_hist_bins:
                edges = grad_hist_edges(cfg.watch_hist_bins)
                for name, counts in tree_path_norms(
                    metrics_dev.pop("layer_grad_hists")
                ).items():
                    layer_grad_norms[f"gradients/{name}/hist"] = {
                        "_type": "histogram",
                        "counts": [int(c) for c in counts],
                        "edges": edges,
                    }
        metrics_host = {k: float(v) for k, v in metrics_dev.items()}
        if precise_timing:
            learn_time = time.perf_counter() - t1
        else:
            rollout_time = learn_time = time.perf_counter() - t0
            fps = total_steps / rollout_time if rollout_time > 0 else 0.0

        fin_rew, fin_len, fin_cnt = fin_host
        self.iteration += 1
        return TrainingMetrics(
            mean_reward=fin_rew / fin_cnt if fin_cnt else 0.0,
            mean_length=fin_len / fin_cnt if fin_cnt else 0.0,
            actor_loss=metrics_host["actor_loss"],
            critic_loss=metrics_host["critic_loss"],
            entropy_loss=metrics_host["entropy_loss"],
            grad_norm=metrics_host["grad_norm"],
            clip_fraction=metrics_host["clip_fraction"],
            explained_variance=metrics_host["explained_variance"],
            approx_kl=metrics_host["approx_kl"],
            fps=fps,
            rollout_time=rollout_time,
            learn_time=learn_time,
            layer_grad_norms=layer_grad_norms,
            block_rewards=block_rewards,
        )

    def param_stats(self, histogram_bins: int = 0) -> dict:
        """Per-layer parameter L2 norms (+ optional fixed-bin histograms),
        computed in ONE jitted program — the parameter half of the
        reference's ``run.watch`` (train.py:94). Returns flat wandb-style
        keys: ``parameters/<path>/norm`` (floats) and, with
        ``histogram_bins`` > 0, ``parameters/<path>/hist`` dicts."""
        norms, hists = _param_stats_jit(self.params, histogram_bins)
        out = {
            f"parameters/{name}/norm": float(v)
            for name, v in jax.device_get(tree_path_norms(norms)).items()
        }
        if histogram_bins:
            flat = jax.device_get(tree_path_norms(hists))
            for name in list(flat):
                if name.endswith("/counts"):
                    base = name[: -len("/counts")]
                    out[f"parameters/{base}/hist"] = {
                        "_type": "histogram",
                        "counts": [int(c) for c in flat[name]],
                        "edges": [float(e) for e in flat[base + "/edges"]],
                    }
        return out

    def _update_chunked(self, traj, entropy_coef: float, k_upd: jax.Array):
        """Host-facade wrapper over the shared ``update_chunked`` dispatch
        (1 + update_chunks programs, bit-identical to ``update``). With
        ``config.zero_update`` the epoch chunks run the ZeRO collective
        schedule instead (alg/zero_epochs.py)."""
        if self.config.zero_update:
            from .zero_epochs import zero_update_chunked

            (
                self.params,
                self.batch_stats,
                self.opt_state,
                metrics,
            ) = zero_update_chunked(
                self.module,
                self.config,
                self.optimizer,
                self.mesh,
                self.params,
                self.batch_stats,
                self.opt_state,
                traj,
                self._obs,
                entropy_coef,
                k_upd,
            )
            return metrics
        (
            self.params,
            self.batch_stats,
            self.opt_state,
            metrics,
        ) = update_chunked(
            self.module,
            self.config,
            self.optimizer,
            self.params,
            self.batch_stats,
            self.opt_state,
            traj,
            self._obs,
            entropy_coef,
            k_upd,
        )
        return metrics
