"""Learning-curve parity study: this framework vs the PyTorch reference.

BASELINE.md's learning-parity target ("win-rate curve matches the reference
within seed variance") cannot be checked at the reference's default scale —
the reference needs ~12.7 days on this machine for its 300M-step default
run (PERFORMANCE.md). This tool checks it at a scale the reference CAN run:
a 5x5x4 board, 128 envs x 64 steps/iter, resnet_b_s, constant lr/entropy,
fresh-snapshot self-play opponent every iteration (the deterministic 85%
branch of the opponent schedule), scoring vs a uniform-random policy every
``--val-every`` iterations on both sides.

The reference side drives the reference's UNMODIFIED PPOAgent / wrapper /
env / validate_gpu on torch-CPU (its own CPU bootstrap crashes —
SURVEY.md §7 quirk 3 — so HardwareConfig is built manually, exactly like
tools/reference_baseline.py). Our side runs the same workload through
PPOLearner + validate.

Usage:
    python tools/learning_parity.py --side ref   --seeds 2   # slow (CPU)
    python tools/learning_parity.py --side ours  --seeds 2
    python tools/learning_parity.py --report     # compare saved curves
Curves land in runs/learning_parity_{ref,ours}.json.
"""

from __future__ import annotations

import argparse
import copy
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, "/root/reference/src")

M, N, K = 5, 5, 4
NUM_ENVS, N_STEPS = 128, 64
BATCH, EPOCHS = 2048, 4
LR, ENT = 5e-4, 0.04
VAL_EPISODES = 512
ARCH = "resnet_b_s"


def run_reference(iters: int, val_every: int, seed: int) -> list:
    import torch

    from alg.ppo import PPOAgent
    from env.torch_vector_mnk_env import TorchVectorMnkEnv
    from selfplay.policy import NNPolicy, RandomPolicy
    from selfplay.torch_self_play_wrapper import TorchSelfPlayWrapper
    from selfplay.validation import validate_gpu
    from utils.hardware import HardwareConfig
    from utils.model_export import create_model_from_architecture

    torch.manual_seed(seed)
    hw = HardwareConfig(
        device="cpu", dtype=torch.float32, use_scaler=False, compile_mode=None
    )
    env = TorchVectorMnkEnv(M, N, K, num_envs=NUM_ENVS, device="cpu")
    wrapper = TorchSelfPlayWrapper(env)
    network = create_model_from_architecture(
        ARCH, obs_shape=(2, M, N), action_dim=M * N
    )
    optimizer = torch.optim.AdamW(
        network.parameters(), lr=LR, eps=1e-5, weight_decay=0.01
    )
    agent = PPOAgent(
        (2, M, N),
        M * N,
        network,
        hw_config=hw,
        n_steps=N_STEPS,
        optimizer=optimizer,
        gamma=0.99,
        batch_size=BATCH,
        ppo_epochs=EPOCHS,
        num_envs=NUM_ENVS,
        entropy_coef=ENT,
        clip_range=0.2,
    )
    rp = RandomPolicy(action_dim=M * N)

    def score():
        res = validate_gpu(
            NNPolicy(network), rp, (M, N, K), n_episodes=VAL_EPISODES,
            device="cpu",
        )
        return res["validation/vs_benchmark/score_rate"]

    curve = [(0, score())]
    t0 = time.perf_counter()
    for i in range(1, iters + 1):
        wrapper.set_opponent(NNPolicy(copy.deepcopy(network)))
        agent.learn(wrapper)
        if i % val_every == 0 or i == iters:
            s = score()
            curve.append((i, s))
            print(
                f"# ref seed {seed} iter {i}: score {s:.3f} "
                f"({time.perf_counter()-t0:.0f}s)",
                file=sys.stderr,
            )
    return curve


def run_ours(iters: int, val_every: int, seed: int, cpu: bool) -> list:
    if cpu:
        os.environ.setdefault("JAX_PLATFORMS", "cpu")
    import jax
    import optax

    from rl_selfplay_mnk_tpu.alg import PPOConfig, PPOLearner
    from rl_selfplay_mnk_tpu.alg.ppo import pick_group_size
    from rl_selfplay_mnk_tpu.env import EnvConfig
    from rl_selfplay_mnk_tpu.models.registry import (
        create_model_from_architecture,
        init_network,
        make_apply_fns,
    )
    from rl_selfplay_mnk_tpu.selfplay import RandomPolicy, validate
    from rl_selfplay_mnk_tpu.selfplay.policies import make_network_policy
    from rl_selfplay_mnk_tpu.utils.hardware import detect_hardware_config

    hw = detect_hardware_config()
    env_cfg = EnvConfig(M, N, K)
    module, _ = create_model_from_architecture(
        ARCH, (2, M, N), M * N, dtype=hw.compute_dtype
    )
    variables = init_network(module, (2, M, N), jax.random.PRNGKey(seed))
    eval_apply, _ = make_apply_fns(module)
    policy_act = make_network_policy(eval_apply)
    config = PPOConfig(
        env=env_cfg,
        num_envs=NUM_ENVS,
        n_steps=N_STEPS,
        batch_size=BATCH,
        ppo_epochs=EPOCHS,
        shuffle="grouped" if hw.is_accelerator else "global",
        group_size=pick_group_size(BATCH),
    )
    optimizer = optax.flatten(
        optax.chain(
            optax.clip_by_global_norm(0.5),
            optax.adamw(LR, eps=1e-5, weight_decay=0.01),
        )
    )
    learner = PPOLearner(
        module, config, optimizer, variables, jax.random.PRNGKey(seed + 1)
    )
    rp = RandomPolicy()

    def score(k):
        res = validate(
            env_cfg, policy_act, learner.variables, rp.apply, rp.params,
            VAL_EPISODES, jax.random.PRNGKey(k),
        )
        return float(res["validation/vs_benchmark/score_rate"])

    curve = [(0, score(seed * 1000))]
    t0 = time.perf_counter()
    for i in range(1, iters + 1):
        learner.learn(policy_act, learner.variables, entropy_coef=ENT)
        if i % val_every == 0 or i == iters:
            s = score(seed * 1000 + i)
            curve.append((i, s))
            print(
                f"# ours seed {seed} iter {i}: score {s:.3f} "
                f"({time.perf_counter()-t0:.0f}s)",
                file=sys.stderr,
            )
    return curve


def save(side: str, curves: dict) -> str:
    os.makedirs(os.path.join(REPO, "runs"), exist_ok=True)
    path = os.path.join(REPO, "runs", f"learning_parity_{side}.json")
    with open(path, "w") as f:
        json.dump(
            {
                "config": f"{M}x{N}x{K} {ARCH} {NUM_ENVS}x{N_STEPS} "
                f"batch{BATCH} ep{EPOCHS} lr{LR} ent{ENT}",
                "curves": curves,
            },
            f,
            indent=1,
        )
    return path


def report() -> None:
    sides = {}
    for side in ("ref", "ours"):
        path = os.path.join(REPO, "runs", f"learning_parity_{side}.json")
        if not os.path.exists(path):
            sys.exit(f"missing {path} — run --side {side} first")
        with open(path) as f:
            sides[side] = json.load(f)["curves"]

    # align on common iteration points
    def points(curves):
        its = None
        for c in curves.values():
            s = {i for i, _ in c}
            its = s if its is None else (its & s)
        return sorted(its)

    common = sorted(set(points(sides["ref"])) & set(points(sides["ours"])))
    print(f"{'iter':>6} {'ref mean±sd':>16} {'ours mean±sd':>16} "
          f"{'|Δmean|':>8} within")
    ok = True
    for it in common:
        vals = {}
        for side in ("ref", "ours"):
            xs = [dict(c)[it] for c in sides[side].values()]
            mean = sum(xs) / len(xs)
            sd = (sum((x - mean) ** 2 for x in xs) / max(1, len(xs) - 1)) ** 0.5
            vals[side] = (mean, sd, xs)
        d = abs(vals["ref"][0] - vals["ours"][0])
        # "within seed variance": |Δmean| <= 2 * max(sd, binomial noise floor)
        noise = max(
            vals["ref"][1],
            vals["ours"][1],
            (0.25 / VAL_EPISODES) ** 0.5,  # sd of a score-rate estimate
        )
        within = d <= 2.0 * noise + 1e-9
        ok &= within
        print(
            f"{it:>6} {vals['ref'][0]:>8.3f}±{vals['ref'][1]:.3f} "
            f"{vals['ours'][0]:>10.3f}±{vals['ours'][1]:.3f} "
            f"{d:>8.3f} {'yes' if within else 'NO'}"
        )
    print(f"\nparity within seed variance: {'YES' if ok else 'NO'}")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--side", choices=["ref", "ours", "both"], default=None)
    ap.add_argument("--seeds", type=int, default=2)
    ap.add_argument("--iters", type=int, default=40)
    ap.add_argument("--val-every", type=int, default=5)
    ap.add_argument("--cpu", action="store_true",
                    help="run our side on CPU too")
    ap.add_argument("--report", action="store_true")
    args = ap.parse_args()

    if args.report:
        report()
        return
    if args.side is None:
        sys.exit("pass --side ref|ours|both or --report")
    if args.side in ("ref", "both"):
        curves = {
            str(s): run_reference(args.iters, args.val_every, s)
            for s in range(args.seeds)
        }
        print("saved", save("ref", curves))
    if args.side in ("ours", "both"):
        curves = {
            str(s): run_ours(args.iters, args.val_every, s, args.cpu)
            for s in range(args.seeds)
        }
        print("saved", save("ours", curves))


if __name__ == "__main__":
    main()
