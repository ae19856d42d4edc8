"""Local random-search sweep driver.

The reference uses a wandb random-search sweep (sweep_config.yaml:1-13:
log-uniform lr 1e-5..2e-3, log-uniform entropy 0.001..0.2, arch in
{transformer_b_s, resnet_b_s, cnn_b_s}, program train_short). This image
has no egress, so the sweep loop runs locally with the same search space,
invoking the same short-run target in-process.

Usage:
    python -m rl_selfplay_mnk_tpu.sweep --trials 8 --seed 0
"""

from __future__ import annotations

import argparse
import json
import math
import os
import random

from .train_short import main as train_short_main

SEARCH_SPACE = {
    "learning_rate": ("log_uniform", 1e-5, 2e-3),
    "entropy_coef": ("log_uniform", 0.001, 0.2),
    "architecture_name": ("choice", ["transformer_b_s", "resnet_b_s", "cnn_b_s"]),
}


def sample_config(rng: random.Random) -> dict:
    out = {}
    for key, spec in SEARCH_SPACE.items():
        if spec[0] == "log_uniform":
            lo, hi = spec[1], spec[2]
            out[key] = math.exp(rng.uniform(math.log(lo), math.log(hi)))
        elif spec[0] == "choice":
            out[key] = rng.choice(spec[1])
    return out


def evaluate_vs_random(run_name: str, mnk, episodes: int, seed: int) -> dict:
    """Cross-comparable trial outcome: the final export's win/score rate vs
    a uniform-random policy (each trial's own validation stream is keyed to
    its self-promoted benchmark, which is not comparable across trials)."""
    import jax

    from .env.mnk_env import EnvConfig
    from .models.registry import make_apply_fns
    from .selfplay.policies import RandomPolicy, make_network_policy
    from .selfplay.validation import validate
    from .utils.model_export import get_models_from_directory, load_any_model

    model_dir = os.path.join("models", run_name)
    latest = get_models_from_directory(model_dir)[-1]["model_id"]
    module, variables, _ = load_any_model(model_dir, latest)
    eval_apply, _ = make_apply_fns(module)
    rp = RandomPolicy()
    m, n, k = mnk
    res = validate(
        EnvConfig(m, n, k).validate(),
        make_network_policy(eval_apply),
        variables,
        rp.apply,
        rp.params,
        episodes,
        jax.random.PRNGKey(seed),
    )
    return {
        "win_rate_vs_random": round(res["validation/vs_benchmark/win_rate"], 4),
        "score_rate_vs_random": round(
            res["validation/vs_benchmark/score_rate"], 4
        ),
    }


def _wandb_trial() -> None:
    """One sweep trial under the wandb agent: the agent's ``wandb.init``
    carries the sampled hyperparameters in ``run.config`` (the reference's
    train_short reads them the same way via ``run.config.<attr>``)."""
    import wandb

    run = wandb.init()
    cfg = dict(run.config)
    train_short_main(
        [
            "--learning_rate", str(cfg.get("learning_rate", 5e-4)),
            "--entropy_coef", str(cfg.get("entropy_coef", 0.04)),
            "--architecture_name", cfg.get("architecture_name", "resnet_b_s"),
        ]
    )


def run_wandb_agent(trials: int, sweep_id: str | None = None) -> str:
    """The reference's actual sweep workflow (``wandb agent`` over
    sweep_config.yaml) for environments WITH egress + wandb installed; the
    local random-search driver below is the no-egress substitute with the
    same search space. Returns the sweep id."""
    try:
        import wandb
        import yaml
    except ImportError as e:  # pragma: no cover - exercised via mock in tests
        raise SystemExit(
            f"--wandb needs the wandb package ({e}); use the local driver "
            "(no flags) in egress-free environments"
        )
    if sweep_id is None:
        here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        with open(os.path.join(here, "sweep_config.yaml")) as f:
            sweep_cfg = yaml.safe_load(f)
        sweep_id = wandb.sweep(sweep_cfg, project="mnk_b_sweeps")
    wandb.agent(sweep_id, function=_wandb_trial, count=trials)
    return sweep_id


def main(argv=None) -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--trials", type=int, default=8)
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--wandb", action="store_true",
                        help="run under the wandb sweep agent "
                        "(sweep_config.yaml; needs egress + wandb)")
    parser.add_argument("--sweep-id", default=None,
                        help="join an existing wandb sweep instead of "
                        "creating one")
    parser.add_argument("--eval-episodes", type=int, default=0,
                        help="after each trial, score its final export vs a "
                        "random policy (cross-comparable outcome) and write "
                        "a ranked summary JSON")
    parser.add_argument("--summary-out", default=None,
                        help="summary path (default runs/sweep_<seed>_summary.json)")
    # unknown flags pass through to the train_short target (scale overrides
    # for smoke tests / tiny-board sweeps)
    args, extra = parser.parse_known_args(argv)

    if args.wandb:
        # the agent path runs the reference's exact workflow: trials get
        # their config from wandb, so local-only conveniences don't apply
        if extra:
            raise SystemExit(
                f"--wandb runs trials from the wandb sweep config; the "
                f"passthrough overrides {extra} would be silently ignored — "
                "drop them or use the local driver (no --wandb)"
            )
        if args.eval_episodes or args.summary_out:
            raise SystemExit(
                "--eval-episodes/--summary-out are local-driver features "
                "(the wandb UI ranks agent trials); drop them or use the "
                "local driver (no --wandb)"
            )
        if args.seed != 0:
            raise SystemExit(
                "--seed is a local-driver flag (agent trials draw their "
                "config — and thus their seeding — from the wandb sweep); "
                "a non-default value would be silently ignored"
            )
        run_wandb_agent(args.trials, args.sweep_id)
        return

    mnk = (9, 9, 5)
    if "--mnk" in extra:
        i = extra.index("--mnk")
        mnk = tuple(int(x) for x in extra[i + 1 : i + 4])

    rng = random.Random(args.seed)
    results = []
    for t in range(args.trials):
        trial = sample_config(rng)
        print(f"\n=== sweep trial {t}: {trial} ===")
        run_name = f"sweep_{args.seed}_{t}"
        train_short_main(
            [
                "--learning_rate", str(trial["learning_rate"]),
                "--entropy_coef", str(trial["entropy_coef"]),
                "--architecture_name", trial["architecture_name"],
                "--seed", str(args.seed * 1000 + t),
                "--run-name", run_name,
            ]
            + extra
        )
        row = {
            "trial": t,
            "run_name": run_name,
            "learning_rate": round(trial["learning_rate"], 8),
            "entropy_coef": round(trial["entropy_coef"], 6),
            "architecture_name": trial["architecture_name"],
        }
        if args.eval_episodes:
            row.update(
                evaluate_vs_random(
                    run_name, mnk, args.eval_episodes, args.seed * 1000 + t
                )
            )
            print(f"trial {t} outcome: {row}")
        results.append(row)

    if args.eval_episodes:
        results.sort(key=lambda r: -r["score_rate_vs_random"])
        out = args.summary_out or f"runs/sweep_{args.seed}_summary.json"
        os.makedirs(os.path.dirname(out) or ".", exist_ok=True)
        with open(out, "w") as f:
            json.dump({"search_space": {k: list(map(str, v))
                                        for k, v in SEARCH_SPACE.items()},
                       "trials": results}, f, indent=1)
            f.write("\n")
        print(f"\nsweep summary (best first) -> {out}")
        for r in results:
            print(r)


if __name__ == "__main__":
    main()
