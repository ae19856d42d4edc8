"""Interactive play CLI: human / random / trained model vs same.

Parity with reference src/play.py:11-266: ``--p1/--p2 {human,random,path}``,
board size flags, ANSI board renderer with cell indices, canonical
channel-flip for the White-side AI, move-history export and
``--import_game`` replay; model arguments resolve to a file or to the
latest export in a directory via the metadata sidecars.

Usage:
    python -m rl_selfplay_mnk_tpu.play --p1 human --p2 models/run/ --m 9 --n 9 --k 5
    python -m rl_selfplay_mnk_tpu.play --import_game game_123.json
"""

from __future__ import annotations

import argparse
import json
import os
import time
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .env.constants import PLAYER_WHITE
from .env.mnk_env import EnvConfig, EnvState, make_env_state, observe, step
from .models.registry import make_apply_fns
from .selfplay.policies import Policy, RandomPolicy, make_network_policy
from .utils.model_export import get_models_from_directory, load_any_model

RESET = "\033[0m"
RED = "\033[91m"
BLUE = "\033[94m"
DIM = "\033[2m"


def print_board(state: EnvState, m: int, n: int) -> None:
    """ANSI board with cell indices on empty squares (reference :132-182)."""
    boards = np.asarray(state.boards)[0]
    width = len(str(m * n - 1))
    print()
    for r in range(m):
        row = []
        for c in range(n):
            idx = r * n + c
            if boards[0, r, c] > 0.5:
                row.append(f"{RED}{'X':>{width}}{RESET}")
            elif boards[1, r, c] > 0.5:
                row.append(f"{BLUE}{'O':>{width}}{RESET}")
            else:
                row.append(f"{DIM}{idx:>{width}}{RESET}")
        print("  " + " ".join(row))
    print()


class HumanPolicy:
    """Reads a cell index from stdin (reference HumanPolicy, play.py:11-33)."""

    def act(self, obs, rng=None, deterministic=False):
        mask = np.asarray(obs["action_mask"])[0]
        while True:
            try:
                raw = input("Your move (cell index): ").strip()
                a = int(raw)
            except (ValueError, EOFError):
                print("Enter a number.")
                continue
            if 0 <= a < mask.shape[0] and mask[a]:
                return jnp.array([a], dtype=jnp.int32)
            print("Illegal move, try again.")


def load_policy_from_arg(arg: str, board: tuple):
    """'human' | 'random' | model file/dir (reference :221-251)."""
    if arg == "human":
        return HumanPolicy(), "human"
    if arg == "random":
        rp = RandomPolicy()
        return Policy(apply=rp.apply, params=None), "random"
    # file or directory
    if os.path.isdir(arg):
        listing = get_models_from_directory(arg)
        if not listing:
            raise FileNotFoundError(f"No exported models in {arg}")
        model_id = listing[-1]["model_id"]  # latest iteration
        model_dir = arg
    else:
        model_dir = os.path.dirname(arg) or "."
        base = os.path.basename(arg)
        model_id = base[: -len(".msgpack")] if base.endswith(".msgpack") else base
    module, variables, metadata = load_any_model(model_dir, model_id)
    m, n = board
    model_mn = tuple(metadata.architecture_params.get("obs_shape", ())[1:])
    if model_mn and model_mn != (m, n):
        raise ValueError(
            f"model {metadata.run_name}/{model_id} was trained for a "
            f"{model_mn[0]}x{model_mn[1]} board but --m/--n select "
            f"{m}x{n}; pass the board the model was trained on"
        )
    eval_apply, _ = make_apply_fns(module)
    act = make_network_policy(eval_apply)
    name = f"{metadata.run_name}/{model_id}"
    return Policy(apply=act, params=variables), name


def _policy_action(policy, obs, rng, mover_is_white: bool):
    """Run a policy for the current mover with a canonical view for White
    (reference :54-55)."""
    if mover_is_white:
        obs = {
            "observation": obs["observation"][:, ::-1],
            "action_mask": obs["action_mask"],
        }
    if isinstance(policy, HumanPolicy):
        return policy.act(obs)
    return policy.act(obs, rng, deterministic=False)


def play_game(
    cfg: EnvConfig, p1, p2, names: Tuple[str, str], rng: jax.Array
) -> Tuple[List[int], Optional[int]]:
    """Drive one game; returns (move_history, winner 0/1/None) (reference :36-84)."""
    state = make_env_state(cfg, 1)
    history: List[int] = []
    print_board(state, cfg.m, cfg.n)
    winner = None
    while True:
        player = int(state.current_player[0])
        policy = p1 if player == 0 else p2
        obs = observe(state)
        rng, k = jax.random.split(rng)
        actions = _policy_action(policy, obs, k, player == PLAYER_WHITE)
        a = int(actions[0])
        mark = "X" if player == 0 else "O"
        print(f"{names[player]} ({mark}) plays {a}")
        history.append(a)
        state, rewards, dones = step(cfg, state, jnp.asarray(actions))
        print_board(state, cfg.m, cfg.n)
        if bool(dones[0]):
            if float(rewards[0]) == 1.0:
                winner = player
                print(f"{names[player]} ({mark}) wins!")
            else:
                print("Draw!")
            break
    return history, winner


def export_game(
    history: List[int], winner: Optional[int], cfg: EnvConfig, names: Tuple[str, str]
) -> str:
    path = f"game_{int(time.time())}.json"
    with open(path, "w") as f:
        json.dump(
            {
                "mnk": [cfg.m, cfg.n, cfg.k],
                "players": list(names),
                "moves": history,
                "winner": winner,
            },
            f,
        )
    print(f"Game exported to {path}")
    return path


def replay_game(path: str, delay: float = 0.5) -> None:
    """Replay an exported game move by move (reference :87-129)."""
    with open(path) as f:
        record = json.load(f)
    m, n, k = record["mnk"]
    cfg = EnvConfig(m, n, k)
    state = make_env_state(cfg, 1)
    print_board(state, m, n)
    for a in record["moves"]:
        player = int(state.current_player[0])
        mark = "X" if player == 0 else "O"
        print(f"{record['players'][player]} ({mark}) plays {a}")
        state, rewards, dones = step(cfg, state, jnp.array([a]))
        print_board(state, m, n)
        if delay:
            time.sleep(delay)
        if bool(dones[0]):
            if float(rewards[0]) == 1.0:
                print(f"{record['players'][player]} ({mark}) wins!")
            else:
                print("Draw!")
            return


def main(argv=None) -> None:
    parser = argparse.ArgumentParser(description="Play MNK games")
    parser.add_argument("--p1", default="human", help="human | random | model path")
    parser.add_argument("--p2", default="random", help="human | random | model path")
    parser.add_argument("--m", type=int, default=9)
    parser.add_argument("--n", type=int, default=9)
    parser.add_argument("--k", type=int, default=5)
    parser.add_argument("--seed", type=int, default=None)
    parser.add_argument("--export", action="store_true", help="save move history")
    parser.add_argument("--import_game", default=None, help="replay a saved game")
    parser.add_argument("--delay", type=float, default=0.5)
    args = parser.parse_args(argv)

    if args.import_game:
        replay_game(args.import_game, args.delay)
        return

    cfg = EnvConfig(args.m, args.n, args.k).validate()
    p1, n1 = load_policy_from_arg(args.p1, (args.m, args.n))
    p2, n2 = load_policy_from_arg(args.p2, (args.m, args.n))
    seed = args.seed if args.seed is not None else int(time.time()) % 2**31
    history, winner = play_game(cfg, p1, p2, (n1, n2), jax.random.PRNGKey(seed))
    if args.export:
        export_game(history, winner, cfg, (n1, n2))


if __name__ == "__main__":
    main()
