"""Tournament result analysis.

Re-creation of the reference's ``result_analysis/draw.ipynb`` (cells 0-14)
as an importable module: load the tournament CSVs, categorize runs by
architecture family and size from run-name substrings, and render the three
headline plots — best-ELO-per-run bar chart, ELO-vs-env-steps progression
lines, and win/draw-rate bars. The sibling ``draw.ipynb`` drives these
functions interactively.
"""

from __future__ import annotations

import os
from typing import Optional, Tuple

import pandas as pd

import matplotlib

# Headless-only backend selection: forcing Agg unconditionally would
# override ipykernel's inline backend and make the sibling draw.ipynb
# render no figures. Only pick Agg when no display/backend is set up.
import os as _os

if not _os.environ.get("DISPLAY") and "inline" not in matplotlib.get_backend():
    try:
        matplotlib.use("Agg", force=False)
    except Exception:
        pass
import matplotlib.pyplot as plt  # noqa: E402


def load_results(results_dir: str) -> Tuple[pd.DataFrame, pd.DataFrame]:
    """Load elo_ratings.csv + match_results.csv from a tournament run dir."""
    elo = pd.read_csv(os.path.join(results_dir, "elo_ratings.csv"))
    matches = pd.read_csv(os.path.join(results_dir, "match_results.csv"))
    return elo, matches


def categorize_runs(elo: pd.DataFrame) -> pd.DataFrame:
    """Tag each row with architecture family and size parsed from the run
    name (reference notebook cell 3 keys on run-name substrings)."""
    elo = elo.copy()

    def family(name: str) -> str:
        name = str(name)
        for fam in ("transformer_c", "transformer", "resnet", "cnn"):
            if fam in name:
                return fam
        return "other"

    def size(name: str) -> str:
        name = str(name)
        if "_l" in name or name.endswith("l"):
            return "L"
        if "_s" in name or name.endswith("s"):
            return "S"
        return "?"

    elo["family"] = elo["run_name"].map(family)
    elo["size"] = elo["run_name"].map(size)
    return elo


def plot_best_elo(elo: pd.DataFrame, out: Optional[str] = None):
    """Best ELO reached per run (notebook cell 5)."""
    best = elo.groupby("run_name")["rating"].max().sort_values()
    fig, ax = plt.subplots(figsize=(10, max(3, 0.4 * len(best))))
    best.plot.barh(ax=ax)
    ax.set_xlabel("Best ELO rating")
    ax.set_title("Best ELO per run")
    fig.tight_layout()
    if out:
        fig.savefig(out, dpi=150)
        plt.close(fig)
    return fig


def plot_elo_progression(
    elo: pd.DataFrame,
    steps_per_iteration: Optional[int] = None,
    out: Optional[str] = None,
):
    """ELO vs training progress, line per run (notebook cells 6-8).

    With ``steps_per_iteration`` given, the x axis converts iterations to
    env steps (the notebook plots against env steps).
    """
    fig, ax = plt.subplots(figsize=(10, 6))
    for run_name, grp in elo.groupby("run_name"):
        grp = grp.sort_values("iteration")
        x = grp["iteration"]
        if steps_per_iteration:
            x = x * steps_per_iteration
        ax.plot(x, grp["rating"], marker="o", markersize=3, label=str(run_name))
    ax.set_xlabel("Env steps" if steps_per_iteration else "Training iteration")
    ax.set_ylabel("ELO rating")
    ax.set_title("ELO progression")
    ax.grid(True, alpha=0.3)
    ax.legend(fontsize=8)
    fig.tight_layout()
    if out:
        fig.savefig(out, dpi=150)
        plt.close(fig)
    return fig


def plot_win_draw_rates(elo: pd.DataFrame, out: Optional[str] = None):
    """Win-rate and draw-rate bars per model (notebook cells 9-10)."""
    elo = elo.copy()
    elo["draw_rate"] = elo["draws"] / elo["games_played"].clip(lower=1)
    elo = elo.sort_values("rating", ascending=False)
    fig, axes = plt.subplots(1, 2, figsize=(14, max(3, 0.35 * len(elo))))
    axes[0].barh(elo["unique_id"], elo["win_rate"])
    axes[0].set_title("Win rate")
    axes[0].invert_yaxis()
    axes[1].barh(elo["unique_id"], elo["draw_rate"])
    axes[1].set_title("Draw rate")
    axes[1].invert_yaxis()
    for ax in axes:
        ax.set_xlim(0, 1)
        ax.tick_params(labelsize=7)
    fig.tight_layout()
    if out:
        fig.savefig(out, dpi=150)
        plt.close(fig)
    return fig


def analyze(results_dir: str, out_dir: Optional[str] = None) -> pd.DataFrame:
    """Run the full notebook pipeline headlessly; returns categorized ELO."""
    out_dir = out_dir or results_dir
    elo, _ = load_results(results_dir)
    elo = categorize_runs(elo)
    plot_best_elo(elo, os.path.join(out_dir, "best_elo.png"))
    plot_elo_progression(elo, out=os.path.join(out_dir, "elo_progression_analysis.png"))
    plot_win_draw_rates(elo, os.path.join(out_dir, "win_draw_rates.png"))
    return elo


if __name__ == "__main__":
    import sys

    analyze(sys.argv[1] if len(sys.argv) > 1 else "comparison_results")
