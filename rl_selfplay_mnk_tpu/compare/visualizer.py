"""Tournament result visualization.

The reference renders a plotly ELO-vs-iteration chart to HTML + PNG
(src/model_comparison/visualizer.py:34-77). plotly is not in this image, so
the chart is matplotlib: PNG always, plus a standalone HTML page embedding
the PNG so the HTML artifact contract survives.
"""

from __future__ import annotations

import base64
import os

import pandas as pd

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt  # noqa: E402


class ResultsVisualizer:
    def __init__(self, output_dir: str):
        self.output_dir = output_dir
        os.makedirs(output_dir, exist_ok=True)

    def create_all_visualizations(self, elo_df: pd.DataFrame) -> None:
        if elo_df.empty:
            return
        self.plot_elo_progression(elo_df)

    def plot_elo_progression(self, elo_df: pd.DataFrame) -> str:
        """ELO vs training iteration, one line per run (reference :34-77)."""
        fig, ax = plt.subplots(figsize=(10, 6))
        for run_name, group in elo_df.groupby("run_name"):
            group = group.sort_values("iteration")
            ax.plot(
                group["iteration"],
                group["rating"],
                marker="o",
                markersize=4,
                label=str(run_name),
            )
        ax.set_xlabel("Training iteration")
        ax.set_ylabel("ELO rating")
        ax.set_title("ELO rating progression")
        ax.grid(True, alpha=0.3)
        ax.legend(fontsize=8)
        fig.tight_layout()

        png_path = os.path.join(self.output_dir, "elo_progression.png")
        fig.savefig(png_path, dpi=150)
        plt.close(fig)

        html_path = os.path.join(self.output_dir, "elo_progression.html")
        with open(png_path, "rb") as f:
            b64 = base64.b64encode(f.read()).decode()
        with open(html_path, "w") as f:
            f.write(
                "<html><head><title>ELO progression</title></head><body>"
                f'<img src="data:image/png;base64,{b64}"/></body></html>'
            )
        return png_path
