"""Render 8ply.png / 7ply.png / match.png learning curves from the metric
pickles a training run writes.

Parity with ``/root/reference/oinkoink/scripts/plot_training_graphs.py``.

Usage: python scripts/plot_training_graphs.py <save_dir>
"""

import os
import sys

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt  # noqa: E402
import pandas as pd  # noqa: E402


def main():
    save_dir = sys.argv[1]
    for name, columns in (
        ("8ply", ["Average loss", "Accuracy"]),
        ("7ply", ["Average loss", "Accuracy", "prior Average loss", "prior Accuracy"]),
        ("match_results", ["return"]),
    ):
        path = os.path.join(save_dir, f"{name}.pkl")
        if not os.path.exists(path):
            continue
        df = pd.read_pickle(path)
        cols = [c for c in columns if c in df.columns]
        ax = df[cols].plot(title=name)
        ax.set_xlabel("generation")
        out = os.path.join(save_dir, f"{name}.png")
        plt.savefig(out, dpi=120, bbox_inches="tight")
        print("wrote", out)


if __name__ == "__main__":
    main()
