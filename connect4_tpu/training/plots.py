"""Learning-curve rendering.

The live-dashboard equivalent of the reference's visdom panels
(``/root/reference/oinkoink/neural/training.py:67-72,143-145,172-174``):
the training loop re-renders ``8ply.png`` / ``7ply.png`` / ``match_results.png``
in ``save_dir`` after every generation, so progress is visible without
rerunning a script (visdom itself is not in the environment).
``scripts/plot_training_graphs.py`` wraps the same renderer for offline use.
"""

from __future__ import annotations

import os


def render(save_dir: str, verbose: bool = True) -> None:
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    import pandas as pd

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
        if not cols or df.empty:
            continue
        plot_df = df[cols]
        # Per-bucket accuracies (loss / draw / win) from the `correct`
        # column, {bucket: (n_members, n_correct)} per row — surfaces the
        # draw-bucket pathology directly on the learning curves.
        if "correct" in df.columns:
            for bucket, label in ((0.0, "acc[loss]"), (0.5, "acc[draw]"), (1.0, "acc[win]")):
                try:
                    vals = [
                        (c[bucket][1] / c[bucket][0]) if c[bucket][0] else float("nan")
                        for c in df["correct"]
                    ]
                    plot_df = plot_df.assign(**{label: vals})
                except (KeyError, TypeError, IndexError):
                    break
        ax = plot_df.plot(title=name)
        # match_results holds one row per gating match (every n_eval
        # generations), not one per generation
        ax.set_xlabel("match" if name == "match_results" else "generation")
        out = os.path.join(save_dir, f"{name}.png")
        plt.savefig(out, dpi=120, bbox_inches="tight")
        plt.close("all")
        if verbose:
            print("wrote", out)
