"""Compare training runs' learning curves side by side.

Round-3 A/B tooling: given two (or more) run save_dirs, print per
generation the 8-ply value MSE and bucketed accuracy (and the 7-ply
stats when present) from each run's stats pickles, so configurations —
e.g. ``parallel_sims`` K=1 vs K=8 — can be compared on identical
workloads. The stats definitions match the reference's
(``/root/reference/oinkoink/neural/stats.py``).

Usage:
  python scripts/compare_runs.py NAME=DIR NAME=DIR [--pickle 8ply.pkl]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    parser = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    parser.add_argument("runs", nargs="+", metavar="NAME=DIR")
    parser.add_argument("--pickle", default="8ply.pkl")
    args = parser.parse_args()

    import pandas as pd

    frames = {}
    for spec in args.runs:
        name, _, path = spec.partition("=")
        if not path:
            name, path = os.path.basename(spec.rstrip("/")), spec
        p = os.path.join(path, args.pickle)
        if not os.path.exists(p):
            print(f"{name}: no {args.pickle} under {path}", file=sys.stderr)
            continue
        frames[name] = pd.read_pickle(p)

    if not frames:
        raise SystemExit("nothing to compare")

    cols = ["Average loss", "Accuracy"]
    header = "gen  " + "  ".join(
        f"{name+'.'+c:>22}" for name in frames for c in cols
    )
    print(header)
    n = max(len(df) for df in frames.values())
    for g in range(n):
        row = [f"{g + 1:>3}  "]
        for name, df in frames.items():
            for c in cols:
                if g < len(df) and c in df.columns:
                    row.append(f"{df[c].iloc[g]:>22.5f}")
                else:
                    row.append(f"{'-':>22}")
        print("  ".join(row))

    for name, df in frames.items():
        if len(df):
            last = df.iloc[-1]
            print(
                f"\n{name}: final gen {len(df)}: "
                + ", ".join(
                    f"{c}={last[c]:.5f}" for c in df.columns
                    if isinstance(last[c], float)
                )
            )


if __name__ == "__main__":
    main()
