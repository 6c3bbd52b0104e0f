"""Histogram of first moves and result/length stats for a generation.

Parity with ``/root/reference/oinkoink/scripts/game_stats.py``.

Usage: python scripts/game_stats.py <save_dir>/<gen>/games.npz
"""

import sys

import numpy as np


def main():
    with np.load(sys.argv[1]) as d:
        moves = d["moves"]
        result = d["result"]
        length = d["length"]
    first = moves[:, 0]
    print("games:", len(first))
    print("first-move histogram:", np.bincount(first, minlength=7).tolist())
    print(
        "results: o wins {}, draws {}, x wins {}".format(
            int((result == 1).sum()), int((result == 3).sum()),
            int((result == 2).sum()),
        )
    )
    print("game length: mean {:.1f} min {} max {}".format(
        float(length.mean()), int(length.min()), int(length.max())))


if __name__ == "__main__":
    main()
