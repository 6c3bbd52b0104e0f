"""Pretty-print a recorded self-play game from a generation's games.npz.

Parity with ``/root/reference/oinkoink/scripts/view_games.py``.

Usage: python scripts/view_games.py <save_dir>/<gen>/games.npz [game_index]
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from connect4_tpu.training.replay import game_str  # noqa: E402


def main():
    path = sys.argv[1]
    idx = int(sys.argv[2]) if len(sys.argv) > 2 else 0
    with np.load(path) as d:
        print(
            game_str(
                d["moves"][idx], d["move_values"][idx], d["policies"][idx],
                d["length"][idx],
            )
        )
        from connect4_tpu.types import Result

        codes = {1: Result.o_win, 2: Result.x_win, 3: Result.draw}
        print("Result:", codes.get(int(d["result"][idx])))


if __name__ == "__main__":
    main()
