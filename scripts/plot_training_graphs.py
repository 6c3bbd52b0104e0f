"""Render 8ply.png / 7ply.png / match.png learning curves from the metric
pickles a training run writes.

Parity with ``/root/reference/oinkoink/scripts/plot_training_graphs.py``.

Usage: python scripts/plot_training_graphs.py <save_dir>
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from connect4_tpu.training.plots import render  # noqa: E402


def main():
    render(sys.argv[1])


if __name__ == "__main__":
    main()
