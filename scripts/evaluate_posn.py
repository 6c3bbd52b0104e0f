"""Evaluate one position: raw net output and optionally a full search.

Parity with ``/root/reference/oinkoink/scripts/evaluate_posn.py``: reads an
ASCII position file (rows top-down, characters o/x/. separated by spaces),
prints the net's (value, prior), and with --search runs MCTS and prints the
root children statistics.

Usage:
  python scripts/evaluate_posn.py POS_FILE [--checkpoint-dir DIR] [--search]
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("position")
    parser.add_argument("--checkpoint-dir", default=None)
    parser.add_argument("--generation", type=int, default=None)
    parser.add_argument("--simulations", type=int, default=800)
    parser.add_argument("--search", action="store_true")
    parser.add_argument("--filters", type=int, default=64)
    parser.add_argument("--fc-layers", type=int, default=6)
    parser.add_argument("--residuals", type=int, default=6)
    args = parser.parse_args()

    import jax

    from connect4_tpu.cli import _load_player
    from connect4_tpu.config import NetConfig
    from connect4_tpu.env.convert import stack_boards
    from connect4_tpu.env.host_board import HostBoard
    from connect4_tpu.mcts.batched import make_search_fn
    from connect4_tpu.types import WIDTH

    with open(args.position) as f:
        rows = [line.rstrip("\n") for line in f if line.strip()]
    o = np.zeros((6, 7), dtype=bool)
    x = np.zeros((6, 7), dtype=bool)
    for r, row in enumerate(rows[:6]):
        for c, ch in enumerate(row.split()[:7]):
            if ch == "o":
                o[r, c] = True
            elif ch == "x":
                x[r, c] = True
    board = HostBoard.from_pieces(o, x)
    print(board)
    print("to move:", board.player_to_move.name)

    net_config = NetConfig(
        filters=args.filters, n_fc_layers=args.fc_layers,
        n_residuals=args.residuals,
    )
    player = _load_player(
        "net", args.checkpoint_dir, args.generation, net_config, args.simulations
    )
    state = stack_boards([board])
    value, prior = player.evaluator(state)
    print("net value: {:.4f}".format(float(value[0])))
    print("net prior:", np.round(np.asarray(prior[0]), 4))

    if args.search:
        run = make_search_fn(player.evaluator, player.config)
        res = run(state, jax.random.key(0))
        print("search move:", int(res.move[0]))
        print("search value: {:.4f}".format(float(res.value[0])))
        print("values policy:", np.round(np.asarray(res.values_policy[0]), 4))
        print("visit policy: ", np.round(np.asarray(res.visit_policy[0]), 4))


if __name__ == "__main__":
    main()
