"""Round-robin strength table between saved generation checkpoints.

Parity with ``/root/reference/oinkoink/scripts/matches.py`` (which produced
the README gen-vs-gen table): every listed generation pair plays all 2-ply
start positions in both colours.

Usage:
  python scripts/matches.py SAVE_DIR --gens 20 40 60 [--simulations 800]
"""

import argparse
import itertools
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("save_dir")
    parser.add_argument("--gens", type=int, nargs="+", required=True)
    parser.add_argument("--simulations", type=int, default=800)
    parser.add_argument("--plies", type=int, default=2)
    parser.add_argument("--filters", type=int, default=64)
    parser.add_argument("--fc-layers", type=int, default=6)
    parser.add_argument("--residuals", type=int, default=6)
    args = parser.parse_args()

    from connect4_tpu.cli import _load_player
    from connect4_tpu.config import NetConfig
    from connect4_tpu.eval.match import play_match

    net_config = NetConfig(
        filters=args.filters, n_fc_layers=args.fc_layers,
        n_residuals=args.residuals,
    )
    players = {
        g: _load_player(f"gen{g}", args.save_dir, g, net_config, args.simulations)
        for g in args.gens
    }
    results = {}
    for g1, g2 in itertools.combinations(args.gens, 2):
        res = play_match(
            players[g1], players[g2], plies=args.plies, switch=True,
            seed=g1 * 1000 + g2,
        )
        results[(g1, g2)] = res["return"]

    print("\nreturns (row vs column):")
    print("      " + "  ".join(f"g{g:>4}" for g in args.gens))
    for g1 in args.gens:
        row = []
        for g2 in args.gens:
            if (g1, g2) in results:
                row.append(f"{results[(g1, g2)]:.3f}")
            elif (g2, g1) in results:
                row.append(f"{1 - results[(g2, g1)]:.3f}")
            else:
                row.append("  -  ")
        print(f"g{g1:>4}  " + "  ".join(row))


if __name__ == "__main__":
    main()
