"""Command-line interface.

Modes mirror the reference CLI (``/root/reference/oinkoink/main.py:17-89``):

- ``game`` — interactive human-vs-AI in the terminal (two games, one per
  colour, like the reference's ``switch=True`` match).
- ``training`` — run the training loop from a Python config file defining
  ``config`` (an ``AlphaZeroConfig``).
- ``match`` — head-to-head between two checkpoints (or the centre
  heuristic), the ``scripts/matches.py`` equivalent.
- ``selfplay-demo`` — generate a handful of games on-device and
  pretty-print one; a quick smoke test of the whole stack.

Run as ``python -m connect4_tpu.cli <mode> ...``.
"""

from __future__ import annotations

import argparse
import sys

import numpy as np


def _lazy_imports():
    import jax

    return jax


def _load_player(name, ckpt_dir, gen, net_config, sims, max_nodes=None):
    """Build a MatchPlayer from a checkpoint directory (or the centre
    heuristic when ckpt_dir is None)."""
    import jax

    from connect4_tpu.config import MCTSConfig, ModelConfig
    from connect4_tpu.eval.evaluators import (
        centre_evaluator_batched,
        make_net_evaluator,
    )
    from connect4_tpu.eval.match import MatchPlayer
    from connect4_tpu.models import init_net
    from connect4_tpu.training import checkpoint as ckpt
    from connect4_tpu.training.learner import TrainState, make_optimizer

    config = MCTSConfig(simulations=sims, max_nodes=max_nodes)
    if ckpt_dir is None:
        return MatchPlayer(name, centre_evaluator_batched, config)

    net, variables = init_net(net_config, jax.random.key(0))
    optimizer = make_optimizer(ModelConfig(net_config=net_config))
    template = TrainState(
        variables["params"], variables["batch_stats"],
        optimizer.init(variables["params"]),
    )
    if gen is None:
        restored = ckpt.restore_latest(ckpt_dir, template, jax.random.key(0))
        if restored is None:
            raise FileNotFoundError(f"no readable checkpoints under {ckpt_dir}")
        gen, state, _ = restored
    else:
        state, _ = ckpt.restore_checkpoint(ckpt_dir, gen, template, jax.random.key(0))
    evaluator = make_net_evaluator(net, state.params, state.batch_stats)
    return MatchPlayer(f"{name}(gen{gen})", evaluator, config)


def _interactive_game(ai_player, human_side):
    """One human-vs-AI game in the terminal
    (``/root/reference/oinkoink/player.py:22-32`` +
    ``game.py:20-40`` behaviours)."""
    import jax

    from connect4_tpu.env.convert import stack_boards
    from connect4_tpu.env.host_board import HostBoard
    from connect4_tpu.mcts.batched import make_search_fn
    from connect4_tpu.types import Side

    search = make_search_fn(ai_player.evaluator, ai_player.config)
    board = HostBoard()
    key = jax.random.key(np.random.randint(0, 2**31 - 1))
    print(board)
    while board.result is None:
        if board.player_to_move == human_side:
            move = -1
            while move not in board.valid_moves:
                try:
                    move = int(
                        input(
                            "Enter User ({}'s) move:".format(
                                Side.as_str(board.player_to_move)
                            )
                        )
                    )
                except ValueError:
                    print("Not a valid move. Try again:")
            board.make_move(move)
        else:
            key, sub = jax.random.split(key)
            res = search(stack_boards([board]), sub)
            move = int(res.move[0])
            value = float(res.value[0])
            policy = np.round(np.asarray(res.visit_policy[0]), 3)
            print(
                "{} selected move: {}, value: {:.4f}, prior: {}".format(
                    ai_player.name, move, value, policy
                )
            )
            board.make_move(move)
        print(board)
    print("Result:", board.result)
    return board.result


def cmd_game(args):
    import json
    import os

    from connect4_tpu.config import NetConfig
    from connect4_tpu.types import Side

    net_config = NetConfig(
        filters=args.filters, n_fc_layers=args.fc_layers, n_residuals=args.residuals
    )
    ckpt_dir = args.checkpoint_dir
    if ckpt_dir is None:
        # default to the packaged trained net, like the reference shipping
        # data/example_net.pth (main.py:38-40,62-63)
        packaged = os.path.join(
            os.path.dirname(__file__), "data", "files", "example_net"
        )
        cfg_path = os.path.join(packaged, "net_config.json")
        if os.path.exists(cfg_path):
            with open(cfg_path) as fh:
                net_config = NetConfig(**json.load(fh))
            ckpt_dir = packaged
            print(f"Using packaged example net ({packaged})")
        elif args.heuristic:
            print(
                "WARNING: playing against the CENTRE HEURISTIC (a much "
                "weaker agent), not a trained net."
            )
        else:
            raise SystemExit(
                f"The packaged example net is missing ({packaged}). Pass "
                "-n/--checkpoint-dir to play a trained checkpoint, or "
                "--heuristic to knowingly play the weak centre heuristic."
            )
    ai = _load_player(
        "AI", ckpt_dir, args.generation, net_config, args.simulations
    )
    # two games, one per colour, like the reference's switch=True match
    _interactive_game(ai, human_side=Side.o)
    _interactive_game(ai, human_side=Side.x)


def cmd_training(args):
    from connect4_tpu.config import load_config_file
    from connect4_tpu.training.loop import TrainingLoop

    config = load_config_file(args.config)
    TrainingLoop(config).run(args.generations, until=args.until_generation)


def cmd_match(args):
    from connect4_tpu.config import NetConfig
    from connect4_tpu.eval.match import play_match

    net_config = NetConfig(
        filters=args.filters, n_fc_layers=args.fc_layers, n_residuals=args.residuals
    )
    p1 = _load_player(
        "player1", args.checkpoint_dir_1, args.generation_1, net_config,
        args.simulations,
    )
    p2 = _load_player(
        "player2", args.checkpoint_dir_2, args.generation_2, net_config,
        args.simulations,
    )
    play_match(p1, p2, plies=args.plies, switch=True, seed=args.seed)


def cmd_selfplay_demo(args):
    import jax

    from connect4_tpu.config import MCTSConfig
    from connect4_tpu.eval.evaluators import centre_evaluator_batched
    from connect4_tpu.training import replay
    from connect4_tpu.training.self_play import make_play_fn
    from connect4_tpu.types import DRAW, O_WIN, X_WIN

    config = MCTSConfig(
        simulations=args.simulations,
        root_dirichlet_alpha=0.3,
        root_exploration_fraction=0.25,
        num_sampling_moves=6,
    )
    play = make_play_fn(centre_evaluator_batched, config, args.batch)
    out = jax.tree_util.tree_map(
        np.asarray, play(jax.random.key(args.seed))
    )
    results = out.result
    print(
        "games: {}  o wins: {}  draws: {}  x wins: {}  mean length: {:.1f}".format(
            args.batch,
            int((results == O_WIN).sum()),
            int((results == DRAW).sum()),
            int((results == X_WIN).sum()),
            float(out.length.mean()),
        )
    )
    print(replay.game_str(out.moves[0], out.move_values[0], out.policies[0], out.length[0]))


def _add_net_flags(p):
    p.add_argument("--filters", type=int, default=32)
    p.add_argument("--fc-layers", type=int, default=4)
    p.add_argument("--residuals", type=int, default=3)


def main(argv=None):
    parser = argparse.ArgumentParser(
        prog="connect4_tpu",
        description="TPU-native AlphaZero-style Connect4 framework",
    )
    sub = parser.add_subparsers(dest="mode", required=True)

    g = sub.add_parser("game", help="play against the AI in the terminal")
    g.add_argument("-n", "--checkpoint-dir", default=None,
                   help="training save_dir holding <gen>/ckpt (default: packaged example net)")
    g.add_argument("-g", "--generation", type=int, default=None)
    g.add_argument("-s", "--simulations", type=int, default=800)
    g.add_argument("--heuristic", action="store_true",
                   help="allow falling back to the weak centre heuristic when "
                        "no checkpoint is given and the packaged net is absent")
    _add_net_flags(g)
    g.set_defaults(fn=cmd_game)

    t = sub.add_parser("training", help="run the training loop")
    t.add_argument("-c", "--config", required=True, help="Python config file defining `config`")
    t.add_argument("--generations", type=int, default=None,
                   help="stop after N generations (default: run forever)")
    t.add_argument("--until-generation", type=int, default=None,
                   help="stop after the given absolute generation number "
                        "(restart-safe: resumed runs still stop there)")
    t.set_defaults(fn=cmd_training)

    m = sub.add_parser("match", help="head-to-head between checkpoints")
    m.add_argument("--checkpoint-dir-1", default=None)
    m.add_argument("--generation-1", type=int, default=None)
    m.add_argument("--checkpoint-dir-2", default=None)
    m.add_argument("--generation-2", type=int, default=None)
    m.add_argument("-s", "--simulations", type=int, default=800)
    m.add_argument("--plies", type=int, default=2)
    m.add_argument("--seed", type=int, default=0)
    _add_net_flags(m)
    m.set_defaults(fn=cmd_match)

    d = sub.add_parser("selfplay-demo", help="generate a few games on-device")
    d.add_argument("-b", "--batch", type=int, default=8)
    d.add_argument("-s", "--simulations", type=int, default=50)
    d.add_argument("--seed", type=int, default=0)
    d.set_defaults(fn=cmd_selfplay_demo)

    args = parser.parse_args(argv)
    if args.mode == "game" and args.simulations <= 0:
        raise ValueError("Simulations must be a positive integer")

    from connect4_tpu.utils import enable_compilation_cache

    enable_compilation_cache()
    args.fn(args)


if __name__ == "__main__":
    main()
