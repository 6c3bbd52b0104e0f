"""Measure steady-state MCTS search throughput across batch sizes.

Perf tool: identifies the sims/s sweet spot on the attached device and
whether any batch size is anomalously slow (padding/layout effects).

Usage: python scripts/sweep_search_batch.py [--sims 800] [--batches 512 1024 ...]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--sims", type=int, default=800)
    parser.add_argument(
        "--batches", type=int, nargs="+",
        default=[512, 600, 1024, 1200, 1280, 2048],
    )
    parser.add_argument(
        "--noise", action=argparse.BooleanOptionalAction, default=True,
        help="root Dirichlet noise (disable with --no-noise)",
    )
    parser.add_argument("--parallel-sims", type=int, nargs="+", default=[1])
    parser.add_argument("--sims-per-call", type=int, default=100,
                        help="segment searches into short device calls")
    args = parser.parse_args()

    import jax

    from connect4_tpu.config import MCTSConfig, NetConfig
    from connect4_tpu.env.core import initial_state
    from connect4_tpu.eval.evaluators import make_net_evaluator
    from connect4_tpu.mcts.batched import make_chunked_search_fn
    from connect4_tpu.models import init_net
    from connect4_tpu.utils import enable_compilation_cache

    enable_compilation_cache()
    print(f"devices: {jax.devices()}", flush=True)

    net, variables = init_net(
        NetConfig(filters=64, n_fc_layers=6, n_residuals=6,
                  compute_dtype="bfloat16"),
        jax.random.key(0),
    )
    ev = make_net_evaluator(net, variables["params"], variables["batch_stats"])
    config = MCTSConfig(
        simulations=args.sims,
        root_dirichlet_alpha=0.3 if args.noise else 0.0,
        root_exploration_fraction=0.25 if args.noise else 0.0,
        num_sampling_moves=6,
    )

    import numpy as np

    from connect4_tpu.env.convert import stack_boards
    from connect4_tpu.env.host_board import HostBoard

    def midgame_state(batch):
        """Random ~12-ply positions: search depth there is representative
        of the expensive middle of a generation (empty-board searches are
        shallow and flatter)."""
        rng = np.random.default_rng(0)
        boards = []
        while len(boards) < batch:
            b = HostBoard()
            ok = True
            for _ in range(12):
                valid = sorted(b.valid_moves)
                if not valid or b.result is not None:
                    ok = False
                    break
                b.make_move(int(rng.choice(valid)))
            if ok and b.result is None:
                boards.append(b)
        return stack_boards(boards)

    import dataclasses

    for batch in args.batches:
        for k in args.parallel_sims:
            # segments must hold whole parallel iterations and divide
            # the total simulation count
            spc = next(
                (
                    d for d in range(min(args.sims_per_call, args.sims), 0, -1)
                    if args.sims % d == 0 and d % k == 0
                ),
                None,
            )
            if spc is None:
                print(
                    f"skipping parallel_sims={k}: no segment size <= "
                    f"{args.sims_per_call} divides sims={args.sims} in whole "
                    f"K-iterations",
                    flush=True,
                )
                continue
            run = make_chunked_search_fn(
                ev, dataclasses.replace(config, parallel_sims=k), spc)
            state = midgame_state(batch)
            t0 = time.time()
            jax.block_until_ready(run(state, jax.random.key(0)))
            compile_s = time.time() - t0
            times = []
            for i in range(2):
                t0 = time.time()
                jax.block_until_ready(run(state, jax.random.key(i + 1)))
                times.append(time.time() - t0)
            steady = min(times)
            print(
                f"batch {batch:>5} K={k}: compile+first {compile_s:6.1f}s  "
                f"steady {steady:6.2f}s  "
                f"{batch * args.sims / steady:>10,.0f} sims/s  "
                f"{steady / args.sims * 1000:6.2f} ms/sim",
                flush=True,
            )


if __name__ == "__main__":
    main()
