"""Capture an XLA/TPU profiler trace of the batched search.

Runs one warm-up search (compile + cache), then traces a steady-state
search with ``jax.profiler`` so kernel-level time (gathers/scatters in
the descent loops vs the network forward) can be inspected in
TensorBoard or Perfetto (`xprof`/`tensorboard --logdir <dir>`).

Usage:
    python scripts/profile_search.py [--batch 512] [--sims 200] \
        [--parallel-sims 8] [--logdir DIR]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--batch", type=int, default=512)
    parser.add_argument("--sims", type=int, default=200)
    parser.add_argument("--parallel-sims", type=int, default=8)
    parser.add_argument("--filters", type=int, default=64)
    parser.add_argument("--logdir", default=None)
    args = parser.parse_args()

    import jax

    from connect4_tpu.config import MCTSConfig, NetConfig
    from connect4_tpu.env.core import initial_state
    from connect4_tpu.eval.evaluators import make_net_evaluator
    from connect4_tpu.mcts.batched import make_search_fn
    from connect4_tpu.models import init_net
    from connect4_tpu.utils import enable_compilation_cache, trace

    enable_compilation_cache()

    net_config = NetConfig(
        filters=args.filters, n_fc_layers=6, n_residuals=6,
        compute_dtype="bfloat16",
    )
    net, variables = init_net(net_config, jax.random.key(0))
    evaluator = make_net_evaluator(net, variables["params"], variables["batch_stats"])
    config = MCTSConfig(simulations=args.sims, parallel_sims=args.parallel_sims)
    search = make_search_fn(evaluator, config)

    state = initial_state((args.batch,))
    t0 = time.time()
    jax.block_until_ready(search(state, jax.random.key(0)))
    print(f"warm-up (compile): {time.time() - t0:.1f}s", file=sys.stderr)

    with trace(args.logdir) as log_dir:
        t0 = time.time()
        jax.block_until_ready(search(state, jax.random.key(1)))
        dt = time.time() - t0
    total_sims = args.batch * args.sims
    print(
        f"steady search: {dt:.3f}s  {total_sims / dt:,.0f} sims/s  "
        f"trace: {log_dir}"
    )


if __name__ == "__main__":
    main()
