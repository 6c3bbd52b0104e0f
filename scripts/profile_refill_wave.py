"""Break one refill-pool self-play wave into its phases and time each.

Perf tool: the generation benchmark runs ~150 waves; any per-wave cost
beyond the raw search shows up here (host glue, record/scatter, chunk
boundaries, transfers).

Usage: python scripts/profile_refill_wave.py [--slots 256] [--games 1200]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--slots", type=int, default=256)
    parser.add_argument("--games", type=int, default=1200)
    parser.add_argument("--sims", type=int, default=800)
    parser.add_argument("--parallel-sims", type=int, default=8)
    parser.add_argument("--sims-per-call", type=int, default=200)
    parser.add_argument("--waves", type=int, default=8)
    args = parser.parse_args()

    import jax
    import numpy as np

    from connect4_tpu.config import MCTSConfig, NetConfig
    from connect4_tpu.eval.evaluators import make_net_evaluator
    from connect4_tpu.mcts.batched import make_chunked_search_fn
    from connect4_tpu.models import init_net
    from connect4_tpu.training import self_play as sp
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
        root_dirichlet_alpha=0.3,
        root_exploration_fraction=0.25,
        num_sampling_moves=6,
        parallel_sims=args.parallel_sims,
    )

    chunked = make_chunked_search_fn(ev, config, args.sims_per_call)

    play = sp.make_refill_play_fn(
        ev, config, args.slots, args.games, args.sims_per_call
    )
    import jax.numpy as jnp

    from connect4_tpu.env.core import initial_state

    S = args.slots

    # Time the public pieces: one run() call with a progress callback
    # measuring wave boundaries, then the bare chunked search at the same
    # batch size for comparison.
    t_wall = []

    def progress(wave, live):
        t_wall.append((time.time(), wave, live))

    t0 = time.time()
    out = play(jax.random.key(99), progress=progress)
    jax.block_until_ready(out)
    total = time.time() - t0
    waves = len(t_wall)
    print(f"first run (compile): {total:.1f}s over {waves} waves", flush=True)

    # steady run
    t_wall.clear()
    t0 = time.time()
    out = play(jax.random.key(1), progress=progress)
    jax.block_until_ready(out)
    total = time.time() - t0
    times = np.diff([t0] + [t for t, _, _ in t_wall])
    live = np.array([l for _, _, l in t_wall])
    full = live >= S * 0.95
    print(
        f"steady run: {total:.1f}s over {len(times)} waves; "
        f"full-pool waves: {full.sum()} x {times[full].mean():.3f}s; "
        f"tail waves: {(~full).sum()} x {times[~full].mean():.3f}s",
        flush=True,
    )
    moves = int(np.asarray(out.mask).sum())
    print(
        f"moves {moves}  sims/s {moves * args.sims / total:,.0f}  "
        f"(search-only reference: see sweep_search_batch)",
        flush=True,
    )

    # Now time the bare search at the same batch size for comparison
    state0 = initial_state((S,))
    active = jnp.ones((S,), jnp.bool_)
    r = chunked(state0, jax.random.key(2), active)
    jax.block_until_ready(r)
    ts = []
    for i in range(3):
        t0 = time.time()
        r = chunked(state0, jax.random.key(3 + i), active)
        jax.block_until_ready(r)
        ts.append(time.time() - t0)
    print(f"bare chunked search at S={S}: {min(ts):.3f}s", flush=True)


if __name__ == "__main__":
    main()
