"""Break the cold-compile cost of the production programs into phases.

The benchmark workload's first-ever run on a fresh host pays ~20 min of
XLA compilation (round-2/3 measurements). This times trace (jaxpr),
lowering (StableHLO) and backend compile separately for each production
program — the refill pool's search segments, record/refill step, init and
finish — so the dominant program is identified rather than guessed.

Set MEASURE_CLEAR_CACHE=1 to bypass the persistent compile cache for a
true cold measurement (uses a throwaway cache dir).

Usage: python scripts/measure_compile.py [--slots 256] [--parallel-sims 8]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    parser = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    parser.add_argument("--slots", type=int, default=256)
    parser.add_argument("--sims", type=int, default=800)
    parser.add_argument("--parallel-sims", type=int, default=8)
    parser.add_argument("--sims-per-call", type=int, default=200)
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp

    if os.environ.get("MEASURE_CLEAR_CACHE") == "1":
        import tempfile

        cache = tempfile.mkdtemp(prefix="c4_coldcache_")
        jax.config.update("jax_compilation_cache_dir", cache)
        print(f"cold cache: {cache}")
    else:
        from connect4_tpu.utils import enable_compilation_cache

        enable_compilation_cache()

    from connect4_tpu.config import MCTSConfig, NetConfig
    from connect4_tpu.env.core import initial_state
    from connect4_tpu.eval.evaluators import make_net_evaluator
    from connect4_tpu.mcts.batched import _finish, _root_init, _run_sims, _sample_key
    from connect4_tpu.env.core import legal_moves
    from connect4_tpu.models import init_net

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

    S = args.slots
    state = initial_state((S,))
    key = jax.random.key(0)
    active = jnp.ones((S,), jnp.bool_)

    def timed(name, fn, *a, **kw):
        t0 = time.time()
        traced = jax.jit(fn).trace(*a, **kw)
        t1 = time.time()
        lowered = traced.lower()
        t2 = time.time()
        compiled = lowered.compile()
        t3 = time.time()
        try:
            n_ops = compiled.cost_analysis()
        except Exception:
            n_ops = None
        flops = (n_ops or {}).get("flops")
        print(
            f"{name:24s} trace {t1-t0:7.2f}s  lower {t2-t1:7.2f}s  "
            f"compile {t3-t2:7.2f}s"
            + (f"  ({flops/1e9:.1f} GFLOP)" if flops else ""),
            flush=True,
        )
        return compiled

    timed("root_init", lambda s, k, a: _root_init(ev, s, k, config, a),
          state, key, active)
    timed(f"segment[{args.sims_per_call}]",
          lambda t, s, a: _run_sims(ev, t, s, config, a, args.sims_per_call),
          _root_init(ev, state, key, config, active), state, active)
    timed("finish",
          lambda t, s, k: _finish(t, s, _sample_key(k), config, legal_moves(s)),
          _root_init(ev, state, key, config, active), state, key)

    # the record/refill step (argument shapes as in make_refill_play_fn)
    from connect4_tpu.training import self_play as sp

    play = sp.make_refill_play_fn(ev, config, S, S * 4, args.sims_per_call)
    t0 = time.time()
    out = play(jax.random.key(1))
    jax.block_until_ready(out.result)
    print(f"full refill generation ({S} slots, {S*4} games): "
          f"{time.time()-t0:.1f}s end-to-end (includes any remaining "
          f"compiles + execution)", flush=True)


if __name__ == "__main__":
    main()
