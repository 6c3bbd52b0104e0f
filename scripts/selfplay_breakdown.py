"""Wall-clock decomposition of the self-play hot loop (VERDICT r4 items 3/7).

Measures, on the real TPU at the flagship workload shape (256 slots,
64-filter net, 800 sims, K=8):

1. per-program blocking times for one wave: root_init, each segment,
   finish, record — where do the ~0.55 s/wave go?
2. the bare network forward at the fan-out batch shape [slots*K] — the
   MXU share of a segment, hence descent/backup share by subtraction;
3. pipelined vs blocking wave wall-time — device idle / dispatch gap;
4. an MFU estimate: achieved net FLOP/s vs the chip's bf16 peak.

Positions are taken from mid-game (ply ~14) boards so tree depth is
realistic, and programs are warmed before timing.

Usage: python scripts/selfplay_breakdown.py [--waves 3]
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
    parser.add_argument("--waves", type=int, default=3)
    parser.add_argument("--setup-plies", type=int, default=14)
    args = parser.parse_args()

    import numpy as np

    import jax
    import jax.numpy as jnp

    from connect4_tpu.config import MCTSConfig, NetConfig
    from connect4_tpu.env.core import initial_state, legal_moves, step
    from connect4_tpu.eval.evaluators import make_net_evaluator
    from connect4_tpu.mcts.batched import (
        _finish, _root_init, _run_sims, _sample_key,
    )
    from connect4_tpu.models import init_net
    from connect4_tpu.utils import enable_compilation_cache

    enable_compilation_cache()

    S, K = args.slots, args.parallel_sims
    net_config = NetConfig(filters=64, n_fc_layers=6, n_residuals=6,
                           compute_dtype="bfloat16")
    net, variables = init_net(net_config, jax.random.key(0))
    eval_fn = make_net_evaluator(net, variables["params"], variables["batch_stats"])
    config = MCTSConfig(
        simulations=args.sims, parallel_sims=K,
        root_dirichlet_alpha=1.0, root_exploration_fraction=0.25,
        num_sampling_moves=6,
    )
    n_segments = args.sims // args.sims_per_call

    # mid-game boards: random legal playouts to setup-plies
    state = initial_state((S,))
    key = jax.random.key(42)
    rand_step = jax.jit(
        lambda st, k: step(
            st,
            jax.random.categorical(
                k, jnp.where(legal_moves(st), 0.0, -jnp.inf)
            ).astype(jnp.int32),
            st.result == 0,
        )
    )
    for _ in range(args.setup_plies):
        key, sub = jax.random.split(key)
        state = rand_step(state, sub)
    active = np.asarray(state.result) == 0
    print(f"setup: {int(active.sum())}/{S} boards live at ply {args.setup_plies}")
    active = jnp.asarray(active)

    init_jit = jax.jit(
        lambda st, k, a: _root_init(eval_fn, st, k, config, a)
    )
    seg_jit = jax.jit(
        lambda tr, st, a: _run_sims(eval_fn, tr, st, config, a, args.sims_per_call)
    )
    fin_jit = jax.jit(
        lambda tr, st, k, a: _finish(tr, st, _sample_key(k), config, legal_moves(st))
    )

    # bare eval forward at the fan-out shape [S*K]
    from connect4_tpu.env.core import BoardState

    flat = jax.tree_util.tree_map(
        lambda x: jnp.concatenate([x] * K, axis=0), state
    )
    eval_jit = jax.jit(lambda b: eval_fn(b))

    # ---- warm-up (compile everything) ----
    t0 = time.time()
    tree = init_jit(state, key, active)
    tree = jax.block_until_ready(seg_jit(tree, state, active))
    res = jax.block_until_ready(fin_jit(tree, state, key, active))
    jax.block_until_ready(eval_jit(flat))
    print(f"warm-up: {time.time() - t0:.1f}s")

    # ---- bare eval ----
    reps = 20
    t0 = time.time()
    for _ in range(reps):
        out = eval_jit(flat)
    jax.block_until_ready(out)
    eval_s = (time.time() - t0) / reps
    print(f"eval forward [{S * K}]: {eval_s * 1e3:.2f} ms")

    # ---- blocking per-program times over full waves ----
    per = {"init": 0.0, "segment": 0.0, "finish": 0.0}
    seg_times = []
    for w in range(args.waves):
        key, k1 = jax.random.split(key)
        t0 = time.time()
        tree = jax.block_until_ready(init_jit(state, k1, active))
        per["init"] += time.time() - t0
        for s in range(n_segments):
            t0 = time.time()
            tree = jax.block_until_ready(seg_jit(tree, state, active))
            dt = time.time() - t0
            per["segment"] += dt
            seg_times.append(dt)
        t0 = time.time()
        res = jax.block_until_ready(fin_jit(tree, state, key, active))
        per["finish"] += time.time() - t0
    w = args.waves
    print(
        f"blocking wave: init {per['init'] / w * 1e3:.1f} ms | "
        f"{n_segments} segments {per['segment'] / w * 1e3:.1f} ms "
        f"(per-seg {[round(t * 1e3) for t in seg_times[:n_segments]]}) | "
        f"finish {per['finish'] / w * 1e3:.1f} ms"
    )
    blocking_wave = sum(per.values()) / w

    # ---- pipelined waves (async dispatch, single sync at the end) ----
    t0 = time.time()
    for _ in range(args.waves):
        key, k1 = jax.random.split(key)
        tree = init_jit(state, k1, active)
        for s in range(n_segments):
            tree = seg_jit(tree, state, active)
        res = fin_jit(tree, state, key, active)
    jax.block_until_ready(res)
    piped_wave = (time.time() - t0) / args.waves
    print(
        f"wave wall-time: blocking {blocking_wave * 1e3:.1f} ms, "
        f"pipelined {piped_wave * 1e3:.1f} ms "
        f"(dispatch gap {max(blocking_wave - piped_wave, 0) * 1e3:.1f} ms)"
    )

    # ---- decomposition + MFU ----
    iters = args.sims // K
    evals_per_wave = iters * eval_s  # one [S*K] forward per parallel iteration
    print(
        f"per-wave eval share (est): {evals_per_wave * 1e3:.1f} ms of "
        f"{piped_wave * 1e3:.1f} ms = {evals_per_wave / piped_wave:.1%}; "
        f"descent/expand/backup+overheads: {(piped_wave - evals_per_wave) * 1e3:.1f} ms"
    )
    sims_s = S * args.sims / piped_wave

    # net forward FLOPs per position (filters=64, 6 res blocks, 6x7 board):
    C, HW = 64, 42
    conv_flops = 2 * 9 * HW * (3 * C + 12 * C * C)  # first conv + 6 res x 2 convs
    head_flops = 2 * (HW * C * C // 16)  # heads are small; rough
    flops_pos = conv_flops + head_flops
    achieved = sims_s * flops_pos
    peak = 197e12  # v5e bf16 peak FLOP/s
    print(
        f"throughput {sims_s:,.0f} sims/s x ~{flops_pos / 1e6:.1f} MFLOP/sim "
        f"= {achieved / 1e12:.2f} TFLOP/s = {achieved / peak:.1%} of bf16 peak "
        f"(MXU-busy bound: eval share x peak-fraction-of-eval)"
    )
    eval_flops = S * K * flops_pos / eval_s
    print(
        f"bare eval achieves {eval_flops / 1e12:.2f} TFLOP/s "
        f"({eval_flops / peak:.1%} of peak) at batch {S * K}"
    )


if __name__ == "__main__":
    main()
