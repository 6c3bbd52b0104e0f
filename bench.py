"""Headline benchmark: wall-clock for one full training generation.

Runs the reference's default workload — 1200 self-play games x 800 MCTS
simulations per move with the published example-net architecture
(filters=64, fc=6, res=6), then 5 epochs of SGD on the generated data —
entirely on-device, and compares against the reference's ~50 min/generation
(``/root/reference/README.md:43``; BASELINE.md).

Prints exactly one JSON line:
  {"metric": "generation_wall_clock", "value": <seconds>, "unit": "s",
   "vs_baseline": <reference_seconds / value>}

Extra context lines go to stderr. Set BENCH_FAST=1 for a reduced workload
(CI smoke), BENCH_GAMES/BENCH_SIMS to override.
"""

import json
import os
import sys
import time

REFERENCE_GENERATION_SECONDS = 50 * 60  # README.md:43 — ~50 min/generation


def log(*args):
    print(*args, file=sys.stderr, flush=True)


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from connect4_tpu.utils import enable_compilation_cache

    enable_compilation_cache()

    fast = os.environ.get("BENCH_FAST") == "1"
    n_games = int(os.environ.get("BENCH_GAMES", 128 if fast else 1200))
    sims = int(os.environ.get("BENCH_SIMS", 64 if fast else 800))
    # AlphaZero-standard leaf parallelism (virtual-visit walkers); set
    # BENCH_PARALLEL_SIMS=1 for the exact sequential reference semantics.
    parallel = int(os.environ.get("BENCH_PARALLEL_SIMS", 8))
    sims_per_call = int(os.environ.get("BENCH_SIMS_PER_CALL", 0)) or min(sims, 200)
    # compact-and-refill slot pool (slots < games keeps every search row
    # busy); BENCH_SLOTS=0 selects the pure-lockstep path instead. In fast
    # mode keep slots strictly below n_games so the smoke run still
    # exercises the refill path (the production default).
    # 512 slots at K=8 evaluates leaves at batch 4096 — measurably higher
    # MXU utilisation than 2048 now the tree-walk share is small
    default_slots = min(256, n_games // 2) if fast else min(512, n_games)
    slots = int(os.environ.get("BENCH_SLOTS", default_slots))

    from connect4_tpu.config import MCTSConfig, ModelConfig, NetConfig
    from connect4_tpu.eval.evaluators import make_net_evaluator
    from connect4_tpu.models import init_net
    from connect4_tpu.training.learner import (
        TrainState,
        make_optimizer,
        make_train_step,
        set_learning_rate,
    )
    from connect4_tpu.training.self_play import (
        make_refill_play_fn,
        make_stepwise_play_fn,
        training_arrays,
    )

    log(f"devices: {jax.devices()}")
    log(f"workload: {n_games} games x {sims} sims")

    net_config = NetConfig(
        filters=64, n_fc_layers=6, n_residuals=6, compute_dtype="bfloat16"
    )
    model_config = ModelConfig(net_config=net_config)
    net, variables = init_net(net_config, jax.random.key(0))
    optimizer = make_optimizer(model_config)
    state = TrainState(
        params=variables["params"],
        batch_stats=variables["batch_stats"],
        opt_state=set_learning_rate(
            optimizer.init(variables["params"]), model_config.initial_lr
        ),
    )

    search_config = MCTSConfig(
        simulations=sims,
        root_dirichlet_alpha=0.3,
        root_exploration_fraction=0.25,
        num_sampling_moves=6,
        parallel_sims=parallel,
    )
    log(f"parallel_sims: {parallel}  sims_per_call: {sims_per_call}  slots: {slots or n_games}")
    evaluator = make_net_evaluator(net, state.params, state.batch_stats)
    if slots and slots < n_games:
        play = make_refill_play_fn(
            evaluator, search_config, slots, n_games, sims_per_call
        )
    else:
        play = make_stepwise_play_fn(
            evaluator, search_config, n_games, sims_per_call
        )
    train_step = jax.jit(make_train_step(net, optimizer))

    # compile both programs outside the timed region (one-time cost,
    # persisted by the compilation cache across runs)
    t0 = time.time()
    warm = jax.block_until_ready(play(
        jax.random.key(99),
        progress=lambda t, n: log(f"  warm ply {t}: {n} live games {time.time()-t0:.0f}s"),
    ))
    log(f"self-play compile+first generation: {time.time() - t0:.1f}s")
    planes_w, values_w, policies_w = training_arrays(warm)
    m = min(len(values_w), model_config.batch_size)
    dummy = (
        jnp.asarray(np.moveaxis(planes_w[:m], 1, -1), dtype=jnp.float32),
        jnp.asarray(values_w[:m]),
        jnp.asarray(policies_w[:m]),
    )
    t0 = time.time()
    jax.block_until_ready(train_step(state, *dummy))
    log(f"train-step compile+first run: {time.time() - t0:.1f}s")

    # ---- timed generation --------------------------------------------------
    t_gen = time.time()
    out = jax.block_until_ready(play(jax.random.key(0)))
    t_selfplay = time.time() - t_gen

    planes, values, policies = training_arrays(out)
    n = len(values)
    # stored uint8 NCHW layout; the train step fuses the f32/NHWC
    # conversion (same path as TrainingLoop._train)
    planes_d = jnp.asarray(planes)
    values_d = jnp.asarray(values)
    policies_d = jnp.asarray(policies)
    batch_size = min(model_config.batch_size, n)
    from connect4_tpu.training.learner import make_batch_gather

    gather = make_batch_gather(batch_size)
    n_full = (n // batch_size) * batch_size
    gather_tail = make_batch_gather(n - n_full) if n > n_full else None
    key = jax.random.key(1)
    for _ in range(model_config.n_training_epochs):
        key, perm_key = jax.random.split(key)
        order = jax.random.permutation(perm_key, n)
        arrays = (planes_d, values_d, policies_d)
        for i in range(0, n_full, batch_size):
            batch = gather(arrays, order, np.int32(i))
            state, metrics = train_step(state, *batch)
        if gather_tail is not None:
            batch = gather_tail(arrays, order, np.int32(n_full))
            state, metrics = train_step(state, *batch)
    jax.block_until_ready(state)
    t_total = time.time() - t_gen

    moves_played = int(np.asarray(out.mask).sum())
    sims_total = moves_played * sims
    log(
        f"self-play: {t_selfplay:.1f}s  training: {t_total - t_selfplay:.1f}s  "
        f"moves: {moves_played}  positions: {n}"
    )
    log(
        f"throughput: {moves_played / t_selfplay:,.0f} moves/s, "
        f"{sims_total / t_selfplay:,.0f} sims/s"
    )

    # scale measured time to the reference workload if overridden
    scale = (1200 * 800) / (n_games * sims)
    effective = t_total * scale if scale != 1.0 else t_total
    if scale != 1.0:
        log(f"(scaled x{scale:.1f} to the 1200x800 reference workload)")

    print(
        json.dumps(
            {
                "metric": "generation_wall_clock",
                "value": round(effective, 2),
                "unit": "s",
                "vs_baseline": round(REFERENCE_GENERATION_SECONDS / effective, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
