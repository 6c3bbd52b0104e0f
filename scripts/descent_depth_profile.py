"""Measure the two quantities that decide whether age-banded search calls
can cut the self-play tree-walk floor (ENGINEERING_LOG round-5 lever):

1. **Descent depth vs board age** — the per-wave while_loop runs
   ``max(depth)`` iterations over all rows; every iteration touches every
   row. If old (shallow-remaining) boards have much shallower trees than
   young boards, a mixed-age refill pool makes every row pay the young
   rows' depth.
2. **Segment cost vs row count** — splitting one 256-row search call into
   age bands only pays if the per-iteration cost actually shrinks with
   rows (bandwidth-bound), not if small gathers are latency-bound.

Usage: python scripts/descent_depth_profile.py [--sims 800] [--k 8]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def live_boards_at_ply(ply, rows, seed):
    """Random playouts to ``ply``, rejection-sampled to keep live rows."""
    import numpy as np

    import jax
    import jax.numpy as jnp

    from connect4_tpu.env.core import initial_state, legal_moves, step

    rand_step = jax.jit(
        lambda st, k: step(
            st,
            jax.random.categorical(
                k, jnp.where(legal_moves(st), 0.0, -jnp.inf)
            ).astype(jnp.int32),
            st.result == 0,
        )
    )
    collected = []
    n_have = 0
    key = jax.random.key(seed)
    for _ in range(64):  # retry budget
        key, sub = jax.random.split(key)
        state = initial_state((rows * 2,))
        for _ in range(ply):
            sub, k2 = jax.random.split(sub)
            state = rand_step(state, k2)
        alive = np.asarray(state.result) == 0
        idx = np.nonzero(alive)[0]
        if len(idx):
            sel = jax.tree_util.tree_map(lambda x: np.asarray(x)[idx], state)
            collected.append(sel)
            n_have += len(idx)
        if n_have >= rows:
            break
    import jax.tree_util as jtu

    cat = jtu.tree_map(lambda *xs: np.concatenate(xs)[:rows], *collected)
    from connect4_tpu.env.core import BoardState

    return BoardState(*[jnp.asarray(x) for x in cat])


def measure_depth(tree, state, config, capacity):
    """Replicate _simulate_parallel's descent, returning per-row depth."""
    import jax
    import jax.numpy as jnp

    from connect4_tpu.mcts.batched import (
        _argmax_prefer_large,
        _const_overlay_scores,
        _descend_valid,
        _light_step,
        _take_node,
    )

    K = config.parallel_sims
    batch = state.age.shape[0]
    node0 = jnp.zeros((batch,), jnp.int32)

    def cond(carry):
        _, _, descending, _ = carry
        return jnp.any(descending)

    def body(carry):
        node, board, descending, depth = carry
        valid = _descend_valid(board)
        scores = _const_overlay_scores(tree, node, board, config, valid, K)
        move = _argmax_prefer_large(scores)
        base = _take_node(tree.children_base, node)
        child = base + move
        board = _light_step(board, move, descending)
        node = jnp.where(descending, child, node)
        depth = depth + descending.astype(jnp.int32)
        has_kids = _take_node(tree.children_base, node) >= 0
        return node, board, descending & has_kids, depth

    descending0 = _take_node(tree.children_base, node0) >= 0
    _, _, _, depth = jax.lax.while_loop(
        cond, body, (node0, state, descending0, jnp.zeros((batch,), jnp.int32))
    )
    return depth


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--sims", type=int, default=800)
    parser.add_argument("--k", type=int, default=8)
    parser.add_argument("--sims-per-call", type=int, default=200)
    parser.add_argument("--rows", type=int, default=256)
    parser.add_argument("--random-net", action="store_true")
    args = parser.parse_args()

    import json

    import numpy as np

    import jax
    import jax.numpy as jnp

    from connect4_tpu.config import MCTSConfig, ModelConfig, NetConfig
    from connect4_tpu.eval.evaluators import make_net_evaluator
    from connect4_tpu.mcts.batched import _root_init, _run_sims
    from connect4_tpu.models import init_net
    from connect4_tpu.training import checkpoint as ckpt
    from connect4_tpu.training.learner import TrainState, make_optimizer
    from connect4_tpu.utils import enable_compilation_cache

    enable_compilation_cache()
    print(f"devices: {jax.devices()}", flush=True)

    packaged = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "connect4_tpu", "data", "files", "example_net",
    )
    with open(os.path.join(packaged, "net_config.json")) as fh:
        net_config = NetConfig(**json.load(fh))
    net, variables = init_net(net_config, jax.random.key(0))
    params, batch_stats = variables["params"], variables["batch_stats"]
    if not args.random_net:
        optimizer = make_optimizer(ModelConfig(net_config=net_config))
        template = TrainState(params, batch_stats, optimizer.init(params))
        state_t, _ = ckpt.restore_checkpoint(
            packaged, 161, template, jax.random.key(0)
        )
        params, batch_stats = state_t.params, state_t.batch_stats
        print("loaded packaged gen-161 net", flush=True)
    eval_fn = make_net_evaluator(net, params, batch_stats)

    config = MCTSConfig(
        simulations=args.sims,
        root_dirichlet_alpha=0.3,
        root_exploration_fraction=0.25,
        num_sampling_moves=6,
        parallel_sims=args.k,
    )
    capacity = config.tree_capacity()
    n_segments = args.sims // args.sims_per_call

    init_jit = jax.jit(
        lambda st, k: _root_init(
            eval_fn, st, k, config, jnp.ones((st.age.shape[0],), jnp.bool_)
        )
    )
    seg_jit = jax.jit(
        lambda tr, st: _run_sims(
            eval_fn, tr, st, config,
            jnp.ones((st.age.shape[0],), jnp.bool_), args.sims_per_call,
        )
    )
    depth_jit = jax.jit(
        lambda tr, st: measure_depth(tr, st, config, capacity)
    )

    # ---- 1. depth vs age --------------------------------------------------
    print("\n== descent depth by board age (rows=%d) ==" % args.rows)
    print("age | after 1st segment (mean/p95/max) | after final (mean/p95/max)")
    for ply in (2, 8, 14, 20, 26, 32):
        st = live_boards_at_ply(ply, args.rows, seed=ply)
        tree = init_jit(st, jax.random.key(ply))
        depths = []
        for s in range(n_segments):
            tree = seg_jit(tree, st)
            if s == 0 or s == n_segments - 1:
                d = np.asarray(depth_jit(tree, st))
                depths.append((d.mean(), np.percentile(d, 95), d.max()))
        (m1, p1, x1), (m2, p2, x2) = depths[0], depths[-1]
        print(
            f"{ply:3d} | {m1:5.1f} / {p1:5.1f} / {x1:3d}"
            f"          | {m2:5.1f} / {p2:5.1f} / {x2:3d}",
            flush=True,
        )

    # ---- 2. segment cost vs rows ------------------------------------------
    # realistic mixed-age pool: equal parts ply 2..32
    print("\n== one %d-sim segment wall-time vs rows (mixed ages) ==" %
          args.sims_per_call)
    import jax.tree_util as jtu

    def mixed_pool(rows, seed):
        parts = []
        plies = (2, 8, 14, 20, 26, 32)
        per = rows // len(plies)
        for i, ply in enumerate(plies):
            n = per if i < len(plies) - 1 else rows - per * (len(plies) - 1)
            parts.append(live_boards_at_ply(ply, n, seed=seed + i))
        return jtu.tree_map(lambda *xs: jnp.concatenate(xs), *parts)

    for rows in (32, 64, 128, 256, 512):
        st = mixed_pool(rows, seed=1000 + rows)
        tree = init_jit(st, jax.random.key(rows))
        tree = jax.block_until_ready(seg_jit(tree, st))  # warm + grow tree
        n_rep = 3
        t0 = time.time()
        for _ in range(n_rep):
            tree2 = jax.block_until_ready(seg_jit(tree, st))
        dt = (time.time() - t0) / n_rep * 1e3
        d = np.asarray(depth_jit(tree2, st))
        print(
            f"rows {rows:4d}: {dt:7.1f} ms/segment"
            f"  ({dt/rows*256:6.1f} ms row-normalised to 256)"
            f"  depth mean/max {d.mean():.1f}/{d.max()}",
            flush=True,
        )


if __name__ == "__main__":
    main()
