"""Batched flat-tensor MCTS under jit.

This is the TPU-native replacement for the reference's pointer-tree search
(``/root/reference/oinkoink/mcts.py:94-121``, ``tree.py:61-147``): instead
of one Python object tree per game walked by 200 threads feeding a
cross-process inference server, every game in a batch owns a slab of
preallocated tree tensors, and one simulation for *all* games is a single
fixed-shape array program — PUCT selection is a masked argmax over child
slots, expansion is an index allocation plus seven vectorised env steps,
leaf evaluation is one batched network forward, and backup is a gather /
scatter walk along parent pointers. The whole search compiles once and
stays on-device.

Semantics match the host oracle (``connect4_tpu.mcts.host``) — and through
it the reference — including: value-based move selection, value^2 sampling
for opening plies, root-only Dirichlet noise, masked-renormalised priors,
"unknown child = 0.0", terminal revisit re-accumulation, and largest-move
tie-breaks. Fidelity is enforced by tests/test_mcts.py.

Performance notes (the descent/backup loops run ~tree-depth iterations per
simulation, so per-iteration op count is the critical constant):

- Per-node search statistics are packed into one float32 ``stats[B, N, 4]``
  slab (visits, value sum, terminal value, terminal flag) so PUCT needs a
  single child-block gather and backup a single scatter-add.
- Descent steps the board with a win-check-free "light" step; terminality
  along the walked path is already known from the tree metadata.

Memory layout per game (N = tree capacity = 1 + 7*simulations by default):
child slots are allocated seven at a time, so a node's children occupy the
contiguous block ``[children_base, children_base + 7)`` and the move that
leads to a child is its offset in the block. Invalid moves still get slots;
they are unselectable (score = -inf under the legal-move mask).
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from connect4_tpu.config import MCTSConfig
from connect4_tpu.env.core import (
    BoardState,
    legal_moves,
    result_value,
    step,
    to_planes,
)
from connect4_tpu.eval.evaluators import BatchedEvaluator
from connect4_tpu.types import HEIGHT, ONGOING, WIDTH

NEG_INF = jnp.float32(-jnp.inf)

# longest possible backup path: root + one node per ply of a full board
# + one freshly expanded child
PATH_MAX = 44

# stats slab channels
_VISITS = 0
_VSUM = 1
_TVAL = 2
_TERM = 3


class TreeArrays(NamedTuple):
    """Struct-of-arrays search tree, batch-major ([B, N, ...])."""

    parent: jax.Array  # int32[B, N], -1 for root
    children_base: jax.Array  # int32[B, N], -1 = unexpanded
    stats: jax.Array  # float32[B, N, 4] — visits, value_sum, tval, terminal
    prior: jax.Array  # float32[B, N, 7] — node's own masked prior
    evaluated: jax.Array  # bool[B, N]
    next_free: jax.Array  # int32[B]

    # convenience views used by tests/tooling
    @property
    def visits(self) -> jax.Array:
        return self.stats[..., _VISITS].astype(jnp.int32)

    @property
    def value_sum(self) -> jax.Array:
        return self.stats[..., _VSUM]

    @property
    def tval(self) -> jax.Array:
        return self.stats[..., _TVAL]

    @property
    def terminal(self) -> jax.Array:
        return self.stats[..., _TERM] > 0.5


class SearchResults(NamedTuple):
    move: jax.Array  # int32[B] — chosen move
    value: jax.Array  # float32[B] — absolute value of the chosen child
    values_policy: jax.Array  # float32[B, 7] — normalised child values (training target)
    visit_policy: jax.Array  # float32[B, 7] — normalised child visit counts
    root_value: jax.Array  # float32[B] — root mean search value
    tree: TreeArrays


def _empty_tree(batch: int, capacity: int) -> TreeArrays:
    return TreeArrays(
        parent=jnp.full((batch, capacity), -1, jnp.int32),
        children_base=jnp.full((batch, capacity), -1, jnp.int32),
        stats=jnp.zeros((batch, capacity, 4), jnp.float32),
        prior=jnp.zeros((batch, capacity, WIDTH), jnp.float32),
        evaluated=jnp.zeros((batch, capacity), jnp.bool_),
        next_free=jnp.ones((batch,), jnp.int32),  # slot 0 is the root
    )


def _mask_normalise(prior: jax.Array, valid: jax.Array) -> jax.Array:
    """Zero illegal moves and renormalise (``mcts.py:197-203``); uniform
    over legal moves if the masked mass vanishes (guards finished games in
    lockstep batches — unreachable for live searches)."""
    masked = jnp.where(valid, prior, 0.0)
    total = masked.sum(axis=-1, keepdims=True)
    n_valid = jnp.maximum(valid.sum(axis=-1, keepdims=True), 1)
    uniform = valid.astype(jnp.float32) / n_valid
    return jnp.where(total > 0, masked / jnp.where(total > 0, total, 1.0), uniform)


def _take_node(arr: jax.Array, idx: jax.Array) -> jax.Array:
    """arr[B, N, ...] gathered at per-game node index idx[B] -> [B, ...]."""
    return jnp.take_along_axis(
        arr, idx.reshape(idx.shape + (1,) * (arr.ndim - 1)), axis=1
    ).squeeze(1)


def _take_child_block(arr: jax.Array, base: jax.Array) -> jax.Array:
    """arr[B, N, ...] gathered at the 7-slot block from base[B] -> [B, 7, ...]."""
    idx = base[:, None] + jnp.arange(WIDTH, dtype=jnp.int32)[None, :]
    idx = jnp.clip(idx, 0, arr.shape[1] - 1)
    return jnp.take_along_axis(
        arr, idx.reshape(idx.shape + (1,) * (arr.ndim - 2)), axis=1
    )


def _value_to_side(abs_value: jax.Array, side: jax.Array) -> jax.Array:
    return jnp.where(side == 0, abs_value, 1.0 - abs_value)


def _light_step(board: BoardState, move: jax.Array, enabled: jax.Array) -> BoardState:
    """Descent-only board step: drop the stone, no terminal detection.

    Terminality along the descent path is known from the tree (terminal
    nodes are never expanded), so the win-check in ``env.step`` would be
    dead weight inside the hottest loop. ``result`` is left untouched;
    downstream consumers of descent boards never read it for the nodes
    this steps through (see search phase comments)."""
    player = (board.age % 2).astype(jnp.int32)
    row = jnp.take_along_axis(board.height, move[..., None], axis=-1)[..., 0]
    rows = jnp.arange(HEIGHT, dtype=jnp.int32)
    cols = jnp.arange(WIDTH, dtype=jnp.int32)
    cell = (rows[:, None] == row[..., None, None]) & (
        cols[None, :] == move[..., None, None]
    )
    side_sel = jnp.arange(2, dtype=jnp.int32)[:, None, None] == player[..., None, None, None]
    update = side_sel & cell[..., None, :, :]
    enabled_b = enabled.reshape(enabled.shape + (1, 1, 1))
    return BoardState(
        pieces=jnp.where(enabled_b, board.pieces | update, board.pieces),
        height=jnp.where(
            enabled[..., None],
            board.height + (cols == move[..., None]).astype(jnp.int32),
            board.height,
        ),
        age=jnp.where(enabled, board.age + 1, board.age),
        result=board.result,
    )


def _descend_valid(board: BoardState) -> jax.Array:
    """Legal moves during descent: open columns only. Nodes with children
    are never terminal, so the env's result mask is redundant here."""
    return board.height < HEIGHT


def _child_score_parts(
    node_stats: jax.Array,  # [B, 4]
    child: jax.Array,  # [B, 7, 4]
    prior_row: jax.Array,  # [B, 7]
    side: jax.Array,  # [B]
    config: MCTSConfig,
    valid: jax.Array,
) -> jax.Array:
    """``_child_scores`` on pre-gathered inputs (see
    ``_const_overlay_score_parts`` for why the hot loop pre-gathers)."""
    parent_visits = node_stats[..., _VISITS]
    log_term = jnp.log(
        (parent_visits + jnp.float32(config.pb_c_base) + 1.0)
        / jnp.float32(config.pb_c_base)
    )
    pb_c0 = (log_term + jnp.float32(config.pb_c_init)) * jnp.sqrt(parent_visits)

    c_visits = child[..., _VISITS]
    c_vsum = child[..., _VSUM]
    c_tval = child[..., _TVAL]
    c_term = child[..., _TERM] > 0.5

    mean = c_vsum / jnp.maximum(c_visits, 1.0)
    abs_val = jnp.where(c_term, c_tval, jnp.where(c_visits > 0, mean, 0.0))
    known = c_term | (c_visits > 0)
    value_score = jnp.where(known, _value_to_side(abs_val, side[:, None]), 0.0)

    pb_c = pb_c0[:, None] / (c_visits + 1.0)
    scores = pb_c * prior_row + value_score

    return jnp.where(valid, scores, NEG_INF)


def _child_scores(
    tree: TreeArrays,
    node: jax.Array,
    board: BoardState,
    config: MCTSConfig,
    valid: jax.Array,
) -> jax.Array:
    """PUCT scores for all 7 child slots of ``node``; -inf on illegal moves.

    Mirrors ``ucb_score`` (``/root/reference/oinkoink/mcts.py:147-161``) in
    float32 with the same operation order as the host oracle.
    """
    base = _take_node(tree.children_base, node)  # [B]
    side = (board.age % 2).astype(jnp.int32)
    node_stats = _take_node(tree.stats, node)  # [B, 4]
    child = _take_child_block(tree.stats, base)  # [B, 7, 4]
    prior_row = _take_node(tree.prior, node)  # [B, 7]
    return _child_score_parts(node_stats, child, prior_row, side, config, valid)


def _argmax_prefer_large(scores: jax.Array) -> jax.Array:
    """Argmax over the move axis breaking ties toward the larger index,
    matching the reference's ``max((score, child))`` with ``Node.__gt__``
    by name (``/root/reference/oinkoink/tree.py:10-15``)."""
    flipped = scores[..., ::-1]
    return jnp.int32(WIDTH - 1) - jnp.argmax(flipped, axis=-1).astype(jnp.int32)


def _scatter_node(arr: jax.Array, idx: jax.Array, values: jax.Array, active: jax.Array) -> jax.Array:
    """arr[B, N, ...].at[b, idx[b]] <- values[b] where active[b]."""
    capacity = arr.shape[1]
    safe_idx = jnp.where(active, idx, capacity)  # OOB rows dropped
    rows = jnp.arange(arr.shape[0])
    return arr.at[rows, safe_idx].set(values, mode="drop")


def _expand_metadata(board: BoardState) -> Tuple[jax.Array, jax.Array]:
    """For each of the 7 moves from ``board``: (is_terminal[B,7], tval[B,7]).

    The vectorised analogue of the reference expanding one ply and calling
    ``make_move`` per child (``tree.py:119-132``): child results are known
    at creation time, which is what lets fresh terminal children be
    selected by value immediately.

    One widened env step over a trailing 7-move axis rather than seven
    sequential steps: the expansion phase is op-launch-latency bound (the
    arrays are tiny), so collapsing 7x the op count into one batched step
    is a direct wall-clock win with identical values (``step`` is
    elementwise over its leading batch shape).
    """
    bs = board.age.shape
    nb = len(bs)
    tile = lambda x: jnp.broadcast_to(
        jnp.expand_dims(x, nb), bs + (WIDTH,) + x.shape[nb:]
    )
    tiled = jax.tree_util.tree_map(tile, board)
    moves = jnp.broadcast_to(jnp.arange(WIDTH, dtype=jnp.int32), bs + (WIDTH,))
    child = step(tiled, moves)
    return child.result != ONGOING, result_value(child.result)


def search(
    eval_fn: BatchedEvaluator,
    root_state: BoardState,
    key: jax.Array,
    config: MCTSConfig,
    active: Optional[jax.Array] = None,
) -> SearchResults:
    """Run ``config.simulations`` PUCT simulations for every game in the
    batch and return chosen moves plus training targets.

    ``active`` masks games (finished games in lockstep self-play): inactive
    games' tree updates are suppressed and their outputs are defined but
    meaningless (callers must mask).

    Equivalent end-to-end to ``search`` + ``MCTS.make_move``
    (``/root/reference/oinkoink/mcts.py:78-121``).
    """
    if active is None:
        active = jnp.ones((root_state.age.shape[0],), jnp.bool_)
    sample_key = _sample_key(key)
    tree = _root_init(eval_fn, root_state, key, config, active)
    tree = _run_sims(eval_fn, tree, root_state, config, active, config.simulations)
    root_valid = legal_moves(root_state)
    return _finish(tree, root_state, sample_key, config, root_valid)


def _sample_key(key: jax.Array) -> jax.Array:
    """Key used for opening-move sampling (split identically to the noise
    key derivation in ``_root_init`` so behaviour is reproducible)."""
    _, sample_key = jax.random.split(key)
    return sample_key


def _root_init(
    eval_fn: BatchedEvaluator,
    root_state: BoardState,
    key: jax.Array,
    config: MCTSConfig,
    active: jax.Array,
) -> TreeArrays:
    """Evaluate the root and mix in Dirichlet noise once (``mcts.py:100-105``)."""
    batch = root_state.age.shape[0]
    capacity = config.tree_capacity()
    tree = _empty_tree(batch, capacity)

    root_value, root_prior_raw = eval_fn(root_state)
    root_valid = legal_moves(root_state)
    root_prior = _mask_normalise(root_prior_raw, root_valid)

    noise_key, _ = jax.random.split(key)
    if config.root_dirichlet_alpha and config.root_exploration_fraction:
        noise = jax.random.gamma(
            noise_key, jnp.float32(config.root_dirichlet_alpha), (batch, WIDTH)
        )
        noise = _mask_normalise(noise, root_valid)
        frac = jnp.float32(config.root_exploration_fraction)
        root_prior = root_prior * (1.0 - frac) + noise * frac

    root_stats = jnp.zeros((batch, 4), jnp.float32)
    root_stats = root_stats.at[:, _VISITS].set(1.0)
    root_stats = root_stats.at[:, _VSUM].set(root_value.astype(jnp.float32))
    return tree._replace(
        prior=tree.prior.at[:, 0, :].set(root_prior),
        evaluated=tree.evaluated.at[:, 0].set(True),
        stats=tree.stats.at[:, 0, :].set(root_stats),
    )


def _run_sims(
    eval_fn: BatchedEvaluator,
    tree: TreeArrays,
    root_state: BoardState,
    config: MCTSConfig,
    active: jax.Array,
    n_sims: int,
) -> TreeArrays:
    """Advance the search by ``n_sims`` simulations (static count) —
    chunkable so hosts can split one search across several device calls."""
    capacity = config.tree_capacity()
    if config.parallel_sims > 1:
        if n_sims % config.parallel_sims:
            raise ValueError("simulations must be divisible by parallel_sims")
        iterations = n_sims // config.parallel_sims
        step_fn = functools.partial(
            _simulate_parallel,
            eval_fn=eval_fn,
            config=config,
            root_state=root_state,
            active=active,
            capacity=capacity,
        )
        return jax.lax.fori_loop(0, iterations, step_fn, tree)
    step_fn = functools.partial(
        _simulate_exact,
        eval_fn=eval_fn,
        config=config,
        root_state=root_state,
        active=active,
        capacity=capacity,
    )
    return jax.lax.fori_loop(0, n_sims, step_fn, tree)


def _simulate_exact(
    _, tree: TreeArrays, *, eval_fn, config, root_state, active, capacity
) -> TreeArrays:
    batch = root_state.age.shape[0]
    rows = jnp.arange(batch)
    # --- phase 1: descend to a childless node -------------------------
    # The walked path is recorded (lockstep: every still-descending game
    # is at depth i after i steps, so one column write per iteration)
    # which turns the backup walk into a single scatter-add.
    # (A variant carrying the node's stats/children_base across
    # iterations to trade two [B] gathers for loop-carried state measured
    # a consistent ~4% SLOWER on v5e — the small gathers are cheaper than
    # the extra carry traffic; see ENGINEERING_LOG round 4.)
    def desc_cond(carry):
        _, _, descending, _, _, _ = carry
        return jnp.any(descending)

    def desc_body(carry):
        node, board, descending, path, depth, i = carry
        valid = _descend_valid(board)
        scores = _child_scores(tree, node, board, config, valid)
        move = _argmax_prefer_large(scores)
        base = _take_node(tree.children_base, node)
        child = base + move
        board = _light_step(board, move, descending)
        node = jnp.where(descending, child, node)
        path = jax.lax.dynamic_update_slice(
            path, jnp.where(descending, node, capacity)[:, None], (0, i + 1)
        )
        depth = depth + descending.astype(jnp.int32)
        has_kids = _take_node(tree.children_base, node) >= 0
        return node, board, descending & has_kids, path, depth, i + 1

    node0 = jnp.zeros((batch,), jnp.int32)
    descending0 = active & (_take_node(tree.children_base, node0) >= 0)
    path0 = jnp.full((batch, PATH_MAX), capacity, jnp.int32)
    path0 = path0.at[:, 0].set(jnp.where(active, 0, capacity))
    leaf, leaf_board, _, path, depth, _ = jax.lax.while_loop(
        desc_cond,
        desc_body,
        (node0, root_state, descending0, path0, jnp.zeros((batch,), jnp.int32),
         jnp.int32(0)),
    )

    # --- phase 2: expand evaluated non-terminal leaves ----------------
    leaf_eval = _take_node(tree.evaluated, leaf)
    leaf_stats = _take_node(tree.stats, leaf)
    leaf_term = leaf_stats[..., _TERM] > 0.5
    need_expand = active & leaf_eval & ~leaf_term

    base = jnp.minimum(tree.next_free, capacity - WIDTH)
    children_base = _scatter_node(tree.children_base, leaf, base, need_expand)
    next_free = jnp.where(
        need_expand, jnp.minimum(tree.next_free + WIDTH, capacity), tree.next_free
    )

    # fresh children metadata: one stats row per slot + parent pointers.
    # note: leaf_board.result is accurate ONGOING here for expanding
    # games (their leaves are non-terminal by construction), so the full
    # env step inside _expand_metadata computes true child results.
    child_term, child_tval = _expand_metadata(leaf_board)
    child_stats = jnp.zeros((batch, WIDTH, 4), jnp.float32)
    child_stats = child_stats.at[..., _TVAL].set(child_tval)
    child_stats = child_stats.at[..., _TERM].set(child_term.astype(jnp.float32))

    slot_idx = base[:, None] + jnp.arange(WIDTH, dtype=jnp.int32)[None, :]
    safe_slots = jnp.where(need_expand[:, None], slot_idx, capacity)
    parent = tree.parent.at[rows[:, None], safe_slots].set(
        leaf[:, None], mode="drop"
    )
    stats = tree.stats.at[rows[:, None], safe_slots].set(
        child_stats, mode="drop"
    )
    evaluated = tree.evaluated.at[rows[:, None], safe_slots].set(
        False, mode="drop"
    )
    children_base = children_base.at[rows[:, None], safe_slots].set(
        -1, mode="drop"
    )

    tree2 = TreeArrays(
        parent=parent,
        children_base=children_base,
        stats=stats,
        prior=tree.prior,
        evaluated=evaluated,
        next_free=next_free,
    )

    # select one fresh child where we expanded
    valid2 = _descend_valid(leaf_board)
    scores = _child_scores(tree2, leaf, leaf_board, config, valid2)
    move2 = _argmax_prefer_large(scores)
    stepped = _light_step(leaf_board, move2, need_expand)
    cur = jnp.where(need_expand, base + move2, leaf)
    cur_board = stepped

    # --- phase 3: evaluate the leaf -----------------------------------
    cur_stats = _take_node(tree2.stats, cur)
    cur_term = cur_stats[..., _TERM] > 0.5
    value_net, prior_net = eval_fn(cur_board)
    value = jnp.where(
        cur_term, cur_stats[..., _TVAL], value_net.astype(jnp.float32)
    )

    # legality for prior masking: open columns (terminal leaves are
    # excluded by cur_term; descent boards carry stale result flags)
    cur_valid = _descend_valid(cur_board)
    prior_masked = _mask_normalise(prior_net, cur_valid)
    store_prior = active & ~cur_term & ~_take_node(tree2.evaluated, cur)
    prior_arr = _scatter_node(tree2.prior, cur, prior_masked, store_prior)
    evaluated2 = _scatter_node(
        tree2.evaluated, cur, jnp.ones((batch,), jnp.bool_), store_prior
    )

    # --- phase 4: backup along the recorded path ----------------------
    # Every node on the root..leaf path plus (if expanded) the fresh
    # child receives (1 visit, value) — one scatter-add instead of a
    # parent-pointer walk. Indices within a row are distinct, so the
    # result is bitwise identical to the sequential walk.
    path = path.at[rows, depth + 1].set(
        jnp.where(need_expand, cur, capacity), mode="drop"
    )
    incr = jnp.stack(
        [jnp.ones((batch,), jnp.float32), value,
         jnp.zeros((batch,), jnp.float32), jnp.zeros((batch,), jnp.float32)],
        axis=-1,
    )  # [B, 4] — adds 1 visit and the value, leaves tval/term alone
    stats2 = tree2.stats.at[rows[:, None], path].add(
        incr[:, None, :], mode="drop"
    )

    return tree2._replace(
        stats=stats2,
        prior=prior_arr,
        evaluated=evaluated2,
    )



def _overlay_scores(
    tree: TreeArrays,
    voverlay: jax.Array,
    node: jax.Array,
    board: BoardState,
    config: MCTSConfig,
    valid: jax.Array,
) -> jax.Array:
    """PUCT scores with a virtual-visit overlay (parallel walkers).

    Virtual visits count as losses from the selecting node's perspective:
    effective value = (side-oriented real value sum) / (n + overlay), and
    the exploration denominator uses n + overlay as well. With overlay = 0
    this reduces exactly to ``_child_scores``.
    """
    lead = node.shape  # [B] or [B, K]
    base = jnp.take_along_axis(
        tree.children_base, node.reshape(lead[0], -1), axis=1
    ).reshape(lead)
    side = (board.age % 2).astype(jnp.int32)

    node_flat = node.reshape(lead[0], -1)
    node_stats = jnp.take_along_axis(
        tree.stats, node_flat[..., None], axis=1
    ).reshape(lead + (4,))
    node_ov = jnp.take_along_axis(voverlay, node_flat, axis=1).reshape(lead)
    parent_visits = node_stats[..., _VISITS] + node_ov
    log_term = jnp.log(
        (parent_visits + jnp.float32(config.pb_c_base) + 1.0)
        / jnp.float32(config.pb_c_base)
    )
    pb_c0 = (log_term + jnp.float32(config.pb_c_init)) * jnp.sqrt(parent_visits)

    idx = base[..., None] + jnp.arange(WIDTH, dtype=jnp.int32)
    idx_flat = jnp.clip(idx.reshape(lead[0], -1), 0, tree.stats.shape[1] - 1)
    child = jnp.take_along_axis(
        tree.stats, idx_flat[..., None], axis=1
    ).reshape(lead + (WIDTH, 4))
    c_ov = jnp.take_along_axis(voverlay, idx_flat, axis=1).reshape(lead + (WIDTH,))

    c_visits = child[..., _VISITS]
    c_vsum = child[..., _VSUM]
    c_tval = child[..., _TVAL]
    c_term = child[..., _TERM] > 0.5

    n_eff = c_visits + c_ov
    side_sum = jnp.where(side[..., None] == 0, c_vsum, c_visits - c_vsum)
    diluted = side_sum / jnp.maximum(n_eff, 1.0)
    term_val = _value_to_side(c_tval, side[..., None])
    known = c_term | (c_visits > 0)
    value_score = jnp.where(c_term, term_val, jnp.where(known, diluted, 0.0))

    pb_c = pb_c0[..., None] / (n_eff + 1.0)
    prior_row = jnp.take_along_axis(
        tree.prior, node_flat[..., None], axis=1
    ).reshape(lead + (WIDTH,))
    scores = pb_c * prior_row + value_score
    return jnp.where(valid, scores, NEG_INF)


def _add_overlay(voverlay: jax.Array, node: jax.Array, active: jax.Array) -> jax.Array:
    """voverlay[b, node] += 1 where active (node: [B] or [B, K])."""
    capacity = voverlay.shape[1]
    flat = node.reshape(node.shape[0], -1)
    act = active.reshape(active.shape[0], -1)
    safe = jnp.where(act, flat, capacity)
    return voverlay.at[
        jnp.arange(voverlay.shape[0])[:, None], safe
    ].add(1.0, mode="drop")


def _simulate_parallel_reference(
    _, tree: TreeArrays, *, eval_fn, config, root_state, active, capacity
) -> TreeArrays:
    """Direct lockstep-walker formulation of one parallel iteration
    (K simulations per game concurrently, virtual-visit overlay).

    Superseded by ``_simulate_parallel`` below, which exploits the fact
    that lockstep walkers share their entire descent path: this version
    walks a redundant [B, K] walker axis through descent, expansion
    metadata and backup. Retained verbatim as the semantic golden
    reference for the optimised implementation (tests/test_mcts.py
    asserts equivalence); not used by any production path.
    """
    K = config.parallel_sims
    batch = root_state.age.shape[0]
    rows = jnp.arange(batch)

    voverlay = jnp.zeros((batch, capacity), jnp.float32)
    tile = lambda x: jnp.broadcast_to(
        x[:, None, ...], (batch, K) + x.shape[1:]
    )
    boards = jax.tree_util.tree_map(tile, root_state)
    nodes = jnp.zeros((batch, K), jnp.int32)
    active_k = jnp.broadcast_to(active[:, None], (batch, K))

    voverlay = _add_overlay(voverlay, nodes, active_k)

    # --- lockstep descent over the walker axis ----------------------------
    def desc_cond(carry):
        _, _, _, descending = carry
        return jnp.any(descending)

    def desc_body(carry):
        node, board, vov, descending = carry
        valid = board.height < HEIGHT  # [B, K, 7]
        scores = _overlay_scores(tree, vov, node, board, config, valid)
        move = _argmax_prefer_large(scores)
        base = jnp.take_along_axis(
            tree.children_base, node.reshape(batch, -1), axis=1
        ).reshape(batch, K)
        child = base + move
        board = _light_step(board, move, descending)
        node = jnp.where(descending, child, node)
        vov = _add_overlay(vov, node, descending)
        has_kids = (
            jnp.take_along_axis(
                tree.children_base, node.reshape(batch, -1), axis=1
            ).reshape(batch, K)
            >= 0
        )
        return node, board, vov, descending & has_kids

    descending0 = active_k & (
        jnp.take_along_axis(
            tree.children_base, nodes.reshape(batch, -1), axis=1
        ).reshape(batch, K)
        >= 0
    )
    nodes, boards, voverlay, _ = jax.lax.while_loop(
        desc_cond, desc_body, (nodes, boards, voverlay, descending0)
    )

    # --- sequential expansion + fresh-child step per walker ---------------
    new_nodes = []
    new_boards = []
    for k in range(K):
        leaf = nodes[:, k]
        board_k = jax.tree_util.tree_map(lambda x: x[:, k], boards)
        act = active_k[:, k]

        leaf_eval = _take_node(tree.evaluated, leaf)
        leaf_stats = _take_node(tree.stats, leaf)
        leaf_term = leaf_stats[..., _TERM] > 0.5
        expandable = act & leaf_eval & ~leaf_term
        need_alloc = expandable & (_take_node(tree.children_base, leaf) < 0)

        base = jnp.minimum(tree.next_free, capacity - WIDTH)
        children_base = _scatter_node(tree.children_base, leaf, base, need_alloc)
        next_free = jnp.where(
            need_alloc,
            jnp.minimum(tree.next_free + WIDTH, capacity),
            tree.next_free,
        )
        child_term, child_tval = _expand_metadata(board_k)
        child_stats = jnp.zeros((batch, WIDTH, 4), jnp.float32)
        child_stats = child_stats.at[..., _TVAL].set(child_tval)
        child_stats = child_stats.at[..., _TERM].set(child_term.astype(jnp.float32))
        slot_idx = base[:, None] + jnp.arange(WIDTH, dtype=jnp.int32)[None, :]
        safe_slots = jnp.where(need_alloc[:, None], slot_idx, capacity)
        parent = tree.parent.at[rows[:, None], safe_slots].set(
            leaf[:, None], mode="drop"
        )
        stats = tree.stats.at[rows[:, None], safe_slots].set(
            child_stats, mode="drop"
        )
        evaluated = tree.evaluated.at[rows[:, None], safe_slots].set(
            False, mode="drop"
        )
        children_base = children_base.at[rows[:, None], safe_slots].set(
            -1, mode="drop"
        )
        tree = TreeArrays(
            parent=parent,
            children_base=children_base,
            stats=stats,
            prior=tree.prior,
            evaluated=evaluated,
            next_free=next_free,
        )

        # step into a child wherever the leaf is (now) expanded
        valid = board_k.height < HEIGHT
        scores = _overlay_scores(tree, voverlay, leaf, board_k, config, valid)
        move = _argmax_prefer_large(scores)
        cb = _take_node(tree.children_base, leaf)
        stepped = _light_step(board_k, move, expandable)
        cur = jnp.where(expandable, cb + move, leaf)
        voverlay = _add_overlay(voverlay, cur, expandable)
        new_nodes.append(cur)
        new_boards.append(stepped)

    nodes = jnp.stack(new_nodes, axis=1)
    boards = jax.tree_util.tree_map(
        lambda *xs: jnp.stack(xs, axis=1), *new_boards
    )

    # --- lockstep evaluation ---------------------------------------------
    cur_stats = jnp.take_along_axis(
        tree.stats, nodes.reshape(batch, -1)[..., None], axis=1
    ).reshape(batch, K, 4)
    cur_term = cur_stats[..., _TERM] > 0.5
    flat_boards = jax.tree_util.tree_map(
        lambda x: x.reshape((batch * K,) + x.shape[2:]), boards
    )
    value_net, prior_net = eval_fn(flat_boards)
    value_net = value_net.reshape(batch, K)
    prior_net = prior_net.reshape(batch, K, WIDTH)
    value = jnp.where(
        cur_term, cur_stats[..., _TVAL], value_net.astype(jnp.float32)
    )

    cur_valid = boards.height < HEIGHT  # [B, K, 7]
    prior_masked = _mask_normalise(prior_net, cur_valid)
    cur_evaluated = jnp.take_along_axis(
        tree.evaluated, nodes.reshape(batch, -1), axis=1
    ).reshape(batch, K)
    store_prior = active_k & ~cur_term & ~cur_evaluated
    safe_nodes = jnp.where(store_prior, nodes, capacity)
    prior_arr = tree.prior.at[rows[:, None], safe_nodes].set(
        prior_masked, mode="drop"
    )
    evaluated2 = tree.evaluated.at[rows[:, None], safe_nodes].set(
        True, mode="drop"
    )

    # --- lockstep backup over the walker axis -----------------------------
    incr = jnp.stack(
        [
            jnp.ones((batch, K), jnp.float32),
            value,
            jnp.zeros((batch, K), jnp.float32),
            jnp.zeros((batch, K), jnp.float32),
        ],
        axis=-1,
    )  # [B, K, 4]

    def bp_cond(carry):
        _, _, alive = carry
        return jnp.any(alive)

    def bp_body(carry):
        idx, stats, alive = carry
        safe = jnp.where(alive, idx, capacity)
        stats = stats.at[rows[:, None], safe].add(incr, mode="drop")
        nxt = jnp.take_along_axis(
            tree.parent, jnp.maximum(idx, 0).reshape(batch, -1), axis=1
        ).reshape(batch, K)
        idx = jnp.where(alive, nxt, idx)
        return idx, stats, alive & (idx >= 0)

    _, stats2, _ = jax.lax.while_loop(
        bp_cond, bp_body, (nodes, tree.stats, active_k)
    )

    return tree._replace(stats=stats2, prior=prior_arr, evaluated=evaluated2)


def _const_overlay_score_parts(
    node_stats: jax.Array,  # [B, 4] — the selecting node's stats row
    child: jax.Array,  # [B, 7, 4] — its child block's stats
    prior_row: jax.Array,  # [B, 7]
    side: jax.Array,  # [B]
    config: MCTSConfig,
    valid: jax.Array,
    k: int,
    c_ov: Optional[jax.Array] = None,
) -> jax.Array:
    """``_const_overlay_scores`` on pre-gathered inputs.

    Used by the K-way leaf fan-out, which pre-gathers its loop-invariant
    inputs (the fan-out node's stats row and child block) once and scores
    all K candidates against them. The descent loop intentionally remains
    gather-based (``_const_overlay_scores``): carrying the stats row and
    child-block base across descent iterations was implemented and
    measured slower (see the comment in ``_simulate_parallel``). The
    arithmetic here is unchanged (bitwise-equal scores)."""
    parent_visits = node_stats[..., _VISITS] + jnp.float32(k)
    log_term = jnp.log(
        (parent_visits + jnp.float32(config.pb_c_base) + 1.0)
        / jnp.float32(config.pb_c_base)
    )
    pb_c0 = (log_term + jnp.float32(config.pb_c_init)) * jnp.sqrt(parent_visits)

    c_visits = child[..., _VISITS]
    c_vsum = child[..., _VSUM]
    c_tval = child[..., _TVAL]
    c_term = child[..., _TERM] > 0.5

    n_eff = c_visits if c_ov is None else c_visits + c_ov
    side_sum = jnp.where(side[..., None] == 0, c_vsum, c_visits - c_vsum)
    diluted = side_sum / jnp.maximum(n_eff, 1.0)
    term_val = _value_to_side(c_tval, side[..., None])
    known = c_term | (c_visits > 0)
    value_score = jnp.where(c_term, term_val, jnp.where(known, diluted, 0.0))

    pb_c = pb_c0[..., None] / (n_eff + 1.0)
    scores = pb_c * prior_row + value_score
    return jnp.where(valid, scores, NEG_INF)


def _const_overlay_scores(
    tree: TreeArrays,
    node: jax.Array,
    board: BoardState,
    config: MCTSConfig,
    valid: jax.Array,
    k: int,
    c_ov: Optional[jax.Array] = None,
) -> jax.Array:
    """Gather-then-score convenience wrapper over the parts form (used by
    tests and one-off callers; the hot loops pre-gather and call the
    parts form directly)."""
    base = _take_node(tree.children_base, node)
    side = (board.age % 2).astype(jnp.int32)
    node_stats = _take_node(tree.stats, node)
    child = _take_child_block(tree.stats, base)
    prior_row = _take_node(tree.prior, node)
    return _const_overlay_score_parts(
        node_stats, child, prior_row, side, config, valid, k, c_ov
    )


def _simulate_parallel(
    _, tree: TreeArrays, *, eval_fn, config, root_state, active, capacity
) -> TreeArrays:
    """One iteration = K simulations per game, walker-deduplicated.

    Lockstep walkers are at the SAME node throughout descent (they see
    identical scores and pick identical moves; the virtual-visit overlay
    only separates them at the leaf fan-out). So instead of dragging a
    [B, K] walker axis through the tree (``_simulate_parallel_reference``),
    this walks the descent ONCE per game with a xK overlay, expands the
    leaf once, fans K walkers out over the leaf's children sequentially
    (each seeing the previous walkers' overlay — the only point where
    walkers genuinely diverge), evaluates the K fan-out boards in one
    batched forward, and backs up with a single shared-path walk carrying
    the combined (K visits, sum of values) increment plus one add per
    fan-out child. The [B, capacity] virtual-visit slab disappears
    entirely: path overlay is the constant K and child overlay is zero
    during descent (``_const_overlay_scores``), leaving only a [B, 7]
    fan-out counter. K-fold less gather/scatter traffic in the two
    depth-bound loops that dominate search time, with the same semantics
    (equivalence vs the reference formulation is tested; float32 sums can
    differ only in accumulation order).
    """
    K = config.parallel_sims
    batch = root_state.age.shape[0]
    rows = jnp.arange(batch)
    node0 = jnp.zeros((batch,), jnp.int32)

    # --- single descent per game (identical for all K walkers) ------------
    # Path recorded for the scatter-add backup (see _simulate_exact; same
    # gather-based loop — the carried-state variant measured slower).
    def desc_cond(carry):
        _, _, descending, _, _ = carry
        return jnp.any(descending)

    def desc_body(carry):
        node, board, descending, path, i = carry
        valid = _descend_valid(board)
        scores = _const_overlay_scores(tree, node, board, config, valid, K)
        move = _argmax_prefer_large(scores)
        base = _take_node(tree.children_base, node)
        child = base + move
        board = _light_step(board, move, descending)
        node = jnp.where(descending, child, node)
        path = jax.lax.dynamic_update_slice(
            path, jnp.where(descending, node, capacity)[:, None], (0, i + 1)
        )
        has_kids = _take_node(tree.children_base, node) >= 0
        return node, board, descending & has_kids, path, i + 1

    descending0 = active & (_take_node(tree.children_base, node0) >= 0)
    path0 = jnp.full((batch, PATH_MAX), capacity, jnp.int32)
    path0 = path0.at[:, 0].set(jnp.where(active, 0, capacity))
    leaf, leaf_board, _, path, _ = jax.lax.while_loop(
        desc_cond, desc_body, (node0, root_state, descending0, path0, jnp.int32(0))
    )

    # --- single expansion of the (shared) leaf ----------------------------
    leaf_eval = _take_node(tree.evaluated, leaf)
    leaf_term = _take_node(tree.stats, leaf)[..., _TERM] > 0.5
    expandable = active & leaf_eval & ~leaf_term
    need_alloc = expandable & (_take_node(tree.children_base, leaf) < 0)

    base = jnp.minimum(tree.next_free, capacity - WIDTH)
    children_base = _scatter_node(tree.children_base, leaf, base, need_alloc)
    next_free = jnp.where(
        need_alloc, jnp.minimum(tree.next_free + WIDTH, capacity), tree.next_free
    )
    child_term, child_tval = _expand_metadata(leaf_board)
    child_stats = jnp.zeros((batch, WIDTH, 4), jnp.float32)
    child_stats = child_stats.at[..., _TVAL].set(child_tval)
    child_stats = child_stats.at[..., _TERM].set(child_term.astype(jnp.float32))
    slot_idx = base[:, None] + jnp.arange(WIDTH, dtype=jnp.int32)[None, :]
    safe_slots = jnp.where(need_alloc[:, None], slot_idx, capacity)
    parent = tree.parent.at[rows[:, None], safe_slots].set(
        leaf[:, None], mode="drop"
    )
    stats = tree.stats.at[rows[:, None], safe_slots].set(child_stats, mode="drop")
    evaluated = tree.evaluated.at[rows[:, None], safe_slots].set(
        False, mode="drop"
    )
    children_base = children_base.at[rows[:, None], safe_slots].set(
        -1, mode="drop"
    )
    tree2 = TreeArrays(
        parent=parent,
        children_base=children_base,
        stats=stats,
        prior=tree.prior,
        evaluated=evaluated,
        next_free=next_free,
    )

    # --- K-way fan-out over the leaf's children, table-driven -------------
    # Each walker sees the previous walkers' virtual visits on the leaf's
    # child block. A child's score for a walker that finds j prior virtual
    # visits on it depends only on j (every node-level term is
    # walker-invariant: the tree is not mutated between walkers), so all
    # K*7 candidate scores are precomputed in ONE broadcast over the
    # overlay axis j = 0..K-1, and the inherently sequential part
    # collapses to K tiny gather+argmax rounds on [B, 7]. The K walkers'
    # boards then step in one batched ``_light_step`` from the shared
    # leaf board instead of K sequential ones. This phase is op-launch
    # latency-bound, so ~3x fewer ops is a direct wall-clock win; the
    # move sequence is bitwise identical to the sequential formulation
    # (same elementwise arithmetic, reordered only across independent
    # elements — equivalence is covered by tests/test_mcts.py).
    move_iota = jnp.arange(WIDTH, dtype=jnp.int32)
    fan_valid = _descend_valid(leaf_board)
    fan_side = (leaf_board.age % 2).astype(jnp.int32)
    cb = _take_node(tree2.children_base, leaf)
    fan_stats = _take_node(tree2.stats, leaf)  # [B, 4]
    fan_child = _take_child_block(tree2.stats, cb)  # [B, 7, 4]
    fan_prior = _take_node(tree2.prior, leaf)  # [B, 7]
    # score_table[b, j, c] — child c's score when it carries j virtual visits
    score_table = _const_overlay_score_parts(
        fan_stats[:, None, :],
        fan_child[:, None, :, :],
        fan_prior[:, None, :],
        fan_side[:, None],
        config,
        fan_valid[:, None, :],
        K,
        jnp.arange(K, dtype=jnp.float32)[None, :, None],
    )  # [B, K, 7]
    ov_cnt = jnp.zeros((batch, WIDTH), jnp.int32)
    moves_k = []
    for _k in range(K):
        scores = jnp.take_along_axis(
            score_table, ov_cnt[:, None, :], axis=1
        )[:, 0, :]  # [B, 7]
        move = _argmax_prefer_large(scores)
        ov_cnt = ov_cnt + (
            (move_iota == move[:, None]) & expandable[:, None]
        ).astype(jnp.int32)
        moves_k.append(move)
    moves = jnp.stack(moves_k, axis=1)  # [B, K]
    tile_k = lambda x: jnp.broadcast_to(
        x[:, None, ...], (batch, K) + x.shape[1:]
    )
    boards = _light_step(
        jax.tree_util.tree_map(tile_k, leaf_board),
        moves,
        jnp.broadcast_to(expandable[:, None], (batch, K)),
    )
    nodes = jnp.where(
        expandable[:, None], cb[:, None] + moves, leaf[:, None]
    )  # [B, K]
    active_k = jnp.broadcast_to(active[:, None], (batch, K))

    # --- lockstep evaluation (as in the reference formulation) ------------
    cur_stats = jnp.take_along_axis(
        tree2.stats, nodes.reshape(batch, -1)[..., None], axis=1
    ).reshape(batch, K, 4)
    cur_term = cur_stats[..., _TERM] > 0.5
    flat_boards = jax.tree_util.tree_map(
        lambda x: x.reshape((batch * K,) + x.shape[2:]), boards
    )
    value_net, prior_net = eval_fn(flat_boards)
    value_net = value_net.reshape(batch, K)
    prior_net = prior_net.reshape(batch, K, WIDTH)
    value = jnp.where(
        cur_term, cur_stats[..., _TVAL], value_net.astype(jnp.float32)
    )

    cur_valid = boards.height < HEIGHT  # [B, K, 7]
    prior_masked = _mask_normalise(prior_net, cur_valid)
    cur_evaluated = jnp.take_along_axis(
        tree2.evaluated, nodes.reshape(batch, -1), axis=1
    ).reshape(batch, K)
    store_prior = active_k & ~cur_term & ~cur_evaluated
    safe_nodes = jnp.where(store_prior, nodes, capacity)
    prior_arr = tree2.prior.at[rows[:, None], safe_nodes].set(
        prior_masked, mode="drop"
    )
    evaluated2 = tree2.evaluated.at[rows[:, None], safe_nodes].set(
        True, mode="drop"
    )

    # --- backup: per-child adds + ONE shared-path walk --------------------
    # each fan-out child receives its own (1 visit, value); every node on
    # the shared root..leaf path receives the combined (K, sum of values)
    child_incr = jnp.stack(
        [
            jnp.ones((batch, K), jnp.float32),
            value,
            jnp.zeros((batch, K), jnp.float32),
            jnp.zeros((batch, K), jnp.float32),
        ],
        axis=-1,
    )
    fan_mask = expandable[:, None] & active_k
    safe_children = jnp.where(fan_mask, nodes, capacity)
    stats_b = tree2.stats.at[rows[:, None], safe_children].add(
        child_incr, mode="drop"
    )

    vsum = jnp.sum(jnp.where(active_k, value, 0.0), axis=1)
    path_incr = jnp.stack(
        [
            jnp.where(active, jnp.float32(K), 0.0),
            vsum,
            jnp.zeros((batch,), jnp.float32),
            jnp.zeros((batch,), jnp.float32),
        ],
        axis=-1,
    )  # [B, 4]

    # the recorded path is exactly the root..leaf chain the old
    # parent-pointer walk visited; one scatter-add replaces the walk
    stats2 = stats_b.at[rows[:, None], path].add(
        path_incr[:, None, :], mode="drop"
    )

    return tree2._replace(stats=stats2, prior=prior_arr, evaluated=evaluated2)


def _finish(
    tree: TreeArrays,
    root_state: BoardState,
    key: jax.Array,
    config: MCTSConfig,
    root_valid: jax.Array,
) -> SearchResults:
    """Move selection + training targets from the finished tree, matching
    ``MCTS.make_move`` and ``Tree.get_values_policy``
    (``/root/reference/oinkoink/mcts.py:78-88``, ``tree.py:69-117``)."""
    batch = root_state.age.shape[0]
    base = tree.children_base[:, 0]
    side = (root_state.age % 2).astype(jnp.int32)

    child = _take_child_block(tree.stats, base)  # [B, 7, 4]
    c_visits = child[..., _VISITS]
    c_vsum = child[..., _VSUM]
    c_term = child[..., _TERM] > 0.5
    c_tval = child[..., _TVAL]

    mean = c_vsum / jnp.maximum(c_visits, 1.0)
    abs_val = jnp.where(c_term, c_tval, jnp.where(c_visits > 0, mean, 0.0))
    known = c_term | (c_visits > 0)
    side_val = jnp.where(known, _value_to_side(abs_val, side[:, None]), 0.0)
    side_val = jnp.where(root_valid, side_val, 0.0)

    # values-policy target with uniform fallback over the existing children
    total = side_val.sum(axis=-1, keepdims=True)
    n_valid = jnp.maximum(root_valid.sum(axis=-1, keepdims=True), 1)
    uniform = root_valid.astype(jnp.float32) / n_valid
    values_policy = jnp.where(total > 0, side_val / jnp.where(total > 0, total, 1.0), uniform)

    visit_total = jnp.maximum((c_visits * root_valid).sum(axis=-1, keepdims=True), 1.0)
    visit_policy = (c_visits * root_valid) / visit_total

    greedy = _argmax_prefer_large(jnp.where(root_valid, side_val, NEG_INF))

    # opening-ply sampling proportional to value^2; fall back to uniform
    # over legal moves if every child value is exactly zero (the reference
    # would divide by zero here)
    weights = jnp.where(root_valid, side_val**2, 0.0)
    wsum = weights.sum(axis=-1, keepdims=True)
    probs = jnp.where(wsum > 0, weights / jnp.where(wsum > 0, wsum, 1.0), uniform)
    sampled = jax.random.categorical(
        key, jnp.log(jnp.where(probs > 0, probs, 1e-30))
    ).astype(jnp.int32)

    use_sampling = (
        (root_state.age < config.num_sampling_moves)
        if config.num_sampling_moves
        else jnp.zeros((batch,), jnp.bool_)
    )
    move = jnp.where(use_sampling, sampled, greedy)

    chosen_abs = jnp.take_along_axis(abs_val, move[:, None], axis=1)[:, 0]
    root_visits = tree.stats[:, 0, _VISITS]
    root_mean = tree.stats[:, 0, _VSUM] / jnp.maximum(root_visits, 1.0)

    return SearchResults(
        move=move,
        value=chosen_abs,
        values_policy=values_policy,
        visit_policy=visit_policy,
        root_value=root_mean,
        tree=tree,
    )


def make_search_fn(eval_fn: BatchedEvaluator, config: MCTSConfig):
    """Close over evaluator+config; jit-friendly ``(state, key[, active])``."""

    @functools.partial(jax.jit, static_argnames=())
    def run(root_state: BoardState, key: jax.Array, active=None):
        return search(eval_fn, root_state, key, config, active)

    return run


def make_chunked_search_fn(
    eval_fn: BatchedEvaluator, config: MCTSConfig, sims_per_call: int,
    mesh=None,
):
    """Host-driven search split over several short device calls.

    Identical results to ``make_search_fn`` (same ops, same order): the
    root init, each ``sims_per_call`` segment, and the finish are separate
    jitted calls with the tree carried between them. Needed because the
    remote-TPU transport in this environment drops device calls that run
    for more than roughly a minute; a full large-batch 800-simulation
    search in one call can exceed that.

    With ``mesh`` the batch axis of every carried array (tree slabs,
    results) is constrained to the mesh's data axis: the search is
    row-parallel, so GSPMD partitions each call with no collectives.
    """
    if config.simulations % sims_per_call:
        raise ValueError("simulations must be divisible by sims_per_call")
    n_segments = config.simulations // sims_per_call

    if mesh is not None:
        from connect4_tpu.parallel.mesh import constrain_data

        _c = lambda tree: constrain_data(tree, mesh)
    else:
        _c = lambda tree: tree

    def init(root_state, key, active):
        return _c(_root_init(eval_fn, root_state, key, config, active))

    def segment(tree, root_state, active):
        return _c(
            _run_sims(eval_fn, tree, root_state, config, active, sims_per_call)
        )

    def finish(tree, root_state, key, active):
        return _c(_finish(
            tree, root_state, _sample_key(key), config, legal_moves(root_state)
        ))

    init_jit = jax.jit(init)
    segment_jit = jax.jit(segment)
    finish_jit = jax.jit(finish)

    def run(root_state: BoardState, key: jax.Array, active=None) -> SearchResults:
        batch = root_state.age.shape[0]
        if active is None:
            active = jnp.ones((batch,), jnp.bool_)
        tree = init_jit(root_state, key, active)
        for _ in range(n_segments):
            tree = segment_jit(tree, root_state, active)
        return finish_jit(tree, root_state, key, active)

    return run
