"""On-device self-play generation.

Replaces the reference's L4 runtime — 10 processes x 20 threads of Python
MCTS blocking on a pipe-RPC inference server
(``/root/reference/oinkoink/neural/training_game.py:8-19``,
``game_pool.py``, ``inference_server.py``) — with a single jitted program:
``lax.scan`` over at most 42 plies, each ply running one batched MCTS for
every live game and stepping them in lockstep. Finished games are masked
and simply ride along; there is no cross-process communication at all.

Per recorded move we keep what ``GameData.add_move`` keeps (pre-move
planes, chosen move, the chosen child's value, and the values-policy
target); the value *training target* is the final game result for every
position, exactly as ``create_training_values``
(``training_game.py:57-60``).
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from connect4_tpu.config import MCTSConfig
from connect4_tpu.env.core import (
    BoardState,
    initial_state,
    result_value,
    step,
    to_planes,
)
from connect4_tpu.eval.evaluators import BatchedEvaluator
from connect4_tpu.mcts.batched import search
from connect4_tpu.types import AREA, HEIGHT, ONGOING, WIDTH


class SelfPlayOutput(NamedTuple):
    """Per-game records, batch-major. ``mask[b, t]`` marks plies actually
    played; slots past the end of a game are zero-filled."""

    planes: jax.Array  # uint8[B, 42, 3, 6, 7] — pre-move board planes
    moves: jax.Array  # int32[B, 42]
    move_values: jax.Array  # float32[B, 42] — chosen child's absolute value
    policies: jax.Array  # float32[B, 42, 7] — values-policy targets
    mask: jax.Array  # bool[B, 42]
    result: jax.Array  # int8[B] — final result code
    length: jax.Array  # int32[B]


def play_games(
    eval_fn: BatchedEvaluator,
    config: MCTSConfig,
    batch: int,
    key: jax.Array,
    init_state: BoardState = None,
) -> SelfPlayOutput:
    """Play ``batch`` complete games in lockstep. Jit-compatible.

    ``init_state`` lets sharded callers pass a mesh-constrained starting
    batch (see ``connect4_tpu.parallel.sharded``)."""

    state0 = init_state if init_state is not None else initial_state((batch,))

    def cond(carry):
        t, state, _, _ = carry
        return (t < AREA) & jnp.any(state.result == ONGOING)

    def ply(carry):
        t, state, key, bufs = carry
        state, key, bufs = _ply_body(eval_fn, config, state, key, bufs, t)
        return t + 1, state, key, bufs

    _, final_state, _, bufs = jax.lax.while_loop(
        cond, ply, (jnp.int32(0), state0, key, _empty_buffers(batch))
    )
    return _finalize(final_state, bufs)


def _empty_buffers(batch: int):
    """Batch-major per-ply record buffers, written at the ply index."""
    return (
        jnp.zeros((batch, AREA, 3, HEIGHT, WIDTH), jnp.uint8),
        jnp.zeros((batch, AREA), jnp.int32),
        jnp.zeros((batch, AREA), jnp.float32),
        jnp.zeros((batch, AREA, WIDTH), jnp.float32),
        jnp.zeros((batch, AREA), jnp.bool_),
    )


def _ply_body(eval_fn, config, state, key, bufs, t):
    """One ply for the whole batch: search all live games, record, step."""
    key, search_key = jax.random.split(key)
    active = state.result == ONGOING
    res = search(eval_fn, state, search_key, config, active)
    planes_b, moves_b, values_b, policies_b, mask_b = bufs
    bufs = (
        planes_b.at[:, t].set(to_planes(state, dtype=jnp.uint8)),
        moves_b.at[:, t].set(res.move),
        values_b.at[:, t].set(res.value),
        policies_b.at[:, t].set(res.values_policy),
        mask_b.at[:, t].set(active),
    )
    state = step(state, res.move, active)
    return state, key, bufs


def _finalize(final_state: BoardState, bufs) -> SelfPlayOutput:
    planes, moves, values, policies, mask = bufs
    zero = lambda x: jnp.where(
        mask.reshape(mask.shape + (1,) * (x.ndim - 2)), x, jnp.zeros_like(x)
    )
    return SelfPlayOutput(
        planes=zero(planes),
        moves=jnp.where(mask, moves, 0),
        move_values=jnp.where(mask, values, 0.0),
        policies=zero(policies),
        mask=mask,
        result=final_state.result,
        length=mask.sum(axis=1).astype(jnp.int32),
    )


def make_play_fn(eval_fn: BatchedEvaluator, config: MCTSConfig, batch: int):
    """Jitted closure ``key -> SelfPlayOutput`` (whole generation in one
    device program; used by tests and the multi-chip dryrun)."""

    def run(key: jax.Array) -> SelfPlayOutput:
        return play_games(eval_fn, config, batch, key)

    return jax.jit(run)


def make_stepwise_play_fn(
    eval_fn: BatchedEvaluator,
    config: MCTSConfig,
    batch: int,
    sims_per_call: int = None,
    mesh=None,
):
    """Host-driven generation: short jitted device calls instead of a
    single multi-minute device program. Produces results identical to
    ``make_play_fn`` (same op order and key threading), but each device
    call lasts seconds — robust against RPC/tunnel deadlines on remote
    TPUs — and the host loop exits as soon as every game is finished.

    ``sims_per_call`` additionally splits each ply's search into segments
    (see ``make_chunked_search_fn``) so no single call exceeds the
    transport deadline even for large batches at high simulation counts.

    ``mesh`` shards the game axis over the mesh's data axis (lockstep
    play is row-parallel, so every device call partitions with no
    collectives and results stay bitwise identical to single-device).
    """
    # note: no buffer donation — the remote-TPU backend used in this
    # environment mishandles long-lived donated buffers, and at ~13 MB the
    # copies are immaterial
    _c = _make_constrainer(mesh)
    finalize_jit = jax.jit(_finalize)
    init_jit = jax.jit(
        lambda: _c((initial_state((batch,)), _empty_buffers(batch)))
    )

    if sims_per_call is None:

        def ply(state, key, bufs, t):
            state, key, bufs = _ply_body(eval_fn, config, state, key, bufs, t)
            return _c(state), key, _c(bufs)

        ply_jit = jax.jit(ply)

        def run_ply(state, key, bufs, t):
            return ply_jit(state, key, bufs, jnp.int32(t))

    else:
        from connect4_tpu.mcts.batched import make_chunked_search_fn

        chunked = make_chunked_search_fn(eval_fn, config, sims_per_call, mesh=mesh)

        def record_and_step(state, bufs, t, move, value, policy, active):
            planes_b, moves_b, values_b, policies_b, mask_b = bufs
            bufs = (
                planes_b.at[:, t].set(to_planes(state, dtype=jnp.uint8)),
                moves_b.at[:, t].set(move),
                values_b.at[:, t].set(value),
                policies_b.at[:, t].set(policy),
                mask_b.at[:, t].set(active),
            )
            return _c((step(state, move, active), bufs))

        record_jit = jax.jit(record_and_step)
        split_jit = jax.jit(jax.random.split)

        def run_ply(state, key, bufs, t):
            key, search_key = split_jit(key)
            active = state.result == ONGOING
            res = chunked(state, search_key, active)
            state, bufs = record_jit(
                state, bufs, jnp.int32(t), res.move, res.value,
                res.values_policy, active,
            )
            return state, key, bufs

    def run(key: jax.Array, progress=None) -> SelfPlayOutput:
        state, bufs = init_jit()
        for t in range(AREA):
            state, key, bufs = run_ply(state, key, bufs, t)
            ongoing = int(np.asarray((state.result == ONGOING).sum()))
            if progress is not None:
                progress(t, ongoing)
            if not ongoing:
                break
        return finalize_jit(state, bufs)

    return run


def _make_constrainer(mesh):
    """Identity without a mesh; otherwise constrain leading axes to the
    mesh's data axis (see ``connect4_tpu.parallel.mesh.constrain_data``)."""
    if mesh is None:
        return lambda tree: tree
    from connect4_tpu.parallel.mesh import constrain_data

    return lambda tree: constrain_data(tree, mesh)


def make_refill_play_fn(
    eval_fn: BatchedEvaluator,
    config: MCTSConfig,
    slots: int,
    total_games: int,
    sims_per_call: int = None,
    n_blocks: int = None,
    mesh=None,
):
    """Compact-and-refill generation: a fixed pool of ``slots`` board slots
    plays ``total_games`` complete games, resetting each slot to a fresh
    game the moment its current one ends.

    Pure lockstep (``make_stepwise_play_fn``) wastes 30-40% of every
    search on already-finished rows: a batch of B games runs until its
    *longest* game ends (up to 42 plies) while the mean game is ~15-25
    plies. Here the batch axis is a slot pool kept near-full until the
    game budget is exhausted, so almost every search row is useful work.
    The reference gets the same effect for free from its work-stealing
    thread pool (``/root/reference/oinkoink/neural/game_pool.py:36-41``,
    ``imap_unordered`` over games); this is the fixed-shape, on-device
    equivalent.

    Per-game semantics are unchanged — each game is still the exact
    search/record/step sequence of the lockstep path (mixed-age batches
    are already supported: noise, sampling plies, and PUCT all key off
    per-row ``age``). Only the PRNG stream assignment differs, so
    outputs match lockstep in distribution rather than bit-for-bit.

    Record buffers are game-indexed ``[total_games, 42, ...]`` and written
    by scatter at ``(game_id, age)``; finished slots with no game budget
    left idle out (``game_id = -1``).

    ``n_blocks`` partitions the pool into independent blocks of
    ``slots/n_blocks`` slots, each owning a contiguous budget of
    ``total_games/n_blocks`` game ids (refill bookkeeping — the id
    cumsum and buffer scatters — then stays entirely within a block).
    With ``mesh`` (n_blocks defaults to the mesh size) every block's
    slots, buffers and counter live on one device, so the sharded pool
    is n independent per-device pools with zero cross-device traffic in
    the hot path; results are bitwise identical to the same-``n_blocks``
    single-device run.
    """
    if slots > total_games:
        raise ValueError("slots must be <= total_games")
    G, S = total_games, slots
    if n_blocks is None:
        n_blocks = int(np.prod(list(mesh.shape.values()))) if mesh is not None else 1
    if S % n_blocks or G % n_blocks:
        raise ValueError(
            f"slots {S} and total_games {G} must divide into {n_blocks} blocks"
        )
    Sb, Gb = S // n_blocks, G // n_blocks
    if Sb > Gb:
        raise ValueError("slots per block must be <= games per block")
    _c = _make_constrainer(mesh)

    if sims_per_call is None:
        search_jit = jax.jit(
            lambda state, key, active: search(eval_fn, state, key, config, active)
        )

        def run_search(state, key, active):
            return search_jit(state, key, active)

    else:
        from connect4_tpu.mcts.batched import make_chunked_search_fn

        chunked = make_chunked_search_fn(eval_fn, config, sims_per_call, mesh=mesh)

        def run_search(state, key, active):
            return chunked(state, key, active)

    def init():
        rows = jnp.arange(S, dtype=jnp.int32)
        return _c((
            initial_state((S,)),
            (rows // Sb) * Gb + rows % Sb,  # game_ids, block-contiguous
            (
                jnp.zeros((G, AREA, 3, HEIGHT, WIDTH), jnp.uint8),
                jnp.zeros((G, AREA), jnp.int32),
                jnp.zeros((G, AREA), jnp.float32),
                jnp.zeros((G, AREA, WIDTH), jnp.float32),
                jnp.zeros((G, AREA), jnp.bool_),
            ),
            jnp.zeros((G,), jnp.int8),  # final result per game
            # next unstarted game id, per block
            jnp.arange(n_blocks, dtype=jnp.int32) * Gb + Sb,
            jnp.ones((S,), jnp.bool_),  # initial active mask
        ))

    def record_step_refill(
        state, game_ids, bufs, results, next_game, move, value, policy, active
    ):
        # width-polymorphic: the drain phase re-traces this at narrower
        # pool widths (see the compaction below), so row counts come from
        # the inputs, not the closure. At full width Sw == S, Sbw == Sb.
        Sw = active.shape[0]
        Sbw = Sw // n_blocks
        planes_b, moves_b, values_b, policies_b, mask_b = bufs
        gid = jnp.where(active, game_ids, G)  # OOB rows dropped
        t = state.age  # pre-move ply index within the game
        bufs = (
            planes_b.at[gid, t].set(to_planes(state, dtype=jnp.uint8), mode="drop"),
            moves_b.at[gid, t].set(move, mode="drop"),
            values_b.at[gid, t].set(value, mode="drop"),
            policies_b.at[gid, t].set(policy, mode="drop"),
            mask_b.at[gid, t].set(True, mode="drop"),
        )
        state = step(state, move, active)

        # slots whose game just ended: record the result, then either start
        # the next unplayed game or go idle (game_id = -1). Rank/budget
        # bookkeeping is per block so it never crosses a shard boundary.
        done = active & (state.result != ONGOING)
        res_gid = jnp.where(done, game_ids, G)
        results = results.at[res_gid].set(state.result, mode="drop")
        done_blk = done.reshape(n_blocks, Sbw)
        rank = jnp.cumsum(done_blk.astype(jnp.int32), axis=1) - 1  # among done
        new_id = (next_game[:, None] + rank).reshape(Sw)
        block_end = (jnp.arange(n_blocks, dtype=jnp.int32) + 1) * Gb
        can_start = done & (new_id < jnp.repeat(block_end, Sbw))
        fresh = initial_state((Sw,))
        reset = lambda cur, f: jnp.where(
            can_start.reshape(can_start.shape + (1,) * (cur.ndim - 1)), f, cur
        )
        state = jax.tree_util.tree_map(reset, state, fresh)
        game_ids = jnp.where(can_start, new_id, jnp.where(done, -1, game_ids))
        next_game = jnp.minimum(
            next_game + done_blk.sum(axis=1, dtype=jnp.int32), block_end
        )
        # next wave's active mask, computed on-device to spare the host
        # loop per-wave eager dispatches (expensive on remote transports)
        active_next = (game_ids >= 0) & (state.result == ONGOING)
        return _c((state, game_ids, bufs, results, next_game, active_next)) + (
            active_next.sum(dtype=jnp.int32),
        )

    def compact(state, game_ids, active, width: int):
        """Keep the ``width`` rows that are live (plus idle filler), in a
        deterministic order: live rows first, original order preserved.
        Callers guarantee live <= width. Dropped rows are all idle — their
        games are finished and already recorded in the game-indexed
        buffers, so no information leaves the pool."""
        Sw = active.shape[0]
        keys = jnp.where(active, 0, Sw + 1) * Sw + jnp.arange(Sw, dtype=jnp.int32)
        perm = jnp.argsort(keys)[:width]
        take = lambda x: jnp.take(x, perm, axis=0)
        return (
            jax.tree_util.tree_map(take, state),
            jnp.take(game_ids, perm),
            jnp.take(active, perm),
        )

    init_jit = jax.jit(init)
    record_jit = jax.jit(record_step_refill)
    compact_jit = jax.jit(compact, static_argnums=(3,))
    split_jit = jax.jit(jax.random.split)
    # Drain-phase pool narrowing: once the game budget is exhausted, the
    # pool only empties, but every wave still pays full-width search cost
    # for its idle rows (~28% of all wave cost at the 512-slot flagship:
    # a ~40-wave tail at ~40% occupancy). When the live count fits in
    # half the pool, compact the live rows into a half-width pool and
    # continue there (jit re-traces the same search/record programs at
    # the narrower width). Per-game search semantics are untouched — the
    # search is row-independent — only the PRNG stream assignment shifts,
    # which is already this function's documented contract vs lockstep.
    # Restricted to unsharded single-block pools: sharded pools must keep
    # their per-device row layout.
    can_narrow = n_blocks == 1 and mesh is None
    MIN_WIDTH = 64

    def run(key: jax.Array, progress=None) -> SelfPlayOutput:
        state, game_ids, bufs, results, next_game, active = init_jit()
        width = S
        pending_live = None  # previous wave's live-count, still on device
        for wave in range(G * AREA):  # safety bound; exits when pool drains
            key, search_key = split_jit(key)
            res = run_search(state, search_key, active)
            state, game_ids, bufs, results, next_game, active, live_dev = record_jit(
                state, game_ids, bufs, results, next_game,
                res.move, res.value, res.values_policy, active,
            )
            # One-wave-lagged termination check: wave N+1 is enqueued
            # BEFORE blocking on wave N's live-count, so host dispatch and
            # the tunnel round-trip hide under device compute (JAX async
            # dispatch). Costs exactly one all-inactive wave at drain
            # (every row masked; record scatters drop — outputs
            # unchanged, only an extra PRNG split that nothing reads).
            if pending_live is not None:
                live = int(np.asarray(pending_live))
                if progress is not None:
                    progress(wave - 1, live)
                if not live:
                    break
                # the lagged count only ever overstates the current live
                # count once the budget is gone, so fitting is guaranteed
                if can_narrow and live <= width // 2 and width // 2 >= MIN_WIDTH:
                    while live <= width // 2 and width // 2 >= MIN_WIDTH:
                        width //= 2
                    state, game_ids, active = compact_jit(
                        state, game_ids, active, width
                    )
            pending_live = live_dev
        else:
            # Safety-bound exit (no drain): flush the final wave's live
            # count so the progress callback is not left one wave behind.
            if pending_live is not None and progress is not None:
                progress(wave, int(np.asarray(pending_live)))
        planes, moves, values, policies, mask = bufs
        return SelfPlayOutput(
            planes=planes,
            moves=moves,
            move_values=values,
            policies=policies,
            mask=mask,
            result=results,
            length=mask.sum(axis=1).astype(jnp.int32),
        )

    return run


def training_arrays(
    output: SelfPlayOutput,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Flatten a generation into (planes, value_targets, policy_targets)
    with left-right mirror augmentation doubling the data — host-side
    equivalent of ``TrainingDataStorage.save`` + ``native_to_pytorch``
    (``/root/reference/oinkoink/neural/pytorch/data.py:52-64,78-105``).

    Value target for every position of a game is that game's final result
    (``training_game.py:57-60``).
    """
    mask = np.asarray(output.mask)
    planes = np.asarray(output.planes)
    policies = np.asarray(output.policies)
    results = np.asarray(result_value(output.result))

    b_idx, t_idx = np.nonzero(mask)
    sel_planes = planes[b_idx, t_idx].astype(np.uint8)  # [M, 3, 6, 7]
    sel_policies = policies[b_idx, t_idx].astype(np.float32)
    sel_values = results[b_idx].astype(np.float32)

    flipped_planes = sel_planes[:, :, :, ::-1]
    flipped_policies = sel_policies[:, ::-1]

    return (
        np.concatenate([sel_planes, flipped_planes]),
        np.concatenate([sel_values, sel_values]),
        np.concatenate([sel_policies, flipped_policies]),
    )
