"""Search tests.

Three layers, mirroring and extending the reference's strategy
(``/root/reference/tests/player_test.py``):

1. Tactical tables — GridSearch and host MCTS (with the deterministic
   centre evaluator and exploration cranked up) must find known forced
   moves.
2. Golden fidelity — the batched device MCTS must reproduce the host
   oracle's visit counts, value sums, chosen move and values-policy
   exactly (same float32 ops) with noise off.
3. Batched behaviours the scalar reference cannot test: masked inactive
   games, Dirichlet reproducibility under a fixed key.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from connect4_tpu.config import MCTSConfig
from connect4_tpu.env.convert import stack_boards
from connect4_tpu.env.host_board import HostBoard
from connect4_tpu.eval.evaluators import (
    centre_evaluator_batched,
    centre_evaluator_host,
    centre_value_host,
)
from connect4_tpu.eval.grid_search import GridSearch
from connect4_tpu.mcts.batched import make_search_fn
from connect4_tpu.mcts.host import HostMCTS
from connect4_tpu.types import WIDTH


def board_from_moves(moves):
    b = HostBoard()
    for m in moves:
        b.make_move(m)
    return b


# (moves to reach position, plies, acceptable best moves)
TACTICS = [
    # o has three on the bottom row (1,2,3 played via alternating x replies
    # high up); o to move can win at 0 or 4
    ([1, 1, 2, 2, 3, 3], 1, {0, 4}),
    # x has 0-1-2 on the bottom row and threatens to win at 3 (the board
    # edge blocks the other side); o must block at 3
    ([6, 0, 6, 1, 5, 2], 2, {3}),
    # o wins immediately by completing a vertical stack in column 5
    ([5, 0, 5, 1, 5, 2], 1, {5}),
    # empty board: centre heuristic prefers the middle
    ([], 1, {3}),
    # x has three stacked in column 6; o to move must block on top
    ([0, 6, 1, 6, 0, 6], 2, {6}),
]


@pytest.mark.parametrize("moves,plies,best", TACTICS)
def test_grid_search_tactics(moves, plies, best):
    board = board_from_moves(moves)
    player = GridSearch(plies, centre_value_host)
    move, _ = player.choose(board)
    assert move in best, (board, move)


@pytest.mark.parametrize("moves,plies,best", TACTICS)
def test_host_mcts_tactics(moves, plies, best):
    board = board_from_moves(moves)
    # near-exhaustive: the reference test recipe (player_test.py:156-157)
    config = MCTSConfig(simulations=7**plies + 1, pb_c_init=9999.0)
    mcts = HostMCTS(config, centre_evaluator_host)
    board_copy = board.copy()
    move, _, _ = mcts.make_move(board_copy)
    assert move in best, (board, move)


@pytest.mark.parametrize("moves,plies,best", TACTICS)
def test_batched_mcts_tactics(moves, plies, best):
    board = board_from_moves(moves)
    config = MCTSConfig(simulations=7**plies + 1, pb_c_init=9999.0)
    run = make_search_fn(centre_evaluator_batched, config)
    state = stack_boards([board])
    res = run(state, jax.random.key(0))
    assert int(res.move[0]) in best, (board, int(res.move[0]))


def _host_tree_stats(root):
    """Root-children (visits, value_sum) rows in move order."""
    visits = np.zeros(WIDTH, dtype=np.int64)
    vsum = np.zeros(WIDTH, dtype=np.float64)
    for m, c in root.children.items():
        visits[m] = c.visits
        vsum[m] = float(c.value_sum)
    return visits, vsum


POSITIONS = [
    [],
    [3],
    [3, 3],
    [2, 4, 3],
    [0, 1, 0, 1, 0],
    [3, 3, 4, 2, 5, 1],
    [6, 6, 5, 5, 4],
]


@pytest.mark.parametrize("sims", [15, 100])
def test_batched_matches_host_oracle(sims):
    """Bit-level fidelity: identical visit counts, value sums, chosen moves
    and value policies between device and host implementations, across a
    spread of positions searched in one batch."""
    config = MCTSConfig(simulations=sims)
    boards = [board_from_moves(m) for m in POSITIONS]
    state = stack_boards(boards)
    run = make_search_fn(centre_evaluator_batched, config)
    res = jax.tree_util.tree_map(np.asarray, run(state, jax.random.key(7)))

    for i, board in enumerate(boards):
        host = HostMCTS(config, centre_evaluator_host)
        root = host.search(board.copy())
        h_visits, h_vsum = _host_tree_stats(root)

        base = res.tree.children_base[i, 0]
        d_visits = res.tree.visits[i, base : base + WIDTH]
        d_vsum = res.tree.value_sum[i, base : base + WIDTH]
        # invalid slots hold zeros on device and in the host stats
        np.testing.assert_array_equal(d_visits, h_visits, err_msg=f"pos {i}")
        np.testing.assert_allclose(
            d_vsum, h_vsum, rtol=0, atol=1e-4, err_msg=f"pos {i}"
        )
        assert res.tree.visits[i, 0] == root.visits, f"pos {i} root visits"

        side = board.player_to_move
        host_best = host._best_child(root, side)
        assert int(res.move[i]) == host_best.move, f"pos {i} move"

        np.testing.assert_allclose(
            res.values_policy[i], host.values_policy(root), atol=1e-5,
            err_msg=f"pos {i} values policy",
        )


def test_masked_inactive_games():
    """Finished games in a lockstep batch must leave no trace: the search
    runs, but tree updates for inactive rows stay at their initial state."""
    config = MCTSConfig(simulations=10)
    finished = board_from_moves([0, 1, 0, 1, 0, 1, 0])  # o already won
    live = board_from_moves([3])
    state = stack_boards([live, finished])
    active = jnp.array([True, False])
    run = make_search_fn(centre_evaluator_batched, config)
    res = run(state, jax.random.key(0), active)
    # inactive row: no expansion beyond the root bookkeeping
    assert int(res.tree.next_free[1]) == 1
    assert int(res.tree.children_base[1, 0]) == -1
    # active row did its simulations
    assert int(res.tree.visits[0, 0]) == config.simulations + 1


def test_dirichlet_sampling_reproducible():
    config = MCTSConfig(
        simulations=30,
        root_dirichlet_alpha=0.3,
        root_exploration_fraction=0.25,
        num_sampling_moves=6,
    )
    run = make_search_fn(centre_evaluator_batched, config)
    state = stack_boards([HostBoard() for _ in range(8)])
    r1 = run(state, jax.random.key(42))
    r2 = run(state, jax.random.key(42))
    np.testing.assert_array_equal(np.asarray(r1.move), np.asarray(r2.move))
    r3 = run(state, jax.random.key(43))
    # different key should (almost surely) change at least one sampled move
    # or noise-perturbed visit distribution
    assert not np.array_equal(
        np.asarray(r1.tree.visits), np.asarray(r3.tree.visits)
    )


@pytest.mark.parametrize("moves,plies,best", TACTICS)
def test_parallel_sims_tactics(moves, plies, best):
    """The virtual-visit parallel mode must still find forced moves."""
    board = board_from_moves(moves)
    config = MCTSConfig(
        simulations=7**plies + 1 + (4 - (7**plies + 1) % 4) % 4,  # pad to /4
        pb_c_init=9999.0,
        parallel_sims=4,
    )
    run = make_search_fn(centre_evaluator_batched, config)
    res = run(stack_boards([board]), jax.random.key(0))
    assert int(res.move[0]) in best, (board, int(res.move[0]))


def test_parallel_tree_capacity_is_exact():
    """The walker-deduplicated search expands at most one shared child
    block per iteration, so the slab capacity 1 + 7*(sims/K) is the exact
    worst case (right-sizing it is a large perf win — the slabs are walked
    by every descent gather and backup scatter). The allocator must never
    exceed it, and a full-budget search must stay in bounds."""
    config = MCTSConfig(simulations=48, parallel_sims=8)
    assert config.tree_capacity() == 1 + 7 * 6
    assert MCTSConfig(simulations=48).tree_capacity() == 1 + 7 * 48
    run = make_search_fn(centre_evaluator_batched, config)
    boards = [HostBoard(), board_from_moves([3, 3, 2, 4])]
    res = run(stack_boards(boards), jax.random.key(0))
    assert int(np.asarray(res.tree.next_free).max()) <= config.tree_capacity()


def test_parallel_sims_visit_accounting():
    """Every walker contributes exactly one real visit per iteration:
    root visits == 1 + simulations regardless of parallelism."""
    for k in (1, 4, 8):
        config = MCTSConfig(simulations=40, parallel_sims=k)
        run = make_search_fn(centre_evaluator_batched, config)
        res = run(stack_boards([HostBoard()]), jax.random.key(1))
        assert int(np.asarray(res.tree.visits)[0, 0]) == 41, k


@pytest.mark.parametrize("k", [2, 4, 8])
def test_parallel_dedup_matches_lockstep_reference(k):
    """The walker-deduplicated parallel iteration must reproduce the
    direct [B, K] lockstep-walker formulation node for node: identical
    tree topology and visit counts, value sums equal up to float32
    accumulation order."""
    import functools

    from connect4_tpu.mcts.batched import (
        _root_init,
        _simulate_parallel,
        _simulate_parallel_reference,
    )

    config = MCTSConfig(simulations=48, parallel_sims=k)
    boards = [board_from_moves(m) for m in POSITIONS]
    state = stack_boards(boards)
    active = jnp.ones((len(boards),), jnp.bool_)
    capacity = config.tree_capacity()

    kwargs = dict(
        eval_fn=centre_evaluator_batched,
        config=config,
        root_state=state,
        active=active,
        capacity=capacity,
    )
    n_iters = config.simulations // k

    t_new = _root_init(centre_evaluator_batched, state, jax.random.key(3), config, active)
    t_ref = jax.tree_util.tree_map(jnp.array, t_new)
    step_new = jax.jit(functools.partial(_simulate_parallel, 0, **kwargs))
    step_ref = jax.jit(functools.partial(_simulate_parallel_reference, 0, **kwargs))
    for _ in range(n_iters):
        t_new = step_new(t_new)
        t_ref = step_ref(t_ref)

    np.testing.assert_array_equal(np.asarray(t_new.parent), np.asarray(t_ref.parent))
    np.testing.assert_array_equal(
        np.asarray(t_new.children_base), np.asarray(t_ref.children_base)
    )
    np.testing.assert_array_equal(
        np.asarray(t_new.evaluated), np.asarray(t_ref.evaluated)
    )
    np.testing.assert_array_equal(
        np.asarray(t_new.next_free), np.asarray(t_ref.next_free)
    )
    np.testing.assert_array_equal(
        np.asarray(t_new.visits), np.asarray(t_ref.visits)
    )
    np.testing.assert_allclose(
        np.asarray(t_new.stats), np.asarray(t_ref.stats), rtol=0, atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(t_new.prior), np.asarray(t_ref.prior), rtol=0, atol=1e-6
    )


def test_parallel_sims_rejects_indivisible():
    config = MCTSConfig(simulations=10, parallel_sims=4)
    run = make_search_fn(centre_evaluator_batched, config)
    with pytest.raises(ValueError):
        run(stack_boards([HostBoard()]), jax.random.key(0))


def test_values_policy_is_masked_and_normalised():
    config = MCTSConfig(simulations=25)
    # column 3 full => move 3 illegal at the root
    board = board_from_moves([3, 3, 3, 3, 3, 3])
    run = make_search_fn(centre_evaluator_batched, config)
    res = run(stack_boards([board]), jax.random.key(0))
    policy = np.asarray(res.values_policy[0])
    assert policy[3] == 0.0
    np.testing.assert_allclose(policy.sum(), 1.0, rtol=1e-5)
    assert int(res.move[0]) != 3
