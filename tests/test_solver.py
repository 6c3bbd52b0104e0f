"""Native exact-solver tests: tactical positions, minimax consistency on
endgames, mirror invariance, and the UCI position-set reproduction."""

import numpy as np
import pytest

from connect4_tpu.env.host_board import HostBoard
from connect4_tpu.native.solver import ExactSolver, board_to_bits


@pytest.fixture(scope="module")
def solver():
    return ExactSolver(1 << 22)


def board_from(moves):
    b = HostBoard()
    for m in moves:
        b.make_move(m)
    return b


def test_immediate_win(solver):
    # o has three stacked in column 3 and it is o's turn
    b = board_from([3, 0, 3, 1, 3, 2])
    assert solver.outcome_to_move(b) == 1
    assert solver.absolute_value(b) == 1.0


def test_double_threat_loss(solver):
    # x holds an open three on the bottom row (cols 2,3,4); o to move loses
    b = board_from([0, 2, 0, 3, 6, 4])
    assert solver.outcome_to_move(b) == -1
    assert solver.absolute_value(b) == 0.0


def test_block_is_found(solver):
    # x threatens at column 3 only; o must block, game continues
    b = board_from([6, 0, 6, 1, 5, 2])
    moves = solver.optimal_moves(b)
    # blocking 3 must be at least as good as anything else; if o is lost
    # anyway the optimal set may include other moves, but 3 must be optimal
    assert 3 in moves


def test_minimax_consistency_endgames(solver):
    """On random near-full boards, the solver value must equal the minimax
    over child values (computed recursively by the solver itself)."""
    rng = np.random.default_rng(0)
    checked = 0
    while checked < 25:
        b = HostBoard()
        for _ in range(34):
            valid = sorted(b.valid_moves)
            if not valid or b.result is not None:
                break
            b.make_move(int(rng.choice(valid)))
        if b.result is not None or b.age != 34:
            continue
        checked += 1
        child_vals = []
        for mv in sorted(b.valid_moves):
            child = b.copy()
            child.make_move(mv)
            if child.result is not None:
                child_vals.append(child.result.value)
            else:
                child_vals.append(solver.absolute_value(child))
        expected = (
            max(child_vals) if b.player_to_move.value == 0 else min(child_vals)
        )
        assert solver.absolute_value(b) == expected, repr(b)


def test_mirror_invariance(solver):
    rng = np.random.default_rng(1)
    for _ in range(10):
        b = HostBoard()
        for _ in range(30):
            valid = sorted(b.valid_moves)
            if not valid or b.result is not None:
                break
            b.make_move(int(rng.choice(valid)))
        if b.result is not None:
            continue
        assert solver.absolute_value(b) == solver.absolute_value(b.create_fliplr())


def test_batch_matches_scalar(solver):
    rng = np.random.default_rng(2)
    boards = []
    while len(boards) < 12:
        b = HostBoard()
        for _ in range(32):
            valid = sorted(b.valid_moves)
            if not valid or b.result is not None:
                break
            b.make_move(int(rng.choice(valid)))
        if b.result is None and b.age == 32:
            boards.append(b)
    batch = solver.absolute_values(boards, n_threads=2)
    scalar = np.array([solver.absolute_value(b) for b in boards])
    np.testing.assert_array_equal(batch, scalar)


def test_uci_position_set_count():
    from connect4_tpu.data.datasets import enumerate_8ply_uci, enumerate_positions

    assert len(enumerate_positions(7)) == 54131
    assert len(enumerate_8ply_uci()) == 67557  # the UCI documented count


def test_bits_roundtrip():
    from connect4_tpu.data.datasets import bits_to_planes

    b = board_from([3, 3, 2, 4, 0])
    o_bits, x_bits = board_to_bits(b)
    planes = bits_to_planes(
        np.array([o_bits], dtype=np.uint64),
        np.array([x_bits], dtype=np.uint64),
        age_parity_o=False,  # 5 plies: x to move
    )
    expected = b.to_planes().astype(np.uint8)
    np.testing.assert_array_equal(planes[0], expected)
