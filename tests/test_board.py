"""Rules-engine tests.

Table-driven terminal-detection cases in the spirit of the reference suite
(``/root/reference/tests/board_test.py``), plus randomized golden-equivalence
tests between the scalar host oracle and the vectorized device environment —
coverage the reference lacks (its batched path was untested).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from connect4_tpu.env import (
    HostBoard,
    has_four,
    enumerate_start_positions,
    flip_lr,
    initial_state,
    legal_moves,
    step,
    symmetrical,
    to_planes,
)
from connect4_tpu.env.core import result_value
from connect4_tpu.types import HEIGHT, ONGOING, WIDTH, Result


# Eager per-op dispatch is slow under this harness; use cached jits.
_jit_step = jax.jit(step)
_jit_has_four = jax.jit(has_four)


def _parse(rows):
    """Build top-down o/x planes from ascii rows ('o', 'x', '.')."""
    o = np.zeros((HEIGHT, WIDTH), dtype=bool)
    x = np.zeros((HEIGHT, WIDTH), dtype=bool)
    for r, row in enumerate(rows):
        for c, ch in enumerate(row.split()):
            if ch == "o":
                o[r, c] = True
            elif ch == "x":
                x[r, c] = True
    return o, x


# Each case: (ascii rows top-down, expected result). Positions are chosen to
# cover every win direction for both sides, draws, and in-progress games.
CASES = [
    # horizontal o win on the bottom row
    (
        [
            ". . . . . . .",
            ". . . . . . .",
            ". . . . . . .",
            ". . . . . . .",
            ". x x x . . .",
            "o o o o . . .",
        ],
        Result.o_win,
    ),
    # vertical o win in column 6
    (
        [
            ". . . . . . .",
            ". . . . . . o",
            ". . . . . . o",
            ". . . . . . o",
            ". . . . . x o",
            ". . . . x x x",
        ],
        Result.o_win,
    ),
    # diagonal (down-right) o win from top-left area
    (
        [
            ". . . . . . .",
            ". o . . . . .",
            ". x o . . . .",
            ". x x o . . .",
            ". x o o o . .",
            ". o x x x o .",
        ],
        Result.o_win,
    ),
    # anti-diagonal (down-left) x win
    (
        [
            ". . . . . . .",
            ". . . . . x .",
            ". . . . x x .",
            ". . . x o o .",
            ". . x o x o .",
            "o o o x o x .",
        ],
        Result.x_win,
    ),
    # horizontal x win on row 3
    (
        [
            ". . . . . . .",
            ". . . . . . .",
            ". . . . . . .",
            ". . x x x x .",
            ". . o o x o .",
            ". o x o o x o",
        ],
        Result.x_win,
    ),
    # vertical x win in column 0
    (
        [
            ". . . . . . .",
            "x . . . . . .",
            "x . . . . . .",
            "x . . . . . .",
            "x . . . . . .",
            "o . o o . . .",
        ],
        Result.x_win,
    ),
    # full board, no four anywhere -> draw
    (
        [
            "x o x o o o x",
            "x x o x o x o",
            "o x o x o x o",
            "x x o o x x x",
            "x o x o x o o",
            "x o o o x x o",
        ],
        Result.draw,
    ),
    # ongoing game
    (
        [
            ". . . . . . .",
            ". . . . . . .",
            ". . . . . . .",
            ". . . x . . .",
            ". . . o x . .",
            ". . o o x . .",
        ],
        None,
    ),
    # empty board is ongoing
    ([". . . . . . ."] * 6, None),
]


@pytest.mark.parametrize("rows,expected", CASES)
def test_host_terminal_detection(rows, expected):
    o, x = _parse(rows)
    board = HostBoard.from_pieces(o, x)
    assert board.result == expected


@pytest.mark.parametrize("rows,expected", CASES)
def test_device_terminal_detection(rows, expected):
    """The batched env must agree with the table when the same position is
    reached move by move."""
    o, x = _parse(rows)
    board = HostBoard.from_pieces(o, x)
    moves = _move_sequence_for(board)
    if moves is None:
        # Not reachable move-by-move in greedy order (e.g. both players
        # hold winning lines): drive the device env via the packed state
        # instead, so these table rows still exercise the device path.
        _check_device_state_consistency(board, expected)
        return
    state = initial_state(())
    host = HostBoard()
    for mv in moves:
        state = _jit_step(state, jnp.int32(mv))
        host.make_move(mv)
    expected_host = host.result  # oracle agreement on the replayed game
    code = int(state.result)
    got = Result.from_code(code)
    assert got == expected_host


def _check_device_state_consistency(board, expected):
    """Pack a host board with ``stack_boards`` and verify the device env's
    view of it: legal-move masking, terminal result value, and that
    ``step`` freezes a finished game (result/age/pieces unchanged)."""
    from connect4_tpu.env.convert import stack_boards

    state = jax.tree.map(lambda a: a[0], stack_boards([board]))
    legal = np.asarray(jax.jit(legal_moves)(state))
    if expected is None:
        open_cols = board.pieces.sum(axis=(0, 1)) < HEIGHT
        assert (legal == open_cols).all()
    else:
        assert not legal.any()  # finished game: no legal moves
        want = {Result.o_win: 1.0, Result.x_win: 0.0, Result.draw: 0.5}[expected]
        assert float(jax.jit(result_value)(state.result)) == want
        # the device step must freeze a terminal state, whatever move is fed
        for mv in range(WIDTH):
            nxt = _jit_step(state, jnp.int32(mv))
            assert int(nxt.result) == int(state.result)
            assert int(nxt.age) == int(state.age)
            assert (np.asarray(nxt.pieces) == np.asarray(state.pieces)).all()


def test_device_has_four_table():
    """Device win detector agrees with the full table directly (no replay)."""
    from connect4_tpu.env.host_board import _plane_has_four

    for rows, expected in CASES:
        o, x = _parse(rows)
        o_b, x_b = np.flipud(o), np.flipud(x)  # bottom-up, env layout
        planes = jnp.asarray(np.stack([o_b, x_b]))
        got = np.asarray(_jit_has_four(planes))
        assert got[0] == _plane_has_four(o_b)
        assert got[1] == _plane_has_four(x_b)
        assert got[0] == (expected == Result.o_win)
        assert got[1] == (expected == Result.x_win)


def _move_sequence_for(board):
    """Reconstruct any legal move order reaching ``board``'s piece planes,
    if one exists with simple greedy column filling."""
    target = board.pieces
    heights = np.zeros(WIDTH, dtype=int)
    total = int(target.sum())
    moves = []
    player = 0
    for _ in range(total):
        placed = False
        for c in range(WIDTH):
            r = heights[c]
            if r < HEIGHT and target[player, r, c]:
                # only place if every row below is already placed
                moves.append(c)
                heights[c] += 1
                player ^= 1
                placed = True
                break
        if not placed:
            return None
    # verify reconstruction
    check = HostBoard()
    for mv in moves:
        if check.result is not None:
            return None  # terminal reached early; replay would differ
        check.make_move(mv)
    if not np.array_equal(check.pieces, target):
        return None
    return moves


def test_valid_moves_empty_and_full_column():
    board = HostBoard()
    assert board.valid_moves == set(range(WIDTH))

    for _ in range(3):
        board.make_move(2)  # o, x, o stack in column 2
        board.make_move(2)
    assert 2 not in board.valid_moves
    assert board.valid_moves == set(range(WIDTH)) - {2}

    state = initial_state(())
    for _ in range(6):
        state = _jit_step(state, jnp.int32(2))
    lm = np.asarray(legal_moves(state))
    assert not lm[2] and lm[[0, 1, 3, 4, 5, 6]].all()


def test_valid_moves_empty_after_win():
    board = HostBoard()
    for mv in [0, 1, 0, 1, 0, 1, 0]:  # o wins vertically in column 0
        board.make_move(mv)
    assert board.result == Result.o_win
    assert board.valid_moves == set()


def test_random_playout_equivalence():
    """Golden test: 256 random games in a device batch step identically to
    the scalar host oracle."""
    rng = np.random.default_rng(0)
    batch = 256
    state = initial_state((batch,))
    hosts = [HostBoard() for _ in range(batch)]

    for _ in range(42):
        moves = np.zeros(batch, dtype=np.int32)
        for i, h in enumerate(hosts):
            valid = sorted(h.valid_moves)
            moves[i] = rng.choice(valid) if valid else 0
        state = _jit_step(state, jnp.asarray(moves))
        for i, h in enumerate(hosts):
            if h.result is None:
                h.make_move(int(moves[i]))

    res = np.asarray(state.result)
    heights = np.asarray(state.height)
    pieces = np.asarray(state.pieces)
    for i, h in enumerate(hosts):
        assert Result.from_code(int(res[i])) == h.result, i
        assert np.array_equal(heights[i], h.height), i
        assert np.array_equal(pieces[i], h.pieces), i


def test_planes_match_host():
    state = initial_state(())
    host = HostBoard()
    for mv in [3, 3, 4, 2, 5]:
        state = _jit_step(state, jnp.int32(mv))
        host.make_move(mv)
    np.testing.assert_array_equal(np.asarray(to_planes(state)), host.to_planes())


def test_fliplr_and_symmetry():
    state = initial_state(())
    for mv in [0, 1, 0]:
        state = _jit_step(state, jnp.int32(mv))
    flipped = flip_lr(state)
    assert not bool(symmetrical(state))
    np.testing.assert_array_equal(
        np.asarray(flipped.pieces), np.asarray(state.pieces)[:, :, ::-1]
    )
    np.testing.assert_array_equal(
        np.asarray(flipped.height), np.asarray(state.height)[::-1]
    )
    # centre-column-only position is symmetric
    sym = initial_state(())
    sym = _jit_step(sym, jnp.int32(3))
    assert bool(symmetrical(sym))


def test_frozen_after_termination():
    """Finished games must ignore further lockstep steps."""
    state = initial_state(())
    for mv in [0, 1, 0, 1, 0, 1, 0]:  # o wins
        state = _jit_step(state, jnp.int32(mv))
    assert int(state.result) == Result.o_win.code
    before = jax.tree_util.tree_map(np.asarray, state)
    after = _jit_step(state, jnp.int32(3))
    for a, b in zip(jax.tree_util.tree_leaves(before), jax.tree_util.tree_leaves(after)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_result_value_codes():
    codes = jnp.array([1, 2, 3], dtype=jnp.int8)
    np.testing.assert_allclose(np.asarray(result_value(codes)), [1.0, 0.0, 0.5])


def test_enumerate_start_positions_counts():
    # 1 ply: 7 positions; 2 plies: 49; all non-terminal, deduplicated.
    assert len(enumerate_start_positions(0)) == 1
    assert len(enumerate_start_positions(1)) == 7
    assert len(enumerate_start_positions(2)) == 49
    for b in enumerate_start_positions(2):
        assert b.result is None and b.age == 2
