"""Batched match-system tests."""

import numpy as np

from connect4_tpu.config import MCTSConfig
from connect4_tpu.env.host_board import enumerate_start_positions
from connect4_tpu.eval.evaluators import centre_evaluator_batched
from connect4_tpu.eval.match import MatchPlayer, play_match


def _player(name, sims=8):
    return MatchPlayer(name, centre_evaluator_batched, MCTSConfig(simulations=sims))


def test_match_counts_and_return():
    res = play_match(
        _player("a"), _player("b"), plies=1, switch=True, display=False
    )
    total = res["wins"] + res["draws"] + res["losses"]
    assert total == 14  # 7 one-ply starts x both colours
    assert 0.0 <= res["return"] <= 1.0
    expected = (res["wins"] + 0.5 * res["draws"]) / total
    assert abs(res["return"] - expected) < 1e-9


def test_match_no_switch():
    res = play_match(
        _player("a"), _player("b"), plies=1, switch=False, display=False
    )
    assert res["wins"] + res["draws"] + res["losses"] == 7


def test_mirror_symmetry_of_identical_players():
    """Identical deterministic players: the switched sub-match replays the
    same games with colours swapped, so wins and losses must mirror to a
    0.5 return."""
    res = play_match(
        _player("a"), _player("a"), plies=1, switch=True, display=False
    )
    assert res["wins"] == res["losses"]
    assert abs(res["return"] - 0.5) < 1e-9


def test_start_positions_two_ply():
    boards = enumerate_start_positions(2)
    assert len(boards) == 49
    res = play_match(
        _player("a", sims=4),
        _player("b", sims=4),
        plies=2,
        switch=True,
        display=False,
    )
    assert res["wins"] + res["draws"] + res["losses"] == 98


def test_mixed_age_start_boards_rejected():
    """The lockstep driver derives side-to-move from a shared ply counter,
    so start boards of different ages would silently route moves to the
    wrong player's search — it must refuse instead."""
    import pytest

    from connect4_tpu.env.host_board import HostBoard

    b0 = HostBoard()
    b1 = HostBoard()
    b1.make_move(3)
    with pytest.raises(ValueError, match="start age"):
        play_match(
            _player("a", sims=4),
            _player("b", sims=4),
            start_boards=[b0, b1],
            display=False,
        )
