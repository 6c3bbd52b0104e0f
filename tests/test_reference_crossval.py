"""Cross-validation against the REFERENCE implementation itself.

Every other fidelity test compares the batched device MCTS against our
own scalar host oracle (``connect4_tpu.mcts.host``) — a careful
reimplementation, but one that could in principle share a misreading of
the reference. This file closes that loop by importing and *executing*
the reference's actual search (``/root/reference/oinkoink/mcts.py:94-121``
+ ``tree.py``) with its deterministic centre evaluator
(``evaluators.py:28-40``) and asserting it agrees with our stack.

Dtype note: the reference computes scores in pure Python float64; our
oracle defaults to float32 to stay bit-identical with the device search.
At high simulation counts a float32-vs-float64 rounding difference can
flip a UCB near-tie between mirror columns (observed: one visit swapped
between columns 0 and 6 after 100 sims). So the head-to-head against the
reference runs the oracle in its float64 mode (exact agreement expected,
any mismatch is a semantic divergence), and the three-way check that
includes the float32 device search runs at low sims where no near-tie
appears.

``anytree`` is not installed here, so a minimal shim
(``tests/ref_shims/anytree``) provides the tiny Node surface the
reference uses; the reference code itself runs unmodified.
"""

import os
import sys

import numpy as np
import pytest

import jax

from connect4_tpu.config import MCTSConfig
from connect4_tpu.env.convert import stack_boards
from connect4_tpu.env.host_board import HostBoard
from connect4_tpu.eval.evaluators import (
    centre_evaluator_batched,
    centre_evaluator_host,
)
from connect4_tpu.mcts.batched import make_search_fn
from connect4_tpu.mcts.host import HostMCTS
from connect4_tpu.types import WIDTH

REFERENCE_DIR = "/root/reference"
SHIM_DIR = os.path.join(os.path.dirname(__file__), "ref_shims")

pytestmark = pytest.mark.skipif(
    not os.path.isdir(os.path.join(REFERENCE_DIR, "oinkoink")),
    reason="reference implementation not present on this machine",
)


@pytest.fixture(scope="module")
def oinkoink():
    """Import the reference modules with the anytree shim on the path.

    ``oinkoink/__init__.py`` imports the full training stack (visdom,
    torch multiprocessing, ...), which is not installed here; a synthetic
    package entry with the reference's ``__path__`` lets the submodules
    we need load unmodified without executing that ``__init__``.
    """
    import types

    added_path = []
    if SHIM_DIR not in sys.path:
        sys.path.insert(0, SHIM_DIR)
        added_path.append(SHIM_DIR)
    pkg = types.ModuleType("oinkoink")
    pkg.__path__ = [os.path.join(REFERENCE_DIR, "oinkoink")]
    sys.modules["oinkoink"] = pkg
    try:
        import oinkoink.evaluators as ref_eval
        import oinkoink.mcts as ref_mcts
        from oinkoink.board import Board as RefBoard

        yield ref_mcts, ref_eval, RefBoard
    finally:
        for name in list(sys.modules):
            if name == "oinkoink" or name.startswith("oinkoink."):
                del sys.modules[name]
        for p in added_path:
            sys.path.remove(p)


POSITIONS = [
    [],
    [3],
    [3, 3],
    [2, 4, 3],
    [0, 1, 0, 1, 0],
    [3, 3, 4, 2, 5, 1],
    [6, 6, 5, 5, 4],
    [5, 0, 5, 1, 5, 2],  # immediate win available
    [6, 0, 6, 1, 5, 2],  # must block
]


def _make_boards(moves, RefBoard):
    board, ref_board = HostBoard(), RefBoard()
    for m in moves:
        board.make_move(m)
        ref_board.make_move(m)
    return board, ref_board


def _reference_root_stats(tree):
    """(visits, value_sum) per root child in move order, plus root visits."""
    visits = np.zeros(WIDTH, dtype=np.int64)
    vsum = np.zeros(WIDTH, dtype=np.float64)
    for c in tree.root.children:
        if c.data.search_value is not None:
            visits[c.name] = c.data.search_value.visit_count
            vsum[c.name] = c.data.search_value.value_sum
    return visits, vsum, tree.root.data.search_value.visit_count


def _host_root_stats(root):
    visits = np.zeros(WIDTH, dtype=np.int64)
    vsum = np.zeros(WIDTH, dtype=np.float64)
    for m, c in root.children.items():
        visits[m] = c.visits
        vsum[m] = float(c.value_sum)
    return visits, vsum, root.visits


@pytest.mark.parametrize("sims", [15, 100, 400])
def test_reference_matches_host_oracle(oinkoink, sims):
    """Reference search vs our float64 oracle: exact visit counts, chosen
    move, and value sums / values-policy to accumulation roundoff."""
    ref_mcts, ref_eval, RefBoard = oinkoink
    config = MCTSConfig(simulations=sims)
    ref_config = ref_mcts.MCTSConfig(simulations=sims)

    for i, moves in enumerate(POSITIONS):
        board, ref_board = _make_boards(moves, RefBoard)

        evaluator = ref_eval.Evaluator(ref_eval.evaluate_centre_with_prior)
        ref_tree = ref_mcts.search(ref_config, ref_board, evaluator)
        r_visits, r_vsum, r_root_visits = _reference_root_stats(ref_tree)

        host = HostMCTS(config, centre_evaluator_host, dtype=np.float64)
        root = host.search(board.copy())
        h_visits, h_vsum, h_root_visits = _host_root_stats(root)

        np.testing.assert_array_equal(r_visits, h_visits, err_msg=f"pos {i}")
        # leaf values come from our float32 centre evaluator vs the
        # reference's float64 one: sums agree to f32 eps, not f64 eps
        np.testing.assert_allclose(
            r_vsum, h_vsum, rtol=0, atol=1e-4, err_msg=f"pos {i}"
        )
        assert r_root_visits == h_root_visits == sims + 1, f"pos {i}"

        # chosen move: the reference picks best_move() past the sampling
        # plies (mcts.py:80-87); both must name the same column
        ref_best = ref_tree.best_move().name
        host_best = host._best_child(root, board.player_to_move).move
        assert ref_best == host_best, f"pos {i} move"

        # values-policy (training target, tree.py:104-110,139-147)
        np.testing.assert_allclose(
            host.values_policy(root), ref_tree.get_values_policy(),
            atol=1e-6, err_msg=f"pos {i} values policy",
        )


def test_reference_matches_device_search(oinkoink):
    """Three-way agreement incl. the float32 batched device search, at a
    simulation count low enough that no float32/float64 UCB near-tie
    arises (the device's float32 fidelity vs the float32 oracle is
    covered exhaustively in tests/test_mcts.py)."""
    ref_mcts, ref_eval, RefBoard = oinkoink
    sims = 15
    config = MCTSConfig(simulations=sims)
    ref_config = ref_mcts.MCTSConfig(simulations=sims)

    pairs = [_make_boards(m, RefBoard) for m in POSITIONS]
    run = make_search_fn(centre_evaluator_batched, config)
    res = jax.tree_util.tree_map(
        np.asarray,
        run(stack_boards([b for b, _ in pairs]), jax.random.key(7)),
    )

    for i, (board, ref_board) in enumerate(pairs):
        evaluator = ref_eval.Evaluator(ref_eval.evaluate_centre_with_prior)
        ref_tree = ref_mcts.search(ref_config, ref_board, evaluator)
        r_visits, r_vsum, _ = _reference_root_stats(ref_tree)

        base = res.tree.children_base[i, 0]
        np.testing.assert_array_equal(
            res.tree.visits[i, base : base + WIDTH], r_visits,
            err_msg=f"pos {i} device visits",
        )
        np.testing.assert_allclose(
            res.tree.value_sum[i, base : base + WIDTH], r_vsum,
            rtol=0, atol=1e-4, err_msg=f"pos {i} device value sums",
        )
        assert int(res.move[i]) == ref_tree.best_move().name, f"pos {i} move"
        np.testing.assert_allclose(
            res.values_policy[i], ref_tree.get_values_policy(),
            atol=1e-5, err_msg=f"pos {i} values policy",
        )
