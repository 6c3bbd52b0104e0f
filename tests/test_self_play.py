"""Self-play generation tests: terminality, record consistency against a
host replay, and augmentation semantics."""

import numpy as np

import jax
import jax.numpy as jnp

from connect4_tpu.config import MCTSConfig
from connect4_tpu.env.host_board import HostBoard
from connect4_tpu.eval.evaluators import centre_evaluator_batched
from connect4_tpu.training.self_play import (
    make_play_fn,
    training_arrays,
)
from connect4_tpu.types import Result


def _play(batch=6, sims=12, **cfg):
    config = MCTSConfig(simulations=sims, **cfg)
    play = make_play_fn(centre_evaluator_batched, config, batch)
    out = play(jax.random.key(0))
    return jax.tree_util.tree_map(np.asarray, out)


def test_games_reach_terminal_states():
    out = _play()
    assert (out.result != 0).all(), "all games must finish within 42 plies"
    assert (out.length >= 7).all(), "a connect4 game needs at least 7 plies"
    assert (out.length <= 42).all()
    # mask is a prefix: no gaps
    for b in range(out.mask.shape[0]):
        np.testing.assert_array_equal(
            out.mask[b], np.arange(42) < out.length[b]
        )


def test_records_replay_consistently():
    """Replaying the recorded moves on the host oracle must visit exactly
    the recorded pre-move planes and end with the recorded result."""
    out = _play(batch=4, sims=10)
    for b in range(4):
        board = HostBoard()
        for t in range(int(out.length[b])):
            np.testing.assert_array_equal(
                out.planes[b, t], board.to_planes().astype(np.uint8),
                err_msg=f"game {b} ply {t}",
            )
            mv = int(out.moves[b, t])
            assert mv in board.valid_moves, f"game {b} ply {t} move {mv}"
            board.make_move(mv)
        assert board.result is not None
        assert board.result.code == int(out.result[b]), f"game {b}"


def test_policies_are_distributions_on_played_steps():
    out = _play(batch=4, sims=10)
    sums = out.policies.sum(-1)
    np.testing.assert_allclose(sums[out.mask], 1.0, atol=1e-5)
    assert (sums[~out.mask] == 0.0).all()


def test_training_arrays_augmentation():
    out = _play(batch=3, sims=8)
    planes, values, policies = training_arrays(out)
    m = int(out.mask.sum())
    assert planes.shape == (2 * m, 3, 6, 7)
    assert values.shape == (2 * m,)
    assert policies.shape == (2 * m, 7)
    # second half is the mirror of the first
    np.testing.assert_array_equal(planes[m:], planes[:m][:, :, :, ::-1])
    np.testing.assert_array_equal(policies[m:], policies[:m][:, ::-1])
    np.testing.assert_array_equal(values[m:], values[:m])
    # every value target equals the final result of its source game
    results = {0: None, 1: 1.0, 2: 0.0, 3: 0.5}
    expected = []
    for b in range(3):
        expected += [results[int(out.result[b])]] * int(out.length[b])
    np.testing.assert_array_equal(values[:m], np.array(expected, dtype=np.float32))


def test_stepwise_matches_whole_program():
    """The host-driven per-ply generation must produce bit-identical output
    to the single jitted program (same ops, same key threading)."""
    from connect4_tpu.training.self_play import make_stepwise_play_fn

    config = MCTSConfig(simulations=10, num_sampling_moves=3,
                        root_dirichlet_alpha=0.3, root_exploration_fraction=0.25)
    whole = make_play_fn(centre_evaluator_batched, config, 5)
    stepwise = make_stepwise_play_fn(centre_evaluator_batched, config, 5)
    key = jax.random.key(11)
    a = jax.tree_util.tree_map(np.asarray, whole(key))
    b = jax.tree_util.tree_map(np.asarray, stepwise(key))
    for name, x, y in zip(a._fields, a, b):
        np.testing.assert_array_equal(x, y, err_msg=name)


def test_chunked_search_matches_whole_program():
    """Splitting each ply's search across several device calls must still
    be bit-identical to the monolithic program."""
    from connect4_tpu.training.self_play import make_stepwise_play_fn

    config = MCTSConfig(simulations=12, num_sampling_moves=2,
                        root_dirichlet_alpha=0.3, root_exploration_fraction=0.25)
    whole = make_play_fn(centre_evaluator_batched, config, 4)
    chunked = make_stepwise_play_fn(
        centre_evaluator_batched, config, 4, sims_per_call=4
    )
    key = jax.random.key(5)
    a = jax.tree_util.tree_map(np.asarray, whole(key))
    b = jax.tree_util.tree_map(np.asarray, chunked(key))
    for name, x, y in zip(a._fields, a, b):
        np.testing.assert_array_equal(x, y, err_msg=name)


def test_refill_plays_all_games_and_replays_consistently():
    """Compact-and-refill with fewer slots than games must complete every
    game, with records that replay exactly on the host oracle."""
    from connect4_tpu.training.self_play import make_refill_play_fn

    config = MCTSConfig(simulations=8, num_sampling_moves=4,
                        root_dirichlet_alpha=0.3, root_exploration_fraction=0.25)
    play = make_refill_play_fn(
        centre_evaluator_batched, config, slots=3, total_games=9
    )
    out = jax.tree_util.tree_map(np.asarray, play(jax.random.key(3)))
    assert out.result.shape == (9,)
    assert (out.result != 0).all(), "all 9 games must finish"
    assert (out.length >= 7).all() and (out.length <= 42).all()
    for b in range(9):
        np.testing.assert_array_equal(
            out.mask[b], np.arange(42) < out.length[b], err_msg=f"game {b}"
        )
        board = HostBoard()
        for t in range(int(out.length[b])):
            np.testing.assert_array_equal(
                out.planes[b, t], board.to_planes().astype(np.uint8),
                err_msg=f"game {b} ply {t}",
            )
            mv = int(out.moves[b, t])
            assert mv in board.valid_moves, f"game {b} ply {t} move {mv}"
            board.make_move(mv)
        assert board.result is not None
        assert board.result.code == int(out.result[b]), f"game {b}"
    # policies on played steps are distributions, zero elsewhere
    sums = out.policies.sum(-1)
    np.testing.assert_allclose(sums[out.mask], 1.0, atol=1e-5)
    assert (sums[~out.mask] == 0.0).all()


def test_refill_drain_narrowing_replays_consistently():
    """With slots >= 128, the drain phase compacts live rows into
    progressively narrower pools (floor 64). Every game must still finish,
    be recorded exactly once, and replay move-by-move on the host oracle
    — compaction only relocates rows, never touches game state."""
    from connect4_tpu.training.self_play import make_refill_play_fn

    config = MCTSConfig(simulations=4, num_sampling_moves=4,
                        root_dirichlet_alpha=0.3, root_exploration_fraction=0.25)
    play = make_refill_play_fn(
        centre_evaluator_batched, config, slots=128, total_games=140
    )
    widths = []
    out = jax.tree_util.tree_map(
        np.asarray, play(jax.random.key(11), progress=lambda w, n: widths.append(n))
    )
    assert (out.result != 0).all(), "all games must finish"
    assert min(w for w in widths if w) < 64, "drain must reach the narrow phase"
    for b in range(0, 140, 17):
        board = HostBoard()
        for t in range(int(out.length[b])):
            mv = int(out.moves[b, t])
            assert mv in board.valid_moves, f"game {b} ply {t} move {mv}"
            board.make_move(mv)
        assert board.result is not None and board.result.code == int(out.result[b])
    sums = out.policies.sum(-1)
    np.testing.assert_allclose(sums[out.mask], 1.0, atol=1e-5)
    assert (sums[~out.mask] == 0.0).all()


def test_refill_chunked_search_path():
    """Refill with per-ply search chunking still finishes every game."""
    from connect4_tpu.training.self_play import make_refill_play_fn

    config = MCTSConfig(simulations=8)
    play = make_refill_play_fn(
        centre_evaluator_batched, config, slots=2, total_games=5,
        sims_per_call=4,
    )
    out = jax.tree_util.tree_map(np.asarray, play(jax.random.key(7)))
    assert (out.result != 0).all()
    assert (out.length >= 7).all()


def test_sampling_changes_openings():
    """With opening sampling + noise on, a batch should not play 42
    identical games."""
    out = _play(
        batch=8,
        sims=12,
        root_dirichlet_alpha=0.3,
        root_exploration_fraction=0.25,
        num_sampling_moves=6,
    )
    first_moves = out.moves[:, 0]
    assert len(np.unique(first_moves)) > 1 or len(np.unique(out.moves[:, 1])) > 1
