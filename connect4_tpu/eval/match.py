"""Batched match system.

Replaces the reference's ``Match`` (one process per game via
``torch.multiprocessing.Pool``, ``/root/reference/oinkoink/match.py:14-76``)
with lockstep batches: all games of a pairing share a start-position set
(every distinct non-terminal k-ply position, as ``make_random_ips``), and
because every game in a sub-batch starts at the same ply, the side to move
is uniform across the batch at every step — each step is therefore exactly
one batched MCTS for whichever player owns that colour.

With ``switch=True`` the pairing is mirrored (player 2 takes the o seat on
the same start set) and mirrored results are flipped before aggregation,
as in ``match.py:34-41,53-55``. The summary dict and the
``(wins + 0.5 draws) / n`` return match ``match.py:57-70``.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional

import numpy as np

import jax
import jax.numpy as jnp

from connect4_tpu.config import MCTSConfig
from connect4_tpu.env.convert import stack_boards
from connect4_tpu.env.core import step
from connect4_tpu.env.host_board import HostBoard, enumerate_start_positions
from connect4_tpu.eval.evaluators import BatchedEvaluator
from connect4_tpu.mcts.batched import search
from connect4_tpu.types import ONGOING, AREA, Side


@dataclasses.dataclass
class MatchPlayer:
    """A named agent: batched evaluator + search settings."""

    name: str
    evaluator: BatchedEvaluator
    config: MCTSConfig


def _search_move_fn(player: MatchPlayer):
    """Jitted (state, key, active) -> move for one player; built once per
    player so the switched sub-match reuses the compilation."""

    def run(st, k, active):
        res = search(player.evaluator, st, k, player.config, active)
        return res.move

    return jax.jit(run)


def _play_sub_batch(
    search_o,
    search_x,
    boards: List[HostBoard],
    seed: int,
) -> np.ndarray:
    """Play every game to completion; returns o-perspective result values."""
    state = stack_boards(boards)
    key = jax.random.key(seed)
    searches = {Side.o: search_o, Side.x: search_x}
    step_fn = jax.jit(step)

    ages = {b.age for b in boards}
    if len(ages) != 1:
        raise ValueError(
            "play_match start boards must share a single start age (the "
            "lockstep driver derives the side to move from the shared ply "
            f"counter); got ages {sorted(ages)}"
        )
    start_age = boards[0].age
    max_plies = AREA - start_age
    for i in range(max_plies):
        results = np.asarray(state.result)
        if (results != ONGOING).all():
            break
        # all games share start parity and step in lockstep, so the side to
        # move in every live game is determined by the ply counter (frozen
        # finished games no longer advance their age)
        side = Side((start_age + i) % 2)
        key, sub = jax.random.split(key)
        active = jnp.asarray(results == ONGOING)
        move = searches[side](state, sub, active)
        state = step_fn(state, move, active)

    from connect4_tpu.env.core import result_value

    return np.asarray(result_value(state.result))


def play_match(
    player_1: MatchPlayer,
    player_2: MatchPlayer,
    plies: int = 0,
    switch: bool = False,
    seed: int = 0,
    display: bool = True,
    start_boards: Optional[List[HostBoard]] = None,
) -> Dict[str, float]:
    """Play all k-ply start positions with player_1 as o (plus the mirrored
    set when ``switch``); returns the reference-format summary dict."""
    boards = start_boards if start_boards is not None else enumerate_start_positions(plies)

    search_1 = _search_move_fn(player_1)
    search_2 = _search_move_fn(player_2)
    results = _play_sub_batch(search_1, search_2, boards, seed)
    if switch:
        flipped = _play_sub_batch(search_2, search_1, boards, seed + 1)
        results = np.concatenate([results, 1.0 - flipped])

    wins = int((results == 1.0).sum())
    draws = int((results == 0.5).sum())
    losses = int((results == 0.0).sum())
    return_ = (wins + 0.5 * draws) / max(wins + draws + losses, 1)

    if display:
        print(
            "The results for {} vs {} are: {} wins, {} draws, {} losses, "
            "{:.3f} return".format(
                player_1.name, player_2.name, wins, draws, losses, return_
            )
        )

    return {"wins": wins, "draws": draws, "losses": losses, "return": return_}
