"""Host <-> device board conversions (off the hot path)."""

from __future__ import annotations

from typing import List, Sequence

import numpy as np

import jax.numpy as jnp

from connect4_tpu.env.core import BoardState
from connect4_tpu.env.host_board import HostBoard
from connect4_tpu.types import ONGOING, Result


def stack_boards(boards: Sequence[HostBoard]) -> BoardState:
    """Pack host boards into a batched device BoardState [N, ...]."""
    pieces = np.stack([b.pieces for b in boards])
    height = np.stack([b.height for b in boards]).astype(np.int32)
    age = np.array([b.age for b in boards], dtype=np.int32)
    result = np.array(
        [ONGOING if b.result is None else b.result.code for b in boards],
        dtype=np.int8,
    )
    return BoardState(
        pieces=jnp.asarray(pieces),
        height=jnp.asarray(height),
        age=jnp.asarray(age),
        result=jnp.asarray(result),
    )


def unstack_state(state: BoardState) -> List[HostBoard]:
    """Unpack a batched device state into host boards."""
    pieces = np.asarray(state.pieces)
    height = np.asarray(state.height)
    age = np.asarray(state.age)
    result = np.asarray(state.result)
    boards = []
    for i in range(pieces.shape[0]):
        b = HostBoard()
        b.pieces = pieces[i].copy()
        b.height = height[i].astype(np.int64)
        b.age = int(age[i])
        b.result = Result.from_code(int(result[i]))
        boards.append(b)
    return boards
