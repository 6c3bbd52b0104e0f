"""Vectorized, pure-functional Connect4 environment for TPU.

This replaces the reference's scalar int64 bitboard
(``/root/reference/oinkoink/board.py:35-222``) with a struct-of-arrays state
that carries an arbitrary leading batch shape, so thousands of games step in
lockstep inside a single XLA program. TPUs prefer 32-bit lanes and dense
vector ops over 64-bit scalar bit twiddling, so the board is held as boolean
piece planes; win detection is a static-shape shift-AND over those planes
(the array equivalent of the reference's bitboard check at
``/root/reference/oinkoink/board.py:172-184``), which XLA fuses into a few
VPU ops with no data-dependent control flow.

Conventions:

- ``pieces[..., p, r, c]`` — True when player ``p`` (0 = o, 1 = x) has a
  stone at row ``r`` (row 0 is the *bottom*), column ``c``.
- ``height[..., c]`` — number of stones in column ``c``.
- ``age[...]`` — total stones on the board; side to move is ``age % 2``.
- ``result[...]`` — int8 result code (see ``connect4_tpu.types``).

All functions broadcast over the leading batch shape and are jit/vmap/pjit
compatible (static shapes, no Python branching on traced values).
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from connect4_tpu.types import AREA, DRAW, HEIGHT, ONGOING, WIDTH


class BoardState(NamedTuple):
    """Batched Connect4 position (a pytree of arrays)."""

    pieces: jax.Array  # bool[..., 2, HEIGHT, WIDTH], row 0 = bottom
    height: jax.Array  # int32[..., WIDTH]
    age: jax.Array  # int32[...]
    result: jax.Array  # int8[...]

    @property
    def batch_shape(self):
        return self.age.shape


def initial_state(batch_shape: tuple = ()) -> BoardState:
    """Empty board(s) with the given leading batch shape."""
    return BoardState(
        pieces=jnp.zeros(batch_shape + (2, HEIGHT, WIDTH), dtype=jnp.bool_),
        height=jnp.zeros(batch_shape + (WIDTH,), dtype=jnp.int32),
        age=jnp.zeros(batch_shape, dtype=jnp.int32),
        result=jnp.zeros(batch_shape, dtype=jnp.int8),
    )


def has_four(plane: jax.Array) -> jax.Array:
    """True where ``plane`` (bool[..., HEIGHT, WIDTH]) contains 4 in a row.

    Static-slice shift-AND in all four directions; the batched analogue of
    the reference bitboard test (``/root/reference/oinkoink/board.py:172-184``).
    """
    p = plane
    horiz = p[..., :, :-3] & p[..., :, 1:-2] & p[..., :, 2:-1] & p[..., :, 3:]
    vert = p[..., :-3, :] & p[..., 1:-2, :] & p[..., 2:-1, :] & p[..., 3:, :]
    diag = p[..., :-3, :-3] & p[..., 1:-2, 1:-2] & p[..., 2:-1, 2:-1] & p[..., 3:, 3:]
    anti = p[..., :-3, 3:] & p[..., 1:-2, 2:-1] & p[..., 2:-1, 1:-2] & p[..., 3:, :-3]
    reduce_axes = (-2, -1)
    return (
        jnp.any(horiz, axis=reduce_axes)
        | jnp.any(vert, axis=reduce_axes)
        | jnp.any(diag, axis=reduce_axes)
        | jnp.any(anti, axis=reduce_axes)
    )


def legal_moves(state: BoardState) -> jax.Array:
    """bool[..., WIDTH] — playable columns; all-False once the game is over
    (matches ``/root/reference/oinkoink/board.py:88-92``)."""
    open_col = state.height < HEIGHT
    ongoing = (state.result == ONGOING)[..., None]
    return open_col & ongoing


def step(
    state: BoardState,
    move: jax.Array,
    enabled: Optional[jax.Array] = None,
) -> BoardState:
    """Drop the side-to-move's stone into column ``move`` (int32[...]).

    ``enabled`` (bool[...]) optionally freezes entries (used by lockstep
    batches that contain finished games); finished games are always frozen.
    The caller is responsible for ``move`` being legal on enabled, ongoing
    games. Semantics mirror ``/root/reference/oinkoink/board.py:160-170``:
    place stone, check win for the mover, then draw when the board fills.
    """
    player = (state.age % 2).astype(jnp.int32)
    row = jnp.take_along_axis(state.height, move[..., None], axis=-1)[..., 0]

    rows = jnp.arange(HEIGHT, dtype=jnp.int32)
    cols = jnp.arange(WIDTH, dtype=jnp.int32)
    cell = (rows[:, None] == row[..., None, None]) & (
        cols[None, :] == move[..., None, None]
    )  # bool[..., H, W]
    side_sel = jnp.arange(2, dtype=jnp.int32)[:, None, None] == player[..., None, None, None]
    update = side_sel & cell[..., None, :, :]  # bool[..., 2, H, W]
    new_pieces = state.pieces | update

    new_height = state.height + (cols == move[..., None]).astype(jnp.int32)
    new_age = state.age + 1

    mover_plane = jnp.take_along_axis(
        new_pieces, player[..., None, None, None], axis=-3
    )[..., 0, :, :]
    won = has_four(mover_plane)

    new_result = jnp.where(
        won,
        (player + 1).astype(jnp.int8),  # O_WIN=1 for player 0, X_WIN=2 for player 1
        jnp.where(new_age >= AREA, jnp.int8(DRAW), jnp.int8(ONGOING)),
    )

    active = state.result == ONGOING
    if enabled is not None:
        active = active & enabled

    return BoardState(
        pieces=jnp.where(active[..., None, None, None], new_pieces, state.pieces),
        height=jnp.where(active[..., None], new_height, state.height),
        age=jnp.where(active, new_age, state.age),
        result=jnp.where(active, new_result, state.result),
    )


def to_planes(state: BoardState, dtype=jnp.float32) -> jax.Array:
    """Network input planes, shape ``[..., 3, HEIGHT, WIDTH]``.

    Channel 0 is all-ones when o is to move (else zeros), channels 1/2 are
    o/x stones, with row 0 at the *top* to match the reference encoding
    (``/root/reference/oinkoink/board.py:147-154``).
    """
    to_move = (state.age % 2 == 0)[..., None, None]
    to_move = jnp.broadcast_to(to_move, state.age.shape + (HEIGHT, WIDTH))
    top_down = state.pieces[..., ::-1, :]  # row 0 = top
    return jnp.stack(
        [to_move, top_down[..., 0, :, :], top_down[..., 1, :, :]], axis=-3
    ).astype(dtype)


def flip_lr(state: BoardState) -> BoardState:
    """Mirror the board about the centre column — the data-augmentation
    symmetry (``/root/reference/oinkoink/board.py:115-126``)."""
    return BoardState(
        pieces=state.pieces[..., :, :, ::-1],
        height=state.height[..., ::-1],
        age=state.age,
        result=state.result,
    )


def symmetrical(state: BoardState) -> jax.Array:
    """bool[...] — True when the position equals its left-right mirror
    (``/root/reference/oinkoink/board.py:94-113``)."""
    return jnp.all(
        state.pieces == state.pieces[..., :, :, ::-1], axis=(-3, -2, -1)
    )


def result_value(result_code: jax.Array) -> jax.Array:
    """float32[...] absolute value of a *terminal* result code."""
    table = jnp.array([0.5, 1.0, 0.0, 0.5], dtype=jnp.float32)
    return table[result_code.astype(jnp.int32)]
