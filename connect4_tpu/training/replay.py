"""Replay storage: per-generation files + sliding training window.

Filesystem layout mirrors the reference's resume convention
(``save_dir/<gen>/{data,games}``; ``/root/reference/oinkoink/neural/
pytorch/data.py:47-75``, ``storage.py:11-22``) with npz instead of torch
pickles. The training window is the last ``min(20, (gen + 1) // 2)``
generations, concatenated — identical to ``get_dataset``
(``data.py:66-75``).
"""

from __future__ import annotations

import os
from typing import Tuple

import numpy as np

from connect4_tpu.training.self_play import SelfPlayOutput, training_arrays


def generation_dir(save_dir: str, gen: int) -> str:
    return os.path.join(save_dir, str(gen))


def window_size(gen: int) -> int:
    return min(20, (gen + 1) // 2)


def save_generation(save_dir: str, gen: int, output: SelfPlayOutput) -> int:
    """Write ``<gen>/data.npz`` (augmented training arrays) and
    ``<gen>/games.npz`` (raw per-game records, the ``games.pkl``
    equivalent). Returns the number of training positions written."""
    folder = generation_dir(save_dir, gen)
    os.makedirs(folder, exist_ok=True)

    planes, values, policies = training_arrays(output)
    np.savez_compressed(
        os.path.join(folder, "data.npz"),
        planes=planes,
        values=values,
        policies=policies,
    )
    np.savez_compressed(
        os.path.join(folder, "games.npz"),
        moves=np.asarray(output.moves, dtype=np.int8),
        move_values=np.asarray(output.move_values, dtype=np.float32),
        policies=np.asarray(output.policies, dtype=np.float32),
        mask=np.asarray(output.mask),
        result=np.asarray(output.result, dtype=np.int8),
        length=np.asarray(output.length, dtype=np.int32),
    )
    return len(values)


def append_generation(save_dir: str, gen: int, outputs) -> int:
    """Like save_generation but concatenates several self-play waves."""
    folder = generation_dir(save_dir, gen)
    os.makedirs(folder, exist_ok=True)

    parts = [training_arrays(o) for o in outputs]
    planes = np.concatenate([p[0] for p in parts])
    values = np.concatenate([p[1] for p in parts])
    policies = np.concatenate([p[2] for p in parts])
    np.savez_compressed(
        os.path.join(folder, "data.npz"),
        planes=planes, values=values, policies=policies,
    )
    np.savez_compressed(
        os.path.join(folder, "games.npz"),
        moves=np.concatenate([np.asarray(o.moves, dtype=np.int8) for o in outputs]),
        move_values=np.concatenate(
            [np.asarray(o.move_values, dtype=np.float32) for o in outputs]
        ),
        policies=np.concatenate(
            [np.asarray(o.policies, dtype=np.float32) for o in outputs]
        ),
        mask=np.concatenate([np.asarray(o.mask) for o in outputs]),
        result=np.concatenate([np.asarray(o.result, dtype=np.int8) for o in outputs]),
        length=np.concatenate([np.asarray(o.length, dtype=np.int32) for o in outputs]),
    )
    return len(values)


def load_window(
    save_dir: str, gen: int
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Concatenate the replay window ending at ``gen`` (inclusive)."""
    n = window_size(gen)
    planes, values, policies = [], [], []
    for g in range(gen, gen - n, -1):
        path = os.path.join(generation_dir(save_dir, g), "data.npz")
        with np.load(path) as data:
            planes.append(data["planes"])
            values.append(data["values"])
            policies.append(data["policies"])
    return (
        np.concatenate(planes),
        np.concatenate(values),
        np.concatenate(policies),
    )


def game_str(moves, move_values, policies, length) -> str:
    """Pretty-print one recorded game
    (``/root/reference/oinkoink/neural/storage.py:25-36`` equivalent)."""
    from connect4_tpu.env.host_board import HostBoard

    board = HostBoard()
    out = [str(board)]
    for t in range(int(length)):
        board.make_move(int(moves[t]))
        out.append(
            "Move: {}  Value: {:.4f} Policy: {}\n{}".format(
                int(moves[t]),
                float(move_values[t]),
                np.round(np.asarray(policies[t]), 3),
                board,
            )
        )
    return "\n".join(out)
