"""Orbax checkpointing of the full learner state.

The TPU equivalent of the reference's torch checkpoint of net + optimiser +
scheduler state (``/root/reference/oinkoink/neural/pytorch/model.py:242-250``):
params, BatchNorm statistics, optimiser state (momentum + injected LR) and
the PRNG key are saved per generation under ``save_dir/<gen>/ckpt``.
Resume follows the reference convention of scanning ``save_dir`` for the
highest numeric generation (``training.py:30-47``).
"""

from __future__ import annotations

import os
import re
from typing import Any, Dict, Optional, Tuple

import jax
import numpy as np
import orbax.checkpoint as ocp

from connect4_tpu.training.learner import TrainState


def _ckpt_path(save_dir: str, gen: int) -> str:
    return os.path.abspath(os.path.join(save_dir, str(gen), "ckpt"))


def save_checkpoint(save_dir: str, gen: int, state: TrainState, key: jax.Array) -> str:
    path = _ckpt_path(save_dir, gen)
    payload = {
        "params": state.params,
        "batch_stats": state.batch_stats,
        "opt_state": state.opt_state,
        "key": jax.random.key_data(key),
        "gen": np.asarray(gen, dtype=np.int64),
    }
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(path, payload, force=True)
    return path


def restore_checkpoint(
    save_dir: str, gen: int, template_state: TrainState, template_key: jax.Array
) -> Tuple[TrainState, jax.Array]:
    """Restore into the structure of freshly-initialised state."""
    path = _ckpt_path(save_dir, gen)
    template = {
        "params": template_state.params,
        "batch_stats": template_state.batch_stats,
        "opt_state": template_state.opt_state,
        "key": jax.random.key_data(template_key),
        "gen": np.asarray(gen, dtype=np.int64),
    }
    with ocp.StandardCheckpointer() as ckptr:
        restored = ckptr.restore(path, template)
    state = TrainState(
        params=restored["params"],
        batch_stats=restored["batch_stats"],
        opt_state=restored["opt_state"],
    )
    key = jax.random.wrap_key_data(restored["key"])
    return state, key


def checkpoint_generations(save_dir: str) -> list[int]:
    """All numeric subdirectories containing a checkpoint dir, ascending."""
    if not os.path.isdir(save_dir):
        return []
    gens = []
    for name in os.listdir(save_dir):
        if re.fullmatch(r"\d+", name) and os.path.isdir(
            os.path.join(save_dir, name, "ckpt")
        ):
            gens.append(int(name))
    return sorted(gens)


def latest_generation(save_dir: str) -> Optional[int]:
    """Highest numeric subdirectory containing a checkpoint, or None."""
    gens = checkpoint_generations(save_dir)
    return gens[-1] if gens else None


def restore_latest(
    save_dir: str, template_state: TrainState, template_key: jax.Array
) -> Optional[Tuple[int, TrainState, jax.Array]]:
    """Restore the newest *readable* checkpoint, falling back one
    generation at a time past half-written/corrupt directories (a crash
    during ``save_checkpoint`` can leave a partial Orbax dir behind). The
    reference handles the same failure by dropping back one generation
    (``/root/reference/oinkoink/neural/training.py:30-47``). Returns
    ``(gen, state, key)`` or ``None`` when no checkpoint is readable."""
    for gen in reversed(checkpoint_generations(save_dir)):
        try:
            state, key = restore_checkpoint(save_dir, gen, template_state, template_key)
            return gen, state, key
        except Exception as exc:  # orbax raises various types on partial dirs
            print(
                f"checkpoint for generation {gen} is unreadable "
                f"({type(exc).__name__}: {exc}); falling back one generation"
            )
    return None
