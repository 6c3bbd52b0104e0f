"""Sharded (multi-chip) self-play and training programs.

Self-play is data-parallel over games; training is data-parallel over
batch rows with replicated parameters. Both are expressed as ordinary jit
programs with sharding annotations — XLA's SPMD partitioner inserts the
gradient ``psum`` and any resharding collectives, which ride ICI inside a
slice (no hand-written communication, unlike the reference's pipe RPC).
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from connect4_tpu.config import MCTSConfig
from connect4_tpu.eval.evaluators import BatchedEvaluator
from connect4_tpu.env.core import initial_state
from connect4_tpu.parallel.mesh import (
    DATA_AXIS,
    constrain_data,
    data_sharding,
    replicated,
)
from connect4_tpu.training.learner import TrainState, make_train_step
from connect4_tpu.training.self_play import play_games


def make_sharded_play_fn(
    eval_fn: BatchedEvaluator, config: MCTSConfig, batch: int, mesh: Mesh
):
    """Self-play over games sharded across the mesh. ``batch`` must divide
    evenly by the mesh size."""
    n_dev = int(np.prod(list(mesh.shape.values())))
    if batch % n_dev:
        raise ValueError(f"selfplay batch {batch} must be divisible by mesh size {n_dev}")

    def run(key: jax.Array):
        state = constrain_data(initial_state((batch,)), mesh)
        return play_games(eval_fn, config, batch, key, init_state=state)

    return jax.jit(run)


def make_sharded_train_step(net, optimizer, mesh: Mesh, weighted: bool = False):
    """DP train step: replicated state, data-sharded batch, replicated
    output (grad all-reduce inserted by the partitioner). The weighted
    value loss normalises by the GLOBAL weight sum (both reductions are
    full-batch sums the partitioner turns into psums), so sharded and
    single-device results agree."""
    step = make_train_step(net, optimizer, weighted=weighted)

    rep = replicated(mesh)
    data = data_sharding(mesh)

    def annotated(state: TrainState, planes, values, priors, weights=None):
        planes = constrain_data(planes, mesh)
        values = constrain_data(values, mesh)
        priors = constrain_data(priors, mesh)
        if weights is not None:
            weights = constrain_data(weights, mesh)
        new_state, metrics = step(state, planes, values, priors, weights)
        return new_state, metrics

    return jax.jit(annotated, out_shardings=(rep, rep))
