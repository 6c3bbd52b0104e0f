"""Position evaluators.

The centre-weighted heuristic mirrors the reference's deterministic fake
evaluator used for NN-free search tests and early-gen gating opponents
(``/root/reference/oinkoink/evaluators.py:28-63``): each stone scores its
distance-from-edge weight, value = 0.5 + (o_score - x_score) / grid_sum,
prior uniform. Both a scalar host version and a batched device version are
provided; both compute in float32 so fidelity tests can compare search
trees across the two implementations.

The reference's ``Evaluator`` memoisation cache
(``/root/reference/oinkoink/evaluators.py:9-25``) is intentionally absent
on-device: it only ever saved repeated NN calls across a worker's games and
has no semantic effect at fixed simulation count (SURVEY.md §2.5); the
batched design amortises evaluation across the whole batch instead.
"""

from __future__ import annotations

from typing import Callable, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from connect4_tpu.env.core import BoardState
from connect4_tpu.env.host_board import HostBoard
from connect4_tpu.types import HEIGHT, WIDTH


def _make_centre_grid() -> np.ndarray:
    col_w = np.minimum(np.arange(WIDTH), np.arange(WIDTH)[::-1]).astype(np.float32)
    row_w = np.minimum(np.arange(HEIGHT), np.arange(HEIGHT)[::-1]).astype(np.float32)
    return row_w[:, None] + col_w[None, :]


CENTRE_GRID = _make_centre_grid()  # [6, 7], symmetric both ways
CENTRE_GRID_SUM = float(CENTRE_GRID.sum())  # 96.0
UNIFORM_PRIOR = np.full((WIDTH,), 1.0 / WIDTH, dtype=np.float32)

# Batched evaluator signature: BoardState[B] -> (value[B], prior[B, 7]).
BatchedEvaluator = Callable[[BoardState], Tuple[jax.Array, jax.Array]]


def centre_value_host(board: HostBoard) -> float:
    """Scalar heuristic value in float32 (orientation-invariant: the grid is
    symmetric, so bottom-up planes score identically to the reference's
    top-down ones)."""
    grid = CENTRE_GRID
    o = board.pieces[0].astype(np.float32)
    x = board.pieces[1].astype(np.float32)
    diff = np.float32((o * grid).sum()) - np.float32((x * grid).sum())
    return float(np.float32(0.5) + diff / np.float32(CENTRE_GRID_SUM))


def centre_evaluator_host(board: HostBoard) -> Tuple[float, np.ndarray]:
    return centre_value_host(board), UNIFORM_PRIOR.copy()


def centre_evaluator_batched(state: BoardState) -> Tuple[jax.Array, jax.Array]:
    grid = jnp.asarray(CENTRE_GRID)
    o = state.pieces[..., 0, :, :].astype(jnp.float32)
    x = state.pieces[..., 1, :, :].astype(jnp.float32)
    diff = jnp.sum(o * grid, axis=(-2, -1)) - jnp.sum(x * grid, axis=(-2, -1))
    value = 0.5 + diff / jnp.float32(CENTRE_GRID_SUM)
    prior = jnp.broadcast_to(
        jnp.asarray(UNIFORM_PRIOR), state.age.shape + (WIDTH,)
    )
    return value, prior


def make_net_evaluator(net, params, batch_stats, fold_bn: bool = True) -> BatchedEvaluator:
    """Wrap a Flax net into the batched evaluator interface. Leaf boards are
    encoded on-device and evaluated in one forward — the role the
    reference's cross-process InferenceServer played
    (``/root/reference/oinkoink/neural/inference_server.py:37-63``).

    ``fold_bn=True`` (default) folds the frozen BatchNorms into the conv
    kernels once at construction and runs the pure-bf16 ``InferenceNet``
    tower — exact in real arithmetic, and the forward is ~50% of every
    search wave (``scripts/selfplay_breakdown.py``). Pass ``False`` for
    the training-mode apply (bitwise-identical to ``make_eval_fn``)."""
    from connect4_tpu.env.core import to_planes

    if fold_bn:
        from connect4_tpu.models.net import InferenceNet, fold_bn_params

        inf_net = InferenceNet(net.config)
        folded = jax.jit(
            lambda p, s: fold_bn_params(net.config, p, s)
        )(params, batch_stats)

        def evaluate(state: BoardState):
            planes = to_planes(state)  # [..., 3, 6, 7]
            nhwc = jnp.moveaxis(planes, -3, -1)
            return inf_net.apply({"params": folded}, nhwc)

        return evaluate

    def evaluate(state: BoardState):
        planes = to_planes(state)  # [..., 3, 6, 7]
        nhwc = jnp.moveaxis(planes, -3, -1)
        return net.apply(
            {"params": params, "batch_stats": batch_stats}, nhwc, train=False
        )

    return evaluate


def make_pallas_net_evaluator(net, params, batch_stats) -> BatchedEvaluator:
    """Folded-BN evaluator running the fused Pallas tower
    (``models.pallas_net``): the whole 13-conv forward for a tile of
    boards stays VMEM-resident instead of round-tripping each layer's
    activation through HBM. Same inference-only transform chain as
    ``make_net_evaluator(fold_bn=True)``; outputs agree to bf16 rounding
    (tests/test_pallas_net.py). Opt-in backend — see README perf notes."""
    from connect4_tpu.env.core import to_planes
    from connect4_tpu.models.net import fold_bn_params
    from connect4_tpu.models.pallas_net import make_pallas_forward, pack_weights

    folded = jax.jit(
        lambda p, s: fold_bn_params(net.config, p, s)
    )(params, batch_stats)
    packed = jax.jit(lambda f: pack_weights(net.config, f))(folded)
    forward = make_pallas_forward(net.config, packed)

    def evaluate(state: BoardState):
        planes = to_planes(state)  # [..., 3, 6, 7]
        nhwc = jnp.moveaxis(planes, -3, -1).astype(jnp.float32)
        lead = nhwc.shape[:-3]
        flat = nhwc.reshape((-1,) + nhwc.shape[-3:])
        value, prior = forward(flat)
        return value.reshape(lead), prior.reshape(lead + (WIDTH,))

    return evaluate
