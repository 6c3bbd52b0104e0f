"""The fused Pallas inference tower must reproduce the folded-BN XLA
tower (models.net.InferenceNet) to bf16 rounding — same weights, same
layer boundaries, only the execution schedule differs."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from connect4_tpu.config import MCTSConfig, NetConfig
from connect4_tpu.env.convert import stack_boards
from connect4_tpu.env.host_board import HostBoard
from connect4_tpu.eval.evaluators import (
    make_net_evaluator,
    make_pallas_net_evaluator,
)
from connect4_tpu.models import init_net
from connect4_tpu.models.net import InferenceNet, fold_bn_params
from connect4_tpu.models.pallas_net import TILE, make_pallas_forward, pack_weights


@pytest.fixture(scope="module")
def small_net():
    config = NetConfig(filters=16, n_fc_layers=2, n_residuals=2,
                       compute_dtype="bfloat16")
    net, variables = init_net(config, jax.random.key(7))
    return config, net, variables


def _random_planes(n, key):
    # binary planes like real board encodings
    return (jax.random.uniform(key, (n, 6, 7, 3)) < 0.25).astype(jnp.float32)


def test_matches_folded_xla_tower(small_net):
    config, net, variables = small_net
    folded = fold_bn_params(config, variables["params"], variables["batch_stats"])
    packed = pack_weights(config, folded)
    forward = make_pallas_forward(config, packed)

    x = _random_planes(2 * TILE + 5, jax.random.key(1))  # exercises padding
    v_ref, p_ref = InferenceNet(config).apply({"params": folded}, x)
    v, p = forward(x)

    assert v.shape == (x.shape[0],) and p.shape == (x.shape[0], 7)
    np.testing.assert_allclose(np.asarray(v), np.asarray(v_ref), atol=2e-2)
    np.testing.assert_allclose(np.asarray(p), np.asarray(p_ref), atol=2e-2)
    np.testing.assert_allclose(np.asarray(p).sum(-1), 1.0, atol=1e-5)
    assert (np.asarray(v) >= 0).all() and (np.asarray(v) <= 1).all()


def test_evaluator_backend_agrees_on_boards(small_net):
    config, net, variables = small_net
    xla_eval = make_net_evaluator(net, variables["params"], variables["batch_stats"])
    pl_eval = make_pallas_net_evaluator(
        net, variables["params"], variables["batch_stats"]
    )
    boards = [HostBoard()]
    b = HostBoard()
    for mv in [3, 3, 2, 4, 1]:
        b.make_move(mv)
        boards.append(b.copy() if hasattr(b, "copy") else b)
    state = stack_boards([HostBoard(), b])
    v1, p1 = jax.jit(xla_eval)(state)
    v2, p2 = jax.jit(pl_eval)(state)
    np.testing.assert_allclose(np.asarray(v1), np.asarray(v2), atol=2e-2)
    np.testing.assert_allclose(np.asarray(p1), np.asarray(p2), atol=2e-2)


def test_search_runs_with_pallas_evaluator(small_net):
    """End-to-end: the batched MCTS accepts the Pallas evaluator and
    produces a legal move distribution."""
    from connect4_tpu.mcts.batched import make_search_fn

    config, net, variables = small_net
    pl_eval = make_pallas_net_evaluator(
        net, variables["params"], variables["batch_stats"]
    )
    search = make_search_fn(
        pl_eval, MCTSConfig(simulations=16, parallel_sims=8)
    )
    res = search(stack_boards([HostBoard(), HostBoard()]), jax.random.key(0))
    assert int(res.move[0]) in range(7)
    np.testing.assert_allclose(
        np.asarray(res.values_policy).sum(-1), 1.0, atol=1e-4
    )
