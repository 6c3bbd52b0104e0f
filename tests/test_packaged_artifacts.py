"""Guards on the shipped data files: the benchmark datasets must be
complete (the README's no-caveat claims depend on it) and the packaged
example net must load and produce sane output — the counterpart of the
reference shipping a working ``data/example_net.pth``
(``/root/reference/oinkoink/main.py:38-40``)."""

import json
import os

import numpy as np
import pytest

import jax

from connect4_tpu.config import ModelConfig, NetConfig, StorageConfig

DATA_DIR = StorageConfig().data_dir


@pytest.mark.parametrize(
    "name,total",
    [("connect4dataset_8ply.npz", 67557), ("connect4dataset_7ply.npz", 54131)],
)
def test_benchmark_datasets_complete(name, total):
    with np.load(os.path.join(DATA_DIR, name)) as d:
        assert len(d["values"]) == total
        assert int(d["solved"].sum()) == total
        assert set(np.unique(d["values"])) <= {0.0, 0.5, 1.0}


def test_8ply_labels_match_uci_class_distribution():
    # The UCI "connect-4" dataset's published class counts for the first
    # player: 44,473 win / 6,449 draw / 16,635 loss. The native solver
    # regenerated the labels from first principles; matching the
    # distribution exactly is an end-to-end check of solver + encoding.
    with np.load(os.path.join(DATA_DIR, "connect4dataset_8ply.npz")) as d:
        v = d["values"]
    assert int((v == 1.0).sum()) == 44473
    assert int((v == 0.5).sum()) == 6449
    assert int((v == 0.0).sum()) == 16635


def test_packaged_example_net_loads_and_evaluates():
    from connect4_tpu.models import init_net
    from connect4_tpu.training import checkpoint as ckpt
    from connect4_tpu.training.learner import (
        TrainState,
        make_eval_fn,
        make_optimizer,
    )

    base = os.path.join(DATA_DIR, "example_net")
    with open(os.path.join(base, "net_config.json")) as fh:
        nc = NetConfig(**json.load(fh))
    net, variables = init_net(nc, jax.random.key(0))
    opt = make_optimizer(ModelConfig(net_config=nc))
    template = TrainState(
        variables["params"], variables["batch_stats"],
        opt.init(variables["params"]),
    )
    gen = ckpt.latest_generation(base)
    assert gen is not None
    state, _ = ckpt.restore_checkpoint(base, gen, template, jax.random.key(0))

    x = np.zeros((2, 6, 7, 3), np.float32)
    x[..., 0] = 1.0  # o to move on an empty board
    value, prior = jax.jit(make_eval_fn(net))(state.params, state.batch_stats, x)
    value, prior = np.asarray(value), np.asarray(prior)
    assert np.all((value > 0.0) & (value < 1.0))
    np.testing.assert_allclose(prior.sum(axis=-1), 1.0, atol=1e-5)
    # a trained net prefers the centre on the empty board
    assert int(prior[0].argmax()) == 3
