"""Model + learner tests: shapes, output ranges, parameter-count parity with
the reference default config (~64.6k params,
``/root/reference/oinkoink/neural/config.py:7-16``), and a tiny overfit run.
"""

import numpy as np

import jax
import jax.numpy as jnp

from connect4_tpu.config import ModelConfig, NetConfig
from connect4_tpu.models import count_params, init_net
from connect4_tpu.models.net import nchw_to_nhwc
from connect4_tpu.training.learner import (
    TrainState,
    bce_loss,
    make_eval_fn,
    make_optimizer,
    make_train_step,
    set_learning_rate,
)


def test_forward_shapes_and_ranges():
    net, variables = init_net(NetConfig(), jax.random.key(0))
    x = jax.random.uniform(jax.random.key(1), (5, 6, 7, 3))
    value, prior = jax.jit(lambda v, x: net.apply(v, x, train=False))(variables, x)
    assert value.shape == (5,)
    assert prior.shape == (5, 7)
    assert (np.asarray(value) >= 0).all() and (np.asarray(value) <= 1).all()
    np.testing.assert_allclose(np.asarray(prior).sum(-1), 1.0, rtol=1e-5)


def test_param_count_matches_reference_default():
    _, variables = init_net(NetConfig(), jax.random.key(0))
    # reference default config: 64,575 trainable parameters
    assert count_params(variables["params"]) == 64575


def test_param_count_example_config():
    # the reference's published run: filters=64, fc=6, res=6
    # (/root/reference/oinkoink/data/example_config.py:8-16)
    cfg = NetConfig(filters=64, n_fc_layers=6, n_residuals=6)
    _, variables = init_net(cfg, jax.random.key(0))
    n = count_params(variables["params"])
    assert 400_000 < n < 500_000  # ~458k


def test_nchw_adapter():
    x = jnp.arange(2 * 3 * 6 * 7, dtype=jnp.float32).reshape(2, 3, 6, 7)
    y = nchw_to_nhwc(x)
    assert y.shape == (2, 6, 7, 3)
    np.testing.assert_array_equal(np.asarray(y[0, :, :, 1]), np.asarray(x[0, 1]))


def test_bce_matches_manual():
    p = jnp.array([[0.9, 0.1], [0.5, 0.5]])
    t = jnp.array([[1.0, 0.0], [0.0, 1.0]])
    manual = -np.mean(
        np.asarray(t) * np.log(np.asarray(p))
        + (1 - np.asarray(t)) * np.log(1 - np.asarray(p))
    )
    np.testing.assert_allclose(float(bce_loss(p, t)), manual, rtol=1e-6)


def test_lr_schedule():
    cfg = ModelConfig()
    assert cfg.lr_at_generation(1) == 0.01
    assert cfg.lr_at_generation(99) == 0.01
    assert np.isclose(cfg.lr_at_generation(100), 0.001)
    assert np.isclose(cfg.lr_at_generation(300), 0.0001)
    assert np.isclose(cfg.lr_at_generation(700), 1e-5)


def test_overfit_tiny_batch():
    """Ten SGD steps on a fixed batch must reduce the loss; BN stats and
    momentum must update without NaNs."""
    model_cfg = ModelConfig(net_config=NetConfig(filters=8, n_fc_layers=1, n_residuals=1))
    net, variables = init_net(model_cfg.net_config, jax.random.key(0))
    optimizer = make_optimizer(model_cfg)
    state = TrainState(
        params=variables["params"],
        batch_stats=variables["batch_stats"],
        opt_state=optimizer.init(variables["params"]),
    )
    state = state._replace(opt_state=set_learning_rate(state.opt_state, 0.05))

    x = jax.random.bernoulli(jax.random.key(1), 0.3, (32, 6, 7, 3)).astype(jnp.float32)
    v_t = jax.random.bernoulli(jax.random.key(2), 0.5, (32,)).astype(jnp.float32)
    p_t = jax.nn.softmax(jax.random.normal(jax.random.key(3), (32, 7)), axis=-1)

    step = jax.jit(make_train_step(net, optimizer))
    first = None
    for i in range(10):
        state, metrics = step(state, x, v_t, p_t)
        loss = float(metrics["loss"])
        assert np.isfinite(loss)
        if first is None:
            first = loss
    assert loss < first

    forward = jax.jit(make_eval_fn(net))
    value, prior = forward(state.params, state.batch_stats, x)
    assert np.isfinite(np.asarray(value)).all()
    assert np.isfinite(np.asarray(prior)).all()


def test_folded_bn_inference_matches_training_apply():
    """InferenceNet with fold_bn_params must reproduce the training-mode
    net's inference forward: exactly in f32, to bf16 rounding otherwise.
    (The folded tower is the self-play evaluator's default path.)"""
    import jax.numpy as jnp

    from connect4_tpu.models.net import InferenceNet, fold_bn_params

    for dtype, vtol, ptol in (("float32", 0.0, 1e-6), ("bfloat16", 1e-3, 5e-3)):
        cfg = NetConfig(
            filters=16, n_fc_layers=2, n_residuals=2, compute_dtype=dtype
        )
        net, variables = init_net(cfg, jax.random.key(0))
        # perturb the running stats so folding is non-trivial
        bs = jax.tree_util.tree_map(
            lambda a: a + 0.3 * jnp.abs(a) + 0.05, variables["batch_stats"]
        )
        x = jax.random.uniform(jax.random.key(1), (32, 6, 7, 3))
        v1, p1 = net.apply(
            {"params": variables["params"], "batch_stats": bs}, x, train=False
        )
        folded = fold_bn_params(cfg, variables["params"], bs)
        v2, p2 = InferenceNet(cfg).apply({"params": folded}, x)
        assert float(jnp.abs(v1 - v2).max()) <= vtol
        assert float(jnp.abs(p1 - p2).max()) <= ptol


def test_net_evaluator_folded_matches_unfolded():
    """The default (folded) net evaluator agrees with the training-mode
    evaluator on real board states."""
    import numpy as np

    from connect4_tpu.env.core import initial_state, step
    from connect4_tpu.eval.evaluators import make_net_evaluator

    cfg = NetConfig(filters=8, n_fc_layers=1, n_residuals=1)
    net, variables = init_net(cfg, jax.random.key(0))
    state = initial_state((4,))
    for mv in (3, 2, 3, 4):
        state = jax.jit(step)(state, jnp.full((4,), mv, jnp.int32))
    ev_fold = make_net_evaluator(net, variables["params"], variables["batch_stats"])
    ev_ref = make_net_evaluator(
        net, variables["params"], variables["batch_stats"], fold_bn=False
    )
    v1, p1 = jax.jit(ev_fold)(state)
    v2, p2 = jax.jit(ev_ref)(state)
    np.testing.assert_allclose(np.asarray(v1), np.asarray(v2), atol=1e-5)
    np.testing.assert_allclose(np.asarray(p1), np.asarray(p2), atol=1e-5)
