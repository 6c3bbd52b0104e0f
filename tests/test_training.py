"""Replay storage, checkpointing, stats, and a miniature end-to-end
training loop with resume — the coverage the reference lacked for its
training path."""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from connect4_tpu.config import (
    AlphaZeroConfig,
    MCTSConfig,
    ModelConfig,
    NetConfig,
    StorageConfig,
)
from connect4_tpu.eval.evaluators import centre_evaluator_batched
from connect4_tpu.models import init_net
from connect4_tpu.training import checkpoint as ckpt
from connect4_tpu.training import replay
from connect4_tpu.training.learner import TrainState, make_optimizer
from connect4_tpu.training.loop import TrainingLoop
from connect4_tpu.training.self_play import make_play_fn
from connect4_tpu.training.stats import PriorStats, ValueStats


def test_window_size_schedule():
    # min(20, (gen+1)//2): the reference replay window (data.py:66-75)
    assert replay.window_size(1) == 1
    assert replay.window_size(2) == 1
    assert replay.window_size(3) == 2
    assert replay.window_size(10) == 5
    assert replay.window_size(39) == 20
    assert replay.window_size(100) == 20


def _small_output(batch=3, sims=6):
    play = make_play_fn(centre_evaluator_batched, MCTSConfig(simulations=sims), batch)
    return jax.tree_util.tree_map(np.asarray, play(jax.random.key(0)))


def test_replay_roundtrip(tmp_path):
    out = _small_output()
    n = replay.save_generation(str(tmp_path), 1, out)
    assert n == 2 * int(out.mask.sum())
    planes, values, policies = replay.load_window(str(tmp_path), 1)
    assert len(planes) == len(values) == len(policies) == n

    # gen 3 window covers gens 2..3
    replay.save_generation(str(tmp_path), 2, out)
    replay.save_generation(str(tmp_path), 3, out)
    planes3, _, _ = replay.load_window(str(tmp_path), 3)
    assert len(planes3) == 2 * n


def test_window_tolerates_missing_generations(tmp_path, capsys):
    # A run continued from a packaged checkpoint has no history before its
    # first new generation: the window must skip absent gens (with a
    # notice), not crash — and must still refuse an entirely-empty window.
    out = _small_output()
    n = replay.save_generation(str(tmp_path), 7, out)
    # gen 7 window is gens 4..7; only gen 7 exists
    planes, values, policies = replay.load_window(str(tmp_path), 7)
    assert len(planes) == n
    assert "missing from disk" in capsys.readouterr().out
    planes, values, policies, w = replay.load_window_ex(str(tmp_path), 7)
    assert len(planes) == n and w is None
    with pytest.raises(FileNotFoundError):
        replay.load_window(str(tmp_path), 3)


def test_game_str_renders(tmp_path):
    out = _small_output()
    text = replay.game_str(
        out.moves[0], out.move_values[0], out.policies[0], out.length[0]
    )
    assert "Move:" in text and text.count("Move:") == int(out.length[0])


def test_checkpoint_roundtrip(tmp_path):
    cfg = ModelConfig(net_config=NetConfig(filters=4, n_fc_layers=1, n_residuals=1))
    _, variables = init_net(cfg.net_config, jax.random.key(0))
    opt = make_optimizer(cfg)
    state = TrainState(
        variables["params"], variables["batch_stats"], opt.init(variables["params"])
    )
    key = jax.random.key(123)
    ckpt.save_checkpoint(str(tmp_path), 5, state, key)
    assert ckpt.latest_generation(str(tmp_path)) == 5

    _, fresh_vars = init_net(cfg.net_config, jax.random.key(9))
    fresh = TrainState(
        fresh_vars["params"], fresh_vars["batch_stats"], opt.init(fresh_vars["params"])
    )
    restored, rkey = ckpt.restore_checkpoint(str(tmp_path), 5, fresh, jax.random.key(0))
    for a, b in zip(
        jax.tree_util.tree_leaves(restored.params),
        jax.tree_util.tree_leaves(state.params),
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert jax.random.key_data(rkey).tolist() == jax.random.key_data(key).tolist()


def test_value_stats_bucketing():
    s = ValueStats()
    preds = np.array([0.1, 0.5, 0.95, 0.4])
    targets = np.array([0.0, 0.5, 1.0, 0.0])
    s.update(preds, targets, loss=0.25)
    # floor(p*3)/2: 0.1->0.0 correct; 0.5->0.5 correct; 0.95->1.0 correct;
    # 0.4->0.5 wrong (target 0.0)
    assert s.accuracy == 0.75
    assert s.total[0.0] == 2 and s.correct[0.0] == 1
    assert s.smallest == 0.1 and s.largest == 0.95


def test_prior_stats_weak_move_accuracy():
    s = PriorStats()
    outputs = np.array([[0.5, 0.3, 0.2], [0.1, 0.8, 0.1]])
    # label 1: argmax set {0, 1}; prediction argmax 0 -> correct
    # label 2: argmax set {2};   prediction argmax 1 -> wrong
    targets = np.array([[0.5, 0.5, 0.0], [0.0, 0.0, 1.0]])
    s.update(outputs, targets, loss=0.1)
    assert s.accuracy == 0.5


def test_training_loop_end_to_end_and_resume(tmp_path):
    """Two generations of the full loop with a tiny config, then resume in
    a fresh TrainingLoop instance."""
    config = AlphaZeroConfig(
        model_config=ModelConfig(
            net_config=NetConfig(filters=4, n_fc_layers=1, n_residuals=1),
            batch_size=64,
            n_training_epochs=1,
        ),
        storage_config=StorageConfig(save_dir=str(tmp_path)),
        simulations=8,
        n_training_games=4,
        selfplay_batch=4,
        num_sampling_moves=4,
        n_eval=2,
        seed=0,
    )
    loop = TrainingLoop(config)
    assert loop.gen == 1
    loop.run(generations=2)
    assert loop.gen == 3

    for g in (1, 2):
        gdir = os.path.join(str(tmp_path), str(g))
        assert os.path.exists(os.path.join(gdir, "data.npz"))
        assert os.path.exists(os.path.join(gdir, "games.npz"))
        assert os.path.exists(os.path.join(gdir, "ckpt"))
    # gen 2 triggered the gating match (n_eval=2)
    assert os.path.exists(os.path.join(str(tmp_path), "match_results.pkl"))

    resumed = TrainingLoop(config)
    assert resumed.gen == 3
    for a, b in zip(
        jax.tree_util.tree_leaves(resumed.state.params),
        jax.tree_util.tree_leaves(loop.state.params),
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # A crash mid-save can leave a half-written checkpoint dir behind;
    # resume must fall back one generation (reference behaviour:
    # neural/training.py:30-47), not crash.
    import shutil

    g2_ckpt = os.path.join(str(tmp_path), "2", "ckpt")
    shutil.rmtree(g2_ckpt)
    os.makedirs(g2_ckpt)  # present but empty: unreadable by orbax
    fallback = TrainingLoop(config)
    assert fallback.gen == 2  # restored gen 1, continues at gen 2
    from connect4_tpu.training import checkpoint as ckpt_mod

    state1, _ = ckpt_mod.restore_checkpoint(
        str(tmp_path), 1, fallback.state, jax.random.key(0)
    )
    for a, b in zip(
        jax.tree_util.tree_leaves(fallback.state.params),
        jax.tree_util.tree_leaves(state1.params),
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_load_window_ex_q_recovery_and_weights(tmp_path):
    """q (search-value) recovery must line up exactly with data.npz rows,
    and the draw-weight column must mark drawn-game rows only."""
    out = _small_output()
    replay.save_generation(str(tmp_path), 1, out)

    planes, z, policies = replay.load_window(str(tmp_path), 1)
    p2, mixed, pol2, w = replay.load_window_ex(
        str(tmp_path), 1, value_target_mix=0.5, draw_loss_weight=4.0
    )
    np.testing.assert_array_equal(planes, p2)
    np.testing.assert_array_equal(policies, pol2)

    # reconstruct the expected mix by hand from the raw output
    mask = np.asarray(out.mask)
    b_idx, t_idx = np.nonzero(mask)
    q_sel = np.asarray(out.move_values)[b_idx, t_idx].astype(np.float32)
    q_rows = np.concatenate([q_sel, q_sel])
    np.testing.assert_allclose(mixed, 0.5 * z + 0.5 * q_rows, rtol=0, atol=1e-7)

    assert w is not None
    np.testing.assert_array_equal(w, np.where(z == 0.5, 4.0, 1.0).astype(np.float32))

    # λ=0 and weight=1: identical to the classic loader, weights omitted
    _, z0, _, w0 = replay.load_window_ex(str(tmp_path), 1)
    np.testing.assert_array_equal(z0, z)
    assert w0 is None


def test_weighted_train_step_ones_is_identity():
    """weighted=True with all-ones weights must reproduce the unweighted
    step bitwise (the extension cannot perturb reference semantics)."""
    from connect4_tpu.training.learner import make_train_step

    cfg = ModelConfig(net_config=NetConfig(filters=4, n_fc_layers=1, n_residuals=1))
    _, variables = init_net(cfg.net_config, jax.random.key(0))
    opt = make_optimizer(cfg)
    state = TrainState(
        variables["params"], variables["batch_stats"], opt.init(variables["params"])
    )
    rng = np.random.default_rng(0)
    planes = jnp.asarray(rng.random((16, 6, 7, 3), dtype=np.float32))
    values = jnp.asarray(rng.choice([0.0, 0.5, 1.0], 16).astype(np.float32))
    priors = jnp.asarray(np.full((16, 7), 1 / 7, dtype=np.float32))

    step_u = jax.jit(make_train_step(_net_for(cfg), opt))
    step_w = jax.jit(make_train_step(_net_for(cfg), opt, weighted=True))
    s1, m1 = step_u(state, planes, values, priors)
    s2, m2 = step_w(state, planes, values, priors, jnp.ones(16, jnp.float32))
    for a, b in zip(jax.tree_util.tree_leaves(s1), jax.tree_util.tree_leaves(s2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert float(m1["loss"]) == float(m2["loss"])

    # and a non-uniform weighting changes the value loss but not its scale
    w = jnp.where(values == 0.5, 4.0, 1.0)
    _, m3 = step_w(state, planes, values, priors, w)
    assert float(m3["prior_loss"]) == float(m2["prior_loss"])
    assert float(m3["value_loss"]) != float(m2["value_loss"])


def _net_for(cfg):
    net, _ = init_net(cfg.net_config, jax.random.key(0))
    return net


def test_uint8_nchw_train_step_matches_f32_nhwc():
    """The storage-layout fast path (uint8 NCHW batches, conversion fused
    into the step) must match the classic f32 NHWC path bitwise."""
    from connect4_tpu.training.learner import make_train_step

    cfg = ModelConfig(net_config=NetConfig(filters=4, n_fc_layers=1, n_residuals=1))
    net, variables = init_net(cfg.net_config, jax.random.key(0))
    opt = make_optimizer(cfg)
    state = TrainState(
        variables["params"], variables["batch_stats"], opt.init(variables["params"])
    )
    rng = np.random.default_rng(1)
    planes_u8 = jnp.asarray(rng.integers(0, 2, (16, 3, 6, 7)).astype(np.uint8))
    planes_f32 = jnp.transpose(planes_u8, (0, 2, 3, 1)).astype(jnp.float32)
    values = jnp.asarray(rng.choice([0.0, 0.5, 1.0], 16).astype(np.float32))
    priors = jnp.asarray(np.full((16, 7), 1 / 7, dtype=np.float32))

    step = jax.jit(make_train_step(net, opt))
    s1, m1 = step(state, planes_f32, values, priors)
    s2, m2 = step(state, planes_u8, values, priors)
    for a, b in zip(jax.tree_util.tree_leaves(s1), jax.tree_util.tree_leaves(s2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert float(m1["loss"]) == float(m2["loss"])
