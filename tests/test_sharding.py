"""Multi-device tests on the 8-virtual-CPU-device mesh (conftest.py):
sharded self-play and DP training must produce the same results as the
single-device programs, and gradients must be correctly all-reduced."""

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from connect4_tpu.config import MCTSConfig, ModelConfig, NetConfig
from connect4_tpu.eval.evaluators import centre_evaluator_batched
from connect4_tpu.models import init_net
from connect4_tpu.parallel.mesh import make_mesh, replicate
from connect4_tpu.parallel.sharded import (
    make_sharded_play_fn,
    make_sharded_train_step,
)
from connect4_tpu.training.learner import (
    TrainState,
    make_optimizer,
    make_train_step,
    set_learning_rate,
)
from connect4_tpu.training.self_play import make_play_fn


def test_eight_virtual_devices_available():
    assert jax.device_count() >= 8, "conftest must provide 8 CPU devices"


def test_sharded_selfplay_matches_single_device():
    config = MCTSConfig(simulations=6)
    batch = 16
    mesh = make_mesh((8,))

    single = make_play_fn(centre_evaluator_batched, config, batch)
    sharded = make_sharded_play_fn(centre_evaluator_batched, config, batch, mesh)

    key = jax.random.key(3)
    out_single = jax.tree_util.tree_map(np.asarray, single(key))
    out_sharded = jax.tree_util.tree_map(np.asarray, sharded(key))

    np.testing.assert_array_equal(out_single.moves, out_sharded.moves)
    np.testing.assert_array_equal(out_single.result, out_sharded.result)
    np.testing.assert_allclose(
        out_single.policies, out_sharded.policies, atol=1e-6
    )


def test_sharded_selfplay_output_is_sharded():
    mesh = make_mesh((8,))
    sharded = make_sharded_play_fn(
        centre_evaluator_batched, MCTSConfig(simulations=4), 8, mesh
    )
    out = sharded(jax.random.key(0))
    sharding = out.moves.sharding
    assert isinstance(sharding, NamedSharding)
    assert sharding.spec[0] == "data"


def test_dp_train_step_matches_single_device():
    """One DP step over 8 devices == one step on one device (same batch)."""
    model_cfg = ModelConfig(
        net_config=NetConfig(filters=4, n_fc_layers=1, n_residuals=1)
    )
    net, variables = init_net(model_cfg.net_config, jax.random.key(0))
    optimizer = make_optimizer(model_cfg)

    def fresh_state():
        return TrainState(
            params=variables["params"],
            batch_stats=variables["batch_stats"],
            opt_state=set_learning_rate(
                optimizer.init(variables["params"]), 0.01
            ),
        )

    x = jax.random.bernoulli(jax.random.key(1), 0.3, (64, 6, 7, 3)).astype(
        jnp.float32
    )
    v = jax.random.bernoulli(jax.random.key(2), 0.5, (64,)).astype(jnp.float32)
    p = jax.nn.softmax(jax.random.normal(jax.random.key(3), (64, 7)), axis=-1)

    single_step = jax.jit(make_train_step(net, optimizer))
    s1, m1 = single_step(fresh_state(), x, v, p)

    mesh = make_mesh((8,))
    sharded_step = make_sharded_train_step(net, optimizer, mesh)
    state_rep = replicate(fresh_state(), mesh)
    s2, m2 = sharded_step(state_rep, x, v, p)

    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]), rtol=1e-5)
    for a, b in zip(
        jax.tree_util.tree_leaves(s1.params), jax.tree_util.tree_leaves(s2.params)
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6
        )


def test_sharded_refill_pool_matches_blocked_single_device():
    """The production self-play path (compact-and-refill, chunked device
    calls) sharded over 8 devices must be BITWISE identical to the same
    blocked pool run on one device: sharding is layout, not semantics."""
    from connect4_tpu.training.self_play import make_refill_play_fn

    config = MCTSConfig(simulations=8, num_sampling_moves=4,
                        root_dirichlet_alpha=0.3,
                        root_exploration_fraction=0.25)
    mesh = make_mesh((8,))
    kwargs = dict(slots=16, total_games=24, sims_per_call=4)
    sharded = make_refill_play_fn(
        centre_evaluator_batched, config, mesh=mesh, **kwargs
    )
    blocked = make_refill_play_fn(
        centre_evaluator_batched, config, n_blocks=8, **kwargs
    )

    key = jax.random.key(11)
    out_s = jax.tree_util.tree_map(np.asarray, sharded(key))
    out_b = jax.tree_util.tree_map(np.asarray, blocked(key))
    assert (out_s.result != 0).all(), "all 24 games must finish"
    for name, x, y in zip(out_s._fields, out_s, out_b):
        np.testing.assert_array_equal(x, y, err_msg=name)


def test_refill_blocked_budget_assignment():
    """Blocked pools must play exactly their own contiguous game-id range
    (the property that keeps sharded refill bookkeeping shard-local)."""
    from connect4_tpu.training.self_play import make_refill_play_fn

    config = MCTSConfig(simulations=4)
    play = make_refill_play_fn(
        centre_evaluator_batched, config, slots=4, total_games=12, n_blocks=2
    )
    out = jax.tree_util.tree_map(np.asarray, play(jax.random.key(2)))
    assert (out.result != 0).all(), "all 12 games must finish"
    assert (out.length >= 7).all()


def test_sharded_training_loop_generation(tmp_path):
    """TrainingLoop itself on the 8-device mesh: one tiny generation with
    sharded refill self-play and a DP train pass (incl. uneven tail)."""
    from connect4_tpu.config import (
        AlphaZeroConfig,
        ModelConfig as MC,
        NetConfig as NC,
        StorageConfig,
    )
    from connect4_tpu.training.loop import TrainingLoop

    config = AlphaZeroConfig(
        model_config=MC(
            net_config=NC(filters=4, n_fc_layers=1, n_residuals=1),
            batch_size=64, n_training_epochs=1,
        ),
        storage_config=StorageConfig(
            save_dir=str(tmp_path), data_dir=str(tmp_path / "nodata")
        ),
        simulations=4,
        sims_per_call=2,
        n_training_games=16,
        selfplay_batch=8,
        num_sampling_moves=2,
        n_eval=1,
        mesh_shape=(8,),
    )
    loop = TrainingLoop(config)
    assert loop.mesh is not None
    loop.run(generations=1)
    assert loop.gen == 2
    assert len(loop.match_results) == 1

    # Resume regression: Orbax-restored arrays come back committed to one
    # device; a resumed mesh run must replicate them before mixing them
    # with sharded self-play/training operands (jit rejects the mix).
    resumed = TrainingLoop(config)
    assert resumed.gen == 2
    resumed.run(generations=1)
    assert resumed.gen == 3


def test_sharded_match_restores_old_checkpoint(tmp_path):
    """The gen>10 gating-match branch under a mesh: the opponent checkpoint
    is Orbax-restored (committed to one device) *outside* __init__'s
    replication, then searched against the mesh-replicated current net
    (loop.py _match). Regression for the path the round-2 dryrun never
    exercised (its tiny config stayed on the centre-heuristic branch)."""
    from connect4_tpu.config import (
        AlphaZeroConfig,
        ModelConfig as MC,
        NetConfig as NC,
        StorageConfig,
    )
    from connect4_tpu.training import checkpoint as ckpt
    from connect4_tpu.training.loop import TrainingLoop

    config = AlphaZeroConfig(
        model_config=MC(
            net_config=NC(filters=4, n_fc_layers=1, n_residuals=1),
            batch_size=64, n_training_epochs=1,
        ),
        storage_config=StorageConfig(
            save_dir=str(tmp_path), data_dir=str(tmp_path / "nodata")
        ),
        simulations=4,
        sims_per_call=2,
        n_training_games=16,
        selfplay_batch=8,
        num_sampling_moves=2,
        n_eval=1,
        mesh_shape=(8,),
        gating_plies=1,  # reference-compat 14-game protocol keeps this cheap
    )
    loop = TrainingLoop(config)
    # fabricate the checkpoint _match will restore for gen 12 (12 - 10 = 2)
    ckpt.save_checkpoint(str(tmp_path), 2, loop.state, loop.key)
    loop.gen = 12
    loop._match()
    assert len(loop.match_results) == 1
    row = loop.match_results.iloc[-1]
    # 7 one-ply starts x both colours
    assert row["wins"] + row["draws"] + row["losses"] == 14


def test_default_gate_plays_98_games():
    """The default in-loop gate covers all 49 two-ply starts both colours
    (config.gating_plies=2); gating_plies=1 restores the reference's
    14-game protocol (``neural/training.py:176-199``)."""
    from connect4_tpu.config import AlphaZeroConfig
    from connect4_tpu.env.host_board import enumerate_start_positions

    config = AlphaZeroConfig()
    assert config.gating_plies == 2
    assert len(enumerate_start_positions(config.gating_plies)) * 2 == 98
    assert len(enumerate_start_positions(1)) * 2 == 14


def test_uneven_batch_rejected():
    mesh = make_mesh((8,))
    try:
        make_sharded_play_fn(
            centre_evaluator_batched, MCTSConfig(simulations=2), 12, mesh
        )
        raised = False
    except ValueError:
        raised = True
    assert raised
