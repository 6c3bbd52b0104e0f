"""Worker process for tests/test_multihost.py.

Joins a 2-process jax.distributed CPU cluster (4 virtual devices per
process, 8 global), runs the production sharded self-play pool and a DP
train step over the GLOBAL mesh, and prints one SUMMARY json line of
replicated, exactly-comparable statistics. Not a test module itself.
"""

import json
import os
import sys


def main() -> None:
    proc_id = int(sys.argv[1])
    n_procs = int(sys.argv[2])
    port = sys.argv[3]

    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    import jax

    jax.config.update("jax_platforms", "cpu")

    from connect4_tpu.parallel.mesh import initialize_distributed

    initialize_distributed(
        coordinator_address=f"localhost:{port}",
        num_processes=n_procs,
        process_id=proc_id,
    )
    assert len(jax.devices()) == 8, jax.devices()
    assert len(jax.local_devices()) == 4

    import jax.numpy as jnp

    from connect4_tpu.config import MCTSConfig, ModelConfig, NetConfig
    from connect4_tpu.eval.evaluators import centre_evaluator_batched
    from connect4_tpu.models import init_net
    from connect4_tpu.parallel.mesh import make_mesh, replicate
    from connect4_tpu.parallel.sharded import make_sharded_train_step
    from connect4_tpu.training.learner import (
        TrainState,
        make_optimizer,
        set_learning_rate,
    )
    from connect4_tpu.training.self_play import make_refill_play_fn
    from tests.multihost_summary import (
        selfplay_summary,
        synthetic_batch,
        train_summary,
    )

    mesh = make_mesh()  # all 8 global devices

    # -- production sharded self-play over the global mesh ------------------
    config = MCTSConfig(
        simulations=8,
        num_sampling_moves=4,
        root_dirichlet_alpha=0.3,
        root_exploration_fraction=0.25,
    )
    play = make_refill_play_fn(
        centre_evaluator_batched, config,
        slots=16, total_games=24, sims_per_call=4, mesh=mesh,
    )
    out = play(jax.random.key(11))
    summary = selfplay_summary(out)

    # -- DP train step on a synthetic (deterministic) batch -----------------
    model_cfg = ModelConfig(
        net_config=NetConfig(filters=8, n_fc_layers=1, n_residuals=1)
    )
    net, variables = init_net(model_cfg.net_config, jax.random.key(0))
    optimizer = make_optimizer(model_cfg)
    state = replicate(
        TrainState(
            params=variables["params"],
            batch_stats=variables["batch_stats"],
            opt_state=set_learning_rate(
                optimizer.init(variables["params"]), 0.01
            ),
        ),
        mesh,
    )
    step = make_sharded_train_step(net, optimizer, mesh)
    new_state, metrics = step(state, *synthetic_batch(mesh))
    summary.update(train_summary(new_state, metrics))

    print("SUMMARY " + json.dumps(summary), flush=True)


if __name__ == "__main__":
    main()
