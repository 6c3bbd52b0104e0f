"""Example training configuration.

The counterpart of the reference's example config
(``/root/reference/oinkoink/data/example_config.py``): the published run's
net (filters=64, fc=6, res=6) with default AlphaZero search settings.
Pass to the CLI: ``python -m connect4_tpu.cli training -c examples/config.py``.
"""

from connect4_tpu.config import (
    AlphaZeroConfig,
    ModelConfig,
    NetConfig,
    StorageConfig,
)

config = AlphaZeroConfig(
    model_config=ModelConfig(
        net_config=NetConfig(
            filters=64,
            n_fc_layers=6,
            n_residuals=6,
            compute_dtype="bfloat16",
        ),
    ),
    storage_config=StorageConfig(),  # save_dir defaults to ~/connect4_tpu_runs
    simulations=800,
    n_training_games=1200,
    # slot pool smaller than the game budget selects compact-and-refill
    # self-play (every search row stays busy). 512 slots at K=8 evaluate
    # leaves at batch 4096 — the fastest measured configuration since the
    # round-5 slab right-sizing (256 was optimal before it).
    selfplay_batch=512,
    n_eval=500,
    parallel_sims=8,
    sims_per_call=200,
)
