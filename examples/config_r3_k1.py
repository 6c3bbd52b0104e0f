"""Round-3 A/B: the K=1 (exact reference search semantics) arm.

Identical to ``examples/config_r3_k8.py`` in every respect except
``parallel_sims=1`` — the configuration proven bit-identical to the
reference search (``tests/test_reference_crossval.py``;
``/root/reference/oinkoink/mcts.py:94-121``). Training N generations under
each arm with the same seed and comparing the 8-ply learning curves plus a
head-to-head match is the evidence for (or against) shipping K=8 as the
default.
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
    storage_config=StorageConfig(
        save_dir="/root/connect4_tpu_runs/r3_k1",
        data_dir="/root/c4_frozen_bench",
    ),
    simulations=800,
    n_training_games=1200,
    selfplay_batch=256,
    n_eval=5,
    parallel_sims=1,
    sims_per_call=200,
    seed=0,
)
