"""Round-5 continuation of the product run with the draw-bucket fix.

Identical to ``config_r3_k8.py`` (the published reference workload) except
``value_target_mix=0.5``: from generation 147 on, the value head trains on
(z+q)/2 — the final game result mixed with the search value of the played
move — instead of pure z. Chosen by the offline sweep in
``scripts/draw_bucket_experiment.py`` (see ENGINEERING_LOG round 5): it
lifts drawn-8-ply-position accuracy 26% → 46-47%, past the reference
example net's 44.7%, while *improving* full-set 8-ply MSE 0.100 → 0.086.
Continuing in the same ``save_dir`` makes the regime change visible on
the shipped learning curves at the gen-147 mark.
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
        value_target_mix=0.5,
    ),
    storage_config=StorageConfig(
        save_dir="/root/connect4_tpu_runs/r3_k8",
        data_dir="/root/c4_frozen_bench",
    ),
    simulations=800,
    n_training_games=1200,
    selfplay_batch=256,
    n_eval=5,
    parallel_sims=8,
    sims_per_call=200,
    seed=0,
)
