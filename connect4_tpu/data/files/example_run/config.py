"""Round-3 product training run (and the K=8 arm of the parallel_sims A/B).

The published reference workload (filters=64, fc=6, res=6; 1200 games x
800 sims per generation, ``/root/reference/oinkoink/data/example_config.py``)
with the TPU-native knobs of ``examples/config.py``. Differences from that
example, specific to this *run*:

- ``n_eval=5``: a gating match every 5 generations (reference default is
  every generation; 5 keeps the match cost amortised on a long run while
  still producing a dense strength curve).
- ``data_dir`` points at a frozen snapshot of the partially-built 8-ply
  benchmark (29,116/67,557 positions solved at freeze time). The live copy
  under ``connect4_tpu/data/files`` keeps growing while the exact solver
  runs, which would silently change the evaluation subset between
  generations and make the learning curve internally inconsistent.
- ``parallel_sims=8``: K-walker leaf parallelism. Justified against exact
  reference semantics (K=1) by the A/B arm in ``config_r3_k1.py``.
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
