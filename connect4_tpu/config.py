"""Configuration for the framework.

Dataclass equivalents of the reference's config system
(``/root/reference/oinkoink/neural/config.py:7-81``), extended with the
TPU-specific knobs (self-play batch width, tree capacity, mesh shape) that
replace the reference's process/thread counts. Like the reference, a user
config is a Python file defining ``config`` (see ``connect4_tpu.cli``).
"""

from __future__ import annotations

import dataclasses
import os
from typing import Optional, Sequence, Tuple


@dataclasses.dataclass
class NetConfig:
    """Architecture of the value+policy net
    (reference defaults: ``/root/reference/oinkoink/neural/config.py:7-16``)."""

    channels: int = 3
    filters: int = 32
    n_fc_layers: int = 4
    n_residuals: int = 3
    # TPU-specific: compute dtype for the conv tower. float32 matches the
    # reference; bfloat16 feeds the MXU at double rate and is the fast path.
    compute_dtype: str = "float32"


@dataclasses.dataclass
class ModelConfig:
    """Optimiser + training schedule
    (``/root/reference/oinkoink/neural/config.py:19-39``). ``milestones``
    are in *generations*, matching the reference's per-generation LR step."""

    net_config: NetConfig = dataclasses.field(default_factory=NetConfig)
    weight_decay: float = 1e-4
    momentum: float = 0.9
    initial_lr: float = 0.01
    milestones: Tuple[int, ...] = (100, 300, 600)
    gamma: float = 0.1
    batch_size: int = 4096
    n_training_epochs: int = 5
    # Draw-bucket extensions (defaults preserve exact reference semantics).
    # draw_loss_weight > 1 upweights the value loss of positions from DRAWN
    # games (the 0.5-target class is ~17% of self-play rows; the shipped
    # nets spread predictions on drawn 8-ply positions almost uniformly
    # over [0,1] — see scripts/draw_bucket_diagnosis.py).
    draw_loss_weight: float = 1.0
    # value_target_mix = λ trains the value head on (1-λ)·z + λ·q, where z
    # is the final game result and q the search value of the move actually
    # played (both absolute). λ>0 lowers target variance on long games —
    # the standard (z+q)/2 trick — and is recoverable for past generations
    # from games.npz (see replay.load_window_ex).
    value_target_mix: float = 0.0

    def lr_at_generation(self, gen: int) -> float:
        """MultiStep schedule: decay by ``gamma`` at each milestone, stepped
        once per generation (``/root/reference/oinkoink/neural/pytorch/model.py:154-156,239``)."""
        passed = sum(1 for m in self.milestones if gen >= m)
        return self.initial_lr * (self.gamma**passed)


@dataclasses.dataclass
class MCTSConfig:
    """Search hyperparameters (``/root/reference/oinkoink/mcts.py:13-26``)."""

    simulations: int = 800
    pb_c_base: float = 19652.0
    pb_c_init: float = 1.25
    root_dirichlet_alpha: float = 0.0
    root_exploration_fraction: float = 0.0
    num_sampling_moves: int = 0
    # TPU-specific: tree capacity per game. None => exact worst case
    # (1 + 7 * simulations) so semantics never degrade; smaller values trade
    # memory for a clamped allocator (overflowing sims reuse the last block).
    max_nodes: Optional[int] = None
    # TPU-specific: number of simulations walked concurrently per game with
    # a virtual-visit overlay (AlphaZero-style leaf parallelism; the
    # reference prototyped the same idea in archive/mcts_parallel.py).
    # 1 = exact reference semantics; >1 trades exact visit statistics for
    # a ~K-fold cut in sequential loop iterations per search. simulations
    # must be divisible by parallel_sims.
    parallel_sims: int = 1

    def tree_capacity(self) -> int:
        if self.max_nodes is not None:
            return self.max_nodes
        # One 7-slot child block can be allocated per *search iteration*.
        # Sequential search (K=1) runs one iteration per simulation; the
        # walker-deduplicated parallel search runs simulations/K iterations
        # and expands at most one shared leaf per iteration (all K lockstep
        # walkers descend to the same node — see mcts/batched.py
        # _simulate_parallel), so its exact worst case is K-fold smaller.
        # Right-sizing the slabs matters for speed, not just memory: every
        # descent gather and backup scatter walks these arrays.
        iterations = -(-self.simulations // max(self.parallel_sims, 1))
        return 1 + 7 * iterations


@dataclasses.dataclass
class StorageConfig:
    """Filesystem layout (``/root/reference/oinkoink/neural/config.py:42-47``).
    ``save_dir/<gen>/`` holds per-generation artifacts, mirroring the
    reference's resume convention."""

    save_dir: str = dataclasses.field(
        default_factory=lambda: os.path.expanduser("~/connect4_tpu_runs")
    )
    data_dir: str = dataclasses.field(
        default_factory=lambda: os.path.join(
            os.path.dirname(os.path.abspath(__file__)), "data", "files"
        )
    )


@dataclasses.dataclass
class AlphaZeroConfig:
    """Top-level training configuration
    (``/root/reference/oinkoink/neural/config.py:50-81``).

    The reference's ``game_processes``/``game_threads`` (OS-level
    parallelism) are replaced by ``selfplay_batch``: the number of games
    stepped in lockstep on-device. The reference's defaults are kept for
    everything with a direct counterpart.
    """

    model_config: ModelConfig = dataclasses.field(default_factory=ModelConfig)
    storage_config: StorageConfig = dataclasses.field(default_factory=StorageConfig)
    simulations: int = 800
    pb_c_base: float = 19652.0
    pb_c_init: float = 1.25
    root_dirichlet_alpha: float = 0.3
    root_exploration_fraction: float = 0.25
    num_sampling_moves: int = 6
    n_eval: int = 1  # run a gating match every n_eval generations
    # Start-position depth for the in-loop gating match. The reference
    # plays 14 games (all 7 one-ply starts, both colours,
    # ``neural/training.py:176-199``) — too few for signal; batched
    # matches here are nearly free, so the default plays all 49 two-ply
    # starts both colours (98 games, the protocol of the reference's
    # offline ``scripts/matches.py``). Set to 1 for reference-compat.
    gating_plies: int = 2
    n_training_games: int = 1200
    selfplay_batch: int = 1200  # games in flight on-device per wave
    max_nodes: Optional[int] = None
    parallel_sims: int = 1  # see MCTSConfig.parallel_sims
    # Split each search into device calls of this many simulations (None =
    # whole search in one call). Needed on transports that drop long device
    # calls; must divide `simulations`.
    sims_per_call: Optional[int] = None
    seed: int = 0
    # Device mesh axis sizes for scale-out; None => use all local devices
    # in a 1-D data mesh.
    mesh_shape: Optional[Tuple[int, ...]] = None

    def search_config(self, training: bool) -> MCTSConfig:
        """Exploration on for self-play, off for evaluation matches
        (``/root/reference/oinkoink/neural/training.py:209-223``)."""
        if training:
            return MCTSConfig(
                simulations=self.simulations,
                pb_c_base=self.pb_c_base,
                pb_c_init=self.pb_c_init,
                root_dirichlet_alpha=self.root_dirichlet_alpha,
                root_exploration_fraction=self.root_exploration_fraction,
                num_sampling_moves=self.num_sampling_moves,
                max_nodes=self.max_nodes,
                parallel_sims=self.parallel_sims,
            )
        return MCTSConfig(
            simulations=self.simulations,
            pb_c_base=self.pb_c_base,
            pb_c_init=self.pb_c_init,
            root_dirichlet_alpha=0.0,
            root_exploration_fraction=0.0,
            num_sampling_moves=0,
            max_nodes=self.max_nodes,
            parallel_sims=self.parallel_sims,
        )


def load_config_file(path: str) -> AlphaZeroConfig:
    """Execute a user config file that defines ``config``; the same
    Python-file-as-config mechanism as ``/root/reference/oinkoink/main.py:80-83``."""
    import importlib.util

    spec = importlib.util.spec_from_file_location("user_config", path)
    module = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(module)
    config = module.config
    if not isinstance(config, AlphaZeroConfig):
        raise TypeError(f"{path} must define `config: AlphaZeroConfig`")
    return config
