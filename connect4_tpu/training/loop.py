"""Training orchestrator.

The L5 equivalent of the reference ``TrainingLoop``
(``/root/reference/oinkoink/neural/training.py:23-223``): per generation,
generate self-play games, train on the replay window, evaluate on the
8/7-ply benchmark sets, and run a gating match every ``n_eval``
generations (vs the centre heuristic for gen <= 10, else vs the net from
10 generations earlier). Host Python only orchestrates; every hot path is
a jitted device program.

Differences by design (TPU-first):
- Self-play is waves of ``selfplay_batch`` lockstep games, not a process
  pool; the inference server does not exist.
- Checkpoints are Orbax (params + BN stats + optimiser + PRNG key).
- Metrics go to pandas pickles with the reference's filenames
  (``8ply.pkl``, ``7ply.pkl``, ``match_results.pkl``) for tooling parity.
"""

from __future__ import annotations

import os
import time
from typing import List, Optional

import numpy as np
import pandas as pd

import jax
import jax.numpy as jnp

from connect4_tpu.config import AlphaZeroConfig, MCTSConfig
from connect4_tpu.env.core import result_value
from connect4_tpu.eval.evaluators import (
    centre_evaluator_batched,
    make_net_evaluator,
)
from connect4_tpu.eval.match import MatchPlayer, play_match
from connect4_tpu.models import init_net
from connect4_tpu.training import checkpoint as ckpt
from connect4_tpu.training import replay
from connect4_tpu.training.learner import (
    TrainState,
    make_batch_gather,
    make_eval_fn,
    make_optimizer,
    make_train_step,
    set_learning_rate,
)
from connect4_tpu.training.self_play import (
    make_refill_play_fn,
    make_stepwise_play_fn,
)
from connect4_tpu.training.stats import CombinedStats, ValueStats
from connect4_tpu.types import DRAW, O_WIN, X_WIN


class TrainingLoop:
    def __init__(self, config: AlphaZeroConfig):
        self.config = config
        self.save_dir = config.storage_config.save_dir
        self.data_dir = config.storage_config.data_dir
        os.makedirs(self.save_dir, exist_ok=True)

        # Device mesh (``config.mesh_shape``): self-play shards games and
        # training shards batch rows over the 1-D data axis — the TPU
        # equivalent of the reference's process pool + single-GPU learner
        # (``training.py:112-133``, SURVEY §2.5). None = single device.
        self.mesh = None
        self.sharded_train_step = None
        if config.mesh_shape is not None:
            from connect4_tpu.parallel.mesh import make_mesh

            self.mesh = make_mesh(config.mesh_shape)

        self.net, variables = init_net(
            config.model_config.net_config, jax.random.key(config.seed)
        )
        self.optimizer = make_optimizer(config.model_config)
        self.state = TrainState(
            params=variables["params"],
            batch_stats=variables["batch_stats"],
            opt_state=self.optimizer.init(variables["params"]),
        )
        self.key = jax.random.key(config.seed + 1)

        restored = ckpt.restore_latest(self.save_dir, self.state, self.key)
        if restored is not None:
            latest, self.state, self.key = restored
            print(f"Resuming from generation {latest}")
            self.gen = latest + 1
        else:
            self.gen = 1

        if self.mesh is not None:
            # Restored (and freshly-initialised) arrays are committed to a
            # single device; mesh programs mix them with sharded operands,
            # which jit rejects. Replicate them over the mesh up front.
            from connect4_tpu.parallel.mesh import replicated

            rep = replicated(self.mesh)
            self.state = jax.device_put(self.state, rep)
            self.key = jax.device_put(self.key, rep)

        weighted = config.model_config.draw_loss_weight != 1.0
        self.train_step = jax.jit(
            make_train_step(self.net, self.optimizer, weighted=weighted)
        )
        if self.mesh is not None:
            from connect4_tpu.parallel.sharded import make_sharded_train_step

            self.sharded_train_step = make_sharded_train_step(
                self.net, self.optimizer, self.mesh, weighted=weighted
            )
        self.forward = jax.jit(make_eval_fn(self.net))

        self.stats_8ply = self._load_pickle("8ply.pkl")
        self.stats_7ply = self._load_pickle("7ply.pkl")
        self.match_results = self._load_pickle("match_results.pkl")

    # -- public ------------------------------------------------------------

    def run(
        self, generations: Optional[int] = None, until: Optional[int] = None
    ) -> None:
        """Run ``generations`` iterations (forever when None, like the
        reference's ``while True`` loop, ``training.py:78-85``), or up to
        the *absolute* generation ``until`` — the restart-safe form: a
        supervised run relaunched mid-way still stops at the same target.
        Touching ``<save_dir>/STOP`` stops the loop cleanly at the next
        generation boundary (checkpoints are per-generation, so a stopped
        run resumes exactly where it left off)."""
        end = None if generations is None else self.gen + generations
        if until is not None:
            end = until + 1 if end is None else min(end, until + 1)
        stop_file = os.path.join(self.save_dir, "STOP")
        while end is None or self.gen < end:
            if os.path.exists(stop_file):
                print(f"STOP file present; stopping before generation {self.gen}")
                break
            print("Loop: ", self.gen)
            self._loop()
            self._evaluate()
            if self.config.n_eval > 0 and self.gen % self.config.n_eval == 0:
                self._match()
            self._render_plots()
            self.gen += 1

    def _render_plots(self) -> None:
        """Refresh the learning-curve PNGs in ``save_dir`` every generation
        (live-dashboard parity with the reference's visdom panels,
        ``training.py:67-72``); plotting errors never kill training."""
        try:
            from connect4_tpu.training.plots import render

            render(self.save_dir, verbose=False)
        except Exception as exc:  # pragma: no cover - defensive
            print(f"plot rendering failed: {exc}")

    # -- internals ---------------------------------------------------------

    def _load_pickle(self, name: str) -> pd.DataFrame:
        path = os.path.join(self.save_dir, name)
        if os.path.exists(path):
            return pd.read_pickle(path)
        return pd.DataFrame()

    def _loop(self) -> None:
        from connect4_tpu.utils import PhaseTimer

        timer = PhaseTimer()
        print("Time now: {}".format(time.asctime(time.localtime())))
        with timer.phase("generate"):
            moves = self._generate_games()
        with timer.phase("train"):
            self._train()
        print(
            timer.summary(
                {
                    "generate": ("moves", moves),
                }
            )
            + "  ({:,.0f} sims/s)".format(
                moves * self.config.simulations / max(timer.seconds["generate"], 1e-9)
            )
        )

    def _evaluator(self):
        return make_net_evaluator(self.net, self.state.params, self.state.batch_stats)

    def _generate_games(self) -> int:
        cfg = self.config.search_config(training=True)
        batch = min(self.config.selfplay_batch, self.config.n_training_games)
        if batch < self.config.n_training_games:
            # compact-and-refill: keep every slot busy until the game
            # budget is exhausted (one pass, no padded lockstep waves)
            play = make_refill_play_fn(
                self._evaluator(), cfg, batch,
                self.config.n_training_games, self.config.sims_per_call,
                mesh=self.mesh,
            )
            self.key, sub = jax.random.split(self.key)
            outputs = [jax.tree_util.tree_map(np.asarray, play(sub))]
        else:
            play = make_stepwise_play_fn(
                self._evaluator(), cfg, batch, self.config.sims_per_call,
                mesh=self.mesh,
            )
            self.key, sub = jax.random.split(self.key)
            outputs = [jax.tree_util.tree_map(np.asarray, play(sub))]

        n_positions = replay.append_generation(self.save_dir, self.gen, outputs)

        results = np.concatenate([o.result for o in outputs])
        print(
            "Player one: wins, draws, losses:  {}, {}, {}".format(
                int((results == O_WIN).sum()),
                int((results == DRAW).sum()),
                int((results == X_WIN).sum()),
            )
        )
        print("{} positions created for training".format(n_positions))
        return int(sum(o.mask.sum() for o in outputs))

    def _train(self) -> None:
        mc = self.config.model_config
        use_ext = mc.draw_loss_weight != 1.0 or mc.value_target_mix > 0.0
        if use_ext:
            planes, values, policies, weights = replay.load_window_ex(
                self.save_dir, self.gen, mc.value_target_mix, mc.draw_loss_weight
            )
        else:
            planes, values, policies = replay.load_window(self.save_dir, self.gen)
            weights = None

        lr = mc.lr_at_generation(self.gen)
        self.state = self.state._replace(
            opt_state=set_learning_rate(self.state.opt_state, lr)
        )

        n = len(values)
        batch_size = min(mc.batch_size, n)
        # Epoch arrays stay device-resident in the stored uint8 NCHW form
        # (~126 B/row vs 504 B as f32 NHWC — a quarter of the HBM
        # residency and host->device upload); the jitted step fuses the
        # f32/NHWC conversion per batch, so the training math is unchanged.
        planes_d = jnp.asarray(planes)
        values_d = jnp.asarray(values)
        policies_d = jnp.asarray(policies)
        weights_d = jnp.asarray(weights) if weights is not None else None

        n_dev = 1
        if self.mesh is not None:
            n_dev = int(np.prod(list(self.mesh.shape.values())))

        # fused per-batch gather: one device call per batch instead of
        # 4-5 (slice + takes); host dispatch round-trips, not device
        # compute, dominate this phase on remote TPU transports
        arrays = (planes_d, values_d, policies_d)
        if weights_d is not None:
            arrays = arrays + (weights_d,)
        n_full = (n // batch_size) * batch_size
        gather = make_batch_gather(batch_size)
        gather_tail = make_batch_gather(n - n_full) if n > n_full else None

        def run_batch(batch, size):
            # DP-shard full batches over the mesh; the (rare) tail
            # batch that does not divide runs replicated so the math
            # stays exactly the reference's drop_last=False pass
            if n_dev > 1 and size % n_dev == 0:
                self.state, _ = self.sharded_train_step(self.state, *batch)
            else:
                self.state, _ = self.train_step(self.state, *batch)

        for _ in range(mc.n_training_epochs):
            self.key, perm_key = jax.random.split(self.key)
            order = jax.random.permutation(perm_key, n)
            # every sample trains, including the final partial batch
            # (torch DataLoader drop_last=False, reference model.py:200-240)
            for i in range(0, n_full, batch_size):
                run_batch(gather(arrays, order, np.int32(i)), batch_size)
            if gather_tail is not None:
                run_batch(
                    gather_tail(arrays, order, np.int32(n_full)), n - n_full
                )
        ckpt.save_checkpoint(self.save_dir, self.gen, self.state, self.key)

    def _benchmark_path(self, name: str) -> Optional[str]:
        path = os.path.join(self.data_dir, name)
        return path if os.path.exists(path) else None

    def _evaluate(self) -> None:
        """8-ply value and 7-ply value+policy benchmarks
        (``training.py:155-174``); skipped gracefully when the benchmark
        files have not been generated yet."""
        from connect4_tpu.training.learner import bce_loss

        from connect4_tpu.utils import np_load_retry

        path8 = self._benchmark_path("connect4dataset_8ply.npz")
        if path8:
            with np_load_retry(path8) as d:
                planes8, values8 = d["planes"], d["values"]
                if "solved" in d:  # partially-built benchmark: use solved rows
                    n_solved, n_total = int(d["solved"].sum()), len(values8)
                    if n_solved < n_total:
                        print(
                            f"WARNING: 8-ply benchmark is partially built "
                            f"({n_solved}/{n_total} positions solved); RMSE "
                            f"is measured on that subset only and is NOT "
                            f"comparable to full-set numbers",
                            flush=True,
                        )
                    planes8 = planes8[d["solved"]]
                    values8 = values8[d["solved"]]
                stats = ValueStats()
                for planes, vals in _batches(planes8, values8, 4096):
                    value, _ = self.forward(
                        self.state.params,
                        self.state.batch_stats,
                        jnp.asarray(np.moveaxis(planes, 1, -1), dtype=jnp.float32),
                    )
                    value = np.asarray(value)
                    stats.update(value, vals, float(np.mean((value - vals) ** 2)))
            print("8 Ply Test Stats:  ", stats)
            self.stats_8ply = pd.concat(
                [self.stats_8ply, pd.DataFrame([stats.to_dict()])],
                ignore_index=True,
            )
            self.stats_8ply.to_pickle(os.path.join(self.save_dir, "8ply.pkl"))

        path7 = self._benchmark_path("connect4dataset_7ply.npz")
        if path7:
            with np_load_retry(path7) as d:
                planes7, values7, policies7 = d["planes"], d["values"], d["policies"]
                if "solved" in d:  # partially-built benchmark: solved rows only
                    n_solved, n_total = int(d["solved"].sum()), len(values7)
                    if n_solved < n_total:
                        print(
                            f"WARNING: 7-ply benchmark is partially built "
                            f"({n_solved}/{n_total} positions solved); stats "
                            f"are measured on that subset only and are NOT "
                            f"comparable to full-set numbers",
                            flush=True,
                        )
                    planes7 = planes7[d["solved"]]
                    values7 = values7[d["solved"]]
                    policies7 = policies7[d["solved"]]
                stats = CombinedStats()
                for planes, vals, priors in _batches(
                    planes7, values7, 4096, policies7
                ):
                    value, prior = self.forward(
                        self.state.params,
                        self.state.batch_stats,
                        jnp.asarray(np.moveaxis(planes, 1, -1), dtype=jnp.float32),
                    )
                    value, prior = np.asarray(value), np.asarray(prior)
                    stats.update(
                        value, vals, float(np.mean((value - vals) ** 2)),
                        prior, priors, float(bce_loss(jnp.asarray(prior), jnp.asarray(priors))),
                    )
            print("7 Ply Test Stats:  ", stats)
            self.stats_7ply = pd.concat(
                [self.stats_7ply, pd.DataFrame([stats.to_dict()])],
                ignore_index=True,
            )
            self.stats_7ply.to_pickle(os.path.join(self.save_dir, "7ply.pkl"))

    def _match(self) -> None:
        """Gating match (``training.py:176-207``): vs the centre heuristic
        until gen 10, then vs the checkpoint from 10 generations ago.
        Unlike the reference's 14-game protocol, the default plays all 49
        two-ply starts both colours (98 games, ``config.gating_plies``) —
        batched matches cost seconds here and 14 games is parity noise."""
        az = MatchPlayer(
            "AlphaZero",
            self._evaluator(),
            self.config.search_config(training=False),
        )
        opponent_cfg = MCTSConfig(
            simulations=self.config.simulations, max_nodes=self.config.max_nodes
        )
        if self.gen <= 10:
            opponent = MatchPlayer(
                "Evaluate_centre_with_prior", centre_evaluator_batched, opponent_cfg
            )
        else:
            # Opponent is the checkpoint from 10 generations ago when it
            # exists; a run continued from a packaged checkpoint has no
            # such history, so fall back to the nearest available older
            # generation (else the oldest on disk) rather than crash.
            old_gen = self.gen - 10
            available = [
                g for g in ckpt.checkpoint_generations(self.save_dir)
                if g < self.gen
            ]
            older = [g for g in available if g <= old_gen]
            fallback = max(older) if older else min(available)
            if fallback != old_gen:
                print(
                    f"gating: no checkpoint for generation {old_gen}; "
                    f"using generation {fallback} instead",
                    flush=True,
                )
                old_gen = fallback
            _, variables = init_net(
                self.config.model_config.net_config, jax.random.key(0)
            )
            old_state = TrainState(
                variables["params"], variables["batch_stats"],
                self.optimizer.init(variables["params"]),
            )
            old_state, _ = ckpt.restore_checkpoint(
                self.save_dir, old_gen, old_state, jax.random.key(0)
            )
            opponent = MatchPlayer(
                "Older net",
                make_net_evaluator(self.net, old_state.params, old_state.batch_stats),
                opponent_cfg,
            )

        results = play_match(
            az, opponent,
            plies=self.config.gating_plies, switch=True, seed=self.gen,
        )
        self.match_results = pd.concat(
            [self.match_results, pd.DataFrame([results])], ignore_index=True
        )
        self.match_results.to_pickle(
            os.path.join(self.save_dir, "match_results.pkl")
        )


def _batches(planes, values, batch_size, policies=None):
    n = len(values)
    for i in range(0, n, batch_size):
        sl = slice(i, min(i + batch_size, n))
        if policies is None:
            yield planes[sl], values[sl]
        else:
            yield planes[sl], values[sl], policies[sl]
