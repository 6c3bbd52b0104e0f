"""Multi-host readiness: the production sharded programs run on a REAL
2-process jax.distributed cluster (4 CPU devices per process, 8 global,
gloo collectives) and produce results identical to the single-process
8-device run.

This is the multi-controller SPMD launch a v4-16 would use: every host
runs the same Python program over the global mesh; the host-driven wave
loop stays in lockstep because its only data dependence (`live`) is a
replicated scalar. PRNG design note: keys are identical on every process
(global program, global key) and `jax_threefry_partitionable` gives each
batch row its own stream by *logical index*, so per-host key folding is
unnecessary — and would break the bitwise equivalence asserted here.
"""

import json
import os
import subprocess
import sys

import jax
import pytest

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

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _expected_summary() -> dict:
    """The same programs on this process's own 8-device mesh."""
    mesh = make_mesh()
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
    return summary


def test_two_process_cluster_matches_single_process():
    expected = _expected_summary()

    env = dict(os.environ)
    env["PYTHONPATH"] = REPO
    env.pop("JAX_PLATFORMS", None)
    port = "19877"
    procs = [
        subprocess.Popen(
            [sys.executable, os.path.join(REPO, "tests", "multihost_worker.py"),
             str(i), "2", port],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            env=env, text=True, cwd=REPO,
        )
        for i in range(2)
    ]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=600)
        outs.append(out)
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {i} failed:\n{out[-4000:]}"

    for i, out in enumerate(outs):
        lines = [l for l in out.splitlines() if l.startswith("SUMMARY ")]
        assert lines, f"worker {i} printed no summary:\n{out[-4000:]}"
        got = json.loads(lines[-1][len("SUMMARY "):])
        assert got == expected, f"worker {i}: {got} != {expected}"
