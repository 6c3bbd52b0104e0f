"""Re-evaluate a run's per-generation checkpoints on the benchmark sets.

The product run's in-loop curves were measured against a frozen snapshot
of the (then partially-built) benchmark datasets, to keep the curve
internally consistent while the exact solver kept solving in the
background. Once the datasets are complete, this tool replays the whole
learning curve against the FULL 8-ply/7-ply sets — the apples-to-apples
comparison with the reference's published plots
(``/root/reference/README.md:82-85``, ``8ply.png`` / ``7ply.png``, which
evaluate on all 67,557 / 54,131 positions).

For every generation checkpoint under the run's ``save_dir``, runs the
same evaluation ``TrainingLoop._evaluate`` performs (identical stats
bucketing, ``neural/stats.py`` semantics) and writes fresh ``8ply.pkl`` /
``7ply.pkl`` + rendered PNGs to ``--out``.

Usage:
    python scripts/reevaluate_run.py -c examples/config_r3_k8.py \
        --data-dir connect4_tpu/data/files --out /root/c4_fullset_eval \
        [--allow-partial] [--stride 1]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    parser = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    parser.add_argument("-c", "--config", required=True,
                        help="the run's Python config file (for save_dir + net arch)")
    parser.add_argument("--data-dir", default=None,
                        help="benchmark npz dir (default: packaged data files)")
    parser.add_argument("--out", required=True,
                        help="output dir for the re-evaluated pickles/PNGs")
    parser.add_argument("--allow-partial", action="store_true",
                        help="evaluate on the solved subset when the sets are "
                             "still incomplete (numbers then carry the usual "
                             "NOT-comparable caveat)")
    parser.add_argument("--stride", type=int, default=1,
                        help="evaluate every Nth generation (default: all)")
    args = parser.parse_args()

    import numpy as np
    import pandas as pd

    import jax
    import jax.numpy as jnp

    from connect4_tpu.config import load_config_file
    from connect4_tpu.models import init_net
    from connect4_tpu.training import checkpoint as ckpt
    from connect4_tpu.training.learner import (
        TrainState, bce_loss, make_eval_fn, make_optimizer,
    )
    from connect4_tpu.training.stats import CombinedStats, ValueStats
    from connect4_tpu.utils import enable_compilation_cache, np_load_retry

    enable_compilation_cache()

    config = load_config_file(args.config)
    save_dir = config.storage_config.save_dir
    data_dir = args.data_dir or config.storage_config.data_dir

    gens = sorted(
        int(d) for d in os.listdir(save_dir)
        if d.isdigit() and os.path.isdir(os.path.join(save_dir, d, "ckpt"))
    )
    if not gens:
        sys.exit(f"no generation checkpoints under {save_dir}")
    gens = [g for g in gens if g % args.stride == 0 or g == gens[-1]]

    def load_set(name, with_policy):
        path = os.path.join(data_dir, name)
        if not os.path.exists(path):
            return None
        with np_load_retry(path) as d:
            planes, values = d["planes"], d["values"]
            policies = d["policies"] if with_policy else None
            solved = d["solved"] if "solved" in d else np.ones(len(values), bool)
        n_solved, n_total = int(solved.sum()), len(values)
        if n_solved < n_total:
            if not args.allow_partial:
                sys.exit(
                    f"{name} is partially built ({n_solved}/{n_total}); "
                    f"full-set re-evaluation needs the completed dataset "
                    f"(pass --allow-partial to evaluate the subset anyway)"
                )
            print(f"WARNING: {name} subset {n_solved}/{n_total} — results "
                  f"are NOT comparable to full-set numbers", flush=True)
        planes = planes[solved]
        values = values[solved]
        if policies is not None:
            policies = policies[solved]
        # NHWC device-resident once; reused across all generations
        planes_d = jnp.asarray(np.moveaxis(planes, 1, -1), dtype=jnp.float32)
        return planes_d, values, policies, n_solved, n_total

    set8 = load_set("connect4dataset_8ply.npz", with_policy=False)
    set7 = load_set("connect4dataset_7ply.npz", with_policy=True)
    if set8 is None and set7 is None:
        sys.exit(f"no benchmark npz files in {data_dir}")

    net, variables = init_net(config.model_config.net_config, jax.random.key(0))
    optimizer = make_optimizer(config.model_config)
    template = TrainState(
        variables["params"], variables["batch_stats"],
        optimizer.init(variables["params"]),
    )
    forward = jax.jit(make_eval_fn(net))

    os.makedirs(args.out, exist_ok=True)
    rows8, rows7 = [], []
    for gen in gens:
        state, _ = ckpt.restore_checkpoint(save_dir, gen, template, jax.random.key(0))
        if set8 is not None:
            planes_d, values, _, _, _ = set8
            stats = ValueStats()
            for i in range(0, len(values), 4096):
                value, _ = forward(
                    state.params, state.batch_stats, planes_d[i : i + 4096]
                )
                value = np.asarray(value)
                tgt = values[i : i + 4096]
                stats.update(value, tgt, float(np.mean((value - tgt) ** 2)))
            row = stats.to_dict()
            row["generation"] = gen
            rows8.append(row)
            print(f"gen {gen}: 8ply MSE {stats.loss:.4f} acc {stats.accuracy:.4f}",
                  flush=True)
        if set7 is not None:
            planes_d, values, policies, _, _ = set7
            stats = CombinedStats()
            for i in range(0, len(values), 4096):
                value, prior = forward(
                    state.params, state.batch_stats, planes_d[i : i + 4096]
                )
                value, prior = np.asarray(value), np.asarray(prior)
                tgt_v = values[i : i + 4096]
                tgt_p = policies[i : i + 4096]
                stats.update(
                    value, tgt_v, float(np.mean((value - tgt_v) ** 2)),
                    prior, tgt_p,
                    float(bce_loss(jnp.asarray(prior), jnp.asarray(tgt_p))),
                )
            row = stats.to_dict()
            row["generation"] = gen
            rows7.append(row)
            print(f"gen {gen}: 7ply MSE {stats.value_stats.loss:.4f} "
                  f"weak-move acc {stats.prior_stats.accuracy:.4f}", flush=True)

    if rows8:
        pd.DataFrame(rows8).set_index("generation").to_pickle(
            os.path.join(args.out, "8ply.pkl"))
    if rows7:
        pd.DataFrame(rows7).set_index("generation").to_pickle(
            os.path.join(args.out, "7ply.pkl"))
    from connect4_tpu.training.plots import render
    render(args.out)
    print(f"re-evaluated {len(gens)} generations -> {args.out}", flush=True)


if __name__ == "__main__":
    main()
