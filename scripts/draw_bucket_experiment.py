"""Offline sweep of the draw-bucket training knobs (VERDICT r4 item 4).

Fine-tunes the shipped gen-146 checkpoint on its own final replay window
(generations 127-146 of the packaged run) under combinations of
``draw_loss_weight`` (w) and ``value_target_mix`` (λ), then scores each
variant on the 8-ply benchmark with the reference bucketing. No self-play
involved, so each variant costs minutes — this picks the knob values for
the real in-loop fine-tune.

Usage (TPU, one process):
    python scripts/draw_bucket_experiment.py --run-dir /root/connect4_tpu_runs/r3_k8 \
        --gen 146 --epochs 4
"""

import argparse
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main():
    parser = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    parser.add_argument("--run-dir", default="/root/connect4_tpu_runs/r3_k8")
    parser.add_argument("--gen", type=int, default=146)
    parser.add_argument("--epochs", type=int, default=4)
    parser.add_argument("--lr", type=float, default=0.001)
    parser.add_argument("--batch", type=int, default=4096)
    parser.add_argument(
        "--variants",
        default="1:0,4:0,1:0.5,4:0.5,8:0.5",
        help="comma list of w:lambda pairs",
    )
    parser.add_argument("--data-dir", default=os.path.join(REPO, "connect4_tpu", "data", "files"))
    args = parser.parse_args()

    import numpy as np

    import jax
    import jax.numpy as jnp

    from connect4_tpu.config import ModelConfig, NetConfig
    from connect4_tpu.models.net import init_net
    from connect4_tpu.training import checkpoint as ckpt
    from connect4_tpu.training import replay
    from connect4_tpu.training.learner import (
        TrainState, make_eval_fn, make_optimizer, make_train_step,
        set_learning_rate,
    )
    from connect4_tpu.utils import enable_compilation_cache, np_load_retry

    enable_compilation_cache()

    # the packaged run used the published architecture
    net_config = NetConfig(filters=64, n_fc_layers=6, n_residuals=6)
    mc = ModelConfig(net_config=net_config, batch_size=args.batch)
    net, variables = init_net(net_config, jax.random.key(0))
    optimizer = make_optimizer(mc)
    template = TrainState(
        variables["params"], variables["batch_stats"],
        optimizer.init(variables["params"]),
    )
    base_state, _ = ckpt.restore_checkpoint(
        args.run_dir, args.gen, template, jax.random.key(0)
    )
    forward = jax.jit(make_eval_fn(net))

    with np_load_retry(os.path.join(args.data_dir, "connect4dataset_8ply.npz")) as d:
        solved = d["solved"] if "solved" in d else np.ones(len(d["values"]), bool)
        planes8 = np.moveaxis(d["planes"][solved], 1, -1).astype(np.float32)
        values8 = d["values"][solved].astype(np.float64)
    planes8_d = jnp.asarray(planes8)
    print(f"8-ply eval set: {len(values8)} solved positions", flush=True)

    def evaluate(state):
        preds = []
        for i in range(0, len(values8), 16384):
            v, _ = forward(state.params, state.batch_stats, planes8_d[i : i + 16384])
            preds.append(np.asarray(v, np.float64))
        p = np.concatenate(preds)
        mse = float(np.mean((p - values8) ** 2))
        cats = np.floor(p * 3.0) / 2.0
        out = {"mse": round(mse, 5)}
        for cls, name in ((0.0, "loss"), (0.5, "draw"), (1.0, "win")):
            sel = values8 == cls
            out[f"acc_{name}"] = round(float((cats[sel] == cls).mean()), 4)
        out["acc"] = round(float((cats == values8).mean()), 4)
        return out

    print("baseline gen-%d:" % args.gen, json.dumps(evaluate(base_state)), flush=True)

    variants = []
    for spec in args.variants.split(","):
        w, lam = spec.split(":")
        variants.append((float(w), float(lam)))

    for w, lam in variants:
        planes, values, policies, weights = replay.load_window_ex(
            args.run_dir, args.gen, value_target_mix=lam, draw_loss_weight=w
        )
        n = len(values)
        planes_d = jnp.asarray(np.moveaxis(planes, 1, -1), dtype=jnp.float32)
        values_d = jnp.asarray(values)
        policies_d = jnp.asarray(policies)
        weights_d = jnp.asarray(weights) if weights is not None else None

        state = base_state._replace(
            opt_state=set_learning_rate(base_state.opt_state, args.lr)
        )
        step = jax.jit(make_train_step(net, optimizer, weighted=weights is not None))
        key = jax.random.key(7)
        for epoch in range(args.epochs):
            key, pk = jax.random.split(key)
            order = jax.random.permutation(pk, n)
            for i in range(0, n - args.batch + 1, args.batch):
                idx = order[i : i + args.batch]
                batch = (
                    jnp.take(planes_d, idx, axis=0),
                    jnp.take(values_d, idx, axis=0),
                    jnp.take(policies_d, idx, axis=0),
                )
                if weights_d is not None:
                    batch = batch + (jnp.take(weights_d, idx, axis=0),)
                state, _ = step(state, *batch)
            res = evaluate(state)
            print(
                f"w={w} lam={lam} epoch={epoch + 1}: {json.dumps(res)}",
                flush=True,
            )


if __name__ == "__main__":
    main()
