"""Architecture sanity check: supervised training directly on the 8-ply /
7-ply benchmark sets.

Parity with the reference's ``scripts/verify.ipynb``
(``/root/reference/README.md:73-75``): before trusting the RL loop, verify
the network has the capacity to fit the evaluation targets when trained on
them directly. Prints value/policy metrics per epoch.

Usage: python scripts/verify_supervised.py [--epochs 20] [--filters 64 ...]
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--epochs", type=int, default=10)
    parser.add_argument("--batch-size", type=int, default=4096)
    parser.add_argument("--lr", type=float, default=0.01)
    parser.add_argument("--filters", type=int, default=64)
    parser.add_argument("--fc-layers", type=int, default=6)
    parser.add_argument("--residuals", type=int, default=6)
    parser.add_argument("--data-dir", default=None)
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp

    from connect4_tpu.config import ModelConfig, NetConfig, StorageConfig
    from connect4_tpu.models import init_net
    from connect4_tpu.training.learner import (
        TrainState,
        make_optimizer,
        make_train_step,
        set_learning_rate,
    )
    from connect4_tpu.training.stats import ValueStats
    from connect4_tpu.utils import enable_compilation_cache

    enable_compilation_cache()
    data_dir = args.data_dir or StorageConfig().data_dir
    path8 = os.path.join(data_dir, "connect4dataset_8ply.npz")
    path7 = os.path.join(data_dir, "connect4dataset_7ply.npz")
    if not os.path.exists(path8):
        sys.exit(
            f"{path8} missing - generate it first: "
            "python -m connect4_tpu.data.datasets 8ply"
        )

    with np.load(path8) as d:
        ok = d["solved"] if "solved" in d else np.ones(len(d["values"]), bool)
        if not ok.all():
            print(f"8ply: using {int(ok.sum())}/{len(ok)} solved rows")
        planes = np.moveaxis(d["planes"][ok], 1, -1).astype(np.float32)
        values = d["values"][ok].astype(np.float32)
    # uniform policy target (the 8-ply set has no policy labels); use the
    # 7-ply set instead when present
    policies = np.full((len(values), 7), 1.0 / 7, dtype=np.float32)
    if os.path.exists(path7):
        with np.load(path7) as d:
            ok = d["solved"] if "solved" in d else np.ones(len(d["values"]), bool)
            if not ok.all():
                print(f"7ply: using {int(ok.sum())}/{len(ok)} solved rows")
            planes7 = np.moveaxis(d["planes"][ok], 1, -1).astype(np.float32)
            values7 = d["values"][ok].astype(np.float32)
            policies7 = d["policies"][ok].astype(np.float32)
        planes = np.concatenate([planes, planes7])
        values = np.concatenate([values, values7])
        policies = np.concatenate([policies, policies7])

    model_cfg = ModelConfig(
        net_config=NetConfig(
            filters=args.filters, n_fc_layers=args.fc_layers,
            n_residuals=args.residuals, compute_dtype="bfloat16",
        ),
        initial_lr=args.lr,
        batch_size=args.batch_size,
    )
    net, variables = init_net(model_cfg.net_config, jax.random.key(0))
    optimizer = make_optimizer(model_cfg)
    state = TrainState(
        variables["params"], variables["batch_stats"],
        set_learning_rate(optimizer.init(variables["params"]), args.lr),
    )
    step = jax.jit(make_train_step(net, optimizer))

    planes_d = jnp.asarray(planes)
    values_d = jnp.asarray(values)
    policies_d = jnp.asarray(policies)
    n = len(values)
    rng = np.random.default_rng(0)
    for epoch in range(args.epochs):
        order = rng.permutation(n)
        losses = []
        for i in range(0, n - args.batch_size + 1, args.batch_size):
            idx = jnp.asarray(order[i : i + args.batch_size])
            state, metrics = step(
                state,
                jnp.take(planes_d, idx, axis=0),
                jnp.take(values_d, idx, axis=0),
                jnp.take(policies_d, idx, axis=0),
            )
            losses.append(float(metrics["loss"]))
        # quick value accuracy on a sample
        from connect4_tpu.training.learner import make_eval_fn

        forward = jax.jit(make_eval_fn(net))
        sample = rng.choice(n, size=min(8192, n), replace=False)
        v_pred, _ = forward(
            state.params, state.batch_stats, jnp.asarray(planes[sample])
        )
        stats = ValueStats()
        stats.update(np.asarray(v_pred), values[sample], np.mean(losses))
        print(f"epoch {epoch}: loss {np.mean(losses):.4f}  {stats!r}")


if __name__ == "__main__":
    main()
