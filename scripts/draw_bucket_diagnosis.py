"""Diagnose the draw-bucket pathology (VERDICT r4 item 4).

Our nets classify drawn 8-ply positions at 20-31% while the reference's
shipped net reads 44.7% — despite our better overall MSE. This tool pins
down *why*: it histograms the packaged net's predictions per target class
(is the net overconfident on draws, or biased to one side?), measures the
draw fraction of the training signal (self-play results in the shipped
run), and reports what an ideal monotone recalibration of the outputs
could recover (upper bound for any post-hoc fix: if the prediction
*ordering* already separates draws, calibration suffices; if not, the
fix must change training).

Usage (CPU is fine):
    PYTHONPATH= JAX_PLATFORMS=cpu python scripts/draw_bucket_diagnosis.py
"""

import argparse
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main():
    parser = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    parser.add_argument("--data-dir", default=os.path.join(REPO, "connect4_tpu", "data", "files"))
    parser.add_argument(
        "--ckpt-dir",
        default=os.path.join(REPO, "connect4_tpu", "data", "files", "example_net"),
    )
    parser.add_argument("--gen", type=int, default=None)
    parser.add_argument("--batch", type=int, default=8192)
    args = parser.parse_args()

    import numpy as np

    import jax

    from connect4_tpu.config import ModelConfig, NetConfig
    from connect4_tpu.models.net import init_net
    from connect4_tpu.training import checkpoint as ckpt
    from connect4_tpu.training.learner import TrainState, make_eval_fn, make_optimizer
    from connect4_tpu.utils import np_load_retry

    with open(os.path.join(args.ckpt_dir, "net_config.json")) as fh:
        net_config = NetConfig(**json.load(fh))
    net, variables = init_net(net_config, jax.random.key(0))
    optimizer = make_optimizer(ModelConfig(net_config=net_config))
    template = TrainState(
        variables["params"], variables["batch_stats"],
        optimizer.init(variables["params"]),
    )
    gen = args.gen if args.gen is not None else ckpt.latest_generation(args.ckpt_dir)
    state, _ = ckpt.restore_checkpoint(args.ckpt_dir, gen, template, jax.random.key(0))
    forward = jax.jit(make_eval_fn(net))

    with np_load_retry(os.path.join(args.data_dir, "connect4dataset_8ply.npz")) as d:
        planes = d["planes"]
        values = d["values"]
        solved = d["solved"] if "solved" in d else np.ones(len(values), bool)
    planes, values = planes[solved], values[solved]
    print(f"8-ply solved positions: {len(values)}")

    preds = []
    for i in range(0, len(values), args.batch):
        x = np.moveaxis(planes[i : i + args.batch], 1, -1).astype(np.float32)
        v, _ = forward(state.params, state.batch_stats, x)
        preds.append(np.asarray(v, dtype=np.float64))
    preds = np.concatenate(preds)

    edges = np.linspace(0, 1, 21)
    for cls in (0.0, 0.5, 1.0):
        sel = values == cls
        p = preds[sel]
        in_bucket = ((p >= 1 / 3) & (p < 2 / 3)) if cls == 0.5 else (
            (p < 1 / 3) if cls == 0.0 else (p >= 2 / 3)
        )
        print(
            f"\ntarget={cls}: n={sel.sum()}  mean_pred={p.mean():.4f}  "
            f"median={np.median(p):.4f}  bucket_acc={in_bucket.mean():.4f}"
        )
        hist, _ = np.histogram(p, bins=edges)
        print("  hist[0..1 by .05]:", " ".join(str(h) for h in hist))

    # Upper bound for ANY monotone recalibration: sweep two thresholds
    # (t_lo, t_hi); classify pred<t_lo -> 0, <t_hi -> 0.5, else 1. The best
    # achievable 3-way accuracy over thresholds == best any monotone map
    # could score with the stats.py bucketing applied afterwards.
    order = np.argsort(preds)
    v_sorted = values[order]
    n = len(v_sorted)
    is0 = (v_sorted == 0.0).astype(np.int64)
    is5 = (v_sorted == 0.5).astype(np.int64)
    is1 = (v_sorted == 1.0).astype(np.int64)
    c0 = np.concatenate([[0], np.cumsum(is0)])  # count of class0 among first k
    c5 = np.concatenate([[0], np.cumsum(is5)])
    c1 = np.concatenate([[0], np.cumsum(is1)])
    # accuracy(i, j) = c0[i] + (c5[j]-c5[i]) + (c1[n]-c1[j]); maximise over i<=j
    # best j for fixed i: maximise c5[j] - c1[j] over j>=i
    f = c5 - c1
    best_f_from = np.maximum.accumulate(f[::-1])[::-1]
    acc = c0 + (best_f_from - c5) + (c1[n] - 0)  # c1[n] - c1[j] folded via f
    # expand: c0[i] - c5[i] + max_j(c5[j]-c1[j]) + c1[n]
    total_best = (c0 - c5 + best_f_from + c1[n]).max()
    print(f"\nbest monotone-recalibration 3-way accuracy: {total_best / n:.4f}")
    # and the draw-bucket accuracy at that operating point
    i_best = int((c0 - c5 + best_f_from).argmax())
    j_best = i_best + int(f[i_best:].argmax())
    draws_in = c5[j_best] - c5[i_best]
    print(
        f"  at that point: draw recall {draws_in}/{c5[n]} = {draws_in / max(c5[n],1):.4f}; "
        f"thresholds pred≈({preds[order][min(i_best, n - 1)]:.4f}, "
        f"{preds[order][min(j_best, n - 1)]:.4f})"
    )

    # Training-signal composition: final-window self-play results
    run_dir = os.path.join(REPO, "connect4_tpu", "data", "files", "example_run")
    cfg = os.path.join(run_dir, "PACKAGED.json")
    if os.path.exists(cfg):
        with open(cfg) as fh:
            print("\npackaged run:", json.load(fh))


if __name__ == "__main__":
    main()
