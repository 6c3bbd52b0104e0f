"""Export a training run's artifacts as the packaged example net + curves.

The reference ships its product as a playable trained checkpoint plus
learning-curve history (``/root/reference/oinkoink/data/example_net.pth``,
``README.md:82-96``). This tool packages a run the same way:

- ``<dest>/example_net/``: the chosen generation's Orbax checkpoint under
  ``<gen>/ckpt`` plus ``net_config.json`` — exactly the layout
  ``python -m connect4_tpu.cli game`` loads with no flags.
- ``<dest>/example_run/``: the stats pickles (``8ply.pkl``, ``7ply.pkl``,
  ``match_results.pkl``), rendered learning-curve PNGs, the run config and
  the training log.

Run it while training is live to snapshot progress (checkpoints are
written atomically per generation), and again at the end for the final
package.

Usage:
    python scripts/ship_run_artifacts.py -c examples/config_r3_k8.py \
        [--gen N] [--dest connect4_tpu/data/files] [--log train.log]
"""

import argparse
import dataclasses
import json
import os
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    parser = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    parser.add_argument("-c", "--config", required=True,
                        help="the run's Python config file")
    parser.add_argument("--gen", type=int, default=None,
                        help="generation to package (default: latest complete)")
    parser.add_argument("--dest", default=None,
                        help="destination data dir (default: the packaged "
                             "connect4_tpu/data/files)")
    parser.add_argument("--log", default=None,
                        help="training log file to include")
    args = parser.parse_args()

    from connect4_tpu.config import load_config_file
    from connect4_tpu.training.checkpoint import latest_generation

    config = load_config_file(args.config)
    run_dir = config.storage_config.save_dir
    dest = args.dest or os.path.join(
        os.path.dirname(os.path.abspath(__file__)), os.pardir,
        "connect4_tpu", "data", "files",
    )
    dest = os.path.abspath(dest)

    gen = args.gen if args.gen is not None else latest_generation(run_dir)
    if gen is None:
        raise SystemExit(f"no checkpoints under {run_dir}")

    # -- example_net: playable packaged checkpoint --------------------------
    net_dir = os.path.join(dest, "example_net")
    src_ckpt = os.path.join(run_dir, str(gen), "ckpt")
    if not os.path.isdir(src_ckpt):
        raise SystemExit(f"missing checkpoint {src_ckpt}")
    # replace wholesale so exactly one generation is packaged
    if os.path.isdir(net_dir):
        shutil.rmtree(net_dir)
    os.makedirs(os.path.join(net_dir, str(gen)))
    shutil.copytree(src_ckpt, os.path.join(net_dir, str(gen), "ckpt"))
    with open(os.path.join(net_dir, "net_config.json"), "w") as fh:
        json.dump(dataclasses.asdict(config.model_config.net_config), fh,
                  indent=2)
    print(f"packaged generation {gen} -> {net_dir}")

    # -- example_run: curves, stats, config, log ----------------------------
    run_out = os.path.join(dest, "example_run")
    os.makedirs(run_out, exist_ok=True)
    copied = []
    for name in ("8ply.pkl", "7ply.pkl", "match_results.pkl",
                 "8ply.png", "7ply.png", "match_results.png"):
        src = os.path.join(run_dir, name)
        if os.path.exists(src):
            shutil.copy2(src, os.path.join(run_out, name))
            copied.append(name)
    shutil.copy2(args.config, os.path.join(run_out, "config.py"))
    copied.append("config.py")
    if args.log and os.path.exists(args.log):
        shutil.copy2(args.log, os.path.join(run_out, "train.log"))
        copied.append("train.log")
    with open(os.path.join(run_out, "PACKAGED.json"), "w") as fh:
        json.dump({"generation": gen, "run_dir": run_dir}, fh, indent=2)
    print(f"copied {', '.join(copied)} -> {run_out}")


if __name__ == "__main__":
    main()
