"""Measure the REFERENCE example net's per-bucket value accuracy.

Our trained nets classify won/lost 8-ply positions at ~85% but drawn ones
at only ~25-31% (the "draw-bucket pathology"). This tool answers whether
that is a defect of this framework's training or a property of the method
itself, by running the reference's own shipped checkpoint
(``/root/reference/oinkoink/data/example_net.pth``, the ~168-generation
net behind its published README numbers) over our regenerated benchmark
sets and bucketing with the identical stats semantics.

Executes the reference's unmodified torch model code (CPU) via the same
synthetic-package import the fidelity tests use; nothing is copied.

Usage: python scripts/ref_net_draw_check.py [--data-dir DIR]
"""

import argparse
import os
import sys
import types

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
REFERENCE_DIR = "/root/reference"


def main():
    parser = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    parser.add_argument("--data-dir", default=None)
    parser.add_argument("--batch", type=int, default=4096)
    args = parser.parse_args()

    import numpy as np
    import torch

    from connect4_tpu.training.stats import ValueStats

    # import the reference's model module without executing the package
    # __init__ (which pulls in visdom etc.); see tests/test_reference_crossval.py
    sys.path.insert(0, os.path.join(REPO, "tests", "ref_shims"))
    pkg = types.ModuleType("oinkoink")
    pkg.__path__ = [os.path.join(REFERENCE_DIR, "oinkoink")]
    sys.modules["oinkoink"] = pkg
    neural_pkg = types.ModuleType("oinkoink.neural")
    neural_pkg.__path__ = [os.path.join(REFERENCE_DIR, "oinkoink", "neural")]
    sys.modules["oinkoink.neural"] = neural_pkg
    from oinkoink.neural.config import NetConfig as RefNetConfig
    from oinkoink.neural.pytorch.model import Net as RefNet

    # the shipped example_net.pth is the DEFAULT architecture (filters=32,
    # fc=4, res=3), not the 64-filter config of the published training runs
    net = RefNet(RefNetConfig())
    ckpt = torch.load(
        os.path.join(REFERENCE_DIR, "oinkoink", "data", "example_net.pth"),
        map_location="cpu",
    )
    net.load_state_dict(ckpt["net_state_dict"])
    net.eval()

    data_dir = args.data_dir
    if data_dir is None:
        from connect4_tpu.config import StorageConfig

        data_dir = StorageConfig().data_dir

    for name in ("connect4dataset_8ply.npz", "connect4dataset_7ply.npz"):
        path = os.path.join(data_dir, name)
        if not os.path.exists(path):
            print(f"{name}: missing, skipped")
            continue
        with np.load(path) as d:
            solved = d["solved"] if "solved" in d else np.ones(len(d["values"]), bool)
            planes = d["planes"][solved].astype(np.float32)
            values = d["values"][solved]
        if solved.sum() < len(solved):
            print(f"{name}: subset {int(solved.sum())}/{len(solved)} "
                  f"(NOT comparable to full-set numbers)")
        stats = ValueStats()
        with torch.no_grad():
            for i in range(0, len(values), args.batch):
                x = torch.from_numpy(planes[i : i + args.batch])
                value, _ = net(x)
                v = value.squeeze(-1).numpy()
                tgt = values[i : i + args.batch]
                stats.update(v, tgt, float(np.mean((v - tgt) ** 2)))
        print(f"\n== reference example net on {name} ==")
        print(stats)


if __name__ == "__main__":
    main()
