#!/bin/bash
# Full-set finalization pipeline (run when BOTH benchmark datasets read
# solved == 100% and no other TPU process is running).
#
# Produces, in order:
#  1. full-run re-evaluation of every checkpoint on the COMPLETED sets
#     (no --allow-partial) -> /root/c4_reeval_full + refreshed
#     example_run/reeval_liveset artifacts
#  2. reference-example-net bucket accuracy on the completed sets
#  3. supervised capacity check on the completed sets
# Logs under /root/c4_finalize_logs/.
set -e
cd /root/repo
mkdir -p /root/c4_finalize_logs

python - <<'EOF'
import numpy as np
for name, total in (("connect4dataset_8ply.npz", 67557), ("connect4dataset_7ply.npz", 54131)):
    d = np.load(f"connect4_tpu/data/files/{name}")
    s = int(d["solved"].sum())
    assert s == total, f"{name}: {s}/{total} solved - dataset not complete yet"
print("both datasets 100% solved")
EOF

echo "=== 1/3 reevaluate_run (full sets) ==="
python scripts/reevaluate_run.py -c examples/config_r3_k8_draw.py \
    --data-dir connect4_tpu/data/files --out /root/c4_reeval_full \
    2>&1 | tee /root/c4_finalize_logs/reeval.log
rm -rf connect4_tpu/data/files/example_run/reeval_liveset
cp -r /root/c4_reeval_full connect4_tpu/data/files/example_run/reeval_liveset

echo "=== 2/3 ref_net_draw_check (full sets) ==="
python scripts/ref_net_draw_check.py 2>&1 | tee /root/c4_finalize_logs/refnet.log

echo "=== 3/3 verify_supervised (full sets) ==="
python scripts/verify_supervised.py --epochs 10 2>&1 | tee /root/c4_finalize_logs/supervised.log

echo "ALL DONE - update README tables from the logs above"
