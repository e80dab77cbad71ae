#!/bin/bash
# r10 item 3b — uniform 10M IVFxSQ8 re-run with the exact-trained,
# hash-seeded build (the committed r9 artifact carries the beam-trained
# centroids, a known ~3x matched-recall-mass understatement).
set -euo pipefail
cd /root/repo
SPARK_DRIVER_MEM=64g \
SPARK_GRAFT_PRETOUCH=0 \
SPARK_GRAFT_SF_DIR=/tmp/graft_sf500 \
SPARK_GRAFT_CPUS=32 \
SPARK_GRAFT_QPS_ONLY=1 \
SPARK_GRAFT_TRACKS=ivf \
SPARK_GRAFT_IVF_FAMILIES=sq8 \
SPARK_GRAFT_SWEEP_CAP_PCT=25 \
SPARK_GRAFT_BENCH_OUT=/root/repo/BENCH_r10_sf500_ivf_uniform.json \
exec sbt -batch 'runMain graft.Bench'
