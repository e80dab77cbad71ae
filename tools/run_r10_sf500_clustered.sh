#!/bin/bash
# r10 items 2+3 — the clustered 10M control REGENERATED at sigma=0.20 (the
# honest tightness: ideal-router mass 3.6% at 10M vs 13% at the old
# sigma=0.25 — tools/sigma_decades.txt) and RE-RUN with the exact-trained
# k-means build (r9's committed 10M artifacts predate the
# assignCarryGraph-in-training fix and the lowest-id seeding removal).
# All IVF families + routed track; fraction sweeps capped at 25%.
set -euo pipefail
cd /root/repo
SPARK_DRIVER_MEM=64g \
SPARK_GRAFT_PRETOUCH=0 \
SPARK_GRAFT_SF_DIR=/tmp/graft_sf500t \
SPARK_GRAFT_CPUS=32 \
SPARK_GRAFT_QPS_ONLY=1 \
SPARK_GRAFT_TRACKS=ivf,routed \
SPARK_GRAFT_SWEEP_CAP_PCT=25 \
SPARK_GRAFT_BENCH_OUT=/root/repo/BENCH_r10_sf500t_clustered.json \
exec sbt -batch 'runMain graft.Bench'
