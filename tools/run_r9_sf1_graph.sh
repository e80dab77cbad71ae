#!/bin/bash
# r9: sf1 (20k rows) graph-track confirmation run for the r8 watch item —
# the sf1 graph matched-recall point regressed r7 -> r8 (4,239/4,743 ->
# 3,354/3,931 q/s at ef=24 / 0.9044) in a 0.17%-steal band; two
# consecutive clean-band (< 0.05% steal) runs within +/-10% either
# restore the r7 level or establish the new one as real.
# Usage: run_r9_sf1_graph.sh N   (N = confirmation run number)
set -euo pipefail
cd /root/repo
N="${1:?usage: run_r9_sf1_graph.sh N}"
SPARK_DRIVER_MEM=24g \
SPARK_GRAFT_SF_DIR=/tmp/graft_sf1 \
SPARK_GRAFT_CPUS=32 \
SPARK_GRAFT_QPS_ONLY=1 \
SPARK_GRAFT_TRACKS=graph \
SPARK_GRAFT_BENCH_OUT="/root/repo/BENCH_r09_sf1_confirm${N}.json" \
exec sbt -batch 'runMain graft.Bench'
