#!/bin/bash
# 10M-row (reference-corpus-scale) bench: ivf + routed tracks, QPS only.
# Corpus: tools/gen_bench_sf.py /tmp/graft_sf500 500 '' embonly  (d=64,
# uniform shell — routing's worst case; clustered controls exist at
# sf1/sf10). 64g pre-touched heap: five resident forms at 10M rows.
set -euo pipefail
cd /root/repo
SPARK_DRIVER_MEM=64g \
SPARK_GRAFT_PRETOUCH=0 \
SPARK_GRAFT_SF_DIR=/tmp/graft_sf500 \
SPARK_GRAFT_CPUS=32 \
SPARK_GRAFT_QPS_ONLY=1 \
SPARK_GRAFT_TRACKS=ivf,routed \
SPARK_GRAFT_SWEEP_CAP_PCT=25 \
SPARK_GRAFT_BENCH_OUT=/root/repo/BENCH_r08_sf500_metrics.json \
exec sbt -batch 'runMain graft.Bench'
