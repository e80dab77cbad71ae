#!/bin/bash
# 10M-row (reference-corpus-scale) bench: ivf + routed tracks, QPS only.
# Corpus: tools/gen_bench_sf.py /tmp/graft_sf500 5000 0 embonly  (d=64,
# uniform shell — routing's worst case; the clustered 10M control is
# /tmp/graft_sf500c, gen'd with 3162 clusters = sqrt(n)). 64g heap,
# pre-touch skipped (the fixture stage warms it; AlwaysPreTouch on a
# 64 GB heap costs ~15 min of VM-init wall on this host).
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
