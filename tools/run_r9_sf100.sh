#!/bin/bash
# r9: 2M-row decade re-run proving the two r8 `weak` items at their named
# decade: (a) the corpus-relative ADC refine budget (rerank escalation —
# r8 ceilinged at 0.42/0.57 with the fixed 2x-then-4x rule) and (b) the
# corpus-relative flat-graph ef grid (256/512 points past 1M rows — r8's
# ef<=128 read 0.686). Corpus: gen_bench_sf.py /tmp/graft_sf100 1000 0
# embonly (uniform shell, same seed as r8's sf100 run).
set -euo pipefail
cd /root/repo
SPARK_DRIVER_MEM=48g \
SPARK_GRAFT_PRETOUCH=0 \
SPARK_GRAFT_SF_DIR=/tmp/graft_sf100 \
SPARK_GRAFT_CPUS=32 \
SPARK_GRAFT_QPS_ONLY=1 \
SPARK_GRAFT_TRACKS=graph,ivf \
SPARK_GRAFT_SWEEP_CAP_PCT=25 \
SPARK_GRAFT_BENCH_OUT=/root/repo/BENCH_r09_sf100.json \
exec sbt -batch 'runMain graft.Bench'
