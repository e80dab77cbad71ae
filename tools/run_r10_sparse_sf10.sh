#!/bin/bash
# r10 item 4 evidence — impact-ordered budget serving at sf10 (200k ZIPF
# docs: tools/gen_bench_sf.py /tmp/graft_sf10z 100 447 full 0.20; the
# Zipf draw is the sparse-side testdata-honesty fix — the old uniform
# vocab draw made every posting tf~1, so NO budget scheme could cut scan
# volume at matched recall). Done-gate: sparse_budget_served posts a
# >=0.9-recall row at budget < full beating the full-budget QPS.
set -euo pipefail
cd /root/repo
SPARK_DRIVER_MEM=48g \
SPARK_GRAFT_PRETOUCH=0 \
SPARK_GRAFT_SF_DIR=/tmp/graft_sf10z \
SPARK_GRAFT_CPUS=32 \
SPARK_GRAFT_QPS_ONLY=1 \
SPARK_GRAFT_TRACKS=sparse \
SPARK_GRAFT_BENCH_OUT=/root/repo/BENCH_r10_sf10z_sparse.json \
exec sbt -batch 'runMain graft.Bench'
