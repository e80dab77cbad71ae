#!/bin/bash
# r9: the clustered 10M control — the reference baseline's own corpus
# SHAPE (yfcc-10M is real clustered data) at its own ROW COUNT. Corpus:
# tools/gen_bench_sf.py /tmp/graft_sf500c 5000 3162 embonly (3162 = sqrt(n),
# the sf1=141 / sf10=447 clustered-control series continued). All ivf
# families + routed track; corpus-fraction sweeps capped at 25% (the
# high-fraction tail re-measures linear scan physics the smaller SFs
# already anchor). 64g heap, pre-touch skipped (fixture stage warms it).
set -euo pipefail
cd /root/repo
SPARK_DRIVER_MEM=64g \
SPARK_GRAFT_PRETOUCH=0 \
SPARK_GRAFT_SF_DIR=/tmp/graft_sf500c \
SPARK_GRAFT_CPUS=32 \
SPARK_GRAFT_QPS_ONLY=1 \
SPARK_GRAFT_TRACKS=ivf,routed \
SPARK_GRAFT_SWEEP_CAP_PCT=25 \
SPARK_GRAFT_BENCH_OUT=/root/repo/BENCH_r09_sf500_clustered.json \
exec sbt -batch 'runMain graft.Bench'
