#!/bin/bash
# r10 item 4, next decade — impact-ordered budget serving at sf100 (2M
# Zipf docs), the row that tests whether the budgeted QPS trajectory
# bends toward linscan's 101 QPS @ 8.8M instead of scaling linearly down.
set -euo pipefail
cd /root/repo
SPARK_DRIVER_MEM=64g \
SPARK_GRAFT_PRETOUCH=0 \
SPARK_GRAFT_SF_DIR=/tmp/graft_sf100z \
SPARK_GRAFT_CPUS=32 \
SPARK_GRAFT_QPS_ONLY=1 \
SPARK_GRAFT_TRACKS=sparse \
SPARK_GRAFT_BENCH_OUT=/root/repo/BENCH_r10_sf100z_sparse.json \
exec sbt -batch 'runMain graft.Bench'
