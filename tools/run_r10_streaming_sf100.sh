#!/bin/bash
# r10 item 6 — streaming runbook replay at the 2M decade (largest that
# fits the session alongside the 10M serving runs): the msturing-shaped
# delete_runbook (32 ins / 10 del / 33 search, max_pts ~ 0.6n) scaled to
# this corpus, per-checkpoint recall + wall against the 0.924 / 23 min
# baseline (streaming/delete_runbook.yaml:245).
set -euo pipefail
cd /root/repo
SPARK_DRIVER_MEM=64g \
SPARK_GRAFT_PRETOUCH=0 \
SPARK_GRAFT_SF_DIR=/tmp/graft_sf100t \
SPARK_GRAFT_CPUS=32 \
SPARK_GRAFT_QPS_ONLY=1 \
SPARK_GRAFT_TRACKS=streaming \
SPARK_GRAFT_BENCH_OUT=/root/repo/BENCH_r10_sf100t_streaming.json \
exec sbt -batch 'runMain graft.Bench'
