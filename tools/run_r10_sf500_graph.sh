#!/bin/bash
# r10 item 5 — the OOD track's first 10M graph rows: flat resident HNSW
# (l2 + ip) on the sigma=0.20 clustered 10M corpus, to set against the
# DiskANN 4,882-QPS @10M baseline row (ood/diskann/config.yaml:22-27).
# The corpus-relative ef grid (to 512 past 1M rows) is what the 2M decade
# needed to clear 0.9 — this run proves or re-prices it at 10M.
set -euo pipefail
cd /root/repo
SPARK_DRIVER_MEM=64g \
SPARK_GRAFT_PRETOUCH=0 \
SPARK_GRAFT_SF_DIR=/tmp/graft_sf500t \
SPARK_GRAFT_CPUS=32 \
SPARK_GRAFT_QPS_ONLY=1 \
SPARK_GRAFT_TRACKS=graph \
SPARK_GRAFT_BENCH_OUT=/root/repo/BENCH_r10_sf500t_graph.json \
exec sbt -batch 'runMain graft.Bench'
