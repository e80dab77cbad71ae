#!/bin/bash
# r10 item 1 — the FILTER track at the reference baseline's own row count,
# for the first time: 10M rows, sigma=0.20 clustered (tools/gen_bench_sf.py
# /tmp/graft_sf500t 5000 3162 embonly 0.20 — the tightened control whose
# ideal-router decade curve is tools/sigma_decades.txt), post k-means-fix
# build. The 3,200-QPS baseline row is FILTERED search on yfcc-10M
# (filter/faiss/faiss.py:361-426, README.md:43); this posts filtered_knn
# (exact signature scan), filtered_knn_subindex (per-tag graphs, ef grid
# corpus-relative), filtered_knn_planner (mixed-branch router), and
# filtered_knn_bucketed (disk layout) at 10M with tags.
set -euo pipefail
cd /root/repo
SPARK_DRIVER_MEM=64g \
SPARK_GRAFT_PRETOUCH=0 \
SPARK_GRAFT_SF_DIR=/tmp/graft_sf500t \
SPARK_GRAFT_CPUS=32 \
SPARK_GRAFT_QPS_ONLY=1 \
SPARK_GRAFT_TRACKS=filter \
SPARK_GRAFT_BENCH_OUT=/root/repo/BENCH_r10_sf500_filter.json \
exec sbt -batch 'runMain graft.Bench'
