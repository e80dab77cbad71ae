#!/bin/bash
# r12 — the OOD track's coarse-routed serving form at 10M (VERDICT r11 item
# 1's shape, built mid-r11/r12): ann_hnsw_probe_coarse routes each query to
# its nprobe nearest k-means cells and pays only those cells' beams —
# per-query work independent of shard count, vs the flat family's
# one-beam-per-partition fan-out (237 q/s @ 0.9284 in
# BENCH_r11_sf500t_graph.json against DiskANN's 4,882 @ 0.9,
# ood/diskann/config.yaml:22-27). Corpus: /tmp/graft_sf500t (10M, sigma=0.20
# clustered — tools/gen_bench_sf.py /tmp/graft_sf500t 5000 3162 embonly
# 0.20). Coarse-only tracks: the flat 10M rows are already committed (r11)
# and re-paying their wall buys no information.
set -euo pipefail
CLS="${GRAFT_CLASSES:-/tmp/graft_classes_r12}"
ADD_OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net \
         java.nio java.util java.util.concurrent java.util.concurrent.atomic \
         sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  ADD_OPENS="$ADD_OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
SPARK_GRAFT_SF_DIR=/tmp/graft_sf500t \
SPARK_GRAFT_CPUS=32 \
SPARK_GRAFT_QPS_ONLY=1 \
SPARK_GRAFT_TRACKS=coarse \
SPARK_GRAFT_BENCH_OUT=/root/repo/BENCH_r12_sf500t_graph.json \
exec java $ADD_OPENS -Xms64g -Xmx64g \
  -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
  -cp "$CLS:/opt/spark/jars/*" graft.Bench
