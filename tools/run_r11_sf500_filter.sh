#!/bin/bash
# r11 item 1 — the FILTER track at 10M re-run on the sliced-probe build:
# probeGroupsBatch stripes each batch into concurrent narrow jobs (the r10
# headline ran at cpu_frac 0.30 because task fan was bounded by the resident
# (key, part) graph count), the registry pins one graph per RDD partition,
# and the planner's two branches run concurrently with the batch's branch
# mix in the op record. Baseline row: 3,200 QPS filtered on yfcc-10M
# (filter/faiss/faiss.py:361-426, README.md:43).
set -euo pipefail
CLS="${GRAFT_CLASSES:-/tmp/graft_classes_r11b}"
ADD_OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net \
         java.nio java.util java.util.concurrent java.util.concurrent.atomic \
         sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  ADD_OPENS="$ADD_OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
SPARK_GRAFT_SF_DIR=/tmp/graft_sf500t \
SPARK_GRAFT_CPUS=32 \
SPARK_GRAFT_QPS_ONLY=1 \
SPARK_GRAFT_TRACKS=filter \
SPARK_GRAFT_BENCH_OUT=/root/repo/BENCH_r11_sf500_filter.json \
exec java $ADD_OPENS -Xms64g -Xmx64g \
  -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
  -cp "$CLS:/opt/spark/jars/*" graft.Bench
