#!/bin/bash
# r12 items 5+6 — the FILTER track at 10M on the FAIR-pool planner and the
# slices saturation sweep: the planner's scan branch runs in its own FAIR
# scheduler pool (its one wide job no longer queues behind graph stripes —
# the r11 spread-1.86 tail), and filtered_knn_subindex sweeps slices
# {2,4,8,16} at the matched-recall beam so the artifact names the stripe
# count where the box saturates. Baseline row: 3,200 QPS filtered on
# yfcc-10M (filter/faiss/faiss.py:361-426, README.md:43); r11 stood at
# 2,323 q/s @ 0.907 with slices fixed at 4 and cpu_frac_med 0.725.
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
SPARK_GRAFT_TRACKS=filter \
SPARK_GRAFT_BENCH_OUT=/root/repo/BENCH_r12_sf500_filter.json \
exec java $ADD_OPENS -Xms64g -Xmx64g \
  -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
  -cp "$CLS:/opt/spark/jars/*" graft.Bench
