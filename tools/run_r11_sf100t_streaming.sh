#!/bin/bash
# r11 items 2+5 — streaming runbook replay at the 2M decade: the
# msturing-shaped delete_runbook (32 ins / 10 del / 33 search,
# max_pts ~ 0.6n) scaled to this corpus, per-checkpoint recall + wall
# against the 0.924 / 23 min baseline (streaming/delete_runbook.yaml:245).
set -euo pipefail
CLS="${GRAFT_CLASSES:-/tmp/graft_classes_r11b}"
ADD_OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net \
         java.nio java.util java.util.concurrent java.util.concurrent.atomic \
         sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  ADD_OPENS="$ADD_OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
SPARK_GRAFT_SF_DIR=/tmp/graft_sf100t \
SPARK_GRAFT_CPUS=32 \
SPARK_GRAFT_QPS_ONLY=1 \
SPARK_GRAFT_TRACKS=streaming \
SPARK_GRAFT_BENCH_OUT=/root/repo/BENCH_r11_sf100t_streaming.json \
exec java $ADD_OPENS -Xms64g -Xmx64g \
  -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
  -cp "$CLS:/opt/spark/jars/*" graft.Bench
