#!/bin/bash
# r11 items 2+3+4 — impact-budget sparse at the 5M-doc Zipf corpus
# (/tmp/graft_sf100z), on the prefix-cut budget kernel (per-dim threshold
# cuts + plain walks, zero per-posting heap traffic), the core-count shard
# floor, and the densified full/8..3full/4 budget grid. The row that tests
# whether the budgeted QPS trajectory bends toward linscan's 101 QPS @ 8.8M
# (sparse/linscan/config.yaml:36) instead of scaling linearly down.
set -euo pipefail
CLS="${GRAFT_CLASSES:-/tmp/graft_classes_r11b}"
ADD_OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net \
         java.nio java.util java.util.concurrent java.util.concurrent.atomic \
         sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  ADD_OPENS="$ADD_OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
SPARK_GRAFT_SF_DIR=/tmp/graft_sf100z \
SPARK_GRAFT_CPUS=32 \
SPARK_GRAFT_QPS_ONLY=1 \
SPARK_GRAFT_TRACKS=sparse \
SPARK_GRAFT_BENCH_OUT=/root/repo/BENCH_r11_sf100z_sparse.json \
exec java $ADD_OPENS -Xms64g -Xmx64g \
  -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
  -cp "$CLS:/opt/spark/jars/*" graft.Bench
