#!/bin/bash
# r11 item 2 — the OOD track's first committed 10M graph rows: flat resident
# HNSW (l2 + ip) plus the mutation row on the sigma=0.20 clustered 10M corpus
# (/tmp/graft_sf500t, tools/gen_bench_sf.py), to set against the DiskANN
# 4,882-QPS @10M baseline row (ood/diskann/config.yaml:22-27). The r10 run of
# this shape was SIGKILLed at round end before producing output; this runs
# from a snapshotted classpath (no sbt lock) so it can proceed while the
# round's code work continues.
set -euo pipefail
CLS="${GRAFT_CLASSES:-/tmp/graft_classes_r11}"
ADD_OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net \
         java.nio java.util java.util.concurrent java.util.concurrent.atomic \
         sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  ADD_OPENS="$ADD_OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
SPARK_GRAFT_SF_DIR=/tmp/graft_sf500t \
SPARK_GRAFT_CPUS=32 \
SPARK_GRAFT_QPS_ONLY=1 \
SPARK_GRAFT_TRACKS=graph \
SPARK_GRAFT_BENCH_OUT=/root/repo/BENCH_r11_sf500t_graph.json \
exec java $ADD_OPENS -Xms64g -Xmx64g \
  -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
  -cp "$CLS:/opt/spark/jars/*" graft.Bench
