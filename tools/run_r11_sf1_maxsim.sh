#!/bin/bash
# r11 item 8 — MaxSim serving vs the exact token join, in ONE artifact at
# sf1 (20k vectors = 5k 4-token docs): maxsim_served (resident token-graph
# hits + the MaxSimServe reduce, matched-recall c pick) timed alongside the
# new maxsim_exact_join anchor (every (qtoken, doctoken) pair scored). The
# served row must post >= 3x the exact anchor at recall >= 0.9 for the
# shortcut to be the honest headline.
set -euo pipefail
CLS="${GRAFT_CLASSES:-/tmp/graft_classes_r11b}"
ADD_OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net \
         java.nio java.util java.util.concurrent java.util.concurrent.atomic \
         sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  ADD_OPENS="$ADD_OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
SPARK_GRAFT_SF_DIR=/tmp/graft_sf1 \
SPARK_GRAFT_CPUS=32 \
SPARK_GRAFT_QPS_ONLY=1 \
SPARK_GRAFT_TRACKS=maxsim \
SPARK_GRAFT_BENCH_OUT=/root/repo/BENCH_r11_sf1_maxsim.json \
exec java $ADD_OPENS -Xms24g -Xmx24g \
  -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
  -cp "$CLS:/opt/spark/jars/*" graft.Bench
