#!/bin/bash
# r11 item 7 — clean-band confirmation run for the r10 sf0.1
# ann_ivfadc_residual_served -23% regression (6,871 -> 5,295 q/s): every
# other family moved -8% with the host band, residual moved outside it.
# One isolated re-run of just the residual family at sf0.1; if it reads
# back in the r9 band the regression was host noise, otherwise bisect.
set -euo pipefail
CLS="${GRAFT_CLASSES:-/tmp/graft_classes_r11b}"
ADD_OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net \
         java.nio java.util java.util.concurrent java.util.concurrent.atomic \
         sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  ADD_OPENS="$ADD_OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
SPARK_GRAFT_CPUS=32 \
SPARK_GRAFT_QPS_ONLY=1 \
SPARK_GRAFT_TRACKS=ivf \
SPARK_GRAFT_IVF_FAMILIES=residual \
SPARK_GRAFT_BENCH_OUT=/root/repo/BENCH_r11_sf01_residual_band.json \
exec java $ADD_OPENS -Xms64g -Xmx64g \
  -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
  -cp "$CLS:/opt/spark/jars/*" graft.Bench
