#!/bin/bash
# r9: uniform 10M re-run of the IVFxSQ8 families with the corpus-aware
# efRoute grid (r8's committed artifact predates it — graphroute was
# grid-bound at recall 0.5006 because byMassGraph routes to at most
# efRoute clusters and the grid stopped at 128 while 15% of C=12,650
# needs ~1,898). Families filtered to sq8 (+ its graphroute twin) and the
# the flat-ADC sweep at 10M is ~minutes per recall eval re-measuring a
# family this run isn't chasing (the clustered run keeps all families).
set -euo pipefail
cd /root/repo
SPARK_DRIVER_MEM=64g \
SPARK_GRAFT_PRETOUCH=0 \
SPARK_GRAFT_SF_DIR=/tmp/graft_sf500 \
SPARK_GRAFT_CPUS=32 \
SPARK_GRAFT_QPS_ONLY=1 \
SPARK_GRAFT_TRACKS=ivf \
SPARK_GRAFT_IVF_FAMILIES=sq8 \
SPARK_GRAFT_SWEEP_CAP_PCT=25 \
SPARK_GRAFT_BENCH_OUT=/root/repo/BENCH_r09_sf500_metrics.json \
exec sbt -batch 'runMain graft.Bench'
