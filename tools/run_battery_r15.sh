#!/bin/bash
# Round-15 artifact battery: correctness dumps + checks first, then the
# four bench legs back-to-back on an otherwise-idle machine (bench
# timing must not share CPUs with the python checkers).
# Mirrors the r10-r14 protocol: sf0.1 x3, sf1 x5, skew x5, 30x x3.
set -u
cd /root/repo

CP="target/scala-2.13/classes:/opt/spark/jars/*"
JOPTS="--add-opens java.base/java.lang=ALL-UNNAMED \
--add-opens java.base/java.lang.invoke=ALL-UNNAMED \
--add-opens java.base/java.lang.reflect=ALL-UNNAMED \
--add-opens java.base/java.io=ALL-UNNAMED \
--add-opens java.base/java.net=ALL-UNNAMED \
--add-opens java.base/java.nio=ALL-UNNAMED \
--add-opens java.base/java.util=ALL-UNNAMED \
--add-opens java.base/java.util.concurrent=ALL-UNNAMED \
--add-opens java.base/java.util.concurrent.atomic=ALL-UNNAMED \
--add-opens java.base/sun.nio.ch=ALL-UNNAMED \
--add-opens java.base/sun.nio.cs=ALL-UNNAMED \
--add-opens java.base/sun.security.action=ALL-UNNAMED \
--add-opens java.base/sun.util.calendar=ALL-UNNAMED \
-Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC -Xmx8g"

log() { echo "[battery $(date +%H:%M:%S)] $*"; }

log "verify dump A (sf0.01)"
rm -rf /tmp/verify_r15_a /tmp/graft_labelprop_* /tmp/graft_ivf_index_*
java -cp "$CP" $JOPTS graft.Verify /root/testdata/sf0.01 /tmp/verify_r15_a \
  > /tmp/battery_verify_a.log 2>&1 || { log "dump A FAILED"; exit 1; }

log "verify dump B (sf0.01, fresh JVM)"
rm -rf /tmp/verify_r15_b /tmp/graft_labelprop_* /tmp/graft_ivf_index_*
java -cp "$CP" $JOPTS graft.Verify /root/testdata/sf0.01 /tmp/verify_r15_b \
  > /tmp/battery_verify_b.log 2>&1 || { log "dump B FAILED"; exit 1; }

log "verify dump sf0.1 (for the sf0.1 parity audit)"
rm -rf /tmp/verify_r15_sf01 /tmp/graft_labelprop_* /tmp/graft_ivf_index_*
java -cp "$CP" $JOPTS graft.Verify /root/testdata/sf0.1 /tmp/verify_r15_sf01 \
  > /tmp/battery_verify_sf01.log 2>&1 || { log "dump sf0.1 FAILED"; exit 1; }

log "local_check at sf0.01"
python3 tools/local_check.py /tmp/verify_r15_a /root/testdata/sf0.01 \
  > /tmp/battery_check_001.log 2>&1
log "local_check at sf0.1"
python3 tools/local_check.py /tmp/verify_r15_sf01 /root/testdata/sf0.1 \
  > /tmp/battery_check_01.log 2>&1
log "determinism A vs B"
python3 tools/determinism_check.py /tmp/verify_r15_a /tmp/verify_r15_b \
  DETERMINISM_r15.json > /tmp/battery_determinism.log 2>&1
log "bit_parity at sf0.01"
python3 tools/bit_parity.py /tmp/verify_r15_a /root/testdata/sf0.01 \
  > /tmp/battery_parity_001.log 2>&1
log "bit_parity at sf0.1"
python3 tools/bit_parity.py /tmp/verify_r15_sf01 /root/testdata/sf0.1 \
  > /tmp/battery_parity_01.log 2>&1

log "plan audit -> PLANS_r15.md"
rm -rf /tmp/graft_labelprop_* /tmp/graft_ivf_index_*
java -cp "$CP" $JOPTS graft.tools.PlanAudit /root/testdata/sf0.001 \
  > PLANS_r15.md 2> /tmp/battery_planaudit.log

log "bench leg sf0.1 x3"
rm -rf /tmp/graft_labelprop_* /tmp/graft_ivf_index_*
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_BENCH_RUNS=3 \
  SPARK_GRAFT_BENCH_OUT=BENCH_SF01_r15.json \
  java -cp "$CP" $JOPTS graft.Bench > /tmp/battery_bench_sf01.log 2>&1

log "bench leg sf1 x5"
rm -rf /tmp/graft_labelprop_* /tmp/graft_ivf_index_*
SPARK_GRAFT_SF_DIR=/dev/shm/graft/sf1 SPARK_GRAFT_BENCH_RUNS=5 \
  SPARK_GRAFT_BENCH_OUT=BENCH_SF1_r15.json \
  java -cp "$CP" $JOPTS graft.Bench > /tmp/battery_bench_sf1.log 2>&1

log "bench leg skew x5"
rm -rf /tmp/graft_labelprop_* /tmp/graft_ivf_index_*
SPARK_GRAFT_SF_DIR=/dev/shm/graft/sf1_skew SPARK_GRAFT_BENCH_RUNS=5 \
  SPARK_GRAFT_BENCH_OUT=BENCH_SKEW_r15.json \
  java -cp "$CP" $JOPTS graft.Bench > /tmp/battery_bench_skew.log 2>&1

log "bench leg 30x x3"
rm -rf /tmp/graft_labelprop_* /tmp/graft_ivf_index_*
SPARK_GRAFT_SF_DIR=/dev/shm/graft/sf30x SPARK_GRAFT_BENCH_RUNS=3 \
  SPARK_GRAFT_BENCH_OUT=BENCH_30X_r15.json \
  java -cp "$CP" $JOPTS graft.Bench > /tmp/battery_bench_30x.log 2>&1

log "ALL LEGS DONE"
