#!/usr/bin/env bash
# Hostile-config correctness sweeps (round-7 verdict task #7): runs the
# full Verify dump + DuckDB oracle compare under seven adversarial Spark
# configurations. The engine's exact-decimal layer buys the property that
# results are BIT-IDENTICAL under any physical plan — AQE re-plans, join
# strategy changes, parallelism changes, reader implementation, and fully
# interpreted (no-codegen) execution must all produce the same bytes.
# This script makes that property reproducible in one command instead of
# five hand-typed SPARK_GRAFT_CONF invocations.
#
# Usage: tools/sweep.sh [SF_DIR]      (default /root/testdata/sf0.01)
# Exit 0 iff all seven sweeps pass every oracle-checked query.
set -u
cd "$(dirname "$0")/.."
SF=${1:-/root/testdata/sf0.01}

# one compile up front; each sweep then invokes the JVM directly (sbt
# startup ×5 would dominate the wall time)
sbt -batch compile >/dev/null || { echo "sweep: compile failed"; exit 2; }

CP="target/scala-2.13/classes:/opt/spark/jars/*"
ADDOPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net \
         java.nio java.util java.util.concurrent java.util.concurrent.atomic \
         sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  ADDOPENS="$ADDOPENS --add-opens java.base/$p=ALL-UNNAMED"
done

declare -A CONFS CPUS
ORDER="aqe_off broadcast_off parallel_13 row_reader interpreted rewrites_off reliable_ckpt"
CONFS[aqe_off]="spark.sql.adaptive.enabled=false"
CONFS[broadcast_off]="spark.sql.autoBroadcastJoinThreshold=-1;spark.sql.adaptive.autoBroadcastJoinThreshold=-1"
CONFS[parallel_13]=""             # odd-width parallelism, no conf override
CONFS[row_reader]="spark.sql.parquet.enableVectorizedReader=false;spark.sql.files.maxPartitionBytes=65536"
CONFS[interpreted]="spark.sql.codegen.wholeStage=false;spark.sql.codegen.factoryMode=NO_CODEGEN"
# graft's own optimizer rules off: q140 et al must return identical rows
# through Spark's naive (nested-loop) plans — rewrites are plan-only
CONFS[rewrites_off]="spark.graft.rewrite.bandJoin.enabled=false"
# every iterative loop on RELIABLE checkpoints: the executor-loss-
# survivable mode must be bit-identical to the default local mode
CONFS[reliable_ckpt]="spark.graft.iterate.checkpointMode=reliable;spark.graft.iterate.checkpointDir=/tmp/graft_sweep_ckpt"
CPUS[aqe_off]=8; CPUS[broadcast_off]=8; CPUS[parallel_13]=13
CPUS[row_reader]=8; CPUS[interpreted]=8; CPUS[rewrites_off]=8
CPUS[reliable_ckpt]=8

overall=0
for name in $ORDER; do
  out="/tmp/sweep_$name"
  rm -rf "$out"
  # reliable-mode checkpoints are not reference-cleaned by default; a
  # stale dir otherwise grows without bound across sweep runs
  [ "$name" = reliable_ckpt ] && rm -rf /tmp/graft_sweep_ckpt
  echo "=== sweep: $name (cpus=${CPUS[$name]} conf='${CONFS[$name]}') ==="
  if ! SPARK_GRAFT_CPUS="${CPUS[$name]}" SPARK_GRAFT_CONF="${CONFS[$name]}" \
      java $ADDOPENS -Xmx8g -cp "$CP" graft.Verify "$SF" "$out" \
      2>"$out.err"; then
    echo "sweep $name: Verify FAILED (see $out.err)"; tail -5 "$out.err"
    overall=1; continue
  fi
  log="$out.check"
  # a crashed checker (nonzero exit, or no summary line) must FAIL the
  # sweep — zero '^FAIL' lines in a traceback is not a green gate
  if ! python3 tools/local_check.py "$SF" "$out" >"$log" 2>&1; then
    echo "sweep $name: local_check CRASHED (see $log)"; tail -5 "$log"
    overall=1; continue
  fi
  summary=$(grep -E '^[0-9]+/[0-9]+ oracle-checked queries pass$' "$log" | tail -1)
  fails=$(grep -c '^FAIL' "$log" || true)
  tail -1 "$log"
  n_ok=${summary%%/*}
  total=$(echo "$summary" | sed 's|^[0-9]*/\([0-9]*\) .*|\1|')
  if [ -z "$summary" ]; then
    echo "sweep $name: NO SUMMARY LINE from local_check (see $log)"
    overall=1
  elif [ "$fails" -ne 0 ] || [ "$n_ok" != "$total" ]; then
    echo "sweep $name: $fails ORACLE FAILURES ($summary)"
    grep '^FAIL' "$log" | head -5
    overall=1
  else
    echo "sweep $name: PASS ($summary)"
  fi
done
[ $overall -eq 0 ] && echo "ALL 7 SWEEPS GREEN" || echo "SWEEP FAILURES (see /tmp/sweep_*.check)"
exit $overall
