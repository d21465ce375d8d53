#!/bin/bash
# Steal-guarded subset bench: runs graft.Bench on a query subset, printing
# the per-query JSON plus the hypervisor steal-time delta over the run —
# this host takes episodic CPU steal (measured: 2% cumulative, bursty), so
# a capture with a large steal delta is contaminated and must be re-run.
# Usage: ab_bench.sh <queries-csv> [sfDir]
set -e
CSV="$1"; SF="${2:-/root/testdata/sf0.1}"
cd /root/repo
CP=$(ls /opt/spark/jars/*.jar | tr '\n' ':')target/scala-2.13/classes
steal() { awk '/^cpu /{print $9}' /proc/stat; }
S0=$(steal)
OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net java.nio \
         java.util java.util.concurrent java.util.concurrent.atomic \
         sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  OPENS="$OPENS --add-opens=java.base/$p=ALL-UNNAMED"
done
SPARK_GRAFT_SF_DIR="$SF" SPARK_GRAFT_CPUS=32 \
  java -Xmx24g $OPENS -cp "$CP" graft.Bench "$CSV" 2>/dev/null \
  | grep -o '"queries":{[^}]*}' | head -1
S1=$(steal)
echo "steal_delta_ticks:$((S1 - S0))"
