#!/bin/bash
# Round-10 follow-up: clean base + shuffle-width ladder at CPUS=32 (first
# sweep's base was contaminated by a concurrent test run), plus the
# leader +mem combo. Sequential, quiet host required.
set -u
cd /root/repo
SF=${SF:-/root/testdata/sf0.1}
run() {
  local tag="$1"; shift
  echo "=== $tag ($*) $(date +%T) load=$(cut -d' ' -f1 /proc/loadavg)"
  env SPARK_GRAFT_SF_DIR="$SF" SPARK_GRAFT_CPUS=32 SPARK_GRAFT_BENCH_REPS="${REPS:-1}" "$@" \
    sbt -batch "runMain graft.Bench" > "/tmp/sweep32_$tag.log" 2>&1
  grep -h '"metric"' "/tmp/sweep32_$tag.log" | python3 -c '
import json,sys
d=json.loads(sys.stdin.read())
t=d["totals"]
print("  total", d["value"], "cold", t["cold_single_shot"], "floor", t["floor"], "load", d["load"], "sent", d["sent_ms"])'
}
run sh8b
run sh12   SPARK_GRAFT_SHUFFLE=12
run sh16b  SPARK_GRAFT_SHUFFLE=16
run sh24   SPARK_GRAFT_SHUFFLE=24
run sh16m16 SPARK_GRAFT_SHUFFLE=16 SPARK_DRIVER_MEM=16g
echo "=== done $(date +%T)"
