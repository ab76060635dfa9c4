#!/bin/bash
# Round-10 gate-config sweep: the driver benches at local[32] (SPARK_GRAFT_CPUS=32)
# but every prior knob sweep ran at 4 threads. Rank the knobs at 32, REPS=1,
# then confirm the winner at REPS=3.
set -u
cd /root/repo
SF=${SF:-/root/testdata/sf0.1}
run() {
  local tag="$1"; shift
  echo "=== $tag ($*) $(date +%T) load=$(cut -d' ' -f1 /proc/loadavg)"
  env SPARK_GRAFT_SF_DIR="$SF" SPARK_GRAFT_CPUS=32 SPARK_GRAFT_BENCH_REPS=1 "$@" \
    sbt -batch "runMain graft.Bench" > "/tmp/sweep32_$tag.log" 2>&1
  grep -h '"metric"' "/tmp/sweep32_$tag.log" | python3 -c '
import json,sys
d=json.loads(sys.stdin.read())
t=d["totals"]
print(f"  total={d[\"value\"]} cold={t[\"cold_single_shot\"]} floor={t[\"floor\"]} regime={d[\"regime\"]} sent={d[\"sent_ms\"]}")'
  grep -h "\[bench\] regime" "/tmp/sweep32_$tag.log" | sed 's/^/  /'
}
run base
run sh32  SPARK_GRAFT_SHUFFLE=32
run sh16  SPARK_GRAFT_SHUFFLE=16
run aqe   SPARK_GRAFT_AQE=true
run mpb32 SPARK_GRAFT_MPB=32m
run mem16 SPARK_DRIVER_MEM=16g
echo "=== done $(date +%T)"
