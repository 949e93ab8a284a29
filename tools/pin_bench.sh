#!/bin/bash
# Gated tri-SF bench pinning (SURVEY §23h / r9 verdict #1 protocol):
# this VM takes bursty hypervisor CPU steal, so a record is only kept
# when (a) a 10 s idle pre-gate shows <= 5 jiffies of steal AND
# (b) the bench's own cpu_steal_sec comes back <= the bar. Polluted
# windows are discarded and retried on the next cycle — the host
# quiesces in epochs, so the loop just has to outlast the noise.
#
# Usage: tools/pin_bench.sh <tag> [bar_seconds]    (from /root/repo)
# Writes tools/bench_sf{01,1,3}_checksum_<tag>.json as each SF lands.
set -u
cd /root/repo
TAG=${1:?tag}
BAR=${2:-5.0}

try_record() { # $1 sfdir  $2 outfile
  local s0 s1 steal
  s0=$(awk '/^cpu /{print $9}' /proc/stat); sleep 10
  s1=$(awk '/^cpu /{print $9}' /proc/stat)
  if (( s1 - s0 > 5 )); then
    echo "$(date +%T) SKIP $1 idle-gate $((s1 - s0)) jiffies"; return 1
  fi
  SPARK_GRAFT_SF_DIR=$1 SPARK_GRAFT_CPUS=32 sbt -batch 'runMain graft.Bench' >/dev/null 2>&1
  steal=$(python3 -c "import json;print(json.load(open('BENCH_DETAIL.json'))['cpu_steal_sec'])")
  # keep the lowest-steal attempt per SF regardless: if no window ever
  # clears the bar, the best polluted record is the honest upper bound
  python3 - "$1" "$steal" <<'PY'
import json, os, sys
sf, steal = sys.argv[1], float(sys.argv[2])
name = os.path.basename(sf.rstrip('/')).replace('.', '')
best = f"/tmp/best_attempt_{name}.json"
prev = json.load(open(best))["cpu_steal_sec"] if os.path.exists(best) else 1e18
if steal < prev:
    open(best, "w").write(open("BENCH_DETAIL.json").read())
PY
  if python3 -c "import sys; sys.exit(0 if $steal <= $BAR else 1)"; then
    cp BENCH_DETAIL.json "$2"
    echo "$(date +%T) RECORDED $2 steal=$steal"
  else
    echo "$(date +%T) POLLUTED $1 steal=$steal (bar $BAR)"; return 1
  fi
}

while :; do
  done_all=1
  for spec in "/root/testdata/sf0.1 tools/bench_sf01_checksum_${TAG}.json" \
              "/tmp/sf1 tools/bench_sf1_checksum_${TAG}.json" \
              "/tmp/sf3 tools/bench_sf3_checksum_${TAG}.json"; do
    set -- $spec
    if [ ! -f "$2" ]; then
      done_all=0
      try_record "$1" "$2" || true
    fi
  done
  [ "$done_all" = 1 ] && { echo "ALL_PINNED"; break; }
  sleep 120
done
