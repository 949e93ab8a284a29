#!/bin/bash
# Block until a quiet hypervisor window: steal <= $1 jiffies (default 5)
# over a 10 s probe, up to $2 attempts (default 90). Exits 0 on quiet,
# 1 if the noise outlasted the budget (caller decides what to do).
BAR=${1:-5}
TRIES=${2:-90}
for i in $(seq 1 "$TRIES"); do
  s0=$(awk '/^cpu /{print $9}' /proc/stat); sleep 10
  s1=$(awk '/^cpu /{print $9}' /proc/stat)
  d=$((s1 - s0))
  if (( d <= BAR )); then echo "quiet after ${i}0s (steal=$d)"; exit 0; fi
  echo "$(date +%T) steal=$d jiffies/10s, waiting"
done
exit 1
