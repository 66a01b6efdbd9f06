#!/bin/bash
# Probe the host; on a >=0.85 reading immediately run THE 384k 2-vs-8 pair
# (hi leg first — see bench.py run_scaling).  ~55 min per attempt; at most
# 2 attempts.  Exit 0 when a pair achieves engine efficiency >= 0.8.
LOG=/root/repo/.probe_watch.log
cd /root/repo
attempts=0
end=$((SECONDS + 10800))
while [ $SECONDS -lt $end ] && [ $attempts -lt 2 ]; do
  out=$(timeout 300 python tools/host_probe.py 2 8 2>/dev/null)
  eff=$(printf '%s' "$out" | python -c "import sys,json
try: print(json.load(sys.stdin).get('hw_eff',0))
except Exception: print(0)")
  echo "$(date +%F\ %T) eff=$eff" >> "$LOG"
  ok=$(python -c "print(1 if float('${eff:-0}')>=0.85 else 0)")
  if [ "$ok" = "1" ]; then
    attempts=$((attempts+1))
    echo "$(date +%F\ %T) LAUNCH 384k attempt $attempts (hi-first)" >> "$LOG"
    python bench.py --scaling 384000 2 8 \
      > "BENCH_SCALING_r04_384k_attempt${attempts}.json" \
      2> .scaling_err.log
    eff2=$(python -c "import json
try: print(json.load(open('BENCH_SCALING_r04_384k_attempt${attempts}.json'))['scaling_efficiency'])
except Exception: print(0)")
    echo "$(date +%F\ %T) RESULT 384k attempt $attempts engine_eff=$eff2" >> "$LOG"
    pass=$(python -c "print(1 if float('${eff2:-0}')>=0.8 else 0)")
    if [ "$pass" = "1" ]; then echo "GATE MET" >> "$LOG"; exit 0; fi
  else
    sleep 150
  fi
done
echo "DONE attempts=$attempts $(date +%F\ %T)" >> "$LOG"
exit 1
