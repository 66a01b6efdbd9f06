#!/bin/bash
# Polls host_probe and exits 0 when two consecutive readings are >= 0.85.
LOG=/root/repo/.probe_watch.log
: > "$LOG"
count=0
end=$((SECONDS + 19800))
while [ $SECONDS -lt $end ]; do
  out=$(timeout 300 python /root/repo/tools/host_probe.py 2 8 2>/dev/null)
  eff=$(printf '%s' "$out" | python -c "import sys,json
try: print(json.load(sys.stdin).get('hw_eff',0))
except Exception: print(0)")
  echo "$(date +%F\ %T) eff=$eff" >> "$LOG"
  ok=$(python -c "print(1 if float('${eff:-0}')>=0.85 else 0)")
  if [ "$ok" = "1" ]; then count=$((count+1)); else count=0; fi
  if [ "$count" -ge 2 ]; then echo "WINDOW OPEN $(date +%F\ %T)" >> "$LOG"; exit 0; fi
  sleep 180
done
echo "TIMEOUT $(date +%F\ %T)" >> "$LOG"
exit 1
