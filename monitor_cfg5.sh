#!/bin/bash
# Round-5 HBM-recovery monitor: probe the chip every ~4 min; once >=4 GB is
# allocatable again, run the config5 recapture (which has its own re-exec
# recovery). Detached via setsid; status in /tmp/cfg5_monitor.log.
cd /root/repo
NEED_MB=${NEED_MB:-4096}
MAX_ITERS=${MAX_ITERS:-60}
for i in $(seq 1 "$MAX_ITERS"); do
  echo "[monitor] $(date +%T) probe iteration $i"
  out=$(timeout 420 python probe_size.py 2>>/tmp/cfg5_probe.err)
  mb=$(echo "$out" | sed -n 's/^max_ok_mb=//p')
  echo "[monitor] $(date +%T) max_ok_mb=${mb:-timeout}"
  if [ -n "$mb" ] && [ "$mb" -ge "$NEED_MB" ]; then
    echo "[monitor] $(date +%T) chip recovered (${mb} MB); launching config5"
    CFG5_UPLOAD=chunked timeout 7200 python bench_config5.py > /tmp/cfg5_r05c.out 2>/tmp/cfg5_r05c.err
    rc=$?
    echo "[monitor] $(date +%T) config5 rc=$rc"
    exit $rc
  fi
  sleep 240
done
echo "[monitor] $(date +%T) gave up after $MAX_ITERS probes"
exit 1
