#!/bin/bash
# Tunnel watcher: probe the TPU tunnel every 5 min; the first time it
# answers, fire the chip measurement queue (scripts/run_chip_queue.sh) and
# exit. Launch DETACHED:
#   nohup scripts/tunnel_watch.sh > /dev/null 2>&1 &
#   echo $! > /tmp/tunnel_watch.pid
# Log: /tmp/tunnel_watch.log. Stop: kill $(cat /tmp/tunnel_watch.pid).
# NEVER run alongside another TPU process (CLAUDE.md: one TPU proc only —
# the probe itself briefly counts as it).
set -u
cd /root/repo
W=/tmp/tunnel_watch.log
while true; do
  if timeout 90 python -c "
import jax, numpy as np
x = jax.numpy.ones((128, 128))
np.asarray(x @ x)
print('up')" > /dev/null 2>&1; then
    echo "UP $(date -u) — launching chip queue" >> "$W"
    bash "${CHIP_QUEUE:-scripts/chip_queue_r4.sh}"
    echo "queue finished $(date -u)" >> "$W"
    exit 0
  fi
  echo "down $(date -u)" >> "$W"
  sleep 300
done
