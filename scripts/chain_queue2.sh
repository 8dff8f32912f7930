#!/bin/bash
# Wait for run_chip_queue.sh to finish (or stop), then run queue 2.
# Launch detached: bash scripts/chain_queue2.sh & echo $! > /tmp/chain2.pid
while true; do
  if grep -q "QUEUE DONE\|STOPPED by" /tmp/chipq.log 2>/dev/null; then
    break
  fi
  sleep 60
done
# a stop request also stops the chain
if grep -q "STOPPED by" /tmp/chipq.log 2>/dev/null; then
  echo "queue1 was stopped; not starting queue2" >> /tmp/chipq2.log
  exit 0
fi
bash /root/repo/scripts/run_chip_queue2.sh
