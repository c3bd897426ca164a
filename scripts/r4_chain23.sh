#!/bin/bash
# Round-4 session-4 chain: wait for queue1b (regression localization +
# VERDICT 1a/1b/5 sweeps) to exit, then run queue2 (ms8 corpus-scaling +
# convergence-matched release + fast-gen neutrality) and queue3 (hero
# config combining the winners).  Survives this Claude session; progress
# is visible in /tmp/queue{2,3}.log.
set -x
cd /root/repo
Q1B_PID="$(cat /tmp/queue1b.pid 2>/dev/null)"
if [ -n "$Q1B_PID" ]; then
  while kill -0 "$Q1B_PID" 2>/dev/null; do sleep 60; done
fi
bash scripts/r4_queue2.sh > /tmp/queue2.log 2>&1
bash scripts/r4_queue3.sh > /tmp/queue3.log 2>&1
echo "CHAIN23 DONE"
