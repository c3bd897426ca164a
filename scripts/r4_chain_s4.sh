#!/bin/bash
# Round-4 session-4 resume chain: queue1b (training phases fast-skip via
# DONE markers; resumes at the heldout baseline track) -> queue2 -> queue3.
set -x
cd /root/repo
bash scripts/r4_queue1b.sh > /tmp/queue1b.log 2>&1
bash scripts/r4_queue2.sh > /tmp/queue2.log 2>&1
bash scripts/r4_queue3.sh > /tmp/queue3.log 2>&1
echo "CHAIN_S4 DONE"
