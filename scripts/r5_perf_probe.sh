#!/bin/bash
# Round-5 quiet-window perf probes (run when the accuracy queue is in a
# host-bound phase): segment-dispatch overhead, sil kernel step cost on
# both scenes, and the stage-6 bench phase. One log per probe under
# /tmp/r5perf/.
set -x
mkdir -p /tmp/r5perf
cd /root/repo
date > /tmp/r5perf/when.txt
timeout 600 python scripts/probe_segment_overhead.py > /tmp/r5perf/segover.log 2>&1
timeout 900 python scripts/bench_sil_phase.py --scene grid --chunks 512 > /tmp/r5perf/sil_grid.log 2>&1
timeout 900 python scripts/bench_sil_phase.py --scene random --chunks 512 > /tmp/r5perf/sil_rand.log 2>&1
timeout 1800 python bench.py --phase stage6 --stage6-batch 8 > /tmp/r5perf/stage6.log 2>&1
echo PROBES DONE
