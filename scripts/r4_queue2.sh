#!/bin/bash
# Round-4 accuracy queue #2 (VERDICT r3 item 3 + funnel validation).
#
# Prereq: queue1 finished (fixture_run_ms exists with trained small-preset
# checkpoints).  Seeds fixture_run_ms8 from ms4's generated sequences
# (meta paths point into fixture_run_ms — shared read-only data) and its
# sample cache (global frame indices 0..359 are identical for the common
# 4-sequence prefix), so only s4..s7 generate fresh.
#
# Outputs:
#   results/fixture_eval_heldout_ms8_small.json   corpus-scaling n=8 row
#   results/fixture_eval_heldout_ms4_release.json release x ms4 at a
#       convergence-matched budget (120 epochs vs small's 60 — the r2
#       release run was undertrained at 60: df_h 25.0 vs small 14.4)
#   results/fixture_eval_heldout_ms4_small_fastgen.json  --fast-gen
#       funnel-harvest metric-neutrality check vs the queue1 baseline
set -x
cd /root/repo

# ---- ms8 corpus ----
mkdir -p fixture_run_ms8
cp -n fixture_run_ms/fixture_meta*.npz fixture_run_ms8/ 2>/dev/null
cp -n fixture_run_ms/fixture2_meta.npz fixture_run_ms8/ 2>/dev/null
[ -d fixture_run_ms8/sample_cache_s2500_g0.15 ] || \
  cp -al fixture_run_ms/sample_cache_s2500_g0.15 fixture_run_ms8/
R8="python scripts/run_fixture_eval.py --out fixture_run_ms8 --train-seqs 8 --net-preset small"
timeout 3600 $R8 --phase generate || { echo "QUEUE2 ABORT ms8 generate"; exit 1; }
nice -n 19 python scripts/prewarm_sample_cache.py --out fixture_run_ms8 > /tmp/prewarm8.log 2>&1 &
PREWARM=$!
ok=0
for i in 1 2 3; do
  timeout 9000 $R8 --phase train-sif && { ok=1; break; } || echo "ms8 train-sif attempt $i rc=$?"
done
kill $PREWARM 2>/dev/null
[ $ok = 1 ] || { echo "QUEUE2 ABORT ms8 train-sif"; exit 1; }
timeout 5400 $R8 --phase train-sn || { echo "QUEUE2 ABORT ms8 train-sn"; exit 1; }
timeout 3600 $R8 --phase train-inf || { echo "QUEUE2 ABORT ms8 train-inf"; exit 1; }
timeout 7200 $R8 --heldout \
  --heldout-results results/fixture_eval_heldout_ms8_small.json \
  || echo "ms8 heldout FAILED"
timeout 1800 python scripts/diagnose_fixture.py --run fixture_run_ms8 \
  --net-preset small --heldout && cp \
  fixture_run_ms8/diagnostics_heldout_small.json \
  results/diagnostics_heldout_ms8_small.json

# ---- release x ms4 at a convergence-matched budget ----
RR="python scripts/run_fixture_eval.py --out fixture_run_ms --train-seqs 4 --net-preset release --sif-epochs 120"
nice -n 19 python scripts/prewarm_sample_cache.py --out fixture_run_ms > /tmp/prewarm_rel.log 2>&1 &
PREWARM=$!
ok=0
for i in 1 2 3; do
  timeout 9000 $RR --phase train-sif && { ok=1; break; } || echo "release train-sif attempt $i rc=$?"
done
kill $PREWARM 2>/dev/null
if [ $ok = 1 ]; then
  timeout 7200 $RR --heldout \
    --heldout-results results/fixture_eval_heldout_ms4_release.json \
    || echo "release heldout FAILED"
  timeout 1800 python scripts/diagnose_fixture.py --run fixture_run_ms \
    --net-preset release --heldout && cp \
    fixture_run_ms/diagnostics_heldout_release.json \
    results/diagnostics_heldout_ms4_release.json
else
  echo "QUEUE2 release train-sif FAILED (continuing)"
fi

# ---- --fast-gen funnel validation on the ms4 small baseline ----
RS="python scripts/run_fixture_eval.py --out fixture_run_ms --train-seqs 4 --net-preset small"
timeout 7200 $RS --heldout --fast-gen --recon-tag fastgen \
  --heldout-results results/fixture_eval_heldout_ms4_small_fastgen.json \
  || echo "fastgen FAILED"

echo "QUEUE2 DONE"
