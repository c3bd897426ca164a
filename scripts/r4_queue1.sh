#!/bin/bash
# Round-4 accuracy queue #1 (VERDICT r3 items 1a/1b/5).
#
# Untracked run artifacts are wiped between rounds, so the ms4 corpus +
# small-preset checkpoints from round 3 must be regenerated before the
# sweep can run.  Phases are sequential (one TPU, one host core); each
# has its own timeout and train-sif retries through orbax resume (the
# known axon futex-hang mode, STATUS round-2 session 7).
#
# Outputs (all under results/):
#   fixture_eval_ms4_small_r4.json          train-pool eval, post sil-fix
#   fixture_eval_heldout_ms4_small_r4.json  heldout baseline (w_ocent=0)
#   stage6_term_ablation_heldout_ms4.json   per-term translation pulls
#   fixture_eval_heldout_ms4_small_oc{025,1,25}.json  ocent sweep
#   fixture_eval_heldout_ms4_small_coll.json          collision ON
#   diagnostics_heldout_ms4_small_{r4,oc*,coll}.json  per-stage centers
set -x
cd /root/repo
R="python scripts/run_fixture_eval.py --out fixture_run_ms --train-seqs 4 --net-preset small"
D="python scripts/diagnose_fixture.py --run fixture_run_ms --net-preset small --heldout"

timeout 3600 $R --phase generate || { echo "QUEUE ABORT generate rc=$?"; exit 1; }
nice -n 19 python scripts/prewarm_sample_cache.py --out fixture_run_ms > /tmp/prewarm.log 2>&1 &
PREWARM=$!
ok=0
for i in 1 2 3; do
  timeout 7200 $R --phase train-sif && { ok=1; break; } || echo "train-sif attempt $i rc=$?"
done
kill $PREWARM 2>/dev/null
[ $ok = 1 ] || { echo "QUEUE ABORT train-sif"; exit 1; }
timeout 3600 $R --phase train-sn || { echo "QUEUE ABORT train-sn"; exit 1; }
timeout 3600 $R --phase train-inf || { echo "QUEUE ABORT train-inf"; exit 1; }
timeout 5400 $R --results results/fixture_eval_ms4_small_r4.json --phase track || echo "track FAILED"
timeout 1800 $R --results results/fixture_eval_ms4_small_r4.json --phase eval || echo "eval FAILED"

timeout 7200 $R --heldout --heldout-results results/fixture_eval_heldout_ms4_small_r4.json \
  || echo "heldout baseline FAILED"
timeout 1800 $D && cp fixture_run_ms/diagnostics_heldout_small.json \
  results/diagnostics_heldout_ms4_small_r4.json

# item 1b: which weighted term pulls obj_t off the neural init?
timeout 3600 python scripts/ablate_stage6_terms.py --run fixture_run_ms \
  --net-preset small --heldout \
  --out results/stage6_term_ablation_heldout_ms4.json || echo "ablation FAILED"

# item 1a: the ocent sweep
for spec in "0.25 oc025" "1.0 oc1" "25.0 oc25"; do
  set -- $spec; w=$1; tag=$2
  timeout 7200 $R --heldout --ocent $w --recon-tag $tag \
    --heldout-results "results/fixture_eval_heldout_ms4_small_${tag}.json" \
    || { echo "RUN $tag FAILED"; continue; }
  timeout 1800 $D --recon-tag $tag && cp \
    "fixture_run_ms/diagnostics_heldout_small_${tag}.json" \
    "results/diagnostics_heldout_ms4_small_${tag}.json"
done

# item 5: collision on/off pair (off = the baseline above)
timeout 7200 $R --heldout --collision --recon-tag coll \
  --heldout-results results/fixture_eval_heldout_ms4_small_coll.json \
  || echo "RUN coll FAILED"
timeout 1800 $D --recon-tag coll && cp \
  fixture_run_ms/diagnostics_heldout_small_coll.json \
  results/diagnostics_heldout_ms4_small_coll.json

echo "QUEUE1 DONE"
