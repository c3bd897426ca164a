#!/bin/bash
# Round-4 session-3 queue: regenerate the ms4 corpus + checkpoints (the
# VM wipe killed the session-2 artifacts), then localize the r4 accuracy
# regression (48.7 vs round-3's 30.0 cm heldout obj_v2v) before running
# the VERDICT sweeps:
#   1. baseline track+eval+diagnostics      -> *_r4b.json
#      (diagnostics split fields [neural_center, rot_init: training-side]
#       from stage 6 [rot_final, t_final: track-side] vs round-3 numbers)
#   2. same checkpoints, --sil-backend xla  -> *_xsil.json
#      (isolates the Pallas soft-sil kernel from everything else)
#   3. VERDICT item 1b: per-term translation ablation
#   4. VERDICT item 1a: ocent sweep {0.25, 1, 25}
#   5. VERDICT item 5:  collision ON pair
set -x
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
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

# 1. baseline (current defaults = the session-2 conditions)
timeout 7200 $R --heldout --heldout-results results/fixture_eval_heldout_ms4_small_r4b.json \
  || echo "heldout baseline FAILED"
timeout 1800 $D && cp fixture_run_ms/diagnostics_heldout_small.json \
  results/diagnostics_heldout_ms4_small_r4b.json

# 2. sil-kernel A/B off the SAME checkpoints
timeout 7200 $R --heldout --sil-backend xla --recon-tag xsil \
  --heldout-results results/fixture_eval_heldout_ms4_small_xsil.json \
  || echo "RUN xsil FAILED"
timeout 1800 $D --recon-tag xsil && cp \
  fixture_run_ms/diagnostics_heldout_small_xsil.json \
  results/diagnostics_heldout_ms4_small_xsil.json

# train-pool eval (baseline kernels) for the train-vs-heldout split
timeout 5400 $R --results results/fixture_eval_ms4_small_r4b.json --phase track || echo "track FAILED"
timeout 1800 $R --results results/fixture_eval_ms4_small_r4b.json --phase eval || echo "eval FAILED"

# 3. item 1b: which weighted term pulls obj_t off the neural init?
timeout 3600 python scripts/ablate_stage6_terms.py --run fixture_run_ms \
  --net-preset small --heldout \
  --out results/stage6_term_ablation_heldout_ms4.json || echo "ablation FAILED"

# 4. item 1a: the ocent sweep
for spec in "0.25 oc025" "1.0 oc1" "25.0 oc25"; do
  set -- $spec; w=$1; tag=$2
  timeout 7200 $R --heldout --ocent $w --recon-tag $tag \
    --heldout-results "results/fixture_eval_heldout_ms4_small_${tag}.json" \
    || { echo "RUN $tag FAILED"; continue; }
  timeout 1800 $D --recon-tag $tag && cp \
    "fixture_run_ms/diagnostics_heldout_small_${tag}.json" \
    "results/diagnostics_heldout_ms4_small_${tag}.json"
done

# 5. item 5: collision on/off pair (off = the baseline above)
timeout 7200 $R --heldout --collision --recon-tag coll \
  --heldout-results results/fixture_eval_heldout_ms4_small_coll.json \
  || echo "RUN coll FAILED"
timeout 1800 $D --recon-tag coll && cp \
  fixture_run_ms/diagnostics_heldout_small_coll.json \
  results/diagnostics_heldout_ms4_small_coll.json

echo "QUEUE1B DONE"
