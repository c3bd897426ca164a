#!/bin/bash
# Round-4 accuracy queue #1: the ocent sweep (VERDICT r3 item 1a) + the
# collision on/off pair (item 5), on the existing ms4 small-preset
# checkpoints (fixture_run_ms). Each run re-tracks the HELD-OUT sequence
# into its own recon dir (--recon-tag) and writes its own results JSON.
set -x
cd /root/repo
for spec in "0.25 oc025" "1.0 oc1" "25.0 oc25"; do
  set -- $spec
  w=$1; tag=$2
  timeout 5400 python scripts/run_fixture_eval.py \
    --out fixture_run_ms --train-seqs 4 --net-preset small --heldout \
    --ocent "$w" --recon-tag "$tag" \
    --heldout-results "results/fixture_eval_heldout_ms4_small_${tag}.json" \
    || echo "RUN $tag FAILED rc=$?"
done
timeout 5400 python scripts/run_fixture_eval.py \
  --out fixture_run_ms --train-seqs 4 --net-preset small --heldout \
  --collision --recon-tag coll \
  --heldout-results results/fixture_eval_heldout_ms4_small_coll.json \
  || echo "RUN coll FAILED rc=$?"
echo "QUEUE DONE"
