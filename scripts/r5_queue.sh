#!/bin/bash
# Round-5 accuracy queue.
#
# Context (round-4 postmortem): the r4 ms4 regen landed materially worse
# than round 3 (heldout obj_v2v 30.0 -> 37.2 cm, neural center 0.144 ->
# 0.320 m) with NO stage-6 change implicated — the diagnostics put the
# regression in the trained fields, i.e. run-to-run training variance.
# Two nondeterminism sources were since fixed (deterministic loader batch
# order; init batch no longer drawn from an abandoned train-loader
# iterator that perturbed the sample-pool slot cycle), so round 5:
#   1. retrains ms4 deterministically (twice — run A/B loss-curve equality
#      is the determinism evidence) and evals heldout  -> *_ms4_small_r5
#   2. trains the ALREADY-GENERATED ms8 corpus and evals heldout
#      -> fixture_eval_heldout_ms8_small.json (VERDICT r3 item 3, n=8 row)
#   3. release-preset x ms4 at a convergence-matched budget (120 epochs)
#      -> fixture_eval_heldout_ms4_release.json (item 3, second half)
#   4. --fast-gen funnel metric-neutrality A/B vs the r5 ms4 baseline
#   5. hero: best corpus/preset of the above, one tagged heldout run
#      -> fixture_eval_heldout_hero.json (replaces the degenerate r4 hero)
set -x
cd /root/repo

R4="python scripts/run_fixture_eval.py --out fixture_run_ms --train-seqs 4 --net-preset small"
R8="python scripts/run_fixture_eval.py --out fixture_run_ms8 --train-seqs 8 --net-preset small"

# ---- 1. deterministic ms4 retrain, A/B ----
# force retrain: the runner's _done markers would skip the (r4-trained,
# pre-determinism-fix) checkpoints
rm -rf fixture_run_ms/sifnet_small fixture_run_ms/sn_smpl \
       fixture_run_ms/sn_rot fixture_run_ms/infiller
timeout 3600 $R4 --phase train-sif || { echo "QUEUE5 ABORT ms4 train-sif A"; exit 1; }
python - <<'PY'
import json
rows = [json.loads(l) for l in open("fixture_run_ms/sifnet_small/metrics.jsonl")]
keys = [k for k in rows[0] if "loss" in k]
json.dump([{k: r[k] for k in keys if k in r} for r in rows],
          open("/tmp/ms4_train_a.json", "w"))
PY
cp -r fixture_run_ms/sifnet_small /tmp/sifnet_small_runA
rm -rf fixture_run_ms/sifnet_small
timeout 3600 $R4 --phase train-sif || { echo "QUEUE5 ABORT ms4 train-sif B"; exit 1; }
python - <<'PY'
import json
rows = [json.loads(l) for l in open("fixture_run_ms/sifnet_small/metrics.jsonl")]
keys = [k for k in rows[0] if "loss" in k]
b = [{k: r[k] for k in keys if k in r} for r in rows]
a = json.load(open("/tmp/ms4_train_a.json"))
same = a == b
print(f"[queue5] determinism A/B: loss curves identical = {same}")
json.dump({"identical": same, "epochs": len(b)},
          open("results/train_determinism_ab.json", "w"), indent=1)
PY
timeout 5400 $R4 --phase train-sn || { echo "QUEUE5 ABORT ms4 train-sn"; exit 1; }
timeout 3600 $R4 --phase train-inf || { echo "QUEUE5 ABORT ms4 train-inf"; exit 1; }
timeout 9000 $R4 --heldout --recon-tag r5 \
  --heldout-results results/fixture_eval_heldout_ms4_small_r5.json \
  || echo "QUEUE5 ms4 heldout FAILED"
timeout 1800 python scripts/diagnose_fixture.py --run fixture_run_ms \
  --net-preset small --heldout --recon-tag r5 && cp \
  fixture_run_ms/diagnostics_heldout_small_r5.json \
  results/diagnostics_heldout_ms4_small_r5.json

# ---- 2. ms8 corpus (data generated in round 4; train + eval) ----
# the queue2-era seeding copied only meta npz files; the common-prefix
# data dirs live in fixture_run_ms and the loaders resolve --out-relative
for d in data data_s1 data_s2 data_s3 data_heldout; do
  [ -d "fixture_run_ms8/$d" ] || cp -al "fixture_run_ms/$d" "fixture_run_ms8/$d"
done
nice -n 19 python scripts/prewarm_sample_cache.py --out fixture_run_ms8 > /tmp/prewarm8.log 2>&1 &
PREWARM=$!
ok=0
for i in 1 2; do
  timeout 7200 $R8 --phase train-sif && { ok=1; break; } || echo "ms8 train-sif attempt $i rc=$?"
done
kill $PREWARM 2>/dev/null
[ $ok = 1 ] || { echo "QUEUE5 ABORT ms8 train-sif"; exit 1; }
timeout 5400 $R8 --phase train-sn || { echo "QUEUE5 ABORT ms8 train-sn"; exit 1; }
timeout 3600 $R8 --phase train-inf || { echo "QUEUE5 ABORT ms8 train-inf"; exit 1; }
timeout 9000 $R8 --heldout --recon-tag r5 \
  --heldout-results results/fixture_eval_heldout_ms8_small.json \
  || echo "QUEUE5 ms8 heldout FAILED"
timeout 1800 python scripts/diagnose_fixture.py --run fixture_run_ms8 \
  --net-preset small --heldout --recon-tag r5 && cp \
  fixture_run_ms8/diagnostics_heldout_small_r5.json \
  results/diagnostics_heldout_ms8_small.json

# ---- 3. release x ms4, convergence-matched (120 epochs) ----
RR="python scripts/run_fixture_eval.py --out fixture_run_ms --train-seqs 4 --net-preset release --sif-epochs 120"
ok=0
for i in 1 2; do
  timeout 9000 $RR --phase train-sif && { ok=1; break; } || echo "release train-sif attempt $i rc=$?"
done
if [ $ok = 1 ]; then
  timeout 9000 $RR --heldout --recon-tag r5 \
    --heldout-results results/fixture_eval_heldout_ms4_release.json \
    || echo "QUEUE5 release heldout FAILED"
  timeout 1800 python scripts/diagnose_fixture.py --run fixture_run_ms \
    --net-preset release --heldout --recon-tag r5 && cp \
    fixture_run_ms/diagnostics_heldout_release_r5.json \
    results/diagnostics_heldout_ms4_release.json
else
  echo "QUEUE5 release train-sif FAILED (continuing)"
fi

# ---- 4. --fast-gen funnel metric-neutrality vs the r5 ms4 baseline ----
timeout 9000 $R4 --heldout --fast-gen --recon-tag fastgen \
  --heldout-results results/fixture_eval_heldout_ms4_small_fastgen.json \
  || echo "QUEUE5 fastgen FAILED"

# ---- 5a. ocent A/B on the ms8 fields ----
# Round 4 measured ocent neutral-to-harmful on the (regressed) ms4 fields.
# The question it was built for (VERDICT r3 item 1) is whether anchoring
# object translation to the NEURAL centers helps when those centers are
# good — which is exactly what a bigger corpus improves. Re-ask on ms8.
timeout 9000 $R8 --heldout --ocent 1.0 --recon-tag oc1 \
  --heldout-results results/fixture_eval_heldout_ms8_small_oc1.json \
  || echo "QUEUE5 ms8 ocent FAILED"

# ---- 5b. hero: copy the best heldout result with provenance ----
# (a re-track of the winning config would be a bitwise duplicate — the
# track is deterministic; the r4 hero was exactly that degenerate copy)
python - <<'PY'
import json, os

CANDS = {
    "ms4_small_r5 (ocent=0)": "fixture_eval_heldout_ms4_small_r5.json",
    "ms8_small (ocent=0)": "fixture_eval_heldout_ms8_small.json",
    "ms8_small ocent=1": "fixture_eval_heldout_ms8_small_oc1.json",
    "ms4_release (ocent=0)": "fixture_eval_heldout_ms4_release.json",
    "ms4_small_fastgen": "fixture_eval_heldout_ms4_small_fastgen.json",
}
best, bv = None, None
for cfg, name in CANDS.items():
    try:
        with open(os.path.join("results", name)) as f:
            d = json.load(f)
        v = d["W1_chore_protocol"]["obj_v2v"]["mean"]
    except Exception:
        continue
    if bv is None or v < bv:
        best, bv, bd = (cfg, name), v, d
DIAGS = {
    "fixture_eval_heldout_ms4_small_r5.json":
        "diagnostics_heldout_ms4_small_r5.json",
    "fixture_eval_heldout_ms8_small.json":
        "diagnostics_heldout_ms8_small.json",
    "fixture_eval_heldout_ms4_release.json":
        "diagnostics_heldout_ms4_release.json",
}
if best is not None:
    dg = DIAGS.get(best[1])
    if dg and os.path.exists(os.path.join("results", dg)):
        import shutil
        shutil.copy(os.path.join("results", dg),
                    "results/diagnostics_heldout_hero.json")
    bd["hero_config"] = best[0]
    bd["hero_source"] = best[1]
    bd["note2"] = ("hero = best round-5 heldout config, copied from its "
                   "source eval (re-tracking an identical config yields a "
                   "bitwise-identical result — the track is deterministic)")
    with open("results/fixture_eval_heldout_hero.json", "w") as f:
        json.dump(bd, f, indent=1)
    print(f"[queue5] hero = {best[0]} obj_v2v {bv:.2f} cm")
PY

echo "QUEUE5 DONE"
