#!/bin/bash
# Round-4 hero run: combine the winners of queue1/queue2 into one
# best-config heldout eval.
#
# Decision inputs (all produced by queue1/queue2):
#   fixture_eval_heldout_ms4_small_r4.json       ocent=0 / no-collision baseline
#   fixture_eval_heldout_ms4_small_oc{025,1,25}.json   ocent sweep
#   fixture_eval_heldout_ms4_small_coll.json     collision ON
#   fixture_eval_heldout_ms8_small.json          ms8 fields (queue2)
#
# Picks: the corpus whose heldout obj_v2v is lower (ms4 vs ms8 fields),
# the best ocent weight, collision iff it beat the baseline.  Runs one
# heldout track+eval with that configuration tagged `hero`.
set -x
cd /root/repo

# Re-run the sil-backend A/B first: the original xsil run was VOID — the
# orchestrator's hand-maintained forward list dropped --sil-backend, so
# the "xla" track ran the pallas default and produced a bitwise-identical
# recon pack (which did prove the track itself is deterministic).
# forwarded_args() is parser-derived now; recon-tag xsil2 forces a fresh
# track.
timeout 7200 python scripts/run_fixture_eval.py --out fixture_run_ms \
  --train-seqs 4 --net-preset small --heldout --sil-backend xla \
  --recon-tag xsil2 \
  --heldout-results results/fixture_eval_heldout_ms4_small_xsil.json \
  || echo "QUEUE3 xsil re-run FAILED"

read -r RUN OCENT COLL <<EOF
$(python - <<'PY'
import json, os

def v2v(name):
    p = os.path.join("results", name)
    try:
        with open(p) as f:
            return json.load(f)["W1_chore_protocol"]["obj_v2v"]["mean"]
    except Exception:
        return None

base = v2v("fixture_eval_heldout_ms4_small_r4b.json")
if base is None:
    # queue1b baseline failed; fall back to the session-2 then round-3
    # artifacts
    base = (v2v("fixture_eval_heldout_ms4_small_r4.json")
            or v2v("fixture_eval_heldout_ms4_small.json") or 1e9)

ocents = {0.0: base}
for w, tag in ((0.25, "oc025"), (1.0, "oc1"), (25.0, "oc25")):
    x = v2v(f"fixture_eval_heldout_ms4_small_{tag}.json")
    if x is not None:
        ocents[w] = x
best_w = min(ocents, key=ocents.get)

coll = v2v("fixture_eval_heldout_ms4_small_coll.json")
use_coll = coll is not None and coll < base

ms8 = v2v("fixture_eval_heldout_ms8_small.json")
run = "fixture_run_ms8" if (ms8 is not None and ms8 < base) else "fixture_run_ms"
n = 8 if run.endswith("ms8") else 4
print(f"{run}:{n} {best_w} {1 if use_coll else 0}")
PY
)
EOF
N=${RUN#*:}; RUN=${RUN%:*}
FLAGS=""
[ "$COLL" = 1 ] && FLAGS="$FLAGS --collision"
python - "$RUN" "$OCENT" "$COLL" <<'PY'
import sys
print(f"[queue3] hero config: run={sys.argv[1]} ocent={sys.argv[2]} collision={sys.argv[3]}", file=sys.stderr)
PY

timeout 7200 python scripts/run_fixture_eval.py --out "$RUN" --train-seqs "$N" \
  --net-preset small --heldout --ocent "$OCENT" $FLAGS --recon-tag hero \
  --heldout-results results/fixture_eval_heldout_hero.json \
  || { echo "QUEUE3 hero FAILED"; exit 1; }
timeout 1800 python scripts/diagnose_fixture.py --run "$RUN" --net-preset small \
  --heldout --recon-tag hero && cp \
  "$RUN/diagnostics_heldout_small_hero.json" \
  results/diagnostics_heldout_hero.json

echo "QUEUE3 DONE"
