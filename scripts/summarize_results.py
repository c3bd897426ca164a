"""Summarize all fixture-eval result JSONs into one table.

Reads results/fixture_eval*.json (+ matching diagnostics_*.json when
present) and prints a markdown table sorted by heldout obj_v2v — the
round's working scoreboard for STATUS.md.  Pure host-side; no jax.
"""
import glob
import json
import os
import re
import sys

RESULTS = os.path.join(os.path.dirname(__file__), "..", "results")


def load(path):
    try:
        with open(path) as f:
            return json.load(f)
    except Exception:
        return None


def diag_for(eval_path):
    """diagnostics file matching a fixture_eval file, by naming convention."""
    base = os.path.basename(eval_path)
    cand = os.path.join(os.path.dirname(eval_path),
                        base.replace("fixture_eval", "diagnostics"))
    return load(cand)


def row(path):
    d = load(path)
    if d is None or "W1_chore_protocol" not in d:
        return None
    w1 = d["W1_chore_protocol"]
    name = re.sub(r"^fixture_eval_|\.json$", "", os.path.basename(path))
    r = {
        "name": name,
        "heldout": "heldout" in name,
        "train_seqs": d.get("train_seqs", 1),
        "obj_v2v": w1["obj_v2v"]["mean"],
        "smpl_v2v": w1["smpl_v2v"]["mean"],
        "obj_chamf": w1["obj_chamf"]["mean"],
    }
    g = diag_for(path)
    if g:
        r["neural_center_m"] = g["neural_center_m"]["all"]
        r["t_final_m"] = g["t_final_m"]["all"]
        r["rot_final_deg"] = g["rot_final_deg"]["all"]
        r["rot_final_vis_deg"] = g["rot_final_deg"]["visible"]
    return r


def main():
    rows = [r for p in sorted(glob.glob(os.path.join(RESULTS, "fixture_eval*.json")))
            if (r := row(p))]
    rows.sort(key=lambda r: (not r["heldout"], r["obj_v2v"]))
    cols = ["name", "train_seqs", "obj_v2v", "smpl_v2v", "neural_center_m",
            "t_final_m", "rot_final_deg", "rot_final_vis_deg"]
    print("| " + " | ".join(cols) + " |")
    print("|" + "---|" * len(cols))
    for r in rows:
        cells = []
        for c in cols:
            v = r.get(c)
            cells.append(f"{v:.3f}" if isinstance(v, float) else str(v) if v is not None else "-")
        print("| " + " | ".join(cells) + " |")
    if "--json" in sys.argv:
        print(json.dumps(rows, indent=1))


if __name__ == "__main__":
    main()
