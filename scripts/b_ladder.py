"""Stage-6 chunk-size (B) ladder: accuracy x throughput (VERDICT r2 #4).

The perf headline measures stage 6 at B=8 frames/chunk while the
reference's parity chunk is 96 (recon_fit_triplane.py:257); smaller B cuts
the +/-1/2-frame temporal stencils (stemp/otemp/ovtemp,
recon_fit_trivis_full.py:170-177,379-391) at more chunk boundaries.  This
driver re-tracks the fixture sequence at several chunk sizes with the SAME
trained checkpoints and budgets, evals each against GT, and writes one
table: {B: {smpl_v2v, obj_v2v, fps}} -> results/b_ladder.json.

On the 90-frame fixture B=90 is the parity shape (one chunk, stencils
never cut — the analog of the reference's 96).  Uses run_fixture_eval's
track/eval phases with --recon-tag so recon dirs don't collide.

Usage: python scripts/b_ladder.py --out fixture_run_rel --net-preset
       release [--sizes 8,30,90]
"""
import argparse
import json
import os
import os.path as osp
import re
import subprocess
import sys
import time

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))


def log(msg):
    print(f"[b_ladder {time.strftime('%H:%M:%S')}] {msg}", flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="fixture_run_rel")
    ap.add_argument("--net-preset", default="release")
    ap.add_argument("--object-shape", default="lbox")
    ap.add_argument("--sizes", default="8,30,90")
    ap.add_argument("--results", default="results/b_ladder.json")
    args = ap.parse_args()
    sizes = [int(s) for s in args.sizes.split(",")]

    here = osp.dirname(osp.abspath(__file__))
    report = {"out": args.out, "net_preset": args.net_preset, "ladder": {}}
    if osp.isfile(args.results):
        with open(args.results) as f:
            report = json.load(f)

    for B in sizes:
        key = str(B)
        if key in report["ladder"] and "obj_v2v_cm" in report["ladder"][key]:
            log(f"B={B} already measured, skipping")
            continue
        tag = f"b{B}"
        res_json = osp.join(args.out, f"eval_{tag}.json")
        base = [sys.executable, osp.join(here, "run_fixture_eval.py"),
                "--out", args.out, "--net-preset", args.net_preset,
                "--object-shape", args.object_shape,
                "--chunk-size", str(B), "--recon-tag", tag,
                "--results", res_json]
        log(f"B={B}: tracking...")
        t0 = time.time()
        rc = subprocess.run(base + ["--phase", "track"]).returncode
        if rc != 0:
            raise SystemExit(f"track failed at B={B} rc={rc}")
        track_s = time.time() - t0
        log(f"B={B}: evaluating...")
        rc = subprocess.run(base + ["--phase", "eval"]).returncode
        if rc != 0:
            raise SystemExit(f"eval failed at B={B} rc={rc}")
        with open(res_json) as f:
            ev = json.load(f)
        # per-chunk fps from the track's own pack log if present; fall back
        # to wall (includes compiles — conservative)
        pack_json = None
        recon_dir = osp.join(
            args.out, f"recon_{args.net_preset}_{tag}", "recon_fixture")
        for fn in os.listdir(recon_dir):
            if fn.endswith(".json"):
                pack_json = osp.join(recon_dir, fn)
        fps = None
        if pack_json:
            with open(pack_json) as f:
                fps = json.load(f).get("fps")
        w1 = ev["W1_chore_protocol"]
        report["ladder"][key] = dict(
            smpl_v2v_cm=w1["smpl_v2v"]["mean"],
            obj_v2v_cm=w1["obj_v2v"]["mean"],
            smpl_chamf_cm=w1["smpl_chamf"]["mean"],
            obj_chamf_cm=w1["obj_chamf"]["mean"],
            fps_tracked=fps, track_wall_s=track_s)
        log(f"B={B}: {json.dumps(report['ladder'][key])}")
        os.makedirs(osp.dirname(args.results) or ".", exist_ok=True)
        with open(args.results, "w") as f:
            json.dump(report, f, indent=2)
    log(f"wrote {args.results}")


if __name__ == "__main__":
    main()
