"""Regression tests for scripts/run_fixture_eval.py phase plumbing.

The B-ladder (scripts/b_ladder.py) and the --collision variant both rely
on --recon-tag landing the track phase's outputs in their own recon dir;
if track writes to the untagged dir, its is_done resume silently skips
the re-track and eval reads stale (or missing) results.
"""
import argparse
import os.path as osp
import sys

import pytest

SCRIPTS = osp.join(osp.dirname(osp.dirname(osp.abspath(__file__))),
                   "scripts")


def _runner_args(out, **over):
    base = dict(out=out, frames=2, raster=64, net_size=64, crop_size=256,
                chunk_size=2, sif_epochs=1, sif_samples=64, grid_ratio=0.15,
                results=osp.join(out, "res.json"),
                heldout_results=osp.join(out, "res_ho.json"),
                heldout_motion_seed=1, train_seqs=1, recon_tag="",
                net_preset="tiny", object_shape="box", collision=False,
                cpu=True, phase=None, single_process=False)
    base.update(over)
    return argparse.Namespace(**base)


@pytest.mark.parametrize("tag,collision", [("b7", False), ("coll", True)])
def test_track_phase_honors_recon_tag_and_collision(tmp_path, monkeypatch,
                                                    tag, collision):
    sys.path.insert(0, SCRIPTS)
    try:
        import run_fixture_eval as rfe
    finally:
        sys.path.remove(SCRIPTS)

    args = _runner_args(str(tmp_path), recon_tag=tag, collision=collision,
                        phase="track")
    captured = {}

    import vistracker_tpu.cli.real_track as rt

    def fake_track(targs):
        captured["out"] = targs.out
        captured["collision"] = bool(getattr(targs, "collision", False))

    monkeypatch.setattr(rt, "run_real_track", fake_track)
    rfe.run_phase(args)

    # tiny preset has no _preset suffix, so the tag is the whole suffix
    assert captured["out"] == osp.join(str(tmp_path), f"recon_{tag}")
    assert captured["collision"] is collision
