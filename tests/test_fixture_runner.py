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


def _import_rfe():
    sys.path.insert(0, SCRIPTS)
    try:
        import run_fixture_eval as rfe
    finally:
        sys.path.remove(SCRIPTS)
    return rfe


def _runner_args(out, **over):
    # Build from the script's OWN parser so every flag (present and future)
    # carries its real default — a Namespace literal here rots the moment a
    # flag is added to the runner (the round-3 --ocent regression).
    args = _import_rfe().build_parser().parse_args([
        "--out", out, "--frames", "2", "--raster", "64", "--net-size", "64",
        "--crop-size", "256", "--chunk-size", "2", "--sif-epochs", "1",
        "--sif-samples", "64",
        "--results", osp.join(out, "res.json"),
        "--heldout-results", osp.join(out, "res_ho.json"), "--cpu"])
    for k, v in over.items():
        assert hasattr(args, k), k
        setattr(args, k, v)
    return args


@pytest.mark.parametrize("tag,collision", [("b7", False), ("coll", True)])
def test_track_phase_honors_recon_tag_and_collision(tmp_path, monkeypatch,
                                                    tag, collision):
    rfe = _import_rfe()
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


def test_track_phase_forwards_ocent(tmp_path, monkeypatch):
    rfe = _import_rfe()
    args = _runner_args(str(tmp_path), ocent=0.25, phase="track")
    captured = {}

    import vistracker_tpu.cli.real_track as rt
    monkeypatch.setattr(
        rt, "run_real_track",
        lambda targs: captured.setdefault("ocent", targs.ocent))
    rfe.run_phase(args)
    assert captured["ocent"] == pytest.approx(0.25)


def test_subprocess_forwarding_roundtrips_every_option(tmp_path):
    """The phase orchestrator must forward EVERY parser option to its
    phase subprocesses. The hand-maintained forward list silently dropped
    new flags twice (round-3 --ocent; round-4 --sil-backend, which voided
    a kernel A/B run with a bitwise-identical recon pack): forwarded_args
    is now derived from the parser, and this test pins the round-trip —
    parse(any overrides) -> forwarded_args -> parse == same namespace."""
    rfe = _import_rfe()
    args = _runner_args(str(tmp_path), recon_tag="xs", collision=True,
                        ocent=0.25, fast_gen=True)
    args.sil_backend = "xla"
    back = rfe.build_parser().parse_args(rfe.forwarded_args(args))
    for k, v in vars(args).items():
        if k in ("phase", "single_process"):
            continue
        assert getattr(back, k) == v, k


def test_track_phase_forwards_sil_backend(tmp_path, monkeypatch):
    rfe = _import_rfe()
    args = _runner_args(str(tmp_path), sil_backend="xla", phase="track")
    captured = {}

    import vistracker_tpu.cli.real_track as rt
    monkeypatch.setattr(
        rt, "run_real_track",
        lambda targs: captured.setdefault(
            "sil", getattr(targs, "sil_backend", "auto")))
    rfe.run_phase(args)
    assert captured["sil"] == "xla"


def test_track_phase_forwards_fast_gen(tmp_path, monkeypatch):
    rfe = _import_rfe()
    args = _runner_args(str(tmp_path), fast_gen=True, phase="track")
    captured = {}

    import vistracker_tpu.cli.real_track as rt
    monkeypatch.setattr(
        rt, "run_real_track",
        lambda targs: captured.setdefault(
            "fast_gen", bool(getattr(targs, "fast_gen", False))))
    rfe.run_phase(args)
    assert captured["fast_gen"] is True
