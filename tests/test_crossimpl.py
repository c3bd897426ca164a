"""Cross-implementation parity tests: the reference's OWN torch stages run
in-process (utils/refbridge shims) vs our implementations, identical
inputs + weights. Small-budget versions of scripts/crossimpl_parity.py
(which produces results/crossimpl_parity.json at full budgets).

Skipped when /root/reference is unavailable.
"""
import os
import os.path as osp
import sys

import numpy as np
import pytest

sys.path.insert(0, osp.join(osp.dirname(osp.dirname(osp.abspath(__file__))),
                            "scripts"))

from vistracker_tpu.utils.refbridge import have_reference  # noqa: E402

pytestmark = pytest.mark.skipif(not have_reference(),
                                reason="reference repo not available")


def test_smoothnet_runner_crossimpl(tmp_path):
    """Reference SMPLTSmoother.model_forward + post_processing vs our
    smooth_smplt: same torch-seeded weights, same noisy trajectory."""
    import crossimpl_parity as X
    res = X.stage_smoothnet(None, str(tmp_path))
    assert res["pose_rot_deg"] < 0.05, res
    assert res["trans_mae_mm"] < 0.5, res
    assert res["betas_mae"] < 1e-4, res


def test_infiller_autoreg_crossimpl(tmp_path):
    """Reference CondMotionInfillAutoreg.test (full autoregressive loop
    incl. packed I/O and the truncated final clip) vs fit/infill.py."""
    import crossimpl_parity as X
    # off the 180+30k grid on purpose: exercises the truncated-final-clip
    # schedule (the round-3 parity fix)
    res = X.stage_infiller(None, str(tmp_path), T=256)
    assert res["rot_deg_all"] < 0.2, res
    assert res["rot_deg_occluded"] < 0.2, res


def test_smplt_fit_crossimpl_small_budget(tmp_path):
    """Reference SMPLHFitter30fps.fit_one_batch vs our fit_smplt at a
    reduced budget (8 iters x 10 steps, 2 global) on a tiny fixture —
    same mocap init jsons, mask-bbox translation init, kpt files. Checks
    the optimizer DYNAMICS (phase schedule, moment resets, w/(1+it//3)
    decay) land on the same parameters."""
    import crossimpl_parity as X
    fx = X.ensure_fixture(str(tmp_path), frames=5, raster=160)
    # at tiny budgets the reference's loss-scaled early-stop gate fires,
    # so the comparison is budget-matched (<= 9-step rounding slack); the
    # full-budget harness run measured 2.9e-5 cm / 1.5e-4 mm with NO
    # early stop on either side (results/crossimpl_parity.json)
    res = X.stage_smplt(fx, str(tmp_path), max_iters=8, global_iters=2,
                        match_ref_budget=True)
    assert res["fitted_v2v_cm"] < 0.2, res
    assert res["trans_mae_mm"] < 2.0, res
    assert res["global_rot_deg"] < 0.2, res
    assert res["fitted_v2v_incl_lbs_cm"] < 0.25, res
