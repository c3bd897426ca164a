"""Run the upstream reference implementation in-process, side by side.

The cross-implementation parity harness (scripts/crossimpl_parity.py and
tests/test_crossimpl.py) executes the reference's OWN torch optimization /
inference stages — preprocess/fit_SMPLH_30fps.py, smoothnet/smooth_smplt.py,
interp/test_cinfill_autoreg.py — on fixture data and compares their final
outputs against ours.  Those modules were written for a CUDA host with
chumpy / psbody / joblib / yacs installed; none of that exists in this
image, so this module provides the minimal shims that let the reference
code run UNMODIFIED on CPU:

  * a tiny eager ``chumpy`` stand-in covering exactly the surface
    smplpytorch's ``ready_arguments`` touches (ch.array / Ch with .r /
    MatVecMult / vstack / concatenate / eye and the Rodrigues subclass in
    posemapper.py) — values are computed eagerly with numpy, no autodiff,
    which is fine because SMPL_Layer only reads ``.r`` of the raw fields;
  * ``psbody.mesh`` (array-holding Mesh, no-op viewer), pickle-backed
    ``joblib``, attribute-tree ``yacs.config.CfgNode``;
  * torch CPU patches: ``Tensor.cuda`` / ``Module.cuda`` return self and
    ``Tensor.to`` tolerates unavailable CUDA targets (the reference calls
    ``.cuda()`` unconditionally, e.g. th_smpl_prior.py:27-28);
  * a ``reference_session`` context manager that writes the PATHS.yml the
    reference reads at import time (wrapper_pytorch.py:15-20 etc.), chdirs
    next to it, puts /root/reference on sys.path, and afterwards unloads
    every module imported from the reference tree (they cache PATHS state
    at import);
  * ``write_ref_model_pkl``: converts our fixture SMPL-H model dict
    (data/fixture.py:build_humanoid_smplh) into the layout
    ``ready_arguments`` expects (scipy-sparse J_regressor, J, bs_type).

Nothing here touches the numbers being compared: every asserted quantity
comes out of reference code paths.
"""
from __future__ import annotations

import contextlib
import os
import os.path as osp
import pickle
import sys
import types

import numpy as np

REF = "/root/reference"


def have_reference() -> bool:
    return osp.isdir(REF)


# ---------------------------------------------------------------------------
# chumpy stand-in
# ---------------------------------------------------------------------------

class Ch:
    """Eager chumpy.Ch: wraps a numpy value, computes immediately.

    Subclasses (posemapper.Rodrigues) declare ``dterms`` and implement
    ``compute_r``; positional ctor args bind to dterms in order, matching
    chumpy's convention.
    """

    dterms = ()

    def __init__(self, *args, **kwargs):
        names = self.dterms
        if isinstance(names, str):
            names = (names,)
        if names:
            vals = list(args) + [kwargs[n] for n in names[len(args):]]
            for n, v in zip(names, vals):
                setattr(self, n, v if isinstance(v, Ch) else Ch(v))
            self._val = None
        else:
            self._val = np.asarray(args[0], np.float64)

    def compute_r(self):  # pragma: no cover - overridden by subclasses
        raise NotImplementedError

    @property
    def r(self):
        if self._val is None:
            return np.asarray(self.compute_r())
        return self._val

    # -- numpy-ish surface used by ready_arguments / lrotmin ---------------
    @staticmethod
    def _raw(x):
        return x.r if isinstance(x, Ch) else np.asarray(x)

    def dot(self, other):
        return Ch(self.r.dot(self._raw(other)))

    def __add__(self, other):
        return Ch(self.r + self._raw(other))

    __radd__ = __add__

    def __sub__(self, other):
        return Ch(self.r - self._raw(other))

    def __rsub__(self, other):
        return Ch(self._raw(other) - self.r)

    def __mul__(self, other):
        return Ch(self.r * self._raw(other))

    __rmul__ = __mul__

    def __getitem__(self, idx):
        return Ch(self.r[idx])

    def __iter__(self):
        for row in self.r:
            yield Ch(row)

    def __len__(self):
        return len(self.r)

    def ravel(self):
        return Ch(self.r.ravel())

    def reshape(self, *shape):
        return Ch(self.r.reshape(*shape))

    def copy(self):
        return Ch(self.r.copy())

    @property
    def T(self):
        return Ch(self.r.T)

    @property
    def shape(self):
        return self.r.shape

    @property
    def ndim(self):
        return self.r.ndim


def _build_chumpy_module():
    ch = types.ModuleType("chumpy")
    ch.Ch = Ch
    ch.array = lambda x: x if isinstance(x, Ch) else Ch(x)
    ch.eye = lambda n: Ch(np.eye(n))
    ch.vstack = lambda xs: Ch(np.vstack([Ch._raw(x) for x in xs]))
    ch.concatenate = lambda xs: Ch(np.concatenate([Ch._raw(x) for x in xs]))
    ch_ch = types.ModuleType("chumpy.ch")
    ch_ch.Ch = Ch
    ch_ch.MatVecMult = lambda m, v: Ch(np.asarray(m @ Ch._raw(v)).ravel())
    ch.ch = ch_ch
    return ch, ch_ch


# ---------------------------------------------------------------------------
# other missing-module stubs
# ---------------------------------------------------------------------------

class ArrayMesh:
    """psbody.mesh.Mesh stand-in: (v, f) holder, file ops are no-ops."""

    def __init__(self, v=None, f=None, vc=None):
        self.v, self.f, self.vc = v, f, vc

    def write_ply(self, path):  # reference save paths; not asserted on
        pass

    def load_from_file(self, path):  # pragma: no cover
        raise IOError(f"ArrayMesh cannot load {path}")


def _pickle_joblib():
    jb = types.ModuleType("joblib")

    def load(path):
        with open(path, "rb") as f:
            return pickle.load(f)

    def dump(obj, path):
        with open(path, "wb") as f:
            pickle.dump(obj, f)

    jb.load, jb.dump = load, dump
    return jb


class CfgTree:
    """yacs.config.CfgNode stand-in: nested attribute tree."""

    def __init__(self, d=None):
        for k, v in (d or {}).items():
            setattr(self, k, CfgTree(v) if isinstance(v, dict) else v)


def install_stubs():
    """Install stub modules for deps missing from this image.

    Returns the list of module names actually stubbed (pre-existing real
    modules are never replaced) so callers can pop them afterwards.
    """
    stubbed = []

    def _add(name, mod):
        if name in sys.modules:
            return
        try:
            __import__(name)
        except ImportError:
            sys.modules[name] = mod
            stubbed.append(name)

    ch, ch_ch = _build_chumpy_module()
    _add("chumpy", ch)
    if "chumpy" in stubbed:
        sys.modules["chumpy.ch"] = ch_ch
        stubbed.append("chumpy.ch")

    psb = types.ModuleType("psbody")
    psb_mesh = types.ModuleType("psbody.mesh")
    psb_mesh.Mesh = ArrayMesh
    psb_mesh.MeshViewer = object
    psb.mesh = psb_mesh
    _add("psbody", psb)
    if "psbody" in stubbed:
        sys.modules["psbody.mesh"] = psb_mesh
        stubbed.append("psbody.mesh")

    _add("joblib", _pickle_joblib())

    tm = types.ModuleType("trimesh")
    tm.Trimesh = object
    _add("trimesh", tm)

    sk = types.ModuleType("skimage")
    sk_measure = types.ModuleType("skimage.measure")
    sk.measure = sk_measure
    _add("skimage", sk)
    if "skimage" in stubbed:
        sys.modules["skimage.measure"] = sk_measure
        stubbed.append("skimage.measure")

    yc = types.ModuleType("yacs")
    yc_cfg = types.ModuleType("yacs.config")
    yc_cfg.CfgNode = CfgTree
    yc.config = yc_cfg
    _add("yacs", yc)
    if "yacs" in stubbed:
        sys.modules["yacs.config"] = yc_cfg
        stubbed.append("yacs.config")

    return stubbed


# ---------------------------------------------------------------------------
# torch CPU patches
# ---------------------------------------------------------------------------

@contextlib.contextmanager
def torch_cpu_patches():
    """Make the reference's unconditional .cuda()/.to('cuda:0') calls no-ops
    on a CPU-only torch build (restores originals on exit)."""
    import torch
    import torch.nn as tnn

    orig_t_cuda = torch.Tensor.cuda
    orig_m_cuda = tnn.Module.cuda
    orig_to = torch.Tensor.to

    def tolerant_to(self, *a, **k):
        try:
            return orig_to(self, *a, **k)
        except (RuntimeError, AssertionError):
            return self

    # NOTE: torch.device is deliberately NOT replaced — it is a TYPE used
    # in `str | torch.device` annotations inside torch's lazily-imported
    # _dynamo (optimizer construction triggers it); a function there makes
    # the union operator blow up. The .cuda()/.to() patches cover every
    # device move the reference actually performs.
    torch.Tensor.cuda = lambda self, *a, **k: self
    tnn.Module.cuda = lambda self, *a, **k: self
    torch.Tensor.to = tolerant_to
    try:
        yield
    finally:
        torch.Tensor.cuda = orig_t_cuda
        tnn.Module.cuda = orig_m_cuda
        torch.Tensor.to = orig_to


# ---------------------------------------------------------------------------
# reference import session
# ---------------------------------------------------------------------------

# every key any reference module reads from PATHS.yml at import time
# (grep paths['X'] / paths["X"] over /root/reference)
PATH_KEYS = ("CODE", "CODE_PATH", "BEHAVE_PATH", "BEHAVE_ROOT",
             "EXTENDED_BEHAVE_PATH", "PROCESSED_PATH", "VIZ_PATH",
             "RECON_PATH", "SMPL_MODEL_ROOT", "SMPL_ASSETS_ROOT",
             "MODEL_PATH", "GT_PACKED", "SPLIT_PATH", "OCC_PATH",
             "BEHAVE_30FPS_PATH", "BEHAVE_OBJS_PATH")


@contextlib.contextmanager
def reference_session(scratch: str, **paths):
    """Context for importing + running reference modules.

    Writes ``PATHS.yml`` under ``scratch`` (keys from PATH_KEYS default to
    scratch, overridable per-call, e.g. SMPL_ASSETS_ROOT=<fixture assets>),
    chdirs there (the reference reads PATHS.yml from cwd at import time),
    prepends /root/reference to sys.path and installs the stubs.  On exit
    everything is restored and all modules imported from the reference tree
    are unloaded so later sessions re-read their PATHS state.
    """
    os.makedirs(scratch, exist_ok=True)
    table = {k: scratch for k in PATH_KEYS}
    table.update(paths)
    with open(osp.join(scratch, "PATHS.yml"), "w") as f:
        for k, v in table.items():
            f.write(f"{k}: {v}\n")

    stubbed = install_stubs()
    cwd = os.getcwd()
    sys.path.insert(0, REF)
    os.chdir(scratch)
    before = set(sys.modules)
    try:
        with torch_cpu_patches():
            yield
    finally:
        os.chdir(cwd)
        if REF in sys.path:
            sys.path.remove(REF)
        for name in stubbed:
            sys.modules.pop(name, None)
        for name in set(sys.modules) - before:
            mod = sys.modules.get(name)
            file = getattr(mod, "__file__", None) or ""
            if file.startswith(REF):
                sys.modules.pop(name, None)


# ---------------------------------------------------------------------------
# fixture model -> reference pkl layout
# ---------------------------------------------------------------------------

def write_ref_model_pkl(model_dict: dict, out_path: str, num_betas: int = 10):
    """Write the fixture SMPL-H dict in the layout ready_arguments expects.

    Differences from our loader's layout (core/smpl.py:load_smpl_pkl):
    J_regressor must be scipy-sparse (SMPL_Layer calls .toarray(),
    smpl_layer.py:77), 'J' (T-pose joints) must exist
    (serialization.py:backwards_compatibility_replacements),
    'bs_type'/'bs_style' select the lrotmin posemap, and shapedirs is
    truncated to `num_betas` components: the reference wrappers construct
    SMPL_Layer with num_betas=300 via from_smpl (wrapper_pytorch.py:114,
    205-226) while feeding 10-d betas, i.e. they assume a 10-component
    pkl.  Both implementations only ever drive the first 10 components,
    so the truncation is exactly equivalent.
    """
    import scipy.sparse as sp

    d = dict(model_dict)
    jreg = np.asarray(d["J_regressor"], np.float64)
    d["J_regressor"] = sp.csc_matrix(jreg)
    d["J"] = jreg @ np.asarray(d["v_template"], np.float64)
    d["shapedirs"] = np.asarray(d["shapedirs"])[:, :, :num_betas]
    d["betas"] = np.zeros(num_betas)
    d.setdefault("bs_type", "lrotmin")
    d.setdefault("bs_style", "lbs")
    os.makedirs(osp.dirname(out_path) or ".", exist_ok=True)
    with open(out_path, "wb") as f:
        pickle.dump(d, f)
    return out_path
