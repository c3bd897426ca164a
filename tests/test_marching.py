"""Marching-tetrahedra iso-surface extraction tests."""
import numpy as np

from vistracker_tpu.ops.marching import marching_tets, udf_to_mesh


def _sphere_grid(R=48, r=0.6):
    lin = np.linspace(-1, 1, R)
    gx, gy, gz = np.meshgrid(lin, lin, lin, indexing="ij")
    return np.sqrt(gx ** 2 + gy ** 2 + gz ** 2) - r


def test_sphere_surface_radius():
    v, f = marching_tets(_sphere_grid(), 0.0)
    assert len(v) > 1000 and len(f) > 2000
    r = np.linalg.norm(v, axis=-1)
    assert abs(r.mean() - 0.6) < 2e-3
    assert r.std() < 2e-3
    # all face indices valid, no degenerate faces
    assert f.min() >= 0 and f.max() < len(v)
    assert (f[:, 0] != f[:, 1]).all()


def test_empty_grid():
    v, f = marching_tets(np.ones((8, 8, 8)), 0.0)
    assert len(v) == 0 and len(f) == 0


def test_udf_to_mesh():
    udf = lambda p: np.abs(np.linalg.norm(p, axis=-1) - 0.6)
    v, f = udf_to_mesh(udf, resolution=40, level=0.03)
    r = np.linalg.norm(v, axis=-1)
    # the UDF shell at level 0.03 straddles the sphere
    assert abs(r.mean() - 0.6) < 0.05
