"""Native C++ BVH point-mesh distance: correctness vs brute force + speed."""
import time
import numpy as np
import pytest

from vistracker_tpu.native.pointmesh import available, PointMeshBVH
from vistracker_tpu.data.sampling import closest_point_triangle, MeshDistance


def _sphere(n_lat=16, n_lon=24, r=0.5):
    vs, fs = [], []
    for i in range(n_lat + 1):
        th = np.pi * i / n_lat
        for j in range(n_lon):
            ph = 2 * np.pi * j / n_lon
            vs.append([r * np.sin(th) * np.cos(ph), r * np.cos(th),
                       r * np.sin(th) * np.sin(ph)])
    for i in range(n_lat):
        for j in range(n_lon):
            a = i * n_lon + j; b = i * n_lon + (j + 1) % n_lon
            c = (i + 1) * n_lon + j; d = (i + 1) * n_lon + (j + 1) % n_lon
            fs += [[a, b, c], [b, d, c]]
    return np.asarray(vs, np.float32), np.asarray(fs, np.int32)


def _brute_force(points, verts, faces):
    tris = verts[faces]  # (F, 3, 3)
    cp = closest_point_triangle(points[:, None].astype(np.float64),
                                tris[None, :, 0].astype(np.float64),
                                tris[None, :, 1].astype(np.float64),
                                tris[None, :, 2].astype(np.float64))
    d = np.linalg.norm(cp - points[:, None], axis=-1)
    return d.min(1)


@pytest.mark.skipif(not available(), reason="no C++ toolchain")
def test_native_matches_brute_force(rng):
    verts, faces = _sphere()
    pts = (rng.randn(500, 3) * 0.7).astype(np.float32)
    bvh = PointMeshBVH(verts, faces)
    d, cp, fi = bvh.query(pts)
    d_ref = _brute_force(pts, verts, faces)
    np.testing.assert_allclose(d, d_ref, atol=1e-5)
    # closest points lie at the reported distance
    np.testing.assert_allclose(np.linalg.norm(cp - pts, axis=-1), d,
                               atol=1e-5)
    assert (fi >= 0).all() and (fi < len(faces)).all()


@pytest.mark.skipif(not available(), reason="no C++ toolchain")
def test_mesh_distance_uses_native_and_agrees(rng):
    verts, faces = _sphere()
    md = MeshDistance(verts, faces)
    assert md._native is not None
    pts = (rng.randn(1000, 3) * 0.6).astype(np.float32)
    d, cp = md.query(pts)
    # sphere: analytic distance | ||p|| - r |, up to facet discretization
    expected = np.abs(np.linalg.norm(pts, axis=-1) - 0.5)
    np.testing.assert_allclose(d, expected, atol=1.5e-2)


@pytest.mark.skipif(not available(), reason="no C++ toolchain")
def test_native_throughput(rng):
    # SMPL-scale: 13k faces, 20k queries — must be far under the reference's
    # 1-2 s/sample igl budget
    verts, faces = _sphere(n_lat=80, n_lon=84)  # ~13.4k faces
    bvh = PointMeshBVH(verts, faces)
    pts = (rng.randn(20000, 3) * 0.7).astype(np.float32)
    bvh.query(pts[:100])  # warm
    t0 = time.perf_counter()
    bvh.query(pts)
    dt = time.perf_counter() - t0
    assert dt < 1.0, f"20k queries took {dt:.3f}s"
