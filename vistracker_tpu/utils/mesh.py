"""Host-side mesh utilities (PLY I/O, sampling, SDF grids).

Replaces psbody.mesh / trimesh usage in the reference (mesh loading,
`trimesh.sample` surface sampling in evaluate.py:151-155 and
recon_fit_base.py:compute_pca_init, boundary_sampler's igl queries) with
dependency-free numpy implementations. These run in the host input
pipeline, not on device.
"""
from __future__ import annotations

import struct

import numpy as np


# ---------------------------------------------------------------------------
# PLY I/O (ascii + binary_little_endian, vertices + faces)
# ---------------------------------------------------------------------------

def save_ply(path: str, verts: np.ndarray, faces: np.ndarray | None = None):
    verts = np.asarray(verts, np.float32)
    faces = np.zeros((0, 3), np.int32) if faces is None else np.asarray(faces, np.int32)
    with open(path, "wb") as f:
        header = (
            "ply\nformat binary_little_endian 1.0\n"
            f"element vertex {len(verts)}\n"
            "property float x\nproperty float y\nproperty float z\n"
            f"element face {len(faces)}\n"
            "property list uchar int vertex_indices\nend_header\n")
        f.write(header.encode())
        f.write(verts.astype("<f4").tobytes())
        if len(faces):
            counts = np.full((len(faces), 1), 3, np.uint8)
            rec = np.zeros(len(faces), dtype=[("n", "u1"), ("v", "<i4", 3)])
            rec["n"] = 3
            rec["v"] = faces
            f.write(rec.tobytes())


def load_ply(path: str):
    """Returns (verts (V, 3) float32, faces (F, 3) int32)."""
    with open(path, "rb") as f:
        data = f.read()
    head_end = data.find(b"end_header\n") + len(b"end_header\n")
    header = data[:head_end].decode("ascii", errors="replace")
    lines = [l.strip() for l in header.splitlines()]
    fmt = next(l.split()[1] for l in lines if l.startswith("format"))
    n_vert = n_face = 0
    vert_props = []
    cur = None
    for l in lines:
        if l.startswith("element vertex"):
            n_vert = int(l.split()[-1]); cur = "v"
        elif l.startswith("element face"):
            n_face = int(l.split()[-1]); cur = "f"
        elif l.startswith("property") and cur == "v":
            parts = l.split()
            vert_props.append((parts[-1], parts[1]))

    type_map = {"float": "<f4", "float32": "<f4", "double": "<f8",
                "uchar": "u1", "uint8": "u1", "int": "<i4", "int32": "<i4",
                "short": "<i2", "ushort": "<u2", "uint": "<u4"}
    if fmt == "ascii":
        body = data[head_end:].decode().split()
        n_props = len(vert_props)
        vals = np.asarray(body[:n_vert * n_props], np.float64).reshape(n_vert, n_props)
        names = [p[0] for p in vert_props]
        verts = vals[:, [names.index("x"), names.index("y"), names.index("z")]]
        faces = []
        idx = n_vert * n_props
        for _ in range(n_face):
            cnt = int(body[idx]); idx += 1
            faces.append([int(v) for v in body[idx:idx + cnt]][:3])
            idx += cnt
        return verts.astype(np.float32), np.asarray(faces, np.int32).reshape(-1, 3)

    # binary little endian
    vdt = np.dtype([(name, type_map[t]) for name, t in vert_props])
    verts_rec = np.frombuffer(data, dtype=vdt, count=n_vert, offset=head_end)
    verts = np.stack([verts_rec["x"], verts_rec["y"], verts_rec["z"]],
                     -1).astype(np.float32)
    off = head_end + n_vert * vdt.itemsize
    fdt = np.dtype([("n", "u1"), ("v", "<i4", 3)])
    faces_rec = np.frombuffer(data, dtype=fdt, count=n_face, offset=off)
    return verts, faces_rec["v"].astype(np.int32).copy()


# ---------------------------------------------------------------------------
# Geometry
# ---------------------------------------------------------------------------

def face_areas(verts: np.ndarray, faces: np.ndarray) -> np.ndarray:
    a = verts[faces[:, 1]] - verts[faces[:, 0]]
    b = verts[faces[:, 2]] - verts[faces[:, 0]]
    return 0.5 * np.linalg.norm(np.cross(a, b), axis=-1)


def sample_surface(verts: np.ndarray, faces: np.ndarray, n: int,
                   rng: np.random.RandomState | None = None) -> np.ndarray:
    """Area-weighted uniform surface sampling (trimesh.sample equivalent)."""
    rng = rng or np.random.RandomState(0)
    areas = face_areas(verts, faces)
    probs = areas / max(areas.sum(), 1e-12)
    fidx = rng.choice(len(faces), size=n, p=probs)
    u, v = rng.rand(n, 1), rng.rand(n, 1)
    flip = (u + v) > 1.0
    u = np.where(flip, 1.0 - u, u)
    v = np.where(flip, 1.0 - v, v)
    tri = verts[faces[fidx]]
    return (tri[:, 0] + u * (tri[:, 1] - tri[:, 0])
            + v * (tri[:, 2] - tri[:, 0])).astype(np.float32)


def vertex_normals(verts: np.ndarray, faces: np.ndarray) -> np.ndarray:
    fn = np.cross(verts[faces[:, 1]] - verts[faces[:, 0]],
                  verts[faces[:, 2]] - verts[faces[:, 0]])
    vn = np.zeros_like(verts)
    for k in range(3):
        np.add.at(vn, faces[:, k], fn)
    return vn / np.maximum(np.linalg.norm(vn, axis=-1, keepdims=True), 1e-12)


def decimate_faces(faces: np.ndarray, max_faces: int,
                   rng: np.random.RandomState | None = None) -> np.ndarray:
    """Subsample faces for coverage-only rasterization (silhouettes are
    robust to missing interior faces)."""
    if len(faces) <= max_faces:
        return faces
    rng = rng or np.random.RandomState(0)
    idx = rng.choice(len(faces), max_faces, replace=False)
    return faces[np.sort(idx)]


def signed_distance_grid(verts: np.ndarray, faces: np.ndarray,
                         resolution: int = 64, padding: float = 0.1):
    """Approximate signed distance grid of a mesh (for collision penalties).

    Unsigned distance from a surface point sample kd-tree; sign from the dot
    product with the nearest sample's normal (robust for the mostly-convex,
    watertight BEHAVE object templates; replaces the CUDA BVH penetration
    term, see ops/sdf_grid.py).

    Returns (values (R,R,R) float32, bmin (3,), bmax (3,)).
    """
    from scipy.spatial import cKDTree
    rng = np.random.RandomState(0)
    n_samp = min(50000, max(10000, len(faces) * 4))
    areas = face_areas(verts, faces)
    probs = areas / max(areas.sum(), 1e-12)
    fidx = rng.choice(len(faces), size=n_samp, p=probs)
    u, v = rng.rand(n_samp, 1), rng.rand(n_samp, 1)
    flip = (u + v) > 1.0
    u = np.where(flip, 1.0 - u, u)
    v = np.where(flip, 1.0 - v, v)
    tri = verts[faces[fidx]]
    pts = tri[:, 0] + u * (tri[:, 1] - tri[:, 0]) + v * (tri[:, 2] - tri[:, 0])
    fn = np.cross(verts[faces[:, 1]] - verts[faces[:, 0]],
                  verts[faces[:, 2]] - verts[faces[:, 0]])
    fn = fn / np.maximum(np.linalg.norm(fn, axis=-1, keepdims=True), 1e-12)
    normals = fn[fidx]

    bmin = verts.min(0) - padding
    bmax = verts.max(0) + padding
    lin = [np.linspace(bmin[k], bmax[k], resolution) for k in range(3)]
    gx, gy, gz = np.meshgrid(*lin, indexing="ij")
    grid_pts = np.stack([gx, gy, gz], -1).reshape(-1, 3)

    tree = cKDTree(pts)
    dist, idx = tree.query(grid_pts, k=1)
    to_point = grid_pts - pts[idx]
    sign = np.sign(np.sum(to_point * normals[idx], -1))
    sign[sign == 0] = 1.0
    values = (dist * sign).reshape(resolution, resolution, resolution)
    return values.astype(np.float32), bmin.astype(np.float32), bmax.astype(np.float32)


def point_mesh_distance(points: np.ndarray, verts: np.ndarray,
                        faces: np.ndarray, n_surface: int = 60000):
    """Unsigned distance + closest surface point via a dense surface-sample
    kd-tree (host-side GT labeling; replaces igl.signed_distance in
    preprocess/boundary_sampler.py:88-96 for UDF purposes)."""
    from scipy.spatial import cKDTree
    samp = sample_surface(verts, faces, n_surface, np.random.RandomState(0))
    tree = cKDTree(np.concatenate([samp, verts.astype(np.float32)], 0))
    all_pts = np.concatenate([samp, verts.astype(np.float32)], 0)
    dist, idx = tree.query(points, k=1)
    return dist.astype(np.float32), all_pts[idx]
