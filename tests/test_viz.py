"""Z-buffered viz renderer tests."""
import os
import numpy as np
import jax.numpy as jnp

from vistracker_tpu.render.viz import (render_shaded, side_by_side,
                                       save_video, render_meshes_perspective)
from vistracker_tpu.core.camera import PerspectiveCamera


def test_zbuffer_occlusion():
    # two overlapping squares; the nearer one must win in the overlap
    def square(cx, z, half=0.4):
        v = jnp.asarray([[cx - half, -half], [cx + half, -half],
                         [cx + half, half], [cx - half, half]], jnp.float32)
        f = jnp.asarray([[0, 1, 2], [0, 2, 3]], jnp.int32)
        v3 = jnp.concatenate([v, jnp.full((4, 1), z)], -1)
        return v, jnp.full((4,), z), v3, f

    size = 64
    v_a, z_a, v3_a, f = square(-0.2, 1.0)   # near
    v_b, z_b, v3_b, _ = square(0.2, 2.0)    # far
    verts2 = jnp.concatenate([v_a, v_b])
    depth = jnp.concatenate([z_a, z_b])
    verts3 = jnp.concatenate([v3_a, v3_b])
    faces = jnp.concatenate([f, f + 4])
    shade, zbuf = render_shaded(verts2, depth, verts3, faces, size)
    zbuf = np.asarray(zbuf)
    # overlap region around x=0: depth must be the NEAR square's (1.0)
    mid = size // 2
    assert abs(zbuf[mid, mid] - 1.0) < 1e-3, zbuf[mid, mid]
    # right-only region: far square
    right = int((0.5 + 1) / 2 * (size - 1))
    assert abs(zbuf[mid, right] - 2.0) < 1e-3, zbuf[mid, right]
    # background
    assert zbuf[0, 0] > 1e8
    s = np.asarray(shade)
    assert s[mid, mid] > 0.9  # face normal along +z -> full headlight
    assert s[0, 0] == 0.0


def test_perspective_render_and_video(tmp_path, rng):
    cam = PerspectiveCamera(crop_size=1200)
    tri_v = np.array([[0, 0, 2.2], [0.3, 0, 2.2], [0, 0.3, 2.2]], np.float32)
    tri_f = np.array([[0, 1, 2]], np.int32)
    cc = np.asarray(cam.project_screen(jnp.asarray(tri_v[:1][None])))[0, 0]
    img = render_meshes_perspective(
        [(tri_v, tri_f, (1.0, 0.2, 0.2))], cam, cc, size=64)
    assert img.shape == (64, 64, 3)
    assert img.max() > 0.2  # triangle visible
    frames = np.stack([img, img * 0.5])
    sbs = side_by_side(frames, frames)
    assert sbs.shape == (2, 64, 128, 3)
    out = save_video(sbs, str(tmp_path / "vid.gif"), fps=5)
    assert os.path.getsize(out) > 0


def test_checkerboard_ground():
    from vistracker_tpu.render.viz import checkerboard_ground
    v, fw, fb = checkerboard_ground(tiles=4)
    assert v.shape == ((5) ** 2, 3)
    assert len(fw) + len(fb) == 4 * 4 * 2
    np.testing.assert_allclose(v[:, 1], 1.0)  # flat plane at y=1
    # disjoint tile sets
    assert not set(map(tuple, fw.tolist())) & set(map(tuple, fb.tolist()))


def test_mp4_video_and_top_view(tmp_path, rng):
    """mp4 output via cv2 (render_recon.py FFMPEG role) + top-down view
    with checkerboard ground (render_recon.py:213-225)."""
    from vistracker_tpu.render.viz import render_top_view, save_video
    frames = rng.rand(3, 64, 64, 3).astype(np.float32)
    out = save_video(frames, str(tmp_path / "vid.mp4"), fps=5)
    assert out.endswith(".mp4") and os.path.getsize(out) > 100
    import cv2
    cap = cv2.VideoCapture(out)
    assert cap.isOpened()
    assert int(cap.get(cv2.CAP_PROP_FRAME_COUNT)) == 3
    cap.release()

    cam = PerspectiveCamera(crop_size=1200)
    tri_v = np.array([[0, 0, 2.2], [0.3, 0, 2.2], [0, 0.3, 2.2]], np.float32)
    tri_f = np.array([[0, 1, 2]], np.int32)
    img = render_top_view([(tri_v, tri_f, (1.0, 0.2, 0.2))], cam, size=64)
    assert img.shape == (64, 64, 3)
    assert img.max() > 0.1  # ground visible from above


def test_contact_spheres(rng):
    """Per-part contact detection (nr_utils.py:get_contact_spheres): object
    verts within thres of the SMPL surface yield one sphere per part."""
    from vistracker_tpu.render.viz import contact_spheres, sphere_mesh
    sv = rng.randn(100, 3).astype(np.float32)
    labels = np.zeros(100, np.int32)
    labels[50:] = 3
    # object verts: two touching one smpl vert each + far-away rest
    ov = np.concatenate([sv[10:11] + 0.01, sv[60:61] + 0.01,
                         sv + np.array([50.0, 0, 0])], 0)
    spheres = contact_spheres(sv, labels, ov, thres=0.04)
    assert len(spheres) == 2  # parts 0 and 3
    colors = {tuple(np.round(c, 2)) for c, _, _ in spheres}
    assert len(colors) == 2
    for _, v, f in spheres:
        assert np.isfinite(v).all() and f.max() < len(v)
    # no contact -> empty
    assert contact_spheres(sv, labels, ov + 100.0, thres=0.04) == []
    # sphere mesh is watertight-ish: all verts used
    v, f = sphere_mesh((0, 0, 0), 0.1)
    assert set(range(len(v))) == set(np.unique(f))
    np.testing.assert_allclose(np.linalg.norm(v, axis=1), 0.1, atol=1e-5)
