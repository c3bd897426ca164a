"""Offline (precomputed-npz) training data + the depth-rescale test path.

Closes the two remaining L2 inventory rows:

  * preprocess/boundary_sampler.py:boundary_sample_all (132-193) — the
    per-frame npz schema the offline BehaveDataset trains from: per-sigma
    dicts points/dist_h/dist_o/parts + pca_axis + smpl_center + body_kpts +
    obj_center (+ optional neighbours_h/o closest surface points).
    `save_boundary_npz` writes that exact schema, including the
    get_sample_num floor (thres = sample_num // 2, boundary_sampler.py:
    126-130), the per-bucket grid samples, and the `_flip.npz` variant
    with flipped part labels (boundary_sampler.py:160-161).
  * data/train_data.py (BehaveDataset, 14-181) — `offline_example`:
    per-sigma np.random.choice subsampling at the release ratios, bucket
    concat, obj_center re-expressed relative to smpl_center
    (train_data.py:134-136), RGBM3 crop from the stored image_file,
    optional triplane png concat (load_triplane, train_data.py:76-79),
    optional horizontal flip loading the `_flip.npz` labels.
  * data/test_data.py (TestData, 23-232) — `prepare_test_crop`: the
    depth-rescale path of the non-triplane (CHORE-legacy) test loader:
    resize to the 2048px Kinect space, union-bbox crop center, mocap-mesh
    fullbody rescale so the person appears at z_0 = 2.2 m, optional
    mean-crop-center padding, crop_info pkl side output.

In-memory layouts stay TPU-native (channels-last images, (N, 3, 3) pca);
only the on-disk npz schema follows the reference bit-for-bit.
"""
from __future__ import annotations

import json
import os.path as osp
import pickle

import numpy as np

from .images import (compose_rgbm3, crop_around, masks_to_bbox,
                     resize_bilinear)
from .sampling import (GRID_BMAX, GRID_BMIN, MeshDistance, compute_pca_axes,
                       flip_part_labels)
from ..utils.mesh import sample_surface

KINECT_SIZE = (2048, 1536)  # (w, h) of the BEHAVE Kinect color image
MEAN_CROP_CENTER = np.array([1008.0, 995.0])  # test_data.py:36


def _get_sample_num(ratio: float, total: int) -> int:
    """boundary_sampler.py:126-130 with thres = total // 2
    (boundary_sample_all passes thres=sample_num//2)."""
    n = int(ratio * total)
    return max(n, total // 2)


def save_boundary_npz(out_path: str, smpl_verts, smpl_faces, obj_verts,
                      obj_faces, part_labels, body_center, body_kpts,
                      image_file: str, sigmas=(0.08, 0.02, 0.003),
                      ratios=(0.01, 0.49, 0.5), sample_num: int = 20000,
                      grid_ratio: float = 1.0 / 16.0,
                      add_neighbours: bool = False, flip: bool = False,
                      rng: np.random.RandomState | None = None) -> str:
    """Write one frame's precomputed boundary samples in the reference npz
    schema (boundary_sampler.py:boundary_sample_all + the driver's
    image_file key read back by train_data.py:74)."""
    rng = rng or np.random.RandomState()
    smpl_verts = np.asarray(smpl_verts, np.float32)
    obj_verts = np.asarray(obj_verts, np.float32)
    comb_v = np.concatenate([smpl_verts, obj_verts], 0)
    comb_f = np.concatenate(
        [np.asarray(smpl_faces), np.asarray(obj_faces) + len(smpl_verts)], 0)
    md_h = MeshDistance(smpl_verts, smpl_faces)
    md_o = MeshDistance(obj_verts, obj_faces)

    points_all, dh_all, do_all, parts_all = {}, {}, {}, {}
    nh_all, no_all = {}, {}
    for s, r in zip(sigmas, ratios):
        n = _get_sample_num(r, sample_num)
        pts = sample_surface(comb_v, comb_f, n, rng) + s * rng.randn(n, 3)
        grid = (rng.rand(int(grid_ratio * n), 3) * (GRID_BMAX - GRID_BMIN)
                + GRID_BMIN)
        pts = np.concatenate([pts, grid], 0).astype(np.float32)
        d_h, n_h = md_h.query(pts)
        d_o, n_o = md_o.query(pts)
        parts = np.asarray(part_labels)[md_h.nearest_vertex(pts)]
        if flip:
            parts = flip_part_labels(parts)
        key = f"sigma{s}"
        points_all[key] = pts
        dh_all[key] = d_h.astype(np.float32)
        do_all[key] = d_o.astype(np.float32)
        parts_all[key] = parts.astype(np.uint8)
        nh_all[key] = n_h.astype(np.float32)
        no_all[key] = n_o.astype(np.float32)

    data = dict(points=points_all, dist_h=dh_all, dist_o=do_all,
                parts=parts_all,
                pca_axis=compute_pca_axes(obj_verts),
                smpl_center=np.asarray(body_center, np.float32),
                body_kpts=np.asarray(body_kpts, np.float32),
                obj_center=obj_verts.mean(0).astype(np.float32),
                image_file=image_file)
    if add_neighbours:
        data["neighbours_h"] = nh_all
        data["neighbours_o"] = no_all
    np.savez(out_path, **data)
    return out_path if out_path.endswith(".npz") else out_path + ".npz"


def _load_frame_images(rgb_file: str, flip: bool = False):
    """RGB + person/object masks with the reference filename fallbacks
    (base_data.py:96-131), optionally horizontally flipped."""
    from PIL import Image
    rgb = np.asarray(Image.open(rgb_file).convert("RGB"))
    pm_file = rgb_file.replace(".color.jpg", ".person_mask.png")
    if not osp.isfile(pm_file):
        pm_file = rgb_file.replace(".color.jpg", ".person_mask.jpg")
    om_file = None
    for pat in (".obj_rend_mask.png", ".obj_rend_mask.jpg",
                ".obj_mask.png", ".obj_mask.jpg"):
        om_file = rgb_file.replace(".color.jpg", pat)
        if osp.isfile(om_file):
            break
    pm = np.asarray(Image.open(pm_file).convert("L"), np.float32)
    om = np.asarray(Image.open(om_file).convert("L"), np.float32)
    if flip:
        rgb, pm, om = rgb[:, ::-1], pm[:, ::-1], om[:, ::-1]
    return rgb.astype(np.float32), pm, om


def offline_example(npz_path: str, sigmas=(0.08, 0.02, 0.003),
                    ratios=(0.01, 0.49, 0.5), total_samples: int = 20000,
                    crop_size: int = 1200, net_size: int = 512,
                    load_triplane: bool = False, flip: bool = False,
                    visibility: float = 1.0,
                    rng: np.random.RandomState | None = None) -> dict:
    """One training example from a precomputed boundary npz — the offline
    BehaveDataset.get_item/get_samples path (train_data.py:61-141).

    Returns the same batch-ready dict as datasets.sifnet_example so it
    plugs into the SIF-Net train step unchanged.
    """
    rng = rng or np.random.RandomState()
    if flip:
        npz_path = npz_path.replace(".npz", "_flip.npz")
    data = np.load(npz_path, allow_pickle=True)

    pts, dfs_h, dfs_o, parts = [], [], [], []
    for s, r in zip(sigmas, ratios):
        key = f"sigma{s}"
        bucket = data["points"].item()[key]
        n = int(total_samples * r)
        choice = rng.choice(bucket.shape[0], n, replace=False)
        pts.append(bucket[choice])
        dfs_h.append(data["dist_h"].item()[key][choice])
        dfs_o.append(data["dist_o"].item()[key][choice])
        parts.append(data["parts"].item()[key][choice])
    points = np.concatenate(pts, 0).astype(np.float32)
    n = len(points)

    rgb_file = str(data["image_file"])
    rgb, pm, om = _load_frame_images(rgb_file, flip)
    bmin, bmax = masks_to_bbox([pm, om])
    center = (bmin + bmax) // 2
    # train-time crop: around the union-bbox center, no rescale
    # (train_data.py:prepare_image_crop)
    rgb_c = resize_bilinear(crop_around(rgb, center, crop_size),
                            (net_size, net_size)) / 255.0
    pm_c = resize_bilinear(crop_around(pm, center, crop_size),
                           (net_size, net_size)) / 255.0
    om_c = resize_bilinear(crop_around(om, center, crop_size),
                           (net_size, net_size)) / 255.0
    images = compose_rgbm3(rgb_c, pm_c, om_c)
    if load_triplane:
        from PIL import Image
        tri_file = rgb_file.replace(".color.jpg", ".smpl_triplane.png")
        tri = np.asarray(Image.open(tri_file), np.float32)[..., :3] / 255.0
        if flip:
            tri = tri[:, ::-1]
        if tri.shape[0] != net_size:
            tri = resize_bilinear(tri, (net_size, net_size))
        images = np.concatenate([images, tri.astype(np.float32)], -1)

    body_center = np.asarray(data["smpl_center"], np.float32)
    return dict(
        images=images.astype(np.float32),
        points=points,
        df_h=np.concatenate(dfs_h, 0).astype(np.float32),
        df_o=np.concatenate(dfs_o, 0).astype(np.float32),
        parts=np.concatenate(parts, 0).astype(np.int32),
        pca=np.broadcast_to(np.asarray(data["pca_axis"], np.float32),
                            (n, 3, 3)).copy(),
        obj_center=(np.asarray(data["obj_center"], np.float32)
                    - body_center),
        visibility=np.full(n, visibility, np.float32),
        crop_center=center.astype(np.float32),
        body_center=body_center,
    )


# ---------------------------------------------------------------------------
# TestData depth-rescale path (test_data.py)
# ---------------------------------------------------------------------------

def _resize_any(img: np.ndarray, size: tuple[int, int]) -> np.ndarray:
    """PIL bilinear resize to (width, height) without the square-aspect
    assert (the 2048px-space resize rounds the short side)."""
    from PIL import Image
    if img.ndim == 2:
        return np.asarray(Image.fromarray(img.astype(np.float32), "F")
                          .resize(size, Image.BILINEAR))
    chans = [np.asarray(Image.fromarray(img[..., c].astype(np.float32), "F")
                        .resize(size, Image.BILINEAR))
             for c in range(img.shape[-1])]
    return np.stack(chans, -1)


def _bbox_width(j2d: np.ndarray, exp: float = 1.1) -> np.ndarray:
    """(bmax - bmin) * exp of a 2D joint set (test_data.py:get_bbox)."""
    return (j2d.max(0) - j2d.min(0)) * exp


def fullbody_scale(kpts: np.ndarray, mocap_verts: np.ndarray,
                   landmarks, camera, depth: float = 2.2) -> float:
    """Crop-scale factor so the person appears at z_0 (test_data.py:
    178-214): project the mocap mesh's body25 joints at depth z_0, compare
    its joint-bbox size against the detected 2D joints' bbox."""
    if np.sum(kpts[:, 2]) == 0:
        return 1.0
    v = mocap_verts - mocap_verts.mean(0) + np.array([0.0, 0.0, depth])
    j3d = np.asarray(landmarks.body25, np.float64) @ v
    j3d_proj = np.asarray(camera.project_screen(j3d))
    valid = kpts[:, 2] > 0.3
    w, h = _bbox_width(kpts[valid, :2])
    wm, hm = _bbox_width(j3d_proj[valid, :2])
    if w >= h and wm >= hm:
        return float(w / wm)
    return float(h / hm)


def _pad_to_mean_center(img: np.ndarray, crop_center: np.ndarray):
    """Zero-pad so the crop center lands on the BEHAVE mean crop center
    (test_data.py:pad_image)."""
    h, w = img.shape[:2]
    top_left = (MEAN_CROP_CENTER - crop_center).astype(int)
    bottom_right = np.array([w, h]) + top_left
    kw, kh = KINECT_SIZE
    new_size = np.maximum(np.array([kw, kh]), bottom_right).astype(int)
    shape = ((new_size[1], new_size[0]) + img.shape[2:])
    new_img = np.zeros(shape, img.dtype)
    x1y1 = np.maximum(np.zeros(2), top_left).astype(int)
    x2y2 = np.minimum(np.array([kw, kh]), bottom_right).astype(int)
    x1 = max(0, -top_left[0])
    y1 = max(0, -top_left[1])
    x2 = min(w, w - (bottom_right[0] - kw))
    y2 = min(h, h - (bottom_right[1] - kh))
    new_img[x1y1[1]:x2y2[1], x1y1[0]:x2y2[0]] = img[y1:y2, x1:x2]
    return new_img


def prepare_test_crop(rgb_file: str, landmarks, camera,
                      crop_size: int = 1200, net_size: int = 512,
                      use_mean_center: bool = False, depth: float = 2.2,
                      save_crop_info: bool = True) -> dict:
    """The CHORE-legacy TestData item (test_data.py:52-141): crop AND
    rescale the patch so the person appears as if at z_0.

    Returns dict(images (net, net, 5) float32 channels-last, crop_center,
    resize_scale, crop_scale, old_crop_center). Side effect: writes
    `<frame>.crop_info.pkl` next to the RGB (needed by the legacy
    renderers) unless it exists or save_crop_info=False.
    """
    rgb, pm, om = _load_frame_images(rgb_file, flip=False)
    bmin, bmax = masks_to_bbox([pm, om])
    assert bmax[0] > 0, f"no valid mask found for image {rgb_file}"
    crop_center = (bmin + bmax) // 2
    rh, rw = rgb.shape[:2]

    # resize everything into the equivalent 2048px Kinect space
    if rw > rh:
        resize_scale = KINECT_SIZE[0] / rw
        newsize = (KINECT_SIZE[0], int(rh * resize_scale))
    else:
        resize_scale = KINECT_SIZE[1] / rh
        newsize = (int(rw * resize_scale), KINECT_SIZE[1])
    crop_center = np.round(resize_scale * crop_center)
    rgb = _resize_any(rgb, newsize)
    pm = _resize_any(pm, newsize)
    om = _resize_any(om, newsize)

    kpt_file = rgb_file.replace(".color.jpg", ".color.json")
    kpts = np.array(json.load(open(kpt_file))["body_joints"],
                    np.float64).reshape(-1, 3)
    if np.sum(kpts[:, 2]) == 0:
        raise ValueError(f"no valid person keypoints in image {rgb_file}")
    kpts[:, :2] *= resize_scale

    from ..utils.mesh import load_ply
    mocap_verts, _ = load_ply(rgb_file.replace(".color.jpg", ".mocap.ply"))
    scale = fullbody_scale(kpts, mocap_verts, landmarks, camera, depth)
    scaled_crop = scale * crop_size

    old_center = crop_center.copy()
    if use_mean_center:
        rgb = _pad_to_mean_center(rgb, crop_center)
        pm = _pad_to_mean_center(pm, crop_center)
        om = _pad_to_mean_center(om, crop_center)
        crop_center = MEAN_CROP_CENTER.copy()

    rgb_c = resize_bilinear(crop_around(rgb, crop_center, scaled_crop),
                            (net_size, net_size)) / 255.0
    pm_c = resize_bilinear(crop_around(pm, crop_center, scaled_crop),
                           (net_size, net_size)) / 255.0
    om_c = resize_bilinear(crop_around(om, crop_center, scaled_crop),
                           (net_size, net_size)) / 255.0
    images = compose_rgbm3(rgb_c, pm_c, om_c)

    info_file = rgb_file.replace(".color.jpg", ".crop_info.pkl")
    if save_crop_info and not osp.isfile(info_file):
        with open(info_file, "wb") as f:
            pickle.dump({"rgb_newsize": np.array(newsize),
                         "resize_scale": resize_scale,
                         "crop_center": old_center,
                         "crop_scale": scale,
                         "crop_size": scaled_crop}, f)

    return dict(images=images.astype(np.float32),
                crop_center=crop_center.astype(np.float32),
                resize_scale=float(resize_scale),
                crop_scale=float(scale),
                old_crop_center=old_center.astype(np.float32))
