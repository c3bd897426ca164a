"""Host-side image preprocessing for network inputs.

Parity targets: data/base_data.py (crop-around-center with zero padding,
aspect-checked resize, compose_images = RGB masked by person|object union +
person mask + object mask = the 5-channel RGBM3 input) and
train_data.py:prepare_image_crop / get_crop_center (crop center = center of
the union bbox of both masks).

numpy + PIL only (no cv2 in this image).
"""
from __future__ import annotations

import numpy as np


def crop_around(img: np.ndarray, center, crop_size: int) -> np.ndarray:
    """Square crop around `center` (x, y), zero-padded at image borders
    (base_data.py:204-235 semantics, including its x2/y2 clamping to
    size-1)."""
    h, w = img.shape[:2]
    center = np.asarray(center, np.float64)
    topleft = np.round(center - crop_size / 2).astype(int)
    bottom_right = np.round(center + crop_size / 2).astype(int)
    x1, y1 = max(0, topleft[0]), max(0, topleft[1])
    x2, y2 = min(w - 1, bottom_right[0]), min(h - 1, bottom_right[1])
    cropped = img[y1:y2, x1:x2]
    p1 = max(0, -topleft[0])
    p2 = max(0, -topleft[1])
    p3 = max(0, bottom_right[0] - w + 1)
    p4 = max(0, bottom_right[1] - h + 1)
    pad = [[p2, p4], [p1, p3]] + [[0, 0]] * (img.ndim - 2)
    return np.pad(cropped, pad)


def resize_bilinear(img: np.ndarray, size: tuple[int, int]) -> np.ndarray:
    """Resize to (width, height) with PIL bilinear (cv2.INTER_LINEAR analog);
    aspect ratio must match (base_data.py:237-250)."""
    from PIL import Image
    h, w = img.shape[:2]
    assert w * size[1] == h * size[0], \
        f"aspect mismatch: image {img.shape} vs target {size}"
    if img.ndim == 2:
        return np.asarray(Image.fromarray(img.astype(np.float32), "F")
                          .resize(size, Image.BILINEAR))
    chans = [np.asarray(Image.fromarray(img[..., c].astype(np.float32), "F")
                        .resize(size, Image.BILINEAR))
             for c in range(img.shape[-1])]
    return np.stack(chans, -1)


def masks_to_bbox(masks) -> tuple[np.ndarray, np.ndarray]:
    """Union bbox (bmin, bmax) in (x, y) of a list of binary masks."""
    union = np.zeros(masks[0].shape, bool)
    for m in masks:
        union |= m > 0.5
    ys, xs = np.nonzero(union)
    if len(xs) == 0:
        h, w = union.shape
        return np.array([0, 0]), np.array([w - 1, h - 1])
    return np.array([xs.min(), ys.min()]), np.array([xs.max(), ys.max()])


def crop_center_from_masks(person_mask: np.ndarray,
                           obj_mask: np.ndarray) -> np.ndarray:
    bmin, bmax = masks_to_bbox([person_mask, obj_mask])
    return (bmin + bmax) // 2


def compose_rgbm3(rgb: np.ndarray, person_mask: np.ndarray,
                  obj_mask: np.ndarray) -> np.ndarray:
    """5-channel RGBM3 input: background-removed RGB + both masks,
    channels-LAST (we are TPU-native; the reference transposes to CHW)."""
    union = (person_mask > 0.5) | (obj_mask > 0.5)
    rgb = rgb * union[..., None]
    return np.dstack([rgb, person_mask, obj_mask]).astype(np.float32)


def prepare_input_crop(rgb: np.ndarray, person_mask: np.ndarray,
                       obj_mask: np.ndarray, crop_size: int = 1200,
                       net_size: int = 512):
    """Full preprocessing of one frame -> ((net, net, 5) image, crop_center).

    rgb uint8 (H, W, 3); masks float/bool (H, W). Parity:
    train_data.py:prepare_image_crop.
    """
    pm = person_mask.astype(np.float32) * (255.0 if person_mask.dtype == bool
                                           else 1.0)
    om = obj_mask.astype(np.float32) * (255.0 if obj_mask.dtype == bool
                                        else 1.0)
    center = crop_center_from_masks(pm, om)
    rgb_c = resize_bilinear(crop_around(rgb.astype(np.float32), center,
                                        crop_size),
                            (net_size, net_size)) / 255.0
    pm_c = resize_bilinear(crop_around(pm, center, crop_size),
                           (net_size, net_size)) / 255.0
    om_c = resize_bilinear(crop_around(om, center, crop_size),
                           (net_size, net_size)) / 255.0
    return compose_rgbm3(rgb_c, pm_c, om_c), center.astype(np.float32)
