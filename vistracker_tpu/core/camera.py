"""Camera projection as pure JAX functions.

Parity targets: /root/reference/model/camera.py (KinectColorCamera,
KinectOrthCamera). Intrinsics are plain Python floats inside a frozen
dataclass, so they are compile-time constants under jit and fold into the
projection arithmetic.

Coordinate conventions (identical to the reference):
  * points live in the Kinect color-camera frame, +z forward, meters
  * `project_screen` maps to full-resolution pixel coordinates
  * `normalize_crop` re-centers around a per-example crop center and maps to
    [-1, 1] across `crop_size` pixels — the range grid sampling expects
"""
from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

# Kinect Azure color camera defaults used throughout BEHAVE
# (reference model/camera.py:26-33, normalized by image width 2048).
KINECT_FX = 979.7844 / 2048.0
KINECT_FY = 979.840 / 2048.0
KINECT_CX = 1018.952 / 2048.0
KINECT_CY = 779.486 / 2048.0


@dataclasses.dataclass(frozen=True)
class PerspectiveCamera:
    """Pinhole camera with normalized intrinsics (relative to image width)."""

    crop_size: int = 1200
    fx: float = KINECT_FX
    fy: float = KINECT_FY
    cx: float = KINECT_CX
    cy: float = KINECT_CY
    width: int = 2048
    height: int = 1536

    @property
    def fx_px(self) -> float:
        return self.fx * self.width

    @property
    def fy_px(self) -> float:
        return self.fy * self.width

    @property
    def cx_px(self) -> float:
        return self.cx * self.width

    @property
    def cy_px(self) -> float:
        return self.cy * self.width

    def project_screen(self, points: jax.Array) -> jax.Array:
        """Project (..., N, 3) points to full-image pixel coords (..., N, 2)."""
        z = points[..., 2:3]
        px = self.fx_px * points[..., 0:1] / z + self.cx_px
        py = self.fy_px * points[..., 1:2] / z + self.cy_px
        return jnp.concatenate([px, py], axis=-1)

    def normalize_crop(self, pix: jax.Array, crop_center: jax.Array) -> jax.Array:
        """Map full-image pixels into [-1, 1] of a crop around crop_center.

        pix: (..., N, 2) pixel coordinates; crop_center: (..., 2).
        Parity: camera.py:normalize — local = crop_size/2 + pix - center,
        then 2*local/crop_size - 1.
        """
        local = self.crop_size / 2.0 + pix - crop_center[..., None, :]
        return 2.0 * local / self.crop_size - 1.0

    def project_points(self, points: jax.Array, crop_center: jax.Array) -> jax.Array:
        """Project (..., N, 3) camera-frame points to crop-normalized coords.

        Returns (..., N, 3): normalized x, y in [-1, 1] plus the raw z.
        (The reference returns (B, 3, N); we keep channels-last and let
        callers transpose when feeding image-layout ops.)
        """
        pix = self.project_screen(points)
        nxy = self.normalize_crop(pix, crop_center)
        return jnp.concatenate([nxy, points[..., 2:3]], axis=-1)


def triplane_project(points: jax.Array, body_center: jax.Array,
                     fx: float = 1.0, cx: float = 0.0) -> jax.Array:
    """Orthographic projection of points onto right/back/top planes.

    points: (..., N, 3) camera-frame points; body_center: (..., 3).
    Returns (..., 3, N, 2) normalized plane coordinates, plane order
    [right, back, top], axis conventions matching the reference
    (model/chore_triplane.py:triplane_project / render_triplane_nr.py):
        right: (x', y') = ( z, y)
        back : (x', y') = (-x, y)
        top  : (x', y') = ( x,-z)
    """
    c = points - body_center[..., None, :]
    x, y, z = c[..., 0], c[..., 1], c[..., 2]
    right = jnp.stack([z * fx + cx, y * fx + cx], axis=-1)
    back = jnp.stack([-x * fx + cx, y * fx + cx], axis=-1)
    top = jnp.stack([x * fx + cx, -z * fx + cx], axis=-1)
    return jnp.stack([right, back, top], axis=-3)
