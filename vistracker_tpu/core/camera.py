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

# InterCap dataset cameras (6 kinects, 1920x1080 — reference
# render/nr_utils.py:224-240 get_intercap_K and config/tri-icap.json
# camera_params, normalized by image width 1920).
ICAP_SIZE = 1920
ICAP_FOCALS = (
    (918.457763671875, 918.4373779296875),
    (915.29962158203125, 915.1966552734375),
    (912.8626708984375, 912.67633056640625),
    (909.82025146484375, 909.62469482421875),
    (920.533447265625, 920.09722900390625),
    (909.17633056640625, 909.23529052734375),
)
ICAP_CENTERS = (
    (956.9661865234375, 555.944580078125),
    (956.664306640625, 551.6165771484375),
    (956.72003173828125, 554.2166748046875),
    (957.6181640625, 554.60296630859375),
    (958.4615478515625, 550.42987060546875),
    (956.14801025390625, 555.01593017578125),
)


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


def intercap_camera(kid: int = 0, crop_size: int = 800) -> PerspectiveCamera:
    """InterCap color camera for kinect `kid` (0..5).

    Intrinsics from nr_utils.py:224-240; the release tri-icap.json uses
    kid 0 with crop_size 800 (camera_params / loadSize)."""
    assert 0 <= kid < 6, f"invalid InterCap kinect index {kid}"
    fx, fy = ICAP_FOCALS[kid]
    cx, cy = ICAP_CENTERS[kid]
    return PerspectiveCamera(
        crop_size=crop_size, fx=fx / ICAP_SIZE, fy=fy / ICAP_SIZE,
        cx=cx / ICAP_SIZE, cy=cy / ICAP_SIZE,
        width=ICAP_SIZE, height=1080)


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
