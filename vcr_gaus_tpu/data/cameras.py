"""Camera objects: host-side construction + device-side array view.

The reference's Camera is an nn.Module holding image/depth/normal/mask
tensors and derived transforms (scene/cameras.py:20-73). Here a Camera is a
frozen host dataclass; `CameraArrays` is the jit-facing pytree a train step
consumes (one camera, or stacked into a batch with jax.tree.map).

Conventions match the reference: ``world_view_transform`` and
``full_proj_transform`` are ROW-VECTOR (transposed/GLM) 4x4s
(scene/cameras.py:68-71); points transform as ``p_hom @ M``.
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field
from typing import Callable, NamedTuple

import numpy as np

from ..utils import graphics as G


class CameraArrays(NamedTuple):
    """Device pytree for the jitted render/train path."""
    viewmatrix: np.ndarray       # (4,4) row-vector world->cam
    projmatrix: np.ndarray       # (4,4) row-vector world->clip
    cam_center: np.ndarray       # (3,)
    intr: np.ndarray             # (4,) fx, fy, cx, cy
    tanfov: np.ndarray           # (2,) tanfovx, tanfovy
    image: np.ndarray            # (3,H,W) in [0,1]
    normal: np.ndarray           # (3,H,W) mono normal prior (zeros if absent)
    depth: np.ndarray            # (H,W) mono depth prior (zeros if absent)
    mask: np.ndarray             # (H,W) int32 semantic labels (0=background)
    has_normal: np.ndarray       # () bool
    has_depth: np.ndarray        # () bool
    has_mask: np.ndarray         # () bool
    idx: np.ndarray              # () int32 — appearance-embedding index


@dataclass(frozen=True)
class Camera:
    """Host camera (scene/cameras.py:20-73 equivalent)."""
    colmap_id: int
    idx: int
    image_name: str
    R: np.ndarray                # (3,3) c2w rotation (COLMAP w2c transposed)
    T: np.ndarray                # (3,) w2c translation
    fovx: float
    fovy: float
    width: int
    height: int
    image: np.ndarray | None = None      # (3,H,W) f32 or u8 (u8 = /255)
    normal: np.ndarray | None = None     # (3,H,W) f32 or f16
    depth: np.ndarray | None = None      # (H,W) f32
    mask: np.ndarray | None = None       # (H,W) int
    znear: float = 0.01
    zfar: float = 100.0
    trans: np.ndarray = field(default_factory=lambda: np.zeros(3))
    scale: float = 1.0
    # data_device='lazy' residency (the reference's data_device=cpu analog,
    # bash_scripts/0_train.sh:24): zero-arg decoders keyed by
    # image/normal/depth/mask, invoked per arrays() call — nothing cached
    loaders: dict[str, Callable[[], np.ndarray]] | None = None

    @property
    def world_view_transform(self) -> np.ndarray:
        """Row-vector w2c (the reference stores the transpose of the column
        form, scene/cameras.py:68)."""
        return G.world_to_view(self.R, self.T, self.trans, self.scale).T

    @property
    def projection_matrix(self) -> np.ndarray:
        return G.projection_matrix(self.znear, self.zfar, self.fovx,
                                   self.fovy).T

    @property
    def full_proj_transform(self) -> np.ndarray:
        return self.world_view_transform @ self.projection_matrix

    @property
    def camera_center(self) -> np.ndarray:
        w = self.world_view_transform
        return np.linalg.inv(w.T)[:3, 3]

    @property
    def intrinsics(self) -> np.ndarray:
        """(4,) fx, fy, cx, cy with the principal point at the center
        (tools/graphics_utils.py:89-101)."""
        return np.array([
            G.fov2focal(self.fovx, self.width),
            G.fov2focal(self.fovy, self.height),
            self.width / 2.0, self.height / 2.0], np.float32)

    def _component(self, kind: str):
        arr = getattr(self, kind)
        if arr is None and self.loaders and kind in self.loaders:
            arr = self.loaders[kind]()
        return arr

    def arrays(self, pixels: bool = True) -> CameraArrays:
        """Materialize the jit-facing f32 pytree. Compact host storage
        (u8 images, f16 normals) and lazy loaders are resolved here, so
        the full-precision stack exists only transiently per use.

        ``pixels=False`` skips image/normal/depth/mask decode entirely and
        carries 1x1 placeholders — for geometry-only consumers
        (render_stats sweeps: the reference's prune_list/get_visi_list
        never read the camera pixels, tools/prune.py:25-69)."""
        h, w = self.height, self.width
        if not pixels:
            return CameraArrays(
                viewmatrix=self.world_view_transform.astype(np.float32),
                projmatrix=self.full_proj_transform.astype(np.float32),
                cam_center=self.camera_center.astype(np.float32),
                intr=self.intrinsics,
                tanfov=np.array([math.tan(self.fovx / 2),
                                 math.tan(self.fovy / 2)], np.float32),
                image=np.zeros((3, 1, 1), np.float32),
                normal=np.zeros((3, 1, 1), np.float32),
                depth=np.zeros((1, 1), np.float32),
                mask=np.zeros((1, 1), np.int32),
                has_normal=np.asarray(False),
                has_depth=np.asarray(False),
                has_mask=np.asarray(False),
                idx=np.asarray(self.idx, np.int32),
            )
        img = self._component("image")
        if img is None:
            img = np.zeros((3, h, w), np.float32)
        elif img.dtype == np.uint8:
            img = img.astype(np.float32) / 255.0
        normal = self._component("normal")
        depth = self._component("depth")
        mask = self._component("mask")
        return self._assemble(img, normal, depth, mask)

    def compact_arrays(self) -> CameraArrays:
        """CameraArrays in COMPACT storage dtypes (u8 image, f16 normal, …)
        for ONE-TIME device residency: `decode_arrays` (the device-side
        analog of `arrays()`'s normalization) turns the resident copy into
        the f32 jit-facing pytree with zero further host↔device traffic —
        the reference keeps whole tensors on the GPU (data_device=cuda,
        scene/cameras.py:35-46); this is the HBM-frugal equivalent for a
        backend where every host→device byte rides a slow link. Missing
        components materialize as full-size compact zeros so per-camera
        pytrees stack uniformly (matching arrays()' zero semantics)."""
        h, w = self.height, self.width
        img = self._component("image")
        if img is None:
            img = np.zeros((3, h, w), np.uint8)
        normal = self._component("normal")
        has_n = normal is not None
        if not has_n:
            normal = np.zeros((3, h, w), np.float16)
        depth = self._component("depth")
        has_d = depth is not None
        if not has_d:
            depth = np.zeros((h, w), np.float32)
        mask = self._component("mask")
        has_m = mask is not None
        if not has_m:
            mask = np.zeros((h, w), np.uint8)
        return CameraArrays(
            viewmatrix=self.world_view_transform.astype(np.float32),
            projmatrix=self.full_proj_transform.astype(np.float32),
            cam_center=self.camera_center.astype(np.float32),
            intr=self.intrinsics,
            tanfov=np.array([math.tan(self.fovx / 2),
                             math.tan(self.fovy / 2)], np.float32),
            image=img, normal=normal, depth=depth, mask=mask,
            has_normal=np.asarray(has_n),
            has_depth=np.asarray(has_d),
            has_mask=np.asarray(has_m),
            idx=np.asarray(self.idx, np.int32),
        )

    def _assemble(self, img, normal, depth, mask) -> CameraArrays:  # noqa: D401
        h, w = self.height, self.width
        return CameraArrays(
            viewmatrix=self.world_view_transform.astype(np.float32),
            projmatrix=self.full_proj_transform.astype(np.float32),
            cam_center=self.camera_center.astype(np.float32),
            intr=self.intrinsics,
            tanfov=np.array([math.tan(self.fovx / 2), math.tan(self.fovy / 2)],
                            np.float32),
            image=img.astype(np.float32, copy=False),
            normal=(normal if normal is not None else
                    np.zeros((3, h, w), np.float32)).astype(np.float32),
            depth=(depth if depth is not None else
                   np.zeros((h, w), np.float32)).astype(np.float32),
            mask=(mask if mask is not None else
                  np.zeros((h, w), np.int32)).astype(np.int32),
            has_normal=np.asarray(
                normal is not None),
            has_depth=np.asarray(depth is not None),
            has_mask=np.asarray(mask is not None),
            idx=np.asarray(self.idx, np.int32),
        )


def decode_arrays(c: CameraArrays) -> CameraArrays:
    """Device-side analog of ``Camera.arrays()``'s dtype normalization for a
    ``compact_arrays()`` pytree: u8 image → f32/255, f16 normal/depth → f32,
    mask → int32. Pure jnp (jit-safe); produces exactly the values
    ``arrays()`` would — the pair lets a trainer keep cameras device-
    resident in compact form and decode per use on device instead of
    re-uploading f32 stacks through the host link every step."""
    import jax.numpy as jnp

    img = jnp.asarray(c.image)
    img = (img.astype(jnp.float32) / 255.0 if img.dtype == jnp.uint8
           else img.astype(jnp.float32))
    return c._replace(
        image=img,
        normal=jnp.asarray(c.normal).astype(jnp.float32),
        depth=jnp.asarray(c.depth).astype(jnp.float32),
        mask=jnp.asarray(c.mask).astype(jnp.int32),
    )
