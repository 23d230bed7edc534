"""Scene loading from a synthetic COLMAP layout."""

import os

import numpy as np
import pytest

from fixtures import write_colmap_scene
from vcr_gaus_tpu.data.scene import (camera_to_json, load_scene_info,
                                     read_colmap_scene)


@pytest.fixture(scope="module")
def scene_dir(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("cube_scene"))
    write_colmap_scene(root, with_priors=True)
    return root


def test_read_colmap_scene(scene_dir):
    info = read_colmap_scene(scene_dir, eval_split=False, resolution=1)
    assert len(info.train_cameras) == 8
    assert len(info.test_cameras) == 0
    assert info.points.shape[1] == 3
    assert info.radius > 0
    # meta.json derived + persisted
    assert os.path.exists(os.path.join(scene_dir, "meta.json"))
    cam = info.train_cameras[0]
    assert cam.image.shape == (3, 48, 64)
    # compact host residency: u8 storage, f32/255 only in arrays()
    assert cam.image.dtype == np.uint8
    arr = cam.arrays()
    assert arr.image.dtype == np.float32
    assert 0 <= arr.image.min() and arr.image.max() <= 1
    # camera geometry: all cameras look at the cube => center projects inside
    for c in info.train_cameras:
        w2c = c.world_view_transform            # row-vector
        p = np.array([0, 0, 0, 1.0]) @ w2c
        assert p[2] > 0                          # in front of camera
    # cameras.json entry roundtrip
    j = camera_to_json(0, cam)
    assert j["width"] == 64 and len(j["position"]) == 3


def test_eval_split_llffhold(scene_dir):
    info = read_colmap_scene(scene_dir, eval_split=True, llffhold=4,
                             resolution=1)
    assert len(info.test_cameras) == 2
    assert len(info.train_cameras) == 6


def test_priors_loaded(scene_dir):
    info = read_colmap_scene(scene_dir, eval_split=False, load_normal=True,
                             load_mask=True, resolution=1)
    cam = info.train_cameras[0]
    assert cam.normal is not None and cam.normal.shape == (3, 48, 64)
    assert cam.mask is not None and cam.mask.shape == (48, 64)
    arr = cam.arrays()
    assert bool(arr.has_normal) and bool(arr.has_mask)


def test_lazy_data_device(scene_dir):
    """data_device='lazy' keeps no pixel arrays resident; arrays() decodes
    per use and matches the cached-mode output exactly (SURVEY §7.3#7 /
    reference data_device=cpu analog)."""
    host = read_colmap_scene(scene_dir, eval_split=False, load_normal=True,
                             load_mask=True, resolution=1)
    lazy = read_colmap_scene(scene_dir, eval_split=False, load_normal=True,
                             load_mask=True, resolution=1,
                             data_device="lazy")
    for ch, cl in zip(host.train_cameras, lazy.train_cameras):
        assert cl.image is None and cl.normal is None and cl.mask is None
        assert set(cl.loaders) == {"image", "normal", "mask"}
        ah, al = ch.arrays(), cl.arrays()
        np.testing.assert_array_equal(ah.image, al.image)
        np.testing.assert_array_equal(ah.normal, al.normal)
        np.testing.assert_array_equal(ah.mask, al.mask)
        assert bool(al.has_normal) and bool(al.has_mask)
    # compact dtypes in host mode
    ch = host.train_cameras[0]
    assert ch.image.dtype == np.uint8
    assert ch.normal.dtype == np.float16


def test_dispatch(scene_dir):
    info = load_scene_info(scene_dir, resolution=1)
    assert len(info.train_cameras) == 8


def test_resolution_downscale(scene_dir):
    info = read_colmap_scene(scene_dir, eval_split=False, resolution=2)
    cam = info.train_cameras[0]
    assert cam.image.shape == (3, 24, 32)
    assert cam.width == 32 and cam.height == 24


def test_reprojection_consistency(scene_dir):
    """Known 3D cube corners project inside the image bounds for each cam."""
    info = read_colmap_scene(scene_dir, eval_split=False, resolution=1)
    corners = np.array([[1, 1, 1], [-1, -1, -1], [1, -1, 1.0]])
    for cam in info.train_cameras:
        hom = np.concatenate([corners, np.ones((3, 1))], 1)
        clip = hom @ cam.full_proj_transform
        ndc = clip[:, :3] / clip[:, 3:4]
        assert np.all(np.abs(ndc[:, :2]) < 1.2)


def test_compact_arrays_decode_matches_arrays(scene_dir):
    """compact_arrays() + decode_arrays() (the device-cache path the
    trainer stages cameras through) must reproduce arrays() EXACTLY for
    every component and dtype combination: u8 image (f32/255), f16 normal,
    depth, mask, and full-size-zero placeholders for missing pieces."""
    from vcr_gaus_tpu.data.cameras import decode_arrays

    info = read_colmap_scene(scene_dir, eval_split=False, resolution=1)
    for cam in (info.train_cameras[0],
                # missing priors: full-size zero placeholders
                info.train_cameras[1].__class__(
                    **{**info.train_cameras[1].__dict__,
                       "normal": None, "depth": None, "mask": None,
                       "loaders": None})):
        ref = cam.arrays()
        dec = decode_arrays(cam.compact_arrays())
        for f in ref._fields:
            a, b = getattr(ref, f), np.asarray(getattr(dec, f))
            assert a.shape == b.shape, f
            assert a.dtype == b.dtype, (f, a.dtype, b.dtype)
            np.testing.assert_array_equal(a, b, err_msg=f)


def test_device_cam_cache_lru_and_values(scene_dir):
    """_DeviceCamCache: staged stacks equal the host path bit-for-bit; the
    byte cap evicts least-recently-used entries."""
    import jax

    from vcr_gaus_tpu.data.cameras import decode_arrays
    from vcr_gaus_tpu.parallel import dp
    from vcr_gaus_tpu.train.trainer import _DeviceCamCache

    info = read_colmap_scene(scene_dir, eval_split=False, resolution=1)
    cams = info.train_cameras
    cache = _DeviceCamCache(cams, cap_bytes=1 << 30)
    stack = jax.tree.map(
        lambda *xs: np.stack(xs),
        *[decode_arrays(cache.get(i)) for i in range(3)])
    host = dp.stack_cameras([cams[i].arrays() for i in range(3)])
    for f in host._fields:
        np.testing.assert_array_equal(np.asarray(getattr(stack, f)),
                                      getattr(host, f), err_msg=f)

    # LRU eviction: cap to ~2 cameras' bytes
    one = sum(int(x.nbytes)
              for x in jax.tree.leaves(cams[0].compact_arrays()))
    small = _DeviceCamCache(cams, cap_bytes=int(one * 2.5))
    small.get(0), small.get(1)
    small.get(0)                      # 0 now most-recent
    small.get(2)                      # evicts 1
    assert set(small._store) == {0, 2}
    assert small._bytes <= int(one * 2.5)
