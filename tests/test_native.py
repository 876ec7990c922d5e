"""Native (C++) ray-store builder / cache packer vs the numpy/jnp spec."""

import numpy as np
import pytest

from nerf_tpu import native
from nerf_tpu.data import build_ray_store, pose_spherical

pytestmark = pytest.mark.skipif(
    not native.available(), reason="no C++ toolchain / native lib unavailable"
)


def _fixture(n=3, h=16, w=20):
    rng = np.random.default_rng(0)
    images = rng.uniform(0, 1, (n, h, w, 3)).astype(np.float32)
    poses = np.stack(
        [pose_spherical(30.0 * i, -20.0 - 5 * i, 4.0) for i in range(n)]
    )
    return images, poses, h, w, 25.0


def test_native_matches_python_spec():
    images, poses, h, w, focal = _fixture()
    ro_n, rd_n, rgb_n = build_ray_store(images, poses, h, w, focal, use_native=True)
    ro_p, rd_p, rgb_p = build_ray_store(images, poses, h, w, focal, use_native=False)
    np.testing.assert_allclose(ro_n, ro_p, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(rd_n, rd_p, rtol=1e-5, atol=1e-6)
    np.testing.assert_array_equal(rgb_n, rgb_p)


def test_native_cache_roundtrip(tmp_path):
    images, poses, h, w, focal = _fixture()
    ro, rd, rgb = build_ray_store(images, poses, h, w, focal)
    path = str(tmp_path / "rays.nrc")
    native.pack_ray_cache(path, ro, rd, rgb, h, w, focal, 2.0, 6.0)
    ro2, rd2, rgb2, meta = native.load_ray_cache_native(path)
    np.testing.assert_array_equal(ro, ro2)
    np.testing.assert_array_equal(rd, rd2)
    np.testing.assert_array_equal(rgb, rgb2)
    assert meta == {
        "height": h, "width": w, "focal": focal, "near": 2.0, "far": 6.0
    }


def test_native_cache_rejects_garbage(tmp_path):
    bad = tmp_path / "bad.nrc"
    bad.write_bytes(b"not a cache file at all, definitely" * 4)
    with pytest.raises(IOError):
        native.load_ray_cache_native(str(bad))


def test_native_without_images():
    _, poses, h, w, focal = _fixture()
    ro, rd, rgb = native.build_ray_store_native(
        poses[:, :3, :4], None, h, w, focal
    )
    assert ro.shape == (3 * h * w, 3) and rgb is None
    # origins are the camera centers
    np.testing.assert_allclose(ro[0], poses[0][:3, 3], rtol=1e-6)
