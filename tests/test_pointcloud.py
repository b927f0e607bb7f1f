"""Point-cloud export: pinhole back-projection + PLY round-trip
(utils/pointcloud.py — the 3-D output surface of the depth models)."""

import numpy as np
import pytest

from ann3depth_tpu.utils import pointcloud as pc


def test_backproject_plane_geometry():
    """A constant-depth plane back-projects to z == z0 with x spanning
    +-z0*tan(fov/2) at the image edges (pinhole definition)."""
    h, w, z0, fov = 40, 60, 5.0, 60.0
    depth = np.full((h, w), z0, np.float32)
    pts, colors = pc.backproject(depth, fov_deg=fov)
    assert colors is None and pts.shape == (h * w, 3)
    np.testing.assert_allclose(pts[:, 2], z0, rtol=1e-6)
    half_span = z0 * np.tan(np.deg2rad(fov) / 2.0)
    # outermost pixel CENTER sits half a pixel inside the frustum edge
    expect = half_span * (w - 1) / w
    np.testing.assert_allclose(pts[:, 0].max(), expect, rtol=1e-5)
    np.testing.assert_allclose(pts[:, 0].min(), -expect, rtol=1e-5)
    # symmetric about the optical axis
    np.testing.assert_allclose(pts[:, 0].mean(), 0.0, atol=1e-5)
    np.testing.assert_allclose(pts[:, 1].mean(), 0.0, atol=1e-5)


def test_backproject_masks_invalid_and_takes_colors():
    depth = np.full((4, 6), 2.0, np.float32)
    depth[0, 0] = 0.0  # invalid -> dropped
    rgb = np.arange(4 * 6 * 3, dtype=np.uint8).reshape(4, 6, 3)
    pts, colors = pc.backproject(depth, rgb=rgb)
    assert pts.shape == (23, 3) and colors.shape == (23, 3)
    # first surviving pixel is (0, 1)
    np.testing.assert_array_equal(colors[0], rgb[0, 1])
    with pytest.raises(ValueError, match="does not match"):
        pc.backproject(depth, rgb=rgb[:2])
    with pytest.raises(ValueError, match="fov_deg"):
        pc.backproject(depth, fov_deg=180.0)


@pytest.mark.parametrize("binary", [True, False])
@pytest.mark.parametrize("with_colors", [True, False])
def test_ply_round_trip(tmp_path, binary, with_colors):
    rng = np.random.default_rng(0)
    pts = rng.normal(size=(37, 3)).astype(np.float32)
    colors = (rng.integers(0, 256, (37, 3), dtype=np.uint8)
              if with_colors else None)
    path = str(tmp_path / "c.ply")
    pc.write_ply(path, pts, colors, binary=binary)
    got_pts, got_colors = pc.read_ply(path)
    np.testing.assert_allclose(got_pts, pts,
                               rtol=0 if binary else 1e-5,
                               atol=0 if binary else 1e-6)
    if with_colors:
        np.testing.assert_array_equal(got_colors, colors)
    else:
        assert got_colors is None


def test_depth_to_ply_end_to_end(tmp_path):
    depth = np.linspace(1.0, 9.0, 5 * 8, dtype=np.float32).reshape(5, 8)
    n = pc.depth_to_ply(str(tmp_path / "d.ply"), depth[..., None])
    assert n == depth.size
    pts, _ = pc.read_ply(str(tmp_path / "d.ply"))
    np.testing.assert_allclose(np.sort(pts[:, 2]), np.sort(depth.ravel()),
                               rtol=1e-6)
