"""Warp stage: cameras, splat (vs brute-force numpy oracle), crack filling,
end-to-end warp."""

import jax.numpy as jnp
import numpy as np
import pytest

from worldforge_tpu.warp.cameras import (dc_apply_zoom, dc_camera_seq,
                                         dc_look_right_seq, vggt_camera_seq)
from worldforge_tpu.warp.geometry import (cam_to_world, dc_unproject,
                                          dc_intrinsic, unproject_depth)
from worldforge_tpu.warp.splat import splat_disk, splat_nearest
from worldforge_tpu.warp.cracks import fill_small_cracks
from worldforge_tpu.warp.vggt_warp import warp_single_image
from worldforge_tpu.warp.dc_warp import warp_video


# ----------------------------------------------------------- cameras


def test_vggt_camera_frame0_is_identity_like():
    """First frame of any sequence must equal the input extrinsic (deg 0)."""
    e = np.eye(4)
    for d in ["up", "right", "forward", "backward", "left_pan", "up_pan"]:
        cams = vggt_camera_seq(e, d, 20.0, 5, look_at_depth=2.0)
        np.testing.assert_allclose(cams[0], e, atol=1e-9)
        assert cams.shape == (5, 4, 4)


def test_vggt_orbit_preserves_lookat_distance():
    """Orbit cameras stay at constant distance from the look-at point."""
    e = np.eye(4)
    depth = 3.0
    cams = vggt_camera_seq(e, "right", 30.0, 8, look_at_depth=depth)
    look_at = np.array([0, 0, depth])
    for c in cams:
        pos = -c[:3, :3].T @ c[:3, 3]
        np.testing.assert_allclose(np.linalg.norm(pos - look_at), depth,
                                   rtol=1e-6)
        # camera z-axis points at the look-at point
        z = c[:3, :3][2]  # third row of w2c R = viewing dir in world
        to_look = look_at - pos
        np.testing.assert_allclose(z, to_look / np.linalg.norm(to_look),
                                   atol=1e-6)


def test_vggt_pan_keeps_position():
    e = np.eye(4)
    e[:3, 3] = [1.0, 2.0, 3.0]
    cams = vggt_camera_seq(e, "right_pan", 25.0, 6, 1.0)
    pos0 = -e[:3, :3].T @ e[:3, 3]
    for c in cams:
        pos = -c[:3, :3].T @ c[:3, 3]
        np.testing.assert_allclose(pos, pos0, atol=1e-9)


def test_dc_camera_schedules():
    cams = dc_camera_seq("right", 20.0, 10, 2.0)
    assert cams.shape == (10, 4, 4)
    stable = dc_camera_seq("right", 20.0, 10, 2.0, stable=True,
                           stable_frame=4)
    # after stable_frame the camera holds still
    np.testing.assert_allclose(stable[4], stable[9], atol=1e-12)
    assert not np.allclose(stable[0], stable[3])


# ----------------------------------------------------------- splat oracle


def _oracle_splat_nearest(points_cam, colors, K, valid, h, w):
    img = np.zeros((h, w, colors.shape[1]), np.float32)
    zbuf = np.full((h, w), np.inf)
    mask = np.zeros((h, w), bool)
    for i in range(points_cam.shape[1]):
        if not valid[i]:
            continue
        z = points_cam[2, i]
        if abs(z) <= 1e-6:
            continue
        u = K[0, 0] * points_cam[0, i] / z + K[0, 2]
        v = K[1, 1] * points_cam[1, i] / z + K[1, 2]
        if not (0 <= u < w and 0 <= v < h):
            continue
        ui, vi = int(round(u)), int(round(v))
        ui, vi = min(ui, w - 1), min(vi, h - 1)
        if z < zbuf[vi, ui]:
            zbuf[vi, ui] = z
            img[vi, ui] = colors[i]
            mask[vi, ui] = True
    return img, mask, zbuf


def test_splat_nearest_matches_bruteforce(rng):
    h, w, n = 16, 20, 400
    pts = rng.standard_normal((3, n)).astype(np.float32)
    pts[2] = np.abs(pts[2]) + 0.5
    colors = rng.uniform(0, 1, (n, 3)).astype(np.float32)
    K = np.array([[10.0, 0, w / 2], [0, 10.0, h / 2], [0, 0, 1]], np.float32)
    valid = rng.uniform(size=n) > 0.1
    img, mask, depth = splat_nearest(jnp.asarray(pts), jnp.asarray(colors),
                                     jnp.asarray(K), jnp.asarray(valid),
                                     h=h, w=w)
    oi, om, oz = _oracle_splat_nearest(pts, colors, K, valid, h, w)
    np.testing.assert_array_equal(np.asarray(mask), om)
    np.testing.assert_allclose(np.asarray(img), oi, atol=1e-5)
    d = np.asarray(depth)
    np.testing.assert_allclose(np.where(om, d, 0), np.where(om, oz, 0),
                               atol=1e-5)


def test_splat_disk_covers_neighbors(rng):
    """A point projected between pixel centers covers the nearby centers."""
    h = w = 8
    K = np.array([[1.0, 0, 3.5], [0, 1.0, 3.5], [0, 0, 1]], np.float32)
    pts = np.array([[0.0, 0.0, 1.0]], np.float32)  # projects to (3.5, 3.5)
    col = np.ones((1, 3), np.float32)
    img, mask = splat_disk(jnp.asarray(pts), jnp.asarray(col),
                           jnp.asarray(np.eye(4), jnp.float32),
                           jnp.asarray(K), h=h, w=w, radius_ndc=0.2)
    m = np.asarray(mask)
    # radius_px = 0.2*8/2 = 0.8 > 0.707 -> the 4 surrounding centers covered
    assert m[3, 3] and m[3, 4] and m[4, 3] and m[4, 4]
    assert m.sum() == 4


def test_unprojection_roundtrip(rng):
    depth = rng.uniform(1.0, 5.0, (6, 8)).astype(np.float32)
    K = np.array([[8.0, 0, 4.0], [0, 8.0, 3.0], [0, 0, 1]], np.float32)
    pts = unproject_depth(jnp.asarray(depth), jnp.asarray(K))
    np.testing.assert_allclose(np.asarray(pts[2]).reshape(6, 8), depth,
                               rtol=1e-6)
    # identity extrinsic: world == cam
    world = cam_to_world(pts, jnp.asarray(np.eye(4), jnp.float32))
    np.testing.assert_allclose(np.asarray(world), np.asarray(pts), atol=1e-6)


# ----------------------------------------------------------- crack fill


def test_fill_small_cracks_fills_single_hole():
    img = np.ones((8, 8, 3), np.float32) * 0.5
    mask = np.ones((8, 8), np.uint8)
    mask[4, 4] = 0
    img[4, 4] = 0
    fi, fm = fill_small_cracks(img, mask, None)
    assert fm[4, 4] == 1
    np.testing.assert_allclose(fi[4, 4], 0.5, atol=1e-5)


def test_fill_small_cracks_keeps_large_holes():
    img = np.ones((12, 12, 3), np.float32)
    mask = np.ones((12, 12), np.uint8)
    mask[2:10, 2:10] = 0  # 8x8 hole: too big for 3x3 closing
    fi, fm = fill_small_cracks(img, mask, None)
    assert fm[5, 5] == 0  # interior stays a hole


# ----------------------------------------------------------- end to end


def test_warp_single_image_end_to_end(rng):
    h, w = 24, 32
    img = rng.uniform(0, 1, (h, w, 3)).astype(np.float32)
    # smooth depth ramp (random per-pixel depth would fragment the
    # depth-band segmentation and outlier removal would erase everything)
    depth = (2.0 + np.linspace(0, 2, w)[None, :]
             + np.linspace(0, 0.5, h)[:, None]).astype(np.float32)
    K = np.array([[20.0, 0, w / 2], [0, 20.0, h / 2], [0, 0, 1]], np.float32)
    imgs, masks, infos = warp_single_image(
        np.eye(4), K, img, depth, direction="right", degree=10.0,
        frame_num=4, conf_threshold=1.0, look_at_depth=1.0)
    assert len(imgs) == 4 and len(masks) == 4
    assert infos[0]["type"] == "original"
    assert masks[0].all()
    assert imgs[1].dtype == np.uint8
    # later frames have some holes but mostly valid content
    assert 0.3 < masks[-1].mean() <= 1.0


def test_warp_video_end_to_end(rng):
    t, h, w = 3, 24, 32
    frames = rng.uniform(0, 1, (t, h, w, 3)).astype(np.float32)
    depth = rng.uniform(0.2, 1.0, (t, h, w)).astype(np.float32)
    rend, masks = warp_video(frames, depth, direction="up", degree=10.0,
                             look_at_depth=0.9)
    assert len(rend) == t and len(masks) == t
    assert rend[0].shape == (h, w, 3)
    assert masks[0].shape == (h, w, 1)
    assert masks[0].mean() > 0.2


def test_warp_video_edge_filter_runs(rng):
    t, h, w = 2, 24, 32
    frames = rng.uniform(0, 1, (t, h, w, 3)).astype(np.float32)
    depth = np.ones((t, h, w), np.float32)
    depth[:, :, 16:] = 3.0  # sharp depth edge
    rend, masks = warp_video(frames, depth, direction="right", degree=5.0,
                             enable_edge_filter=True)
    assert np.isfinite(rend[1]).all()
