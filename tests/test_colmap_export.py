"""COLMAP text-model export: filtering semantics + file round trip."""

import numpy as np
import pytest

from worldforge_tpu.sfm.colmap_export import (build_reconstruction,
                                              rotmat_to_qvec)
from worldforge_tpu.sfm.projection import project_3d_points


def _scene(rng, n_cams=2, n_pts=80):
    pts = rng.uniform(-1, 1, (n_pts, 3)).astype(np.float32)
    pts[:, 2] += 6.0
    ext = np.broadcast_to(np.eye(3, 4, dtype=np.float32),
                          (n_cams, 3, 4)).copy()
    ext[1, :3, 3] = [0.2, 0.0, 0.1]
    K = np.broadcast_to(np.array([[120, 0, 64], [0, 120, 48], [0, 0, 1]],
                                 np.float32), (n_cams, 3, 3)).copy()
    p2d, _ = project_3d_points(pts, ext, K)
    return pts, ext, K, np.asarray(p2d)


def test_rotmat_to_qvec_identity_and_rotations(rng):
    np.testing.assert_allclose(rotmat_to_qvec(np.eye(3)), [1, 0, 0, 0],
                               atol=1e-12)
    # random rotation round-trips through quaternion -> matrix
    a = rng.standard_normal((3, 3))
    q_, r_ = np.linalg.qr(a)
    rot = q_ * np.sign(np.diag(r_))
    if np.linalg.det(rot) < 0:
        rot[:, 0] *= -1
    w, x, y, z = rotmat_to_qvec(rot)
    m = np.array([
        [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
        [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
        [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)]])
    np.testing.assert_allclose(m, rot, atol=1e-8)


def test_build_and_write(tmp_path, rng):
    pts, ext, K, tracks = _scene(rng)
    rec, valid = build_reconstruction(
        pts, ext, K, tracks, image_size=(128, 96),
        max_reproj_error=2.0, min_inlier_per_frame=8)
    assert rec is not None
    assert valid.sum() == pts.shape[0]          # exact projections: all in
    assert len(rec.cameras) == 2 and len(rec.images) == 2
    # every 3D point tracked in both frames
    assert all(len(p["track"]) == 2 for p in rec.points3d.values())

    rec.write_text(str(tmp_path))
    cams = (tmp_path / "cameras.txt").read_text().splitlines()
    imgs = (tmp_path / "images.txt").read_text().splitlines()
    pts3 = (tmp_path / "points3D.txt").read_text().splitlines()
    assert len([l for l in cams if not l.startswith("#")]) == 2
    assert len([l for l in imgs if not l.startswith("#")]) == 4  # 2 lines/img
    assert len([l for l in pts3 if not l.startswith("#")]) == pts.shape[0]
    # SIMPLE_PINHOLE: f cx cy
    fields = cams[1].split()
    assert fields[1] == "SIMPLE_PINHOLE" and float(fields[4]) == 120.0


def test_outlier_filtering(rng):
    pts, ext, K, tracks = _scene(rng)
    tracks = tracks.copy()
    tracks[0, :5] += 50.0   # 5 outliers in frame 0
    rec, valid = build_reconstruction(
        pts, ext, K, tracks, image_size=(128, 96),
        max_reproj_error=2.0, min_inlier_per_frame=8)
    # those tracks have only 1 inlier -> dropped
    assert valid.sum() == pts.shape[0] - 5
    assert len(rec.points3d) == pts.shape[0] - 5


def test_min_inliers_gate(rng):
    pts, ext, K, tracks = _scene(rng)
    rec, valid = build_reconstruction(
        pts, ext, K, tracks + 100.0, image_size=(128, 96),
        max_reproj_error=2.0, min_inlier_per_frame=8)
    assert rec is None and valid is None
