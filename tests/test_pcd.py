"""Point-cloud export (reference: visualization_pcd.py geometry)."""

import os

import numpy as np
import pytest

from worldforge_tpu.warp.pcd import (disparity_to_pointcloud,
                                     normalize_disparity, read_ply,
                                     write_ply)


def test_pointcloud_matches_reference_math():
    """Exact replay of visualization_pcd.py:113-130 as an oracle."""
    rng = np.random.default_rng(0)
    h, w, ds = 6, 8, 3
    disp = rng.uniform(0, 1, (h, w)).astype(np.float32)
    frame = rng.integers(0, 255, (h, w, 3)).astype(np.uint8)

    v, u = np.where(np.zeros((h, w)) == 0)
    d = disp[v, u]
    zc = 1.0 / (d + 0.1)
    xc = zc * (u - w / 2.0) / (w / 2.0)
    yc = zc * (v - h / 2.0) / (h / 2.0)
    zc = zc - 4
    want_pts = np.stack((xc, yc, zc), 1)[::ds]
    want_cols = frame[v, u][::ds]

    pts, cols = disparity_to_pointcloud(disp, frame, downsample_factor=ds)
    np.testing.assert_allclose(pts, want_pts, rtol=1e-6)
    np.testing.assert_array_equal(cols, want_cols)


def test_normalize_disparity_clip_global():
    disp = np.stack([np.full((2, 2), 3.0), np.full((2, 2), 7.0)])
    out = normalize_disparity(disp)
    assert out.min() == 0.0 and out.max() == 1.0
    np.testing.assert_allclose(out[0], 0.0)  # normalized over the clip,
    np.testing.assert_allclose(out[1], 1.0)  # not per frame


def test_ply_roundtrip(tmp_path):
    rng = np.random.default_rng(1)
    pts = rng.standard_normal((17, 3)).astype(np.float32)
    cols = rng.integers(0, 255, (17, 3)).astype(np.uint8)
    path = str(tmp_path / "a.ply")
    write_ply(path, pts, cols)
    rpts, rcols = read_ply(path)
    np.testing.assert_array_equal(rpts, pts)
    np.testing.assert_array_equal(rcols, cols)
    with open(path, "rb") as f:
        assert f.read(4) == b"ply\n"


def test_cli_exports_ply_frames(tmp_path):
    cv2 = pytest.importorskip("cv2")
    from worldforge_tpu.cli.visualize_pcd import main

    rng = np.random.default_rng(2)
    t, h, w = 4, 16, 24
    np.savez(tmp_path / "clip.npz",
             depth=rng.uniform(0, 1, (t, h, w)).astype(np.float32))
    vid_path = str(tmp_path / "clip_input.mp4")
    wr = cv2.VideoWriter(vid_path, cv2.VideoWriter_fourcc(*"mp4v"), 8,
                         (w, h))
    for _ in range(t):
        wr.write(rng.integers(0, 255, (h, w, 3)).astype(np.uint8))
    wr.release()

    out = tmp_path / "pcd"
    main(["--data-path", str(tmp_path), "--vid-name", "clip",
          "--downsample-factor", "2", "--max-frames", "3",
          "--out-dir", str(out)])
    files = sorted(os.listdir(out))
    assert files == ["t0000.ply", "t0001.ply", "t0002.ply"]
    pts, cols = read_ply(str(out / "t0000.ply"))
    assert len(pts) == (h * w + 1) // 2 and cols.dtype == np.uint8
