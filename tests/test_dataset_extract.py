"""DepthCrafter benchmark dataset-extraction parity.

The reference's five extraction scripts are pure numpy/PIL; their DEPTH
READERS run here as oracles on synthetic files (the full reference
scripts cannot run in-image: imageio mp4 writing needs the absent
imageio-ffmpeg — our port writes mp4 via the repo's cv2 writer instead,
a tracked substitution). The extraction walks are verified end-to-end on
synthetic dataset trees against the mp4+npz+CSV contract that
cli/depth_benchmark.py consumes."""

import csv
import importlib.util
import os
import os.path as osp
import sys

import numpy as np
import pytest

from worldforge_tpu.benchmark.dataset_extract import (
    extract_bonn, extract_kitti, extract_nyu, extract_scannet,
    extract_sintel, kitti_depth_read, png_depth_read, sintel_depth_read)

PIL = pytest.importorskip("PIL")
from PIL import Image  # noqa: E402

REF_DIR = ("/root/reference/DepthCrafter/DepthCrafter/benchmark/"
           "dataset_extract")


def _ref_module(name):
    mod_name = f"_ref_extract_{name}"
    if mod_name in sys.modules:
        return sys.modules[mod_name]
    spec = importlib.util.spec_from_file_location(
        mod_name, osp.join(REF_DIR, f"dataset_extract_{name}.py"))
    mod = importlib.util.module_from_spec(spec)
    sys.modules[mod_name] = mod
    spec.loader.exec_module(mod)
    return mod


def _write_dpt(path, depth):
    with open(path, "wb") as f:
        np.float32(202021.25).tofile(f)
        np.int32(depth.shape[1]).tofile(f)
        np.int32(depth.shape[0]).tofile(f)
        depth.astype(np.float32).tofile(f)


def _write_png16(path, arr):
    Image.fromarray(arr.astype(np.uint16)).save(path)


def _write_rgb(path, rng, hw):
    Image.fromarray(rng.integers(0, 255, (*hw, 3), dtype=np.uint8).astype(
        np.uint8)).save(path)


# ----------------------------------------------------- reader oracles


def test_sintel_dpt_reader_matches_reference(tmp_path, rng):
    d = rng.uniform(0.1, 80.0, (12, 20)).astype(np.float32)
    p = str(tmp_path / "x.dpt")
    _write_dpt(p, d)
    ref = _ref_module("sintel").depth_read(p)
    np.testing.assert_array_equal(sintel_depth_read(p), ref)
    np.testing.assert_array_equal(ref, d)


def test_kitti_reader_matches_reference(tmp_path, rng):
    raw = rng.integers(0, 60000, (8, 10)).astype(np.uint16)
    raw[0, 0] = 0          # invalid -> -1
    raw[1, 1] = 60001      # ensure 16-bit assertion holds
    p = str(tmp_path / "d.png")
    _write_png16(p, raw)
    ref = _ref_module("kitti").depth_read(p)
    got = kitti_depth_read(p)
    np.testing.assert_array_equal(got, ref)
    assert got[0, 0] == -1.0


def test_factor_readers_match_reference(tmp_path, rng):
    raw = rng.integers(256, 20000, (6, 7)).astype(np.uint16)
    raw[2, 3] = 0     # invalid pixel: bonn maps it to -1, scannet/nyu keep 0
    p = str(tmp_path / "d.png")
    _write_png16(p, raw)
    np.testing.assert_array_equal(
        png_depth_read(p, 5000.0, zero_invalid=True),
        _ref_module("bonn").depth_read(p))
    np.testing.assert_array_equal(png_depth_read(p, 1000.0),
                                  _ref_module("scannet").depth_read(p))
    np.testing.assert_array_equal(png_depth_read(p, 1000.0),
                                  _ref_module("nyu").depth_read(p))


# ------------------------------------------------------- e2e contracts


def _check_contract(out_dir, csv_path, n_rows, disp_shape):
    with open(csv_path) as f:
        rows = list(csv.DictReader(f))
    assert len(rows) == n_rows
    for r in rows:
        mp4 = osp.join(out_dir, r["filepath_left"])
        npz = osp.join(out_dir, r["filepath_disparity"])
        assert osp.exists(mp4) and os.path.getsize(mp4) > 0, mp4
        disp = np.load(npz)["disparity"]
        assert disp.shape == disp_shape, (disp.shape, disp_shape)
    return rows


def test_extract_sintel_e2e(tmp_path, rng):
    root = tmp_path / "clean"
    droot = tmp_path / "depth"
    for seq in ("alley_1", "cave_2"):
        (root / seq).mkdir(parents=True)
        (droot / seq).mkdir(parents=True)
        for i in range(4):
            _write_rgb(str(root / seq / f"frame_{i:04d}.png"), rng, (32, 48))
            _write_dpt(str(droot / seq / f"frame_{i:04d}.dpt"),
                       rng.uniform(1, 10, (32, 48)).astype(np.float32))
    out = str(tmp_path / "out") + "/"
    samples = extract_sintel(str(root), str(droot), sample_len=-1,
                             csv_save_path=str(tmp_path / "out/sintel.csv"),
                             saved_rgb_dir=out, saved_disp_dir=out)
    assert len(samples) == 2
    _check_contract(out, str(tmp_path / "out/sintel.csv"), 2, (4, 1, 32, 48))


def test_extract_kitti_e2e(tmp_path, rng):
    seq = "2011_09_26_drive_0002_sync"
    img_dir = tmp_path / "raw" / seq[0:10] / seq / "image_02/data"
    dep_dir = tmp_path / "depth" / seq / "proj_depth/groundtruth/image_02"
    img_dir.mkdir(parents=True)
    dep_dir.mkdir(parents=True)
    for i in range(3):
        _write_rgb(str(img_dir / f"{i:010d}.png"), rng, (33, 45))  # odd dims
        d = rng.integers(256, 60000, (33, 45)).astype(np.uint16)
        d[0, 0] = 60001
        _write_png16(str(dep_dir / f"{i:010d}.png"), d)
    out = str(tmp_path / "out") + "/"
    samples = extract_kitti(str(tmp_path / "raw"), str(tmp_path / "depth"),
                            csv_save_path=str(tmp_path / "out/KITTI.csv"),
                            saved_rgb_dir=out, saved_disp_dir=out)
    # odd dims cropped even (kitti.py:81-93)
    _check_contract(out, str(tmp_path / "out/KITTI.csv"), 1, (3, 1, 32, 44))
    assert len(samples) == 1


def test_extract_bonn_e2e(tmp_path, rng):
    seq = "rgbd_bonn_balloon"
    for sub in ("rgb", "depth"):
        (tmp_path / "bonn" / seq / sub).mkdir(parents=True)
    for i in range(3):
        _write_rgb(str(tmp_path / "bonn" / seq / "rgb" / f"f_{i:04d}.png"),
                   rng, (24, 32))
        _write_png16(str(tmp_path / "bonn" / seq / "depth" / f"f_{i:04d}.png"),
                     rng.integers(0, 30000, (24, 32)).astype(np.uint16))
    # force one zero (invalid) pixel: the TUM convention maps it to -1
    _write_png16(str(tmp_path / "bonn" / seq / "depth" / "f_0000.png"),
                 np.concatenate([np.zeros((1, 32), np.uint16),
                                 rng.integers(256, 30000, (23, 32))
                                 .astype(np.uint16)]))
    out = str(tmp_path / "out") + "/"
    extract_bonn(str(tmp_path / "bonn"), str(tmp_path / "bonn"),
                 start_frame=0, end_frame=110,
                 csv_save_path=str(tmp_path / "out/bonn.csv"),
                 saved_rgb_dir=out, saved_disp_dir=out)
    rows = _check_contract(out, str(tmp_path / "out/bonn.csv"), 1,
                           (3, 1, 24, 32))
    # depth decoded with the TUM 1/5000 factor; raw 0 -> -1.0 (bonn.py:19)
    disp = np.load(osp.join(out, rows[0]["filepath_disparity"]))["disparity"]
    assert disp.max() <= 30000 / 5000.0
    assert (disp[0, 0, 0] == -1.0).all()


def test_extract_scannet_e2e(tmp_path, rng):
    seq = "scene0000_00"
    for sub in ("color", "depth"):
        (tmp_path / "scan" / seq / sub).mkdir(parents=True)
    for i in range(3):
        _write_rgb(str(tmp_path / "scan" / seq / "color" / f"{i}.jpg"),
                   rng, (64, 80))
        _write_png16(str(tmp_path / "scan" / seq / "depth" / f"{i}.png"),
                     rng.integers(0, 8000, (64, 80)).astype(np.uint16))
    out = str(tmp_path / "out") + "/"
    extract_scannet(str(tmp_path / "scan"),
                    csv_save_path=str(tmp_path / "out/scannet.csv"),
                    saved_rgb_dir=out, saved_disp_dir=out)
    # crop [8:-8, 11:-11] (scannet.py:73-74)
    _check_contract(out, str(tmp_path / "out/scannet.csv"), 1,
                    (3, 1, 48, 58))


def test_extract_nyu_e2e(tmp_path, rng):
    (tmp_path / "nyu" / "rgb").mkdir(parents=True)
    (tmp_path / "nyu" / "depth").mkdir(parents=True)
    _write_rgb(str(tmp_path / "nyu" / "rgb" / "img_0001.png"), rng,
               (480, 640))
    _write_png16(str(tmp_path / "nyu" / "depth" / "d_0001.png"),
                 rng.integers(0, 9000, (480, 640)).astype(np.uint16))
    with open(tmp_path / "list.txt", "w") as f:
        f.write("rgb/img_0001.png x depth/d_0001.png\n")
    out = str(tmp_path / "out") + "/"
    extract_nyu(str(tmp_path / "nyu"), str(tmp_path / "nyu"),
                csv_save_path=str(tmp_path / "out/NYUv2.csv"),
                filename_ls_path=str(tmp_path / "list.txt"),
                saved_rgb_dir=out, saved_disp_dir=out)
    # crop [45:471, 41:601] (nyu.py:52-53)
    _check_contract(out, str(tmp_path / "out/NYUv2.csv"), 1,
                    (1, 1, 426, 560))
