"""Bucket tables, depth metrics, profiling subsystem."""

import numpy as np
import pytest

from worldforge_tpu.utils.buckets import (closest_bucket, get_bucket_config)
from worldforge_tpu.utils.depth_metrics import (align_disparity_lstsq,
                                                depth_metrics)
from worldforge_tpu.utils.profiling import phase, phase_report


def test_bucket_tables():
    t480 = get_bucket_config("480p", 32)
    assert t480["0.58"] == (480, 832)
    t720 = get_bucket_config("720p", 32)
    assert t720["1.00"] == (960, 960)
    assert closest_bucket(480, 832) == (480, 832)
    # ratio 0.5625: closest key is '0.54' -> (704, 1312)
    assert closest_bucket(720, 1280, "720p") == (704, 1312)
    with pytest.raises(ValueError):
        get_bucket_config("1080p", 32)


def test_depth_alignment_recovers_affine(rng):
    gt = rng.uniform(0.5, 3.0, (32, 32))
    pred = 2.5 * gt - 0.7  # affine-transformed prediction
    aligned, a, b = align_disparity_lstsq(pred, gt)
    np.testing.assert_allclose(aligned, gt, atol=1e-6)
    assert a == pytest.approx(1 / 2.5, rel=1e-6)


def test_depth_metrics_perfect_prediction(rng):
    gt = rng.uniform(0.5, 3.0, (16, 16))
    m = depth_metrics(gt.copy(), gt, align=False)
    assert m["abs_rel"] == pytest.approx(0.0, abs=1e-7)
    assert m["delta1"] == 1.0 and m["rmse"] == pytest.approx(0.0, abs=1e-6)


def test_depth_metrics_known_offset(rng):
    gt = np.full((8, 8), 2.0)
    pred = np.full((8, 8), 2.2)  # 10% error
    m = depth_metrics(pred, gt, align=False)
    assert m["abs_rel"] == pytest.approx(0.1, rel=1e-6)
    assert m["delta1"] == 1.0  # 1.1 < 1.25


def test_phase_timer():
    with phase("unit_test_phase"):
        _ = sum(range(1000))
    rep = phase_report()
    assert rep["unit_test_phase"]["calls"] == 1
    assert rep["unit_test_phase"]["total_s"] >= 0
    assert phase_report() == {}  # reset


def test_upscale_cli_parser():
    from worldforge_tpu.cli.run_upscale import build_parser
    args = build_parser().parse_args(["--input", "/tmp/x", "--random-init"])
    assert args.t_thresh == 0.6 and not args.spatial_refine_only


def test_read_frames_mask_normalization(tmp_path):
    """Reference semantics (infer_worldforge.py:91-99): no masks -> ZERO
    masks (guided fusion trusts nothing); fewer masks than frames -> the
    last mask repeats; extra masks truncate."""
    from PIL import Image
    import numpy as np
    from worldforge_tpu.io.frames import read_frames_from_directory

    d = tmp_path / "no_masks"
    d.mkdir()
    for i in range(3):
        Image.fromarray(np.full((8, 10, 3), 100 + i, np.uint8)).save(
            d / f"frame_{i}.png")
    frames, masks, first = read_frames_from_directory(str(d))
    assert len(frames) == len(masks) == 3
    assert all(m.shape == (8, 10) and m.sum() == 0 for m in masks)
    assert first is not None

    d2 = tmp_path / "short_masks"
    d2.mkdir()
    for i in range(3):
        Image.fromarray(np.full((8, 10, 3), 50, np.uint8)).save(
            d2 / f"frame_{i}.png")
    Image.fromarray(np.full((8, 10), 255, np.uint8)).save(
        d2 / "mask_0.png")
    frames, masks, _ = read_frames_from_directory(str(d2))
    assert len(masks) == 3
    assert all((m == 1).all() for m in masks)   # repeated last mask
