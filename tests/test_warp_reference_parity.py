"""Warp-stage parity against the REFERENCE'S OWN runnable code.

The reference warp core is pure numpy/cv2/scipy and runs on this host, so it
is imported directly as the oracle (no hand-written re-implementations):

  * VGGT warp:  warp_single_img (vggt/modules/utils_warp.py:724-1000) incl.
    camera sequences, z-buffer splat, crack filling — masks must be
    BIT-IDENTICAL and frames bit-identical uint8 across all 8 directions.
  * DepthCrafter: trajectory generators (DepthCrafter/utils.py:240-492),
    edge filtering (:495-567), and the CPU renderer
    project_points_to_image_numpy (:173-237) vs our splat.

This is the proof behind BASELINE.json's "matched warp masks" gate.
"""

import types

import numpy as np
import pytest

from reference_oracle import import_dc_utils, import_utils_warp
from worldforge_tpu.warp.cameras import dc_camera_seq, vggt_camera_seq
from worldforge_tpu.warp.edge_filter import edge_point_mask
from worldforge_tpu.warp.splat import render_points_nearest
from worldforge_tpu.warp.vggt_warp import warp_single_image

H, W = 40, 56
ALL_DIRECTIONS = ["up", "down", "left", "right", "forward", "backward",
                  "up_pan", "down_pan", "left_pan", "right_pan"]


def _scene(seed=0):
    """Smooth synthetic scene: depth in ~[1.5, 3.5] with structure (so depth
    segmentation and crack filling all engage), float image in [0,1], a
    confidence map, and a slightly rotated extrinsic."""
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:H, 0:W].astype(np.float64)
    depth = (2.5 + 0.8 * np.sin(xx / 9.0) * np.cos(yy / 7.0)
             + 0.2 * np.sin(xx / 3.0 + 1.0))
    depth += rng.normal(0, 0.01, depth.shape)
    image = rng.random((H, W, 3)).astype(np.float32) * 0.98
    conf = rng.random((H, W)).astype(np.float64) + 0.1
    th = 0.05
    c, s = np.cos(th), np.sin(th)
    extr = np.eye(4)
    extr[:3, :3] = np.array([[c, 0, s], [0, 1, 0], [-s, 0, c]])
    extr[:3, 3] = [0.05, -0.02, 0.1]
    intr = np.array([[60.0, 0.0, W / 2.0],
                     [0.0, 60.0, H / 2.0],
                     [0.0, 0.0, 1.0]])
    return extr, intr, image, depth, conf


def _run_ref(uw, extr, intr, image, depth, conf, direction, **kw):
    imgs, masks, infos = uw.warp_single_img(
        extr.copy(), intr.copy(), image.copy(), depth.copy(),
        depth_conf=None if conf is None else conf.copy(),
        direction=direction, **kw)
    return imgs, masks, infos


@pytest.mark.parametrize("direction", ALL_DIRECTIONS)
def test_vggt_warp_matches_reference(direction):
    """Masks bit-identical + frames bit-identical through splat AND crack
    filling, for every camera direction."""
    uw = import_utils_warp()
    extr, intr, image, depth, conf = _scene()
    kw = dict(degree=12.0, conf_threshold=0.5, frame_num=4, fill_cracks=True)
    ref_imgs, ref_masks, ref_infos = _run_ref(uw, extr, intr, image, depth,
                                              conf, direction, **kw)
    imgs, masks, infos = warp_single_image(extr, intr, image, depth, conf,
                                           direction=direction, **kw)
    assert len(imgs) == len(ref_imgs) == 4
    for i, (rm, m) in enumerate(zip(ref_masks, masks)):
        np.testing.assert_array_equal(np.asarray(rm, np.uint8), m,
                                      err_msg=f"{direction} mask frame {i}")
    for i, (ri, im) in enumerate(zip(ref_imgs, imgs)):
        np.testing.assert_array_equal(ri, im,
                                      err_msg=f"{direction} image frame {i}")
    for ri, inf in zip(ref_infos, infos):
        assert ri["direction"] == inf["direction"]
        assert abs(ri["angle"] - inf["angle"]) < 1e-12


@pytest.mark.parametrize("case", ["no_fill", "no_conf", "thr1",
                                  "no_depth_aware"])
def test_vggt_warp_config_variants(case):
    """Config corners: fill off, no confidence map, conf_threshold=1.0
    (reference keeps depth un-NaN'd), depth-aware fill disabled (the
    fill_small_cracks + conf-guided path)."""
    uw = import_utils_warp()
    extr, intr, image, depth, conf = _scene(seed=3)
    kw = dict(degree=10.0, frame_num=3)
    if case == "no_fill":
        ref = _run_ref(uw, extr, intr, image, depth, conf, "right",
                       conf_threshold=0.5, fill_cracks=False, **kw)
        got = warp_single_image(extr, intr, image, depth, conf,
                                direction="right", conf_threshold=0.5,
                                fill_cracks=False, **kw)
    elif case == "no_conf":
        ref = _run_ref(uw, extr, intr, image, depth, None, "up",
                       conf_threshold=0.5, **kw)
        got = warp_single_image(extr, intr, image, depth, None,
                                direction="up", conf_threshold=0.5, **kw)
    elif case == "thr1":
        ref = _run_ref(uw, extr, intr, image, depth, conf, "forward",
                       conf_threshold=1.0, **kw)
        got = warp_single_image(extr, intr, image, depth, conf,
                                direction="forward", conf_threshold=1.0, **kw)
    else:  # no_depth_aware -> fill_small_cracks path with conf guidance
        args = types.SimpleNamespace(disable_depth_aware_fill=True)
        ref = _run_ref(uw, extr, intr, image, depth, conf, "left",
                       conf_threshold=0.5, args=args, **kw)
        got = warp_single_image(extr, intr, image, depth, conf,
                                direction="left", conf_threshold=0.5,
                                disable_depth_aware_fill=True, **kw)
    for rm, m in zip(ref[1], got[1]):
        np.testing.assert_array_equal(np.asarray(rm, np.uint8), m)
    for ri, im in zip(ref[0], got[0]):
        np.testing.assert_array_equal(ri, im)


def test_vggt_camera_seq_matches_reference():
    """Camera matrices for all 8 trajectory types vs the reference
    generators (utils_warp.py:64-379)."""
    uw = import_utils_warp()
    extr, _, _, _, _ = _scene()
    n, la = 5, 2.4
    ref_fns = {
        "up": lambda: uw.get_look_up_camera_seq(extr.copy(), 9.0, n, la),
        "down": lambda: uw.get_look_up_camera_seq(extr.copy(), -9.0, n, la),
        "right": lambda: uw.get_look_right_camera_seq(extr.copy(), 9.0, n, la),
        "left": lambda: uw.get_look_right_camera_seq(extr.copy(), -9.0, n, la),
        "forward": lambda: uw.get_look_forward_camera_seq(extr.copy(), 20.0,
                                                          n, la),
        "backward": lambda: uw.get_look_backward_camera_seq(extr.copy(), 20.0,
                                                            n, la),
        "up_pan": lambda: uw.get_up_pan_camera_seq(extr.copy(), 9.0, n, la),
        "down_pan": lambda: uw.get_down_pan_camera_seq(extr.copy(), 9.0, n,
                                                       la),
        "left_pan": lambda: uw.get_left_pan_camera_seq(extr.copy(), 9.0, n,
                                                       la),
        "right_pan": lambda: uw.get_right_pan_camera_seq(extr.copy(), 9.0, n,
                                                         la),
    }
    for direction, fn in ref_fns.items():
        deg = 20.0 if direction in ("forward", "backward") else 9.0
        ours = vggt_camera_seq(extr, direction, deg, n, la)
        np.testing.assert_allclose(ours, np.stack(fn()), atol=1e-13, rtol=0,
                                   err_msg=direction)


def test_dc_camera_seq_matches_reference():
    """DepthCrafter trajectories: standard/stable x up/down/left/right,
    zoom in/out, circle — vs DepthCrafter/utils.py:240-492 through the same
    dispatch as run_warping (warp_depthcrafter.py:216-247)."""
    dc = import_dc_utils()
    e = np.eye(4)
    n, la = 7, 1.9
    for direction in ["up", "down", "right", "left"]:
        sgn = -1.0 if direction in ("down", "left") else 1.0
        ref_fn = (dc.get_look_up_camera_seq if direction in ("up", "down")
                  else dc.get_look_right_camera_seq)
        ref = np.stack(ref_fn(e, sgn * 14.0, n, la))
        ours = dc_camera_seq(direction, 14.0, n, la)
        np.testing.assert_allclose(ours, ref, atol=1e-13, rtol=0,
                                   err_msg=direction)
        # stable variant
        ref_sfn = (dc.get_stable_look_up_camera_seq
                   if direction in ("up", "down")
                   else dc.get_stable_look_right_camera_seq)
        ref_s = np.stack(ref_sfn(e, sgn * 14.0, n, la, stable_frame=4))
        ours_s = dc_camera_seq(direction, 14.0, n, la, stable=True,
                               stable_frame=4)
        np.testing.assert_allclose(ours_s, ref_s, atol=1e-13, rtol=0,
                                   err_msg=f"stable_{direction}")
    # zoom on top of a standard seq
    base = dc.get_look_up_camera_seq(e, 14.0, n, la)
    for mode, rate in [("zoom_in", 0.6), ("zoom_out", 0.7)]:
        ref_z = np.stack(dc.apply_zoom_to_camera_seq(
            [c.copy() for c in base], mode, rate, la))
        ours_z = dc_camera_seq("up", 14.0, n, la, zoom=mode, rate=rate)
        np.testing.assert_allclose(ours_z, ref_z, atol=1e-13, rtol=0,
                                   err_msg=mode)
        ref_sz = np.stack(dc.apply_stable_zoom_to_camera_seq(
            dc.get_stable_look_up_camera_seq(e, 14.0, n, la, stable_frame=4),
            mode, rate, la, stable_frame=4))
        ours_sz = dc_camera_seq("up", 14.0, n, la, stable=True,
                                stable_frame=4, zoom=mode, rate=rate)
        np.testing.assert_allclose(ours_sz, ref_sz, atol=1e-13, rtol=0,
                                   err_msg=f"stable_{mode}")
    # circle
    for cdir in ["right", "left"]:
        ref_c = np.stack(dc.get_circle_camera_seq(e, 0.3, n, la, cdir))
        ours_c = dc_camera_seq(cdir, 0.0, n, la, circle_radius=0.3)
        np.testing.assert_allclose(ours_c, ref_c, atol=1e-13, rtol=0,
                                   err_msg=f"circle_{cdir}")


def test_dc_edge_filter_matches_reference():
    """edge_point_mask vs the reference filter_edge_points keep-set
    (DepthCrafter/utils.py:520-567)."""
    import torch

    dc = import_dc_utils()
    rng = np.random.default_rng(11)
    yy, xx = np.mgrid[0:H, 0:W].astype(np.float64)
    depth = 1.0 / (0.5 + 0.4 * (xx > W / 2) + 0.1 * np.sin(yy / 5.0) + 0.1)
    depth += rng.normal(0, 0.005, depth.shape)
    pts = rng.normal(size=(H * W, 3))
    feats = rng.random((H * W, 3))
    fp, ff = dc.filter_edge_points(
        torch.from_numpy(pts), torch.from_numpy(feats),
        torch.from_numpy(depth), edge_threshold=0.1, edge_dilation=3,
        depth_jump_threshold=0.3, neighbor_check_radius=2)
    keep = edge_point_mask(depth, 0.1, 3, 0.3, 2)
    np.testing.assert_array_equal(fp.numpy(), pts[keep])
    np.testing.assert_array_equal(ff.numpy(), feats[keep])


def test_dc_renderer_matches_reference_numpy():
    """Our nearest splat (round_first borders) + 3x3 CLOSE vs the
    reference's own CPU renderer project_points_to_image_numpy
    (DepthCrafter/utils.py:173-237): identical mask and image."""
    dc = import_dc_utils()
    rng = np.random.default_rng(5)
    h, w = 32, 40
    n = 1600
    pts = np.stack([rng.uniform(-1.2, 1.2, n), rng.uniform(-1.0, 1.0, n),
                    rng.uniform(1.0, 4.0, n)], axis=1)
    feats = rng.random((n, 3))
    intr = np.array([[30.0, 0, w / 2.0], [0, 30.0, h / 2.0], [0, 0, 1.0]])
    extr = np.eye(4)
    extr[:3, 3] = [0.03, -0.05, 0.12]
    ref_img, ref_mask = dc.project_points_to_image_numpy(
        pts, feats.copy(), extr, intr, (h, w))
    img, mask = render_points_nearest(pts, feats, extr, intr, h, w)
    np.testing.assert_array_equal(mask, ref_mask)
    np.testing.assert_allclose(img, ref_img.astype(np.float32), atol=1e-6)


def test_dc_unproject_matches_reference_formula():
    """dc_unproject vs the reference's point-cloud generation
    (warp_depthcrafter.py:259-266: X=(j-cx)*d/f, Y=(i-cy)*d/f, Z=d with
    d = 1/(depth+0.1), computed here with torch like the reference)."""
    import torch

    from worldforge_tpu.warp.geometry import dc_unproject

    rng = np.random.default_rng(8)
    depth = rng.random((H, W)).astype(np.float32)
    d = 1.0 / (torch.from_numpy(depth) + 0.1)
    K = torch.tensor([[525.0, 0, 0.5 * W], [0, 525.0, 0.5 * H], [0, 0, 1]])
    ii, jj = torch.from_numpy(np.indices((H, W)))
    X = (jj - K[0, 2]) * d / K[0, 0]
    Y = (ii - K[1, 2]) * d / K[1, 1]
    ref = torch.stack((X, Y, d), axis=-1).reshape(-1, 3).numpy()
    ours = np.asarray(dc_unproject(
        np.asarray(1.0 / (depth + 0.1)), f=525.0))
    np.testing.assert_allclose(ours, ref, atol=1e-5, rtol=1e-5)


def test_remove_outliers_small_data_matches_reference(rng):
    """The reference routes valid_count <= 5000 to scipy convolve with a
    constant-0 border (utils_warp.py:486-489): border pixels see fewer
    neighbors than under cv2's reflection, so edge outliers are dropped.
    Bit-parity on a sparse frame with border-hugging valid pixels."""
    from worldforge_tpu.warp.cracks import remove_outliers

    uw = import_utils_warp()
    h, w = 40, 50
    m = (rng.uniform(size=(h, w)) < 0.05).astype(np.uint8)  # ~100 valid
    m[0, :] |= (rng.uniform(size=w) < 0.3).astype(np.uint8)  # border row
    img = rng.uniform(size=(h, w, 3)).astype(np.float32) * m[..., None]
    dep = np.where(m > 0, rng.uniform(0.5, 2.0, (h, w)).astype(np.float32),
                   np.nan)
    ri, rm, rd = uw.remove_outliers(img, m, dep, min_neighbors=4,
                                    neighbor_radius=1)
    oi, om, od = remove_outliers(img, m, dep, 4, 1)
    np.testing.assert_array_equal(om, rm)
    np.testing.assert_array_equal(oi, ri)
    np.testing.assert_array_equal(np.isnan(od), np.isnan(rd))


def test_merge_depth_segments_all_invalid_matches_reference(rng):
    """When segments exist but none has valid pixels the reference
    returns the ZERO image/mask (merge loop never runs) — not None — so
    depth_aware_crack_filling must NOT fall back to fill_small_cracks."""
    from worldforge_tpu.warp.cracks import merge_depth_segments

    uw = import_utils_warp()
    shape = (8, 10, 3)
    empty = [(None, None, None), (None, None, None)]
    ref = uw.merge_depth_segments([None, None], empty, shape)
    ours = merge_depth_segments(empty, shape)
    assert ref[0] is not None and ours[0] is not None
    np.testing.assert_array_equal(ours[0], ref[0])
    np.testing.assert_array_equal(ours[1], ref[1])
    assert ours[0].sum() == 0 and ours[1].sum() == 0
