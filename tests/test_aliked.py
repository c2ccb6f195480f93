"""ALIKED port gates (no local torch oracle — lightglue absent in-image;
same offline treatment as the SVD UNet, see sfm/aliked.py docstring):
hand-derived component goldens + frozen conversion manifest + exact
roundtrip + the extractor-factory surface (vggsfm_utils.py:189-253)."""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from worldforge_tpu.io.convert_aliked import convert_aliked
from worldforge_tpu.sfm.aliked import (ALIKEDConfig, _bilinear_gather, _bn,
                                       _conv, _deform_conv, _upsample_ac,
                                       aliked_forward, dkd_detect,
                                       init_aliked, pad_to_multiple,
                                       sddh_describe)

FIXDIR = os.path.join(os.path.dirname(__file__), "fixtures")


# ------------------------------------------------------------- goldens


def test_deform_conv_zero_offset_equals_plain_conv(rng):
    """With the offset head zeroed, torchvision deform_conv2d degenerates
    to an ordinary 3x3 zero-padded conv — ours must too."""
    cin, cout = 5, 7
    x = jnp.asarray(rng.standard_normal((1, 8, 10, cin)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((3, 3, cin, cout)) * 0.2,
                    jnp.float32)
    p = {"offset": {"w": jnp.zeros((3, 3, cin, 18), jnp.float32),
                    "b": jnp.zeros((18,), jnp.float32)},
         "w": w}
    got = _deform_conv(p, x)
    want = _conv({"w": w}, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_deform_conv_integer_offset_shifts_taps(rng):
    """A constant integer offset (+1, +1) on every tap equals shifting the
    sampling window — verify against a manually shifted plain conv on the
    interior."""
    cin, cout = 3, 4
    x = jnp.asarray(rng.standard_normal((1, 10, 10, cin)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((3, 3, cin, cout)) * 0.2,
                    jnp.float32)
    # offset conv outputs constant (dy, dx) = (1, 1): zero weight, bias 1
    p = {"offset": {"w": jnp.zeros((3, 3, cin, 18), jnp.float32),
                    "b": jnp.ones((18,), jnp.float32)},
         "w": w}
    got = np.asarray(_deform_conv(p, x))
    want = np.asarray(_conv({"w": w}, x))
    # output[i, j] with +1 offset == plain output at [i+1, j+1]
    np.testing.assert_allclose(got[0, 2:-2, 2:-2], want[0, 3:-1, 3:-1],
                               rtol=1e-4, atol=1e-5)


def test_batchnorm_inference_semantics(rng):
    c = 6
    x = jnp.asarray(rng.standard_normal((1, 4, 4, c)), jnp.float32)
    p = {"scale": jnp.asarray(rng.uniform(0.5, 2, c), jnp.float32),
         "bias": jnp.asarray(rng.standard_normal(c), jnp.float32),
         "mean": jnp.asarray(rng.standard_normal(c), jnp.float32),
         "var": jnp.asarray(rng.uniform(0.5, 2, c), jnp.float32)}
    got = np.asarray(_bn(p, x))
    want = (np.asarray(x) - np.asarray(p["mean"])) / np.sqrt(
        np.asarray(p["var"]) + 1e-5) * np.asarray(p["scale"]) + \
        np.asarray(p["bias"])
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_upsample_align_corners_golden():
    """nn.Upsample(scale, bilinear, align_corners=True): out index j maps
    to in position j*(n_in-1)/(n_out-1). 1D hand-check on a ramp."""
    x = jnp.asarray([[0.0, 3.0]]).reshape(1, 1, 2, 1)
    got = np.asarray(_upsample_ac(x, 2))[0, 0, :, 0]
    np.testing.assert_allclose(got, [0.0, 1.0, 2.0, 3.0], atol=1e-6)

    x2 = jnp.asarray([[0.0, 1.0], [2.0, 3.0]]).reshape(1, 2, 2, 1)
    got2 = np.asarray(_upsample_ac(x2, 2))[0, :, :, 0]
    # corners preserved exactly under align_corners=True
    np.testing.assert_allclose(
        [got2[0, 0], got2[0, -1], got2[-1, 0], got2[-1, -1]],
        [0.0, 1.0, 2.0, 3.0], atol=1e-6)


def test_bilinear_gather_zero_vs_border():
    x = jnp.ones((4, 4, 1), jnp.float32)
    ys = jnp.asarray([-0.5, 1.0, 3.5])
    xs = jnp.asarray([1.0, -0.5, 3.5])
    z = np.asarray(_bilinear_gather(x, ys, xs, zero_pad=True))[:, 0]
    b = np.asarray(_bilinear_gather(x, ys, xs, zero_pad=False))[:, 0]
    np.testing.assert_allclose(z, [0.5, 0.5, 0.25], atol=1e-6)
    np.testing.assert_allclose(b, [1.0, 1.0, 1.0], atol=1e-6)


def test_dkd_recovers_subpixel_peak():
    """A quadratic bump centred between pixels: DKD's 5x5 T=0.1
    soft-argmax must land within ~0.15 px of the true peak."""
    hh, ww = 32, 32
    cy, cx = 14.4, 17.7
    yy, xx = np.meshgrid(np.arange(hh), np.arange(ww), indexing="ij")
    score = 0.9 * np.exp(-((yy - cy) ** 2 + (xx - cx) ** 2) / 6.0)
    cfg = ALIKEDConfig.tiny(max_num_keypoints=8, detection_threshold=0.5)
    kpts, scores = dkd_detect(jnp.asarray(score, jnp.float32)[None], cfg)
    kpts, scores = np.asarray(kpts[0]), np.asarray(scores[0])
    assert (scores > 0).sum() == 1          # NMS leaves one peak
    kx, ky = kpts[0]
    assert abs(kx - cx) < 0.15 and abs(ky - cy) < 0.15, (kx, ky)
    assert scores[0] > 0.8                   # resampled peak score


def test_dkd_threshold_fallback_and_border():
    """Nothing clears the threshold -> the reference falls back to the
    mean-score threshold instead of returning nothing; border keypoints
    are excluded."""
    hh = ww = 32
    score = np.full((hh, ww), 0.001, np.float32)
    score[0, 0] = 0.9          # border peak: must be suppressed
    score[16, 16] = 0.002      # interior, below detection threshold
    cfg = ALIKEDConfig.tiny(max_num_keypoints=4, detection_threshold=0.5)
    kpts, scores = dkd_detect(jnp.asarray(score)[None], cfg)
    kpts = np.asarray(kpts[0])[np.asarray(scores[0]) > 0]
    assert len(kpts) >= 1
    assert not ((kpts[:, 0] < 2) | (kpts[:, 1] < 2)).any()
    assert tuple(np.round(kpts[0]).astype(int)) == (16, 16)


def test_dkd_fallback_is_per_image():
    """Regression: a batch where image A has a real peak and image B is
    low-contrast — B must still fall back to its own mean threshold and
    return keypoints (the reference decides the fallback per image)."""
    hh = ww = 32
    a = np.full((hh, ww), 0.001, np.float32)
    a[16, 16] = 0.9                       # clears the threshold
    b = np.full((hh, ww), 0.001, np.float32)
    b[10, 12] = 0.002                     # below it everywhere
    cfg = ALIKEDConfig.tiny(max_num_keypoints=4, detection_threshold=0.5)
    kpts, scores = dkd_detect(jnp.asarray(np.stack([a, b])), cfg)
    n_b = int((np.asarray(scores[1]) > 0).sum())
    assert n_b >= 1, "low-contrast image lost its keypoints in a batch"
    kb = np.asarray(kpts[1])[np.asarray(scores[1]) > 0]
    assert tuple(np.round(kb[0]).astype(int)) == (12, 10)


def test_sddh_shapes_and_norm(rng):
    cfg = ALIKEDConfig.tiny()
    params = init_aliked(jax.random.key(0), cfg)
    feat = jnp.asarray(rng.standard_normal((1, 32, 32, cfg.dim)),
                       jnp.float32)
    kpts = jnp.asarray([[[5.0, 7.0], [20.0, 11.0], [-1.0, -1.0]]])
    desc = np.asarray(sddh_describe(params, cfg, feat, kpts))
    assert desc.shape == (1, 3, cfg.dim)
    np.testing.assert_allclose(np.linalg.norm(desc[0, :2], axis=-1), 1.0,
                               rtol=1e-5)


def test_forward_end_to_end(rng):
    cfg = ALIKEDConfig.tiny()
    params = init_aliked(jax.random.key(1), cfg)
    img = jnp.asarray(rng.uniform(0, 1, (1, 64, 96, 3)), jnp.float32)
    out = aliked_forward(params, cfg, img)
    k = np.asarray(out["keypoints"][0])
    s = np.asarray(out["scores"][0])
    assert k.shape == (cfg.max_num_keypoints, 2)
    live = k[s > 0]
    assert (live[:, 0] >= 0).all() and (live[:, 0] <= 95).all()
    assert (live[:, 1] >= 0).all() and (live[:, 1] <= 63).all()
    assert np.isfinite(np.asarray(out["descriptors"])).all()


def test_pad_to_multiple():
    img = np.random.default_rng(0).uniform(0, 1, (518, 518, 3)) \
        .astype(np.float32)
    p = pad_to_multiple(img)
    assert p.shape == (544, 544, 3)
    np.testing.assert_array_equal(p[:518, :518], img)
    np.testing.assert_array_equal(p[518:], np.repeat(p[517:518], 26, 0))


# -------------------------------------------------- conversion contract


def _w_conv(sd, name, p):
    w = np.asarray(p["w"])
    nd = w.ndim - 2
    perm = (nd + 1, nd) + tuple(range(nd))
    sd[f"{name}.weight"] = np.ascontiguousarray(w.transpose(perm))
    if "b" in p:
        sd[f"{name}.bias"] = np.asarray(p["b"])


def _w_bn(sd, name, p):
    sd[f"{name}.weight"] = np.asarray(p["scale"])
    sd[f"{name}.bias"] = np.asarray(p["bias"])
    sd[f"{name}.running_mean"] = np.asarray(p["mean"])
    sd[f"{name}.running_var"] = np.asarray(p["var"])


def _w_convlayer(sd, name, p):
    if "offset" in p:
        _w_conv(sd, f"{name}.offset_conv", p["offset"])
        _w_conv(sd, f"{name}.regular_conv", {"w": p["w"]})
    else:
        _w_conv(sd, name, p)


def _w_block(sd, pre, p):
    _w_convlayer(sd, f"{pre}.conv1", p["conv1"])
    _w_bn(sd, f"{pre}.bn1", p["bn1"])
    _w_convlayer(sd, f"{pre}.conv2", p["conv2"])
    _w_bn(sd, f"{pre}.bn2", p["bn2"])
    if "downsample" in p:
        _w_conv(sd, f"{pre}.downsample", p["downsample"])


def aliked_to_torch_layout(params) -> dict:
    sd = {}
    for b in ("block1", "block2", "block3", "block4"):
        _w_block(sd, b, params[b])
    for c in ("conv1", "conv2", "conv3", "conv4"):
        _w_conv(sd, c, params[c])
    for i in ("0", "2", "4", "6"):
        _w_conv(sd, f"score_head.{i}", params["score_head"][i])
    dh = params["desc_head"]
    _w_conv(sd, "desc_head.offset_conv.0", dh["offset_conv1"])
    _w_conv(sd, "desc_head.offset_conv.2", dh["offset_conv2"])
    _w_conv(sd, "desc_head.sf_conv", dh["sf_conv"])
    _w_conv(sd, "desc_head.convM", dh["convM"])
    return sd


def test_aliked_roundtrip_and_manifest():
    cfg = ALIKEDConfig.n16()    # the real model's shapes in the manifest
    params = init_aliked(jax.random.key(2), cfg)
    sd = aliked_to_torch_layout(params)

    path = os.path.join(FIXDIR, "aliked_manifest.json")
    manifest = {k: list(np.asarray(v).shape) for k, v in sorted(sd.items())}
    if not os.path.exists(path):
        os.makedirs(FIXDIR, exist_ok=True)
        with open(path, "w") as f:
            json.dump(manifest, f, indent=1, sort_keys=True)
    with open(path) as f:
        assert manifest == json.load(f), "ALIKED layout contract changed"

    conv = convert_aliked(sd, cfg, strict=True)
    la, ta = jax.tree_util.tree_flatten_with_path(params)
    lb, tb = jax.tree_util.tree_flatten_with_path(conv)
    assert ta == tb
    for (pa, va), (_, vb) in zip(la, lb):
        np.testing.assert_array_equal(np.asarray(va), np.asarray(vb),
                                      err_msg=jax.tree_util.keystr(pa))


def test_aliked_conversion_loud_failures():
    cfg = ALIKEDConfig.tiny()
    sd = aliked_to_torch_layout(init_aliked(jax.random.key(3), cfg))
    broken = dict(sd)
    del broken["score_head.6.weight"]
    with pytest.raises(ValueError, match="missing key.*score_head"):
        convert_aliked(broken, cfg)
    extra = dict(sd)
    extra["brand_new.weight"] = np.zeros((2,), np.float32)
    with pytest.raises(ValueError, match="never consumed"):
        convert_aliked(extra, cfg, strict=True)


# -------------------------------------------------------- extractors


def test_sift_extractor_corners():
    """cv2 SIFT on a checkerboard: finds corners, strongest-first,
    deterministic, within bounds."""
    from worldforge_tpu.sfm.extractors import sift_extract

    rng = np.random.default_rng(5)
    img = np.kron(rng.uniform(0, 1, (8, 8)) > 0.5,
                  np.ones((16, 16)))[..., None].repeat(3, -1) \
        .astype(np.float32)
    k1 = sift_extract(img, max_num_keypoints=100)
    k2 = sift_extract(img, max_num_keypoints=100)
    assert k1.shape[0] > 10 and k1.shape[1] == 2
    np.testing.assert_array_equal(k1, k2)
    assert (k1 >= 0).all() and (k1[:, 0] < 128).all() \
        and (k1[:, 1] < 128).all()


def test_make_extractors_combo(rng):
    """'aliked+sp+sift' concatenates all three extractors' (rounded)
    keypoints — the reference's multi-method path
    (vggsfm_utils.py:202-253)."""
    from worldforge_tpu.sfm.extractors import (combined_extract_fn,
                                               make_extractors)
    from worldforge_tpu.sfm.aliked import ALIKEDConfig
    from worldforge_tpu.sfm.superpoint import SuperPointConfig

    img = np.kron(rng.uniform(0, 1, (8, 8)) > 0.5,
                  np.ones((8, 8)))[..., None].repeat(3, -1) \
        .astype(np.float32)
    exts = make_extractors(
        "aliked+sp+sift+bogus", max_query_num=32, det_thres=0.005,
        aliked_cfg=ALIKEDConfig.tiny(),
        superpoint_cfg=SuperPointConfig.tiny())
    assert set(exts) == {"aliked", "sp", "sift"}
    fn = combined_extract_fn(exts)   # default: sub-pixel (tracking path)
    kpts = fn(img)
    assert kpts.ndim == 2 and kpts.shape[1] == 2
    kr = combined_extract_fn(exts, round_keypoints=True)(img)
    np.testing.assert_array_equal(kr, np.round(kr))  # opt-in rounding
    # default fallback
    assert set(make_extractors("nope", 16,
                               aliked_cfg=ALIKEDConfig.tiny())) == {"aliked"}

# ----------------------------------------- scalar numpy oracles (round 3)
# Independent scalar-loop re-derivations of the deformable-sampling / SDDH
# / DKD math, written straight from the documented semantics (torchvision
# deform_conv2d offset layout: (dy, dx) pairs per kernel tap, k = ky*K+kx;
# ALIKED SDDH/DKD equations, arXiv:2304.03608 §3). These catch exactly the
# class of bug the frozen manifest cannot: a transposed offset pair, a
# kernel-tap-order slip, or a bad reshape in the vectorized JAX path.
# (lightglue/torchvision are absent in-image, so the oracle is hand-scalar
# rather than the upstream torch module — see the module docstring.)


def _bilin_np(img, y, x, zero_pad=True):
    import math as _m
    hh, ww = img.shape[:2]
    y0, x0 = _m.floor(y), _m.floor(x)
    wy, wx = y - y0, x - x0
    acc = np.zeros(img.shape[-1], np.float64)
    for yi, xi, wgt in ((y0, x0, (1 - wy) * (1 - wx)),
                        (y0, x0 + 1, (1 - wy) * wx),
                        (y0 + 1, x0, wy * (1 - wx)),
                        (y0 + 1, x0 + 1, wy * wx)):
        if 0 <= yi < hh and 0 <= xi < ww:
            acc += wgt * img[yi, xi]
        elif not zero_pad:
            acc += wgt * img[min(max(yi, 0), hh - 1),
                             min(max(xi, 0), ww - 1)]
    return acc


def _conv3_np(x, w, b):
    hh, ww, _ = x.shape
    xp = np.pad(x, ((1, 1), (1, 1), (0, 0)))
    out = np.zeros((hh, ww, w.shape[-1]), np.float64)
    for yy in range(hh):
        for xx in range(ww):
            out[yy, xx] = np.einsum("klc,klco->o",
                                    xp[yy:yy + 3, xx:xx + 3], w) + b
    return out


def test_deform_conv_matches_scalar_oracle(rng):
    """Spatially-varying random offsets through the full deformable path
    vs a scalar-loop oracle: out[y,x,o] = sum_k w[ky,kx,:,o] . bilin(x,
    y+ky-1+off[y,x,2k], x+kx-1+off[y,x,2k+1]). A dy/dx transposition or
    tap-order slip in the vmap'd gather fails this immediately."""
    cin, cout, hh, ww = 3, 4, 8, 10
    x = rng.standard_normal((hh, ww, cin)).astype(np.float32)
    w = (rng.standard_normal((3, 3, cin, cout)) * 0.2).astype(np.float32)
    ow = (rng.standard_normal((3, 3, cin, 18)) * 0.4).astype(np.float32)
    ob = rng.standard_normal(18).astype(np.float32)
    off = np.clip(_conv3_np(x, ow, ob), -max(hh, ww) / 4, max(hh, ww) / 4)

    want = np.zeros((hh, ww, cout), np.float64)
    for yy in range(hh):
        for xx in range(ww):
            for ky in range(3):
                for kx in range(3):
                    kk = ky * 3 + kx
                    v = _bilin_np(x, yy + ky - 1 + off[yy, xx, 2 * kk],
                                  xx + kx - 1 + off[yy, xx, 2 * kk + 1])
                    want[yy, xx] += v @ w[ky, kx]

    p = {"offset": {"w": jnp.asarray(ow), "b": jnp.asarray(ob)},
         "w": jnp.asarray(w)}
    got = np.asarray(_deform_conv(p, jnp.asarray(x)[None]))[0]
    np.testing.assert_allclose(got, want, rtol=3e-4, atol=3e-4)


def test_sddh_matches_scalar_oracle(rng):
    """Per-keypoint scalar walk of the SDDH pipeline (patch -> offset head
    -> SELU -> deformable samples -> sf_conv -> convM -> L2) vs the vmap'd
    implementation, fractional keypoints included."""
    cfg = ALIKEDConfig.tiny(max_num_keypoints=4)
    params = init_aliked(jax.random.key(5), cfg)
    p = params["desc_head"]
    hh, ww, c = 12, 16, cfg.dim
    fm = rng.standard_normal((hh, ww, c)).astype(np.float32)
    kp = np.asarray([[3.4, 7.9], [0.0, 0.0], [15.0, 11.0], [8.6, 2.2]],
                    np.float32)                        # (x, y)

    got = np.asarray(sddh_describe(params, cfg,
                                   jnp.asarray(fm)[None],
                                   jnp.asarray(kp)[None]))[0]

    def selu(v):
        a, s = 1.6732632423543772, 1.0507009873554805
        return np.where(v > 0, s * v, s * a * (np.expm1(v)))

    w1 = np.asarray(p["offset_conv1"]["w"], np.float64)
    b1 = np.asarray(p["offset_conv1"]["b"], np.float64)
    w2 = np.asarray(p["offset_conv2"]["w"], np.float64)[0, 0]
    b2 = np.asarray(p["offset_conv2"]["b"], np.float64)
    sf = np.asarray(p["sf_conv"]["w"], np.float64)[0, 0]
    cm = np.asarray(p["convM"]["w"], np.float64)[0, 0]
    r = cfg.kernel_size // 2
    mo = max(hh, ww) / 4.0
    want = np.zeros((len(kp), cfg.dim))
    for n, (kx_, ky_) in enumerate(kp):
        ix = min(max(int(kx_), 0), ww - 1)
        iy = min(max(int(ky_), 0), hh - 1)
        kk = cfg.kernel_size
        patch = np.zeros((kk, kk, c))
        for a in range(-r, r + 1):
            for b_ in range(-r, r + 1):
                patch[a + r, b_ + r] = fm[min(max(iy + a, 0), hh - 1),
                                          min(max(ix + b_, 0), ww - 1)]
        off = selu(np.einsum("klc,klco->o", patch, w1) + b1)
        off = np.clip(off @ w2 + b2, -mo, mo).reshape(cfg.n_pos, 2)
        samp = np.stack([_bilin_np(fm, ky_ + o[1], kx_ + o[0])
                         for o in off])                 # [M, C] (dx, dy)
        samp = selu(samp @ sf)
        desc = samp.reshape(-1) @ cm
        want[n] = desc / max(np.linalg.norm(desc), 1e-12)
    np.testing.assert_allclose(got, want, rtol=5e-4, atol=5e-4)


def test_dkd_matches_scalar_oracle(rng):
    """Whole DKD on a random smooth score map vs a scalar oracle: iterated
    max-pool NMS, border/threshold mask, descending-top-k (stable ties),
    5x5 T=0.1 soft-argmax, bilinear rescoring at the refined point."""
    from scipy.ndimage import gaussian_filter

    hh, ww = 16, 16
    score = gaussian_filter(rng.uniform(0, 1, (hh, ww)), 1.2)
    score = ((score - score.min()) / (score.max() - score.min())) \
        .astype(np.float32)
    cfg = ALIKEDConfig.tiny(max_num_keypoints=8, detection_threshold=0.7)
    got_k, got_s = dkd_detect(jnp.asarray(score)[None], cfg)
    got_k, got_s = np.asarray(got_k[0]), np.asarray(got_s[0])

    r = cfg.nms_radius

    def maxpool(a):
        out = np.empty_like(a)
        for y in range(hh):
            for x in range(ww):
                out[y, x] = a[max(0, y - r):y + r + 1,
                              max(0, x - r):x + r + 1].max()
        return out

    nms = np.where(score == maxpool(score), score, 0.0)
    max_mask = nms > 0
    for _ in range(2):
        supp = maxpool(max_mask.astype(np.float32)) > 0
        ss = np.where(supp, 0.0, score)
        max_mask = max_mask | ((ss == maxpool(ss)) & ~supp)
    nms = np.where(max_mask, score, 0.0)
    nms[:r], nms[-r:], nms[:, :r], nms[:, -r:] = 0, 0, 0, 0
    th = (cfg.detection_threshold
          if (nms > cfg.detection_threshold).any() else score.mean())
    masked = np.where(nms > th, nms, -1.0).ravel()
    order = np.argsort(-masked, kind="stable")[:cfg.max_num_keypoints]
    want_k, want_s = [], []
    for idx in order:
        if masked[idx] <= 0:
            want_k.append((-1.0, -1.0)); want_s.append(-1.0); continue
        iy, ix = divmod(int(idx), ww)
        taps, dys, dxs = [], [], []
        for dy in range(-r, r + 1):
            for dx in range(-r, r + 1):
                taps.append(score[min(max(iy + dy, 0), hh - 1),
                                  min(max(ix + dx, 0), ww - 1)])
                dys.append(dy); dxs.append(dx)
        taps = np.asarray(taps, np.float64)
        e = np.exp((taps - taps.max()) / 0.1)
        ky = iy + (e * dys).sum() / e.sum()
        kx = ix + (e * dxs).sum() / e.sum()
        want_k.append((kx, ky))
        want_s.append(_bilin_np(score[..., None], ky, kx,
                                zero_pad=False)[0])
    np.testing.assert_allclose(got_k, np.asarray(want_k), atol=1e-4)
    np.testing.assert_allclose(got_s, np.asarray(want_s), atol=1e-4)
