"""ALIKED keypoint detector + descriptor (the reference's DEFAULT tracking
extractor) in JAX.

Behavioral reference: the reference imports it from the `lightglue` pip
package (/root/reference/vggt/vggt/dependency/vggsfm_utils.py:15,207-209,
ALIKED(max_num_keypoints, detection_threshold) -> .extract ->
["keypoints"]); the architecture is the published ALIKED
(arXiv:2304.03608; lightglue/aliked.py port of Zhao et al.'s repo):

  backbone   conv/res blocks at scales 1, /2, /8, /32 (block3/4 use 3x3
             DEFORMABLE convs), SELU gate, inference BatchNorm
  neck       1x1 conv each scale to dim/4, bilinear align_corners=True
             upsample, concat -> [B, H, W, dim]
  score head 1x1(dim,8) -> 3x3(8,4) -> 3x3(4,4) -> 3x3(4,1) -> sigmoid
  DKD        simple_nms(radius 2) -> border/threshold mask -> top-n_limit
             -> 5x5 soft-argmax sub-pixel refinement (T=0.1)
  SDDH       per-keypoint 3x3 patch -> offset head -> M deformable
             samples -> 1x1 sf_conv -> SELU -> convM aggregation -> L2

lightglue is NOT installed in this image, so (as with the SVD UNet,
COMPONENTS.md deviation 2) there is no local torch oracle: the port is
gated by hand-derived goldens (tests/test_aliked.py: zero-offset
deformable conv == plain conv, DKD recovers known sub-pixel peaks,
align-corners upsample goldens) and a frozen conversion manifest; exact
parity is validated at real-checkpoint load on a real host. Only the
KEYPOINTS leave this module on the product path (extract_keypoints uses
coordinates alone; descriptors are exposed for completeness).

TPU-first notes: everything static-shaped (padded top-k like
sfm/superpoint.py); deformable sampling is a vmap'd row gather (the
take_along_axis form hits a slow XLA gather path on TPU); NHWC layout.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from worldforge_tpu.core import params as P
from worldforge_tpu.sfm.superpoint import simple_nms


@dataclasses.dataclass(frozen=True)
class ALIKEDConfig:
    # (c1, c2, c3, c4, dim, K, M) tables from the published configs
    c1: int = 16
    c2: int = 32
    c3: int = 64
    c4: int = 128
    dim: int = 128
    kernel_size: int = 3      # SDDH patch kernel K
    n_pos: int = 16           # SDDH sample positions M
    max_num_keypoints: int = 2048
    detection_threshold: float = 0.005   # vggsfm_utils.py:189 det_thres
    nms_radius: int = 2

    @classmethod
    def n16(cls, **kw) -> "ALIKEDConfig":
        return cls(**kw)

    @classmethod
    def t16(cls, **kw) -> "ALIKEDConfig":
        return cls(c1=8, c2=16, c3=32, c4=64, dim=64, n_pos=16, **kw)

    @classmethod
    def n32(cls, **kw) -> "ALIKEDConfig":
        return cls(n_pos=32, **kw)

    @classmethod
    def tiny(cls, **kw) -> "ALIKEDConfig":
        kw = {"max_num_keypoints": 64, **kw}
        return cls(c1=4, c2=8, c3=8, c4=8, dim=8, n_pos=4, **kw)


# ------------------------------------------------------------------ init


def _conv_init(key, cin, cout, k, dtype, bias=True):
    w = jax.random.normal(key, (k, k, cin, cout), dtype) * (
        1.0 / np.sqrt(cin * k * k))
    p = {"w": w}
    if bias:
        p["b"] = jnp.zeros((cout,), dtype)
    return p


def _bn_init(c, dtype):
    return {"scale": jnp.ones((c,), dtype), "bias": jnp.zeros((c,), dtype),
            "mean": jnp.zeros((c,), dtype), "var": jnp.ones((c,), dtype)}


def _dcn_init(key, cin, cout, dtype):
    k1, k2 = jax.random.split(key)
    return {"offset": _conv_init(k1, cin, 18, 3, dtype, bias=True),
            "w": _conv_init(k2, cin, cout, 3, dtype, bias=False)["w"]}


def _convblock_init(key, cin, cout, dtype, dcn=False):
    ks = P.split_keys(key, 2)
    mk = (lambda k, a, b: _dcn_init(k, a, b, dtype)) if dcn else \
        (lambda k, a, b: _conv_init(k, a, b, 3, dtype, bias=False))
    return {"conv1": mk(ks[0], cin, cout), "bn1": _bn_init(cout, dtype),
            "conv2": mk(ks[1], cout, cout), "bn2": _bn_init(cout, dtype)}


def _resblock_init(key, cin, cout, dtype, dcn=False):
    p = _convblock_init(key, cin, cout, dtype, dcn)
    p["downsample"] = _conv_init(jax.random.fold_in(key, 7), cin, cout, 1,
                                 dtype, bias=True)
    return p


def init_aliked(key, cfg: ALIKEDConfig, dtype=jnp.float32) -> dict:
    ks = P.split_keys(key, 16)
    d4 = cfg.dim // 4
    return {
        "block1": _convblock_init(ks[0], 3, cfg.c1, dtype),
        "block2": _resblock_init(ks[1], cfg.c1, cfg.c2, dtype),
        "block3": _resblock_init(ks[2], cfg.c2, cfg.c3, dtype, dcn=True),
        "block4": _resblock_init(ks[3], cfg.c3, cfg.c4, dtype, dcn=True),
        # the neck + score-head convs are torchvision resnet.conv1x1 /
        # conv3x3 -> bias=False
        "conv1": _conv_init(ks[4], cfg.c1, d4, 1, dtype, bias=False),
        "conv2": _conv_init(ks[5], cfg.c2, d4, 1, dtype, bias=False),
        "conv3": _conv_init(ks[6], cfg.c3, d4, 1, dtype, bias=False),
        "conv4": _conv_init(ks[7], cfg.c4, d4, 1, dtype, bias=False),
        "score_head": {
            "0": _conv_init(ks[8], cfg.dim, 8, 1, dtype, bias=False),
            "2": _conv_init(ks[9], 8, 4, 3, dtype, bias=False),
            "4": _conv_init(ks[10], 4, 4, 3, dtype, bias=False),
            "6": _conv_init(ks[11], 4, 1, 3, dtype, bias=False)},
        "desc_head": {
            "offset_conv1": _conv_init(ks[12], cfg.dim, 2 * cfg.n_pos,
                                       cfg.kernel_size, dtype),
            "offset_conv2": _conv_init(ks[13], 2 * cfg.n_pos,
                                       2 * cfg.n_pos, 1, dtype),
            "sf_conv": _conv_init(ks[14], cfg.dim, cfg.dim, 1, dtype,
                                  bias=False),
            "convM": _conv_init(ks[15], cfg.dim * cfg.n_pos, cfg.dim, 1,
                                dtype, bias=False)},
    }


# ---------------------------------------------------------------- pieces


def _conv(p, x, stride=1):
    k = p["w"].shape[0]
    y = jax.lax.conv_general_dilated(
        x, p["w"], (stride, stride),
        padding=[(k // 2, k // 2)] * 2,
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    if "b" in p:
        y = y + p["b"]
    return y


def _bn(p, x, eps=1e-5):
    inv = jax.lax.rsqrt(p["var"] + eps) * p["scale"]
    return (x - p["mean"]) * inv + p["bias"]


def _gate(x):
    return jax.nn.selu(x)


def _avg_pool(x, k):
    return jax.lax.reduce_window(
        x, 0.0, jax.lax.add, (1, k, k, 1), (1, k, k, 1), "VALID") / (k * k)


def _bilinear_gather(x, ys, xs, zero_pad=True):
    """x [H, W, C]; ys/xs [...] float pixel coords. Out-of-bounds reads 0
    (torchvision deform_conv2d / grid_sample 'zeros' semantics) unless
    zero_pad=False (clamped/border)."""
    hh, ww, _ = x.shape
    y0 = jnp.floor(ys)
    x0 = jnp.floor(xs)
    wy = (ys - y0)[..., None]
    wx = (xs - x0)[..., None]

    def g(yi, xi):
        yc = jnp.clip(yi, 0, hh - 1).astype(jnp.int32)
        xc = jnp.clip(xi, 0, ww - 1).astype(jnp.int32)
        v = x[yc, xc]          # advanced-index row gather (fast XLA path)
        if zero_pad:
            valid = (yi >= 0) & (yi <= hh - 1) & (xi >= 0) & (xi <= ww - 1)
            v = jnp.where(valid[..., None], v, 0.0)
        return v

    return ((1 - wy) * ((1 - wx) * g(y0, x0) + wx * g(y0, x0 + 1))
            + wy * ((1 - wx) * g(y0 + 1, x0) + wx * g(y0 + 1, x0 + 1)))


def _deform_conv(p, x):
    """3x3 deformable conv, stride 1, zero-padding semantics
    (DeformableConv2d: offset conv -> clamp +-max(h,w)/4 ->
    torchvision.deform_conv2d with the regular 3x3 kernel, no bias).
    Offset channel layout: [dy_k, dx_k] pairs, k = ky*3 + kx."""
    b, hh, ww, cin = x.shape
    off = _conv(p["offset"], x)                      # [B, H, W, 18]
    mo = max(hh, ww) / 4.0
    off = jnp.clip(off, -mo, mo).reshape(b, hh, ww, 9, 2)

    yy, xx = jnp.meshgrid(jnp.arange(hh, dtype=x.dtype),
                          jnp.arange(ww, dtype=x.dtype), indexing="ij")
    ky, kx = jnp.meshgrid(jnp.arange(-1, 2, dtype=x.dtype),
                          jnp.arange(-1, 2, dtype=x.dtype), indexing="ij")
    pos_y = yy[None, :, :, None] + ky.reshape(-1) + off[..., 0]
    pos_x = xx[None, :, :, None] + kx.reshape(-1) + off[..., 1]

    sampled = jax.vmap(_bilinear_gather)(x, pos_y, pos_x)  # [B,H,W,9,Cin]
    wk = p["w"].reshape(9, cin, -1)                  # HWIO flatten, ky-major
    return jnp.einsum("bhwkc,kco->bhwo", sampled, wk)


def _apply_conv_or_dcn(p, x):
    return _deform_conv(p, x) if "offset" in p else _conv(p, x)


def _convblock(p, x):
    x = _gate(_bn(p["bn1"], _apply_conv_or_dcn(p["conv1"], x)))
    return _gate(_bn(p["bn2"], _apply_conv_or_dcn(p["conv2"], x)))


def _resblock(p, x):
    h = _gate(_bn(p["bn1"], _apply_conv_or_dcn(p["conv1"], x)))
    h = _bn(p["bn2"], _apply_conv_or_dcn(p["conv2"], h))
    return _gate(h + _conv(p["downsample"], x))


def _upsample_ac(x, factor: int):
    """Bilinear upsample with align_corners=True (nn.Upsample in the
    reference neck; jax.image.resize is half-pixel, so done manually)."""
    b, hh, ww, c = x.shape
    oh, ow = hh * factor, ww * factor

    def axis_idx(n_in, n_out):
        if n_in == 1:
            return jnp.zeros((n_out,), x.dtype)
        return jnp.arange(n_out, dtype=x.dtype) * (n_in - 1) / (n_out - 1)

    def interp(arr, idx, axis):
        i0 = jnp.floor(idx).astype(jnp.int32)
        i1 = jnp.minimum(i0 + 1, arr.shape[axis] - 1)
        w1 = (idx - i0.astype(x.dtype))
        a0 = jnp.take(arr, i0, axis=axis)
        a1 = jnp.take(arr, i1, axis=axis)
        shape = [1] * arr.ndim
        shape[axis] = -1
        w1 = w1.reshape(shape)
        return a0 * (1 - w1) + a1 * w1

    x = interp(x, axis_idx(hh, oh), 1)
    return interp(x, axis_idx(ww, ow), 2)


# ---------------------------------------------------------------- forward


def aliked_dense(params, cfg: ALIKEDConfig, image: jnp.ndarray
                 ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """image [B, H, W, 3] in [0, 1], H and W multiples of 32.
    Returns (feature_map [B, H, W, dim] L2-normalized, score_map [B, H, W])."""
    x1 = _convblock(params["block1"], image)             # 1,  c1
    x2 = _resblock(params["block2"], _avg_pool(x1, 2))   # /2, c2
    x3 = _resblock(params["block3"], _avg_pool(x2, 4))   # /8, c3
    x4 = _resblock(params["block4"], _avg_pool(x3, 4))   # /32, c4

    x1 = _gate(_conv(params["conv1"], x1))
    x2 = _gate(_conv(params["conv2"], x2))
    x3 = _gate(_conv(params["conv3"], x3))
    x4 = _gate(_conv(params["conv4"], x4))
    cat = jnp.concatenate([x1, _upsample_ac(x2, 2), _upsample_ac(x3, 8),
                           _upsample_ac(x4, 32)], axis=-1)

    sh = params["score_head"]
    s = _gate(_conv(sh["0"], cat))
    s = _gate(_conv(sh["2"], s))
    s = _gate(_conv(sh["4"], s))
    score = jax.nn.sigmoid(_conv(sh["6"], s))[..., 0]    # [B, H, W]
    feat = cat / jnp.maximum(
        jnp.linalg.norm(cat, axis=-1, keepdims=True), 1e-12)
    return feat, score


def dkd_detect(score_map: jnp.ndarray, cfg: ALIKEDConfig
               ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Differentiable Keypoint Detection (DKD): NMS -> border/threshold
    mask -> top-n_limit -> 5x5 soft-argmax sub-pixel refinement (T=0.1).
    score_map [B, H, W] -> keypoints [B, K, 2] (x, y) pixel coords (padded
    entries (-1, -1)), scores [B, K] (padding -1). Static shapes."""
    b, hh, ww = score_map.shape
    r = cfg.nms_radius
    nms = simple_nms(score_map, r)
    border = jnp.zeros((hh, ww), bool).at[r:hh - r, r:ww - r].set(True)
    nms = jnp.where(border[None], nms, 0.0)

    # threshold, with the reference's fallback to the mean score when
    # nothing clears it — decided per image, not batch-globally (a
    # low-contrast image in a batch must still fall back to its own mean)
    has_peak = (nms > cfg.detection_threshold).reshape(b, -1).any(axis=-1)
    th = jnp.where(has_peak.reshape(b, 1, 1),
                   cfg.detection_threshold,
                   score_map.reshape(b, -1).mean(axis=-1).reshape(b, 1, 1))
    masked = jnp.where(nms > th, nms, -1.0).reshape(b, -1)
    k = min(cfg.max_num_keypoints, masked.shape[1])
    scores, idx = jax.lax.top_k(masked, k)
    valid = scores > 0
    iy = (idx // ww).astype(jnp.int32)
    ix = (idx % ww).astype(jnp.int32)

    # 5x5 soft-argmax refinement over the raw score map (all selected
    # keypoints are >= r from the border, so the patch stays in bounds)
    dy, dx = jnp.meshgrid(jnp.arange(-r, r + 1), jnp.arange(-r, r + 1),
                          indexing="ij")
    py = iy[..., None] + dy.reshape(-1)[None, None]      # [B, K, 25]
    px = ix[..., None] + dx.reshape(-1)[None, None]

    def gather(sm, py, px):
        return sm[jnp.clip(py, 0, hh - 1), jnp.clip(px, 0, ww - 1)]

    patch = jax.vmap(gather)(score_map, py, px)          # [B, K, 25]
    e = jnp.exp((patch - patch.max(axis=-1, keepdims=True)) / 0.1)
    denom = e.sum(axis=-1)
    res_y = (e * dy.reshape(-1)).sum(-1) / denom
    res_x = (e * dx.reshape(-1)).sum(-1) / denom
    ky = iy.astype(jnp.float32) + res_y
    kx = ix.astype(jnp.float32) + res_x

    # keypoint score: bilinear resample of the score map at the refined
    # location (grid_sample align_corners=True == direct pixel bilinear)
    kscore = jax.vmap(
        lambda sm, ys, xs: _bilinear_gather(sm[..., None], ys, xs,
                                            zero_pad=False)[..., 0]
    )(score_map, ky, kx)

    kpts = jnp.where(valid[..., None], jnp.stack([kx, ky], axis=-1), -1.0)
    return kpts, jnp.where(valid, kscore, -1.0)


def sddh_describe(params, cfg: ALIKEDConfig, feat: jnp.ndarray,
                  kpts: jnp.ndarray) -> jnp.ndarray:
    """Sparse Deformable Descriptor Head: per keypoint, a KxK patch of the
    feature map drives an offset head; M deformable positions are sampled,
    passed through sf_conv + SELU, aggregated by convM, L2-normalized.
    feat [B, H, W, dim]; kpts [B, K, 2] (x, y) pixels -> [B, K, dim]."""
    p = params["desc_head"]
    b, hh, ww, c = feat.shape
    r = cfg.kernel_size // 2
    mo = max(hh, ww) / 4.0

    dy, dx = jnp.meshgrid(jnp.arange(-r, r + 1), jnp.arange(-r, r + 1),
                          indexing="ij")

    def one(fm, kp):
        ix = jnp.clip(kp[:, 0].astype(jnp.int32), 0, ww - 1)
        iy = jnp.clip(kp[:, 1].astype(jnp.int32), 0, hh - 1)
        py = jnp.clip(iy[:, None] + dy.reshape(-1)[None], 0, hh - 1)
        px = jnp.clip(ix[:, None] + dx.reshape(-1)[None], 0, ww - 1)
        patch = fm[py, px]                       # [K, k*k, C]
        kk = cfg.kernel_size
        patch = patch.reshape(-1, kk, kk, c)
        # offset head: VALID KxK conv on the patch == tensordot
        w1 = p["offset_conv1"]["w"]              # [k, k, C, 2M]
        off = jnp.einsum("nkld,kldo->no", patch, w1) + p["offset_conv1"]["b"]
        off = _gate(off)
        off = off @ p["offset_conv2"]["w"][0, 0] + p["offset_conv2"]["b"]
        off = jnp.clip(off, -mo, mo).reshape(-1, cfg.n_pos, 2)  # (dx, dy)

        pos_x = kp[:, 0:1] + off[..., 0]
        pos_y = kp[:, 1:2] + off[..., 1]
        samp = _bilinear_gather(fm, pos_y, pos_x)            # [K, M, C]
        samp = _gate(samp @ p["sf_conv"]["w"][0, 0])         # [K, M, C]
        desc = samp.reshape(samp.shape[0], -1) @ \
            p["convM"]["w"][0, 0]                            # [K, dim]
        return desc / jnp.maximum(
            jnp.linalg.norm(desc, axis=-1, keepdims=True), 1e-12)

    return jax.vmap(one)(feat, kpts)


def aliked_forward(params, cfg: ALIKEDConfig, image: jnp.ndarray
                   ) -> Dict[str, jnp.ndarray]:
    """image [B, H, W, 3] in [0, 1], H/W multiples of 32. Returns
    keypoints [B, K, 2] (x, y) pixels (padding (-1, -1)), scores [B, K],
    descriptors [B, K, dim] (padding rows zeroed)."""
    feat, score = aliked_dense(params, cfg, image)
    kpts, kscores = dkd_detect(score, cfg)
    desc = sddh_describe(params, cfg, feat, kpts)
    desc = jnp.where((kscores > 0)[..., None], desc, 0.0)
    return {"keypoints": kpts, "scores": kscores, "descriptors": desc}


def pad_to_multiple(image: np.ndarray, div: int = 32) -> np.ndarray:
    """Replicate-pad H and W (bottom/right) to multiples of `div` (the
    reference's InputPadder before extract_dense_map). Keypoints from the
    padded run that land in the pad margin are dropped by the caller."""
    hh, ww = image.shape[:2]
    ph = (-hh) % div
    pw = (-ww) % div
    if ph == 0 and pw == 0:
        return image
    return np.pad(image, ((0, ph), (0, pw), (0, 0)), mode="edge")
