"""VGGSfM tracker: coarse CNN + iterative predictor + fine patch refine.

Behavioral reference: vggt/vggt/dependency/vggsfm_tracker.py:25-128 and
dependency/track_modules/:
  - blocks.py:25-149 (BasicEncoder: RAFT-style instance-norm residual CNN
    with 4-scale feature concat; ShallowEncoder for 31x31 patches)
  - base_track_predictor.py:15-200 (BaseTrackerPredictor: RAW multi-scale
    correlations — no corr MLP — concat [flow sincos || flow || corr ||
    feats] padded to a fixed width, EfficientUpdateFormer WITHOUT
    input/output norms or query-ref tokens, non-affine LayerNorms in the
    attention blocks, GroupNorm(1) feat updater; vis head on coarse only)
  - track_refine.py:22-161 (refine_track: 31x31 patches centered on the
    coarse track (floored, clamped to the image), ShallowEncoder features,
    fine predictor at stride 1, offsets added back; frame-0 coords pinned
    to the query)

TPU-first: patch extraction is a batched gather (index arithmetic instead
of torch.unfold); every iteration count and patch size is static so the
whole tracker jits; align_corners resizes are explicit bilinear samples.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from worldforge_tpu.core import params as P
from worldforge_tpu.models.vggt.track import (_mha, _mha_init, _mlp,
                                              _mlp_init, bilinear_sample,
                                              flow_embedding,
                                              sincos_pos_embed_2d)

_EPS_LN = 1e-6   # non-affine LayerNorm eps (dependency modules.py:146)


# ----------------------------------------------------------- CNN encoders


def _instance_norm(x: jnp.ndarray, eps: float = 1e-5) -> jnp.ndarray:
    """Parameter-free InstanceNorm2d over [B, H, W, C]."""
    mean = x.mean(axis=(1, 2), keepdims=True)
    var = jnp.var(x, axis=(1, 2), keepdims=True)
    return (x - mean) * jax.lax.rsqrt(var + eps)


def _conv_init(key, cin, cout, k, dtype):
    return P.conv_init(key, cin, cout, (k, k), dtype=dtype)


def _res_block_init(key, cin, cout, stride, dtype):
    k1, k2, k3 = jax.random.split(key, 3)
    p = {"conv1": _conv_init(k1, cin, cout, 3, dtype),
         "conv2": _conv_init(k2, cout, cout, 3, dtype)}
    if stride != 1:
        p["down"] = _conv_init(k3, cin, cout, 1, dtype)
    return p


def _res_block(p, x, stride):
    """modules.py:39-94 (instance norm, relu(x + y)). Explicit torch-style
    symmetric padding: XLA SAME pads asymmetrically for stride-2 on even
    sizes, which would shift every window."""
    pad1 = ((1, 1), (1, 1))
    y = jax.nn.relu(_instance_norm(P.conv(p["conv1"], x, stride=stride,
                                          padding=pad1)))
    y = jax.nn.relu(_instance_norm(P.conv(p["conv2"], y, padding=pad1)))
    if "down" in p:
        x = _instance_norm(P.conv(p["down"], x, stride=stride,
                                  padding="VALID"))
    return jax.nn.relu(x + y)


from worldforge_tpu.ops.sampling import resize_align_corners  # noqa: E402,F401


def init_basic_encoder(key, dtype=jnp.float32, output_dim: int = 128) -> dict:
    ks = iter(P.split_keys(key, 12))
    d = output_dim
    dims = [d // 2, d // 4 * 3, d, d]
    p = {"conv1": _conv_init(next(ks), 3, d // 2, 7, dtype)}
    cin = d // 2
    for i, dim in enumerate(dims, start=1):
        p[f"layer{i}a"] = _res_block_init(next(ks), cin, dim,
                                          1 if i == 1 else 2, dtype)
        p[f"layer{i}b"] = _res_block_init(next(ks), dim, dim, 1, dtype)
        cin = dim
    p["conv2"] = _conv_init(next(ks), sum(dims), 2 * d, 3, dtype)
    p["conv3"] = _conv_init(next(ks), 2 * d, d, 1, dtype)
    return p


def basic_encoder_forward(p, x: jnp.ndarray, stride: int = 4) -> jnp.ndarray:
    """[B, H, W, 3] -> [B, H/stride, W/stride, 128] (blocks.py:66-88)."""
    b, hh, ww, _ = x.shape
    h_out, w_out = hh // stride, ww // stride
    x = jax.nn.relu(_instance_norm(P.conv(p["conv1"], x, stride=2,
                                          padding=((3, 3), (3, 3)))))
    feats = []
    for i in range(1, 5):
        x = _res_block(p[f"layer{i}a"], x, 1 if i == 1 else 2)
        x = _res_block(p[f"layer{i}b"], x, 1)
        feats.append(resize_align_corners(x, h_out, w_out))
    y = jnp.concatenate(feats, axis=-1)
    y = jax.nn.relu(_instance_norm(P.conv(p["conv2"], y,
                                          padding=((1, 1), (1, 1)))))
    return P.conv(p["conv3"], y)


def init_shallow_encoder(key, dtype=jnp.float32,
                         output_dim: int = 32) -> dict:
    k1, k2, k3, k4 = jax.random.split(key, 4)
    return {"conv1": _conv_init(k1, 3, output_dim, 3, dtype),
            "layer1": _res_block_init(k2, output_dim, output_dim, 2, dtype),
            "layer2": _res_block_init(k3, output_dim, output_dim, 2, dtype),
            "conv2": _conv_init(k4, output_dim, output_dim, 1, dtype)}


def shallow_encoder_forward(p, x: jnp.ndarray,
                            stride: int = 1) -> jnp.ndarray:
    """[B, P, P, 3] patch -> [B, P/stride, P/stride, 32]
    (blocks.py:132-149)."""
    b, hh, ww, _ = x.shape
    x = jax.nn.relu(_instance_norm(P.conv(p["conv1"], x, stride=2,
                                          padding=((1, 1), (1, 1)))))
    tmp = _res_block(p["layer1"], x, 2)
    x = x + resize_align_corners(tmp, x.shape[1], x.shape[2])
    tmp = _res_block(p["layer2"], tmp, 2)
    x = x + resize_align_corners(tmp, x.shape[1], x.shape[2])
    x = P.conv(p["conv2"], x) + x
    return resize_align_corners(x, hh // stride, ww // stride)


# ------------------------------------------------------------- predictor


@dataclasses.dataclass(frozen=True)
class SfmTrackerConfig:
    stride: int = 4
    corr_levels: int = 5
    corr_radius: int = 4
    latent_dim: int = 128
    hidden_size: int = 384
    depth: int = 6
    num_heads: int = 8
    num_virtual: int = 64
    mlp_ratio: float = 4.0
    fine: bool = False
    use_spaceatt: bool = True

    @property
    def corr_dim(self) -> int:
        return self.corr_levels * (2 * self.corr_radius + 1) ** 2

    @property
    def transformer_dim(self) -> int:
        """base_track_predictor.py:42-48 padding rule."""
        d = self.corr_dim + 2 * self.latent_dim
        if self.fine:
            return d + (4 if d % 2 == 0 else 5)
        return d + (4 - d % 4) % 4

    @classmethod
    def coarse(cls) -> "SfmTrackerConfig":
        return cls()

    @classmethod
    def fine_cfg(cls) -> "SfmTrackerConfig":
        return cls(stride=1, depth=4, corr_levels=3, corr_radius=3,
                   latent_dim=32, hidden_size=256, fine=True,
                   use_spaceatt=False)


def _attn_block_na_init(key, dim, mlp_ratio, dtype, cross=False):
    k1, k2 = jax.random.split(key)
    p = {"attn": _mha_init(k1, dim, dtype),
         "mlp": _mlp_init(k2, dim, int(dim * mlp_ratio), dtype)}
    if cross:
        p["norm_ctx"] = P.layer_norm_init(dim, dtype=dtype)
    return p


def _ln_na(x):
    return P.layer_norm({}, x.astype(jnp.float32), eps=_EPS_LN)


def _attn_block_na(p, x, num_heads):
    """Non-affine-norm AttnBlock (dependency modules.py:133-171; same
    residual-on-normed-x quirk as the heads variant)."""
    x = _ln_na(x)
    x = x + _mha(p["attn"], x, x, num_heads)
    return x + _mlp(p["mlp"], _ln_na(x))


def _cross_block_na(p, x, ctx, num_heads):
    """CrossAttnBlock (dependency modules.py:172-204): norm1/norm2 are
    non-affine eps 1e-6, but norm_context is a PLAIN affine LayerNorm."""
    x = _ln_na(x)
    ctx = P.layer_norm(p["norm_ctx"], ctx.astype(jnp.float32), eps=1e-5)
    x = x + _mha(p["attn"], x, ctx, num_heads)
    return x + _mlp(p["mlp"], _ln_na(x))


def init_sfm_updateformer(key, cfg: SfmTrackerConfig,
                          dtype=jnp.float32) -> dict:
    ks = iter(P.split_keys(key, 4 * cfg.depth + 4))
    h = cfg.hidden_size
    p = {"input_transform": P.dense_init(next(ks), cfg.transformer_dim, h,
                                         dtype=dtype),
         "time_blocks": [_attn_block_na_init(next(ks), h, cfg.mlp_ratio,
                                             dtype)
                         for _ in range(cfg.depth)],
         "flow_head": P.dense_init(next(ks), h, cfg.latent_dim + 2,
                                   dtype=dtype)}
    if cfg.use_spaceatt:
        p["virtual"] = jax.random.normal(
            next(ks), (1, cfg.num_virtual, 1, h)).astype(dtype)
        p["space_virtual"] = [_attn_block_na_init(next(ks), h,
                                                  cfg.mlp_ratio, dtype)
                              for _ in range(cfg.depth)]
        p["v2p"] = [_attn_block_na_init(next(ks), h, cfg.mlp_ratio, dtype,
                                        cross=True)
                    for _ in range(cfg.depth)]
        p["p2v"] = [_attn_block_na_init(next(ks), h, cfg.mlp_ratio, dtype,
                                        cross=True)
                    for _ in range(cfg.depth)]
    return p


def sfm_updateformer_forward(p, cfg: SfmTrackerConfig,
                             x: jnp.ndarray) -> jnp.ndarray:
    """x [B, N, T, D] -> delta [B, N, T, latent+2] (blocks.py:224-263 —
    no input/output norms)."""
    b, n, t, _ = x.shape
    nh = cfg.num_heads
    tokens = P.dense(p["input_transform"], x)
    init_tokens = tokens
    ntot = n
    if cfg.use_spaceatt:
        virt = jnp.broadcast_to(p["virtual"],
                                (b, cfg.num_virtual, t, cfg.hidden_size))
        tokens = jnp.concatenate([tokens, virt], axis=1)
        ntot = n + cfg.num_virtual
    for i in range(cfg.depth):
        tt = tokens.reshape(b * ntot, t, -1)
        tt = _attn_block_na(p["time_blocks"][i], tt, nh)
        tokens = tt.reshape(b, ntot, t, -1)
        if cfg.use_spaceatt:
            st = tokens.transpose(0, 2, 1, 3).reshape(b * t, ntot, -1)
            pts, virt = st[:, :n], st[:, n:]
            virt = _cross_block_na(p["v2p"][i], virt, pts, nh)
            virt = _attn_block_na(p["space_virtual"][i], virt, nh)
            pts = _cross_block_na(p["p2v"][i], pts, virt, nh)
            st = jnp.concatenate([pts, virt], axis=1)
            tokens = st.reshape(b, t, ntot, -1).transpose(0, 2, 1, 3)
    tokens = tokens[:, :n] + init_tokens
    return P.dense(p["flow_head"], tokens)


def init_sfm_predictor(key, cfg: SfmTrackerConfig,
                       dtype=jnp.float32) -> dict:
    ks = iter(P.split_keys(key, 4))
    lat = cfg.latent_dim
    p = {"updateformer": init_sfm_updateformer(next(ks), cfg, dtype),
         "norm": P.group_norm_init(lat, dtype=dtype),
         "ffeat_updater": P.dense_init(next(ks), lat, lat, dtype=dtype)}
    if not cfg.fine:
        p["vis_predictor"] = P.dense_init(next(ks), lat, 1, dtype=dtype)
    return p


def _corr_pyramid(fmaps, levels):
    b, s, hh, ww, c = fmaps.shape
    cur = fmaps.reshape(b * s, hh, ww, c)
    pyr = [cur]
    for _ in range(levels - 1):
        m, h2, w2, _ = cur.shape
        if h2 < 2 or w2 < 2:      # the reference crashes below 1x1; clamp
            pyr.append(cur)
            continue
        cur = cur[:, :h2 // 2 * 2, :w2 // 2 * 2]
        cur = cur.reshape(m, h2 // 2, 2, w2 // 2, 2, c).mean(axis=(2, 4))
        pyr.append(cur)
    return pyr


def sfm_predictor_forward(p, cfg: SfmTrackerConfig,
                          query_points: jnp.ndarray, fmaps: jnp.ndarray,
                          iters: int = 4, down_ratio: int = 1,
                          return_feat: bool = False):
    """query_points [B,N,2] image px; fmaps [B,S,HH,WW,C]
    (base_track_predictor.py:71-200)."""
    b, n, _ = query_points.shape
    s, hh, ww = fmaps.shape[1:4]
    lat = cfg.latent_dim
    fmaps = fmaps.astype(jnp.float32)

    qp = query_points.astype(jnp.float32)
    if down_ratio > 1:
        qp = qp / down_ratio
    qp = qp / cfg.stride
    coords = jnp.broadcast_to(qp[:, None], (b, s, n, 2))
    coords0 = coords
    query_feat = bilinear_sample(fmaps[:, 0], qp, padding="border")
    track_feats = jnp.broadcast_to(query_feat[:, None], (b, s, n, lat))

    pyramid = _corr_pyramid(fmaps, cfg.corr_levels)
    pos_grid = jnp.asarray(sincos_pos_embed_2d(cfg.transformer_dim, hh, ww))
    pos_grid = jnp.broadcast_to(pos_grid[None], (b,) + pos_grid.shape)
    radius = cfg.corr_radius
    k = 2 * radius + 1
    dx = np.linspace(-radius, radius, k)
    delta = jnp.asarray(np.stack(np.meshgrid(dx, dx, indexing="ij"),
                                 axis=-1).reshape(-1, 2), jnp.float32)

    coord_preds = []
    for _ in range(iters):
        coords = jax.lax.stop_gradient(coords)
        corrs = []
        for i, fm in enumerate(pyramid):
            fh, fw = fm.shape[1:3]
            fmap2 = fm.reshape(b, s, fh * fw, lat)
            cr = jnp.einsum("bsnc,bspc->bsnp", track_feats, fmap2)
            cr = cr / np.sqrt(lat)
            cr = cr.reshape(b * s * n, fh, fw, 1)
            pts = coords.reshape(b * s * n, 1, 2) / (2.0 ** i) + delta[None]
            # grid_sample(align_corners=True) collapses a size-1 axis to
            # pixel 0 for ANY coordinate (utils.py:124-190 normalize by
            # max(size-1,1) then unnormalize by size-1=0); replicate
            if fw == 1:
                pts = pts.at[..., 0].set(0.0)
            if fh == 1:
                pts = pts.at[..., 1].set(0.0)
            samp = bilinear_sample(cr, pts, padding="zeros")
            corrs.append(samp.reshape(b, s, n, k * k))
        fcorrs = jnp.concatenate(corrs, axis=-1)
        fcorrs_ = fcorrs.transpose(0, 2, 1, 3).reshape(b * n, s, -1)
        flows = (coords - coords[:, 0:1]).transpose(0, 2, 1, 3).reshape(
            b * n, s, 2)
        femb = jnp.concatenate([flow_embedding(flows, lat // 2), flows],
                               axis=-1)
        tfeats_ = track_feats.transpose(0, 2, 1, 3).reshape(b * n, s, lat)
        x = jnp.concatenate([femb, fcorrs_, tfeats_], axis=-1)
        pad = cfg.transformer_dim - x.shape[-1]
        if pad > 0:
            x = jnp.concatenate(
                [x, jnp.zeros(x.shape[:-1] + (pad,), x.dtype)], axis=-1)
        sampled_pos = bilinear_sample(pos_grid, coords[:, 0],
                                      padding="border")
        x = x + sampled_pos.reshape(b * n, 1, -1)
        delta_out = sfm_updateformer_forward(p["updateformer"], cfg,
                                             x.reshape(b, n, s, -1))
        delta_out = delta_out.reshape(b * n, s, -1)
        dcoords, dfeats = delta_out[..., :2], delta_out[..., 2:]
        upd = P.dense(p["ffeat_updater"],
                      P.group_norm(p["norm"],
                                   dfeats.reshape(b * n * s, lat),
                                   groups=1, eps=1e-5))
        tfeats_ = jax.nn.gelu(upd, approximate=False) \
            + tfeats_.reshape(b * n * s, lat)
        track_feats = tfeats_.reshape(b, n, s, lat).transpose(0, 2, 1, 3)
        coords = coords + dcoords.reshape(b, n, s, 2).transpose(0, 2, 1, 3)
        coords = coords.at[:, 0].set(coords0[:, 0])
        coord_preds.append(coords * cfg.stride * down_ratio)

    vis = None
    if not cfg.fine:
        vis = jax.nn.sigmoid(
            P.dense(p["vis_predictor"],
                    track_feats.reshape(b * s * n, lat)).reshape(b, s, n))
    if return_feat:
        return coord_preds, vis, track_feats, query_feat
    return coord_preds, vis


# ----------------------------------------------------------- refine_track


def extract_patches(images: jnp.ndarray, topleft: jnp.ndarray,
                    psize: int) -> jnp.ndarray:
    """images [M, H, W, 3]; topleft [M, N, 2] int (x, y), pre-clamped ->
    [M, N, psize, psize, 3] gather (replaces torch.unfold,
    track_refine.py:73-107)."""
    m, hh, ww, c = images.shape
    n = topleft.shape[1]
    dy = jnp.arange(psize)
    ys = topleft[..., 1][..., None] + dy[None, None]          # [M,N,P]
    xs = topleft[..., 0][..., None] + dy[None, None]
    rows = images[jnp.arange(m)[:, None, None], ys]           # [M,N,P,W,3]
    return rows[jnp.arange(m)[:, None, None, None],
                jnp.arange(n)[None, :, None, None],
                jnp.arange(psize)[None, None, :, None],
                xs[:, :, None, :]]                            # [M,N,P,P,3]


def refine_track(images: jnp.ndarray, fine_fnet_params,
                 fine_predictor_params, coarse_pred: jnp.ndarray,
                 fine_cfg: Optional[SfmTrackerConfig] = None,
                 pradius: int = 15, fine_iters: int = 6) -> jnp.ndarray:
    """images [B,S,H,W,3] in [0,1]; coarse_pred [B,S,N,2] -> refined
    tracks [B,S,N,2] (track_refine.py:22-161)."""
    fine_cfg = fine_cfg or SfmTrackerConfig.fine_cfg()
    b, s, hh, ww, _ = images.shape
    n = coarse_pred.shape[2]
    psize = 2 * pradius + 1
    query_points = coarse_pred[:, 0]

    track_int = jnp.floor(coarse_pred).astype(jnp.int32)
    track_frac = coarse_pred - track_int
    topleft_bsn = track_int - pradius
    topleft = jnp.clip(topleft_bsn, 0, hh - psize).reshape(b * s, n, 2)

    patches = extract_patches(images.reshape(b * s, hh, ww, 3), topleft,
                              psize)
    feats = shallow_encoder_forward(
        fine_fnet_params, patches.reshape(b * s * n, psize, psize, 3),
        stride=fine_cfg.stride)
    fh = feats.shape[1]
    feats = feats.reshape(b, s, n, fh, fh, -1).transpose(0, 2, 1, 3, 4, 5)
    feats = feats.reshape(b * n, s, fh, fh, -1)

    patch_queries = (track_frac[:, 0] + pradius).reshape(b * n, 1, 2)
    preds, _ = sfm_predictor_forward(fine_predictor_params, fine_cfg,
                                     patch_queries, feats,
                                     iters=fine_iters)
    fine = preds[-1].reshape(b, n, s, 1, 2)[:, :, :, 0]
    fine = fine.transpose(0, 2, 1, 3) + topleft_bsn
    return fine.at[:, 0].set(query_points)


# -------------------------------------------------------------- top level


def init_sfm_tracker(key, dtype=jnp.float32) -> dict:
    k1, k2, k3, k4 = jax.random.split(key, 4)
    return {"coarse_fnet": init_basic_encoder(k1, dtype),
            "coarse_predictor": init_sfm_predictor(
                k2, SfmTrackerConfig.coarse(), dtype),
            "fine_fnet": init_shallow_encoder(k3, dtype),
            "fine_predictor": init_sfm_predictor(
                k4, SfmTrackerConfig.fine_cfg(), dtype)}


def compute_tracker_fmaps(params, images: jnp.ndarray,
                          coarse_down_ratio: int = 2) -> jnp.ndarray:
    """Coarse-encoder feature maps for the whole sequence, computed once
    and reusable across query frames/chunks (the reference hoists this as
    tracker.process_images_to_fmaps, track_predict.py:77).
    images [B,S,H,W,3] -> fmaps [B,S,HH,WW,C]."""
    b, s, hh, ww, _ = images.shape
    coarse_cfg = SfmTrackerConfig.coarse()
    imgs = images.reshape(b * s, hh, ww, 3)
    if coarse_down_ratio > 1:
        imgs = resize_align_corners(imgs, hh // coarse_down_ratio,
                                    ww // coarse_down_ratio)
    fmaps = basic_encoder_forward(params["coarse_fnet"], imgs,
                                  stride=coarse_cfg.stride)
    return fmaps.reshape(b, s, *fmaps.shape[1:])


def sfm_tracker_forward(params, images: jnp.ndarray,
                        query_points: jnp.ndarray, coarse_iters: int = 6,
                        fine_tracking: bool = True,
                        coarse_down_ratio: int = 2,
                        fmaps: jnp.ndarray = None):
    """images [B,S,H,W,3] in [0,1]; query_points [B,N,2]. Returns
    (fine_track, coarse_track, vis) (vggsfm_tracker.py:58-105).
    fmaps: precomputed compute_tracker_fmaps output (skips the coarse
    encoder — images are then only used by the fine refinement)."""
    coarse_cfg = SfmTrackerConfig.coarse()
    if fmaps is None:
        fmaps = compute_tracker_fmaps(params, images,
                                      coarse_down_ratio=coarse_down_ratio)
    preds, vis = sfm_predictor_forward(params["coarse_predictor"],
                                       coarse_cfg, query_points, fmaps,
                                       iters=coarse_iters,
                                       down_ratio=coarse_down_ratio)
    coarse = preds[-1]
    if fine_tracking:
        fine = refine_track(images, params["fine_fnet"],
                            params["fine_predictor"], coarse)
    else:
        fine = coarse
    return fine, coarse, vis
