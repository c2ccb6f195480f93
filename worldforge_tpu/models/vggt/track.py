"""VGGT track head: CoTracker-style iterative point tracking.

Behavioral reference: vggt/vggt/heads/track_head.py:12-104 (DPT feature
extractor, feature_only, down_ratio=2) + track_modules/:
  - base_track_predictor.py:17-209 (BaseTrackerPredictor: corr pyramid
    sampling, flow sincos embedding, EfficientUpdateFormer refinement,
    coords[:,0] pinned to the query, vis/conf heads)
  - blocks.py:19-134 (EfficientUpdateFormer: 64 virtual tracks, interleaved
    time-attention over S and space-attention over N via
    virtual2point/virtual/point2virtual blocks; residual uses the
    POST-norm1 tensor — a reference quirk we replicate)
  - blocks.py:137-245 (CorrBlock: 2x avg-pool pyramid, per-level dot-product
    correlation sampled on a (2r+1)^2 delta grid, zeros padding)
  - utils.py:18-121 (sincos embeddings), :124-240 (align_corners=True
    bilinear sampling; border padding for features, zeros for correlation)

TPU-first notes: the refinement iterations (4) and pyramid levels are
static python loops that unroll under jit; every sample is a gather +
fused bilinear weights (no grid_sample kernel needed); correlation is a
batched matmul on the MXU. All attention here is tiny (S, N ~ dozens), so
plain fp32 SDPA is used rather than the Pallas kernel.
"""

from __future__ import annotations

import dataclasses
import math
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from worldforge_tpu.core import params as P
from worldforge_tpu.models.vggt.heads import (DPTHeadConfig, dpt_head_forward,
                                              init_dpt_head)

_EPS = 1e-5  # torch LayerNorm/GroupNorm default


@dataclasses.dataclass(frozen=True)
class TrackHeadConfig:
    dim_in: int = 2048
    patch_size: int = 14
    features: int = 128          # latent_dim
    iters: int = 4
    stride: int = 2
    corr_levels: int = 7
    corr_radius: int = 4
    hidden_size: int = 384
    depth: int = 6               # time depth == space depth
    num_heads: int = 8
    num_virtual: int = 64
    max_scale: int = 518
    mlp_ratio: float = 4.0
    predict_conf: bool = True
    intermediate_layer_idx: Tuple[int, ...] = (4, 11, 17, 23)

    @property
    def transformer_dim(self) -> int:
        return 3 * self.features + 4

    @property
    def dpt(self) -> DPTHeadConfig:
        return DPTHeadConfig(dim_in=self.dim_in, patch_size=self.patch_size,
                             features=self.features,
                             out_channels=(self.features * 2,) * 4
                             if self.features < 64 else
                             (256, 512, 1024, 1024),
                             pos_embed=False, feature_only=True, down_ratio=2)

    @classmethod
    def tiny(cls) -> "TrackHeadConfig":
        return cls(dim_in=64, patch_size=14, features=16, iters=2,
                   corr_levels=2, corr_radius=2, hidden_size=32, depth=2,
                   num_heads=2, num_virtual=4,
                   intermediate_layer_idx=(0, 1, 2, 3))


# ------------------------------------------------------------- primitives


from worldforge_tpu.ops.sampling import bilinear_sample  # noqa: F401
# (moved to ops/sampling.py; re-exported here for existing importers)


def sincos_pos_embed_2d(dim: int, gh: int, gw: int) -> np.ndarray:
    """[gh, gw, dim] = cat(sincos(x), sincos(y)) (utils.py:18-88)."""
    half = dim // 2
    omega = np.arange(half // 2, dtype=np.float64) / (half / 2.0)
    omega = 1.0 / (10000.0 ** omega)

    def emb(pos):
        out = np.einsum("m,d->md", pos.reshape(-1), omega)
        return np.concatenate([np.sin(out), np.cos(out)], axis=1)

    xx, yy = np.meshgrid(np.arange(gw, dtype=np.float64),
                         np.arange(gh, dtype=np.float64), indexing="xy")
    return np.concatenate([emb(xx), emb(yy)],
                          axis=1).reshape(gh, gw, dim).astype(np.float32)


def flow_embedding(flows: jnp.ndarray, c: int) -> jnp.ndarray:
    """Interleaved sin/cos embedding of 2D flows (utils.py:90-121,
    cat_coords=False): [..., 2] -> [..., 2c]."""
    div = jnp.arange(0, c, 2, dtype=jnp.float32) * (1000.0 / c)  # [c/2]
    x = flows[..., 0:1] * div
    y = flows[..., 1:2] * div

    def interleave(sin, cos):
        out = jnp.stack([sin, cos], axis=-1)       # [..., c/2, 2]
        return out.reshape(out.shape[:-2] + (c,))

    return jnp.concatenate([interleave(jnp.sin(x), jnp.cos(x)),
                            interleave(jnp.sin(y), jnp.cos(y))], axis=-1)


# ---------------------------------------------------------------- modules


def _mha_init(key, dim, dtype):
    """torch nn.MultiheadAttention layout: fused in-proj + out-proj."""
    k1, k2 = jax.random.split(key)
    return {"in_proj": P.dense_init(k1, dim, 3 * dim, dtype=dtype),
            "out_proj": P.dense_init(k2, dim, dim, dtype=dtype)}


def _mha(p, q, kv, num_heads):
    dim = q.shape[-1]
    w = p["in_proj"]["w"].astype(jnp.float32)
    b = p["in_proj"]["b"].astype(jnp.float32)
    qq = q @ w[:, :dim] + b[:dim]
    kk = kv @ w[:, dim:2 * dim] + b[dim:2 * dim]
    vv = kv @ w[:, 2 * dim:] + b[2 * dim:]
    hd = dim // num_heads

    def split(t):
        return t.reshape(t.shape[:-1] + (num_heads, hd)).swapaxes(-3, -2)

    qh, kh, vh = split(qq), split(kk), split(vv)
    att = jax.nn.softmax(qh @ kh.swapaxes(-1, -2) / math.sqrt(hd), axis=-1)
    out = (att @ vh).swapaxes(-3, -2)
    out = out.reshape(out.shape[:-2] + (dim,))
    return P.dense(p["out_proj"], out)


def _mlp_init(key, dim, hidden, dtype, out_dim=None):
    k1, k2 = jax.random.split(key)
    return {"fc1": P.dense_init(k1, dim, hidden, dtype=dtype),
            "fc2": P.dense_init(k2, hidden, out_dim or dim, dtype=dtype)}


def _mlp(p, x):
    return P.dense(p["fc2"], jax.nn.gelu(P.dense(p["fc1"], x),
                                         approximate=False))


def _attn_block_init(key, dim, mlp_ratio, dtype):
    k1, k2 = jax.random.split(key)
    return {"norm1": P.layer_norm_init(dim, dtype=dtype),
            "norm2": P.layer_norm_init(dim, dtype=dtype),
            "attn": _mha_init(k1, dim, dtype),
            "mlp": _mlp_init(k2, dim, int(dim * mlp_ratio), dtype)}


def _attn_block(p, x, num_heads):
    """Self-attention block (modules.py:156-172). NB the reference
    overwrites x with norm1(x) before the residual add — replicated."""
    x = P.layer_norm(p["norm1"], x, eps=_EPS)
    x = x + _mha(p["attn"], x, x, num_heads)
    return x + _mlp(p["mlp"], P.layer_norm(p["norm2"], x, eps=_EPS))


def _cross_block_init(key, dim, mlp_ratio, dtype):
    k1, k2 = jax.random.split(key)
    return {"norm1": P.layer_norm_init(dim, dtype=dtype),
            "norm_ctx": P.layer_norm_init(dim, dtype=dtype),
            "norm2": P.layer_norm_init(dim, dtype=dtype),
            "attn": _mha_init(k1, dim, dtype),
            "mlp": _mlp_init(k2, dim, int(dim * mlp_ratio), dtype)}


def _cross_block(p, x, ctx, num_heads):
    """Cross-attention block (modules.py:192-210); same post-norm residual
    quirk as _attn_block."""
    x = P.layer_norm(p["norm1"], x, eps=_EPS)
    ctx = P.layer_norm(p["norm_ctx"], ctx, eps=_EPS)
    x = x + _mha(p["attn"], x, ctx, num_heads)
    return x + _mlp(p["mlp"], P.layer_norm(p["norm2"], x, eps=_EPS))


def init_updateformer(key, cfg: TrackHeadConfig, dtype=jnp.float32) -> dict:
    ks = iter(P.split_keys(key, 4 * cfg.depth + 4))
    h = cfg.hidden_size
    return {
        "input_norm": P.layer_norm_init(cfg.transformer_dim, dtype=dtype),
        "input_transform": P.dense_init(next(ks), cfg.transformer_dim, h,
                                        dtype=dtype),
        "virtual": jax.random.normal(next(ks), (1, cfg.num_virtual, 1, h)
                                     ).astype(dtype),
        "time_blocks": [_attn_block_init(next(ks), h, cfg.mlp_ratio, dtype)
                        for _ in range(cfg.depth)],
        "space_virtual": [_attn_block_init(next(ks), h, cfg.mlp_ratio, dtype)
                          for _ in range(cfg.depth)],
        "v2p": [_cross_block_init(next(ks), h, cfg.mlp_ratio, dtype)
                for _ in range(cfg.depth)],
        "p2v": [_cross_block_init(next(ks), h, cfg.mlp_ratio, dtype)
                for _ in range(cfg.depth)],
        "output_norm": P.layer_norm_init(h, dtype=dtype),
        "flow_head": P.dense_init(next(ks), h, cfg.features + 2,
                                  dtype=dtype),
    }


def updateformer_forward(p, cfg: TrackHeadConfig,
                         x: jnp.ndarray) -> jnp.ndarray:
    """x [B, N, T, D] -> delta [B, N, T, features+2] (blocks.py:90-134)."""
    b, n, t, _ = x.shape
    nh = cfg.num_heads
    tokens = P.dense(p["input_transform"],
                     P.layer_norm(p["input_norm"], x, eps=_EPS))
    init_tokens = tokens
    virt = jnp.broadcast_to(p["virtual"],
                            (b, cfg.num_virtual, t, cfg.hidden_size))
    tokens = jnp.concatenate([tokens, virt], axis=1)
    ntot = n + cfg.num_virtual
    for i in range(cfg.depth):
        tt = tokens.reshape(b * ntot, t, -1)
        tt = _attn_block(p["time_blocks"][i], tt, nh)
        tokens = tt.reshape(b, ntot, t, -1)
        # space attention every iteration (time_depth == space_depth)
        st = tokens.transpose(0, 2, 1, 3).reshape(b * t, ntot, -1)
        pts, virt = st[:, :n], st[:, n:]
        virt = _cross_block(p["v2p"][i], virt, pts, nh)
        virt = _attn_block(p["space_virtual"][i], virt, nh)
        pts = _cross_block(p["p2v"][i], pts, virt, nh)
        st = jnp.concatenate([pts, virt], axis=1)
        tokens = st.reshape(b, t, ntot, -1).transpose(0, 2, 1, 3)
    tokens = tokens[:, :n] + init_tokens
    return P.dense(p["flow_head"],
                   P.layer_norm(p["output_norm"], tokens, eps=_EPS))


# --------------------------------------------------------------- CorrBlock


def _avg_pool2(x: jnp.ndarray) -> jnp.ndarray:
    """2x2/2 average pool, floor semantics (blocks.py:159-164)."""
    m, h, w, c = x.shape
    h2, w2 = h // 2, w // 2
    x = x[:, :h2 * 2, :w2 * 2]
    return x.reshape(m, h2, 2, w2, 2, c).mean(axis=(2, 4))


def corr_pyramid(fmaps: jnp.ndarray, num_levels: int) -> List[jnp.ndarray]:
    """fmaps [B, S, H, W, C] -> list of pooled maps."""
    b, s, h, w, c = fmaps.shape
    cur = fmaps.reshape(b * s, h, w, c)
    pyr = [cur]
    for _ in range(num_levels - 1):
        cur = _avg_pool2(cur)
        pyr.append(cur)
    return pyr


def corr_sample(pyramid: List[jnp.ndarray], targets: jnp.ndarray,
                coords: jnp.ndarray, radius: int) -> jnp.ndarray:
    """Per-level dot-product correlation sampled on the (2r+1)^2 delta grid
    around coords (blocks.py:176-245). targets [B,S,N,C];
    coords [B,S,N,2] full-res. Returns [B,S,N,L*(2r+1)^2]."""
    b, s, n, c = targets.shape
    k = 2 * radius + 1
    dx = np.linspace(-radius, radius, k)
    delta = np.stack(np.meshgrid(dx, dx, indexing="ij"),
                     axis=-1).reshape(-1, 2)  # (dy, dx) pairs, [K2, 2]
    # reference delta is (dy, dx) stacked but ADDED to (x, y) centroids
    # verbatim (blocks.py:171-174, 213-216) — replicate the swap
    delta = jnp.asarray(delta, jnp.float32)
    out = []
    for i, fm in enumerate(pyramid):
        hh, ww = fm.shape[1:3]
        fmap2 = fm.reshape(b, s, hh * ww, c)
        corr = jnp.einsum("bsnc,bspc->bsnp", targets.astype(jnp.float32),
                          fmap2.astype(jnp.float32)) / math.sqrt(c)
        corr = corr.reshape(b * s * n, hh, ww, 1)
        centers = coords.reshape(b * s * n, 1, 2) / (2.0 ** i)
        pts = centers + delta[None]                       # [BSN, K2, 2]
        samp = bilinear_sample(corr, pts, padding="zeros")
        out.append(samp.reshape(b, s, n, k * k))
    return jnp.concatenate(out, axis=-1)


# -------------------------------------------------------------- predictor


def init_track_predictor(key, cfg: TrackHeadConfig,
                         dtype=jnp.float32) -> dict:
    ks = iter(P.split_keys(key, 8))
    lat = cfg.features
    corr_dim = cfg.corr_levels * (2 * cfg.corr_radius + 1) ** 2
    return {
        "corr_mlp": _mlp_init(next(ks), corr_dim, cfg.hidden_size, dtype,
                              out_dim=lat),
        "query_ref_token": jax.random.normal(
            next(ks), (1, 2, cfg.transformer_dim)).astype(dtype),
        "updateformer": init_updateformer(next(ks), cfg, dtype),
        "fmap_norm": P.layer_norm_init(lat, dtype=dtype),
        "ffeat_norm": P.group_norm_init(lat, dtype=dtype),
        "ffeat_updater": P.dense_init(next(ks), lat, lat, dtype=dtype),
        "vis_predictor": P.dense_init(next(ks), lat, 1, dtype=dtype),
        "conf_predictor": P.dense_init(next(ks), lat, 1, dtype=dtype),
    }


def track_predictor_forward(p, cfg: TrackHeadConfig, query_points: jnp.ndarray,
                            fmaps: jnp.ndarray, iters: Optional[int] = None,
                            apply_sigmoid: bool = True):
    """query_points [B,N,2] (x,y in image px); fmaps [B,S,HH,WW,C].
    Returns (coord_preds list of [B,S,N,2] in image px, vis [B,S,N],
    conf [B,S,N]) (base_track_predictor.py:82-209)."""
    b, n, _ = query_points.shape
    s, hh, ww = fmaps.shape[1:4]
    lat = cfg.features
    iters = cfg.iters if iters is None else iters

    fmaps = P.layer_norm(p["fmap_norm"], fmaps.astype(jnp.float32), eps=_EPS)
    qp = query_points.astype(jnp.float32) / float(cfg.stride)
    coords = jnp.broadcast_to(qp[:, None], (b, s, n, 2))
    coords0 = coords

    query_feat = bilinear_sample(fmaps[:, 0], qp, padding="border")  # [B,N,C]
    track_feats = jnp.broadcast_to(query_feat[:, None], (b, s, n, lat))

    pyramid = corr_pyramid(fmaps, cfg.corr_levels)
    pos_grid = jnp.asarray(sincos_pos_embed_2d(cfg.transformer_dim, hh, ww))
    pos_grid = jnp.broadcast_to(pos_grid[None],
                                (b,) + pos_grid.shape)  # [B,HH,WW,D]

    qref = jnp.concatenate(
        [p["query_ref_token"][:, 0:1],
         jnp.broadcast_to(p["query_ref_token"][:, 1:2],
                          (1, s - 1, cfg.transformer_dim))],
        axis=1).astype(jnp.float32)                       # [1, S, D]

    coord_preds = []
    for _ in range(iters):
        coords = jax.lax.stop_gradient(coords)
        fcorrs = corr_sample(pyramid, track_feats, coords, cfg.corr_radius)
        fcorrs_ = _mlp(p["corr_mlp"],
                       fcorrs.transpose(0, 2, 1, 3).reshape(b * n, s, -1))
        flows = (coords - coords[:, 0:1]).transpose(0, 2, 1, 3).reshape(
            b * n, s, 2)
        femb = flow_embedding(flows, lat // 2)
        femb = jnp.concatenate([femb, flows / cfg.max_scale,
                                flows / cfg.max_scale], axis=-1)
        tfeats_ = track_feats.transpose(0, 2, 1, 3).reshape(b * n, s, lat)
        x = jnp.concatenate([femb, fcorrs_, tfeats_], axis=-1)

        sampled_pos = bilinear_sample(pos_grid, coords[:, 0],
                                      padding="border")   # [B,N,D]
        x = x + sampled_pos.reshape(b * n, 1, -1) + qref
        delta = updateformer_forward(p["updateformer"], cfg,
                                     x.reshape(b, n, s, -1))
        delta = delta.reshape(b * n, s, -1)
        dcoords, dfeats = delta[..., :2], delta[..., 2:]

        upd = P.dense(p["ffeat_updater"],
                      P.group_norm(p["ffeat_norm"],
                                   dfeats.reshape(b * n * s, lat),
                                   groups=1, eps=_EPS))
        tfeats_ = jax.nn.gelu(upd, approximate=False) \
            + tfeats_.reshape(b * n * s, lat)
        track_feats = tfeats_.reshape(b, n, s, lat).transpose(0, 2, 1, 3)

        coords = coords + dcoords.reshape(b, n, s, 2).transpose(0, 2, 1, 3)
        coords = coords.at[:, 0].set(coords0[:, 0])   # pin query frame
        coord_preds.append(coords * cfg.stride)

    flat = track_feats.reshape(b * s * n, lat)
    vis = P.dense(p["vis_predictor"], flat).reshape(b, s, n)
    conf = P.dense(p["conf_predictor"], flat).reshape(b, s, n) \
        if cfg.predict_conf else None
    if apply_sigmoid:
        vis = jax.nn.sigmoid(vis)
        conf = jax.nn.sigmoid(conf) if conf is not None else None
    return coord_preds, vis, conf


# -------------------------------------------------------------- track head


def init_track_head(key, cfg: TrackHeadConfig, dtype=jnp.float32) -> dict:
    k1, k2 = jax.random.split(key)
    return {"feature_extractor": init_dpt_head(k1, cfg.dpt, dtype),
            "tracker": init_track_predictor(k2, cfg, dtype)}


def track_head_forward(params, cfg: TrackHeadConfig,
                       tapped_tokens: List[jnp.ndarray],
                       img_hw: Tuple[int, int], patch_start_idx: int,
                       query_points: jnp.ndarray,
                       iters: Optional[int] = None):
    """tapped_tokens: 4x [B,S,P,2C] aggregator taps. Returns
    (coord_preds, vis, conf) (track_head.py:72-104). Feature maps come out
    at half resolution (down_ratio=2), tracker stride=2 maps query pixels
    to feature coords."""
    fmaps = dpt_head_forward(params["feature_extractor"], cfg.dpt,
                             tapped_tokens, img_hw, patch_start_idx)
    return track_predictor_forward(params["tracker"], cfg, query_points,
                                   fmaps, iters=iters)
