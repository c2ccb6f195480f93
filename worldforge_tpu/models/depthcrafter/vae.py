"""SVD VAE (AutoencoderKLTemporalDecoder): 2D encoder + temporal decoder.

The reference uses this via diffusers (pip). Encoder = standard SD VAE
encoder (per-frame 2D); decoder = TemporalDecoder: 2D decoder blocks whose
resnets are spatio-temporal (the same SpatioTemporalResBlock mixing as the
UNet) plus a final temporal conv over frames. scaling_factor 0.18215.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp

from worldforge_tpu.core import params as P
from worldforge_tpu.models.depthcrafter.unet import (_attn, _attn_init,
                                                     _conv, _conv2d,
                                                     _conv_t, _res2d,
                                                     _res2d_init, _st_res,
                                                     _st_res_init)

SVD_VAE_SCALING = 0.18215


@dataclasses.dataclass(frozen=True)
class SVDVAEConfig:
    in_channels: int = 3
    latent_channels: int = 4
    block_out_channels: Tuple[int, ...] = (128, 256, 512, 512)
    layers_per_block: int = 2
    eps: float = 1e-6

    @classmethod
    def svd(cls) -> "SVDVAEConfig":
        return cls()

    @classmethod
    def tiny(cls) -> "SVDVAEConfig":
        return cls(block_out_channels=(8, 8, 16, 16), layers_per_block=1)


def init_svd_vae(key, cfg: SVDVAEConfig, dtype=jnp.float32) -> dict:
    ks = iter(P.split_keys(key, 128))
    boc = cfg.block_out_channels
    enc = {"conv_in": _conv(next(ks), cfg.in_channels, boc[0], 3, dtype),
           "down": []}
    for i, c in enumerate(boc):
        cin = boc[max(i - 1, 0)]
        blk = {"resnets": [
            _res2d_init(next(ks), cin if j == 0 else c, c, 0, dtype)
            for j in range(cfg.layers_per_block)]}
        for r in blk["resnets"]:
            r.pop("time_emb_proj")
        if i < len(boc) - 1:
            blk["down"] = _conv(next(ks), c, c, 3, dtype)
        enc["down"].append(blk)
    mid1 = _res2d_init(next(ks), boc[-1], boc[-1], 0, dtype)
    mid2 = _res2d_init(next(ks), boc[-1], boc[-1], 0, dtype)
    mid1.pop("time_emb_proj")
    mid2.pop("time_emb_proj")
    enc["mid"] = {
        "res1": mid1,
        "attn_norm": P.group_norm_init(boc[-1], dtype),
        "attn": _attn_init(next(ks), boc[-1], boc[-1], dtype),
        "res2": mid2,
    }
    enc["norm_out"] = P.group_norm_init(boc[-1], dtype)
    enc["conv_out"] = _conv(next(ks), boc[-1], 2 * cfg.latent_channels, 3,
                            dtype)
    enc["quant_conv"] = _conv(next(ks), 2 * cfg.latent_channels,
                              2 * cfg.latent_channels, 1, dtype)

    rev = list(reversed(boc))
    temb = 0  # temporal decoder res blocks carry no timestep embedding
    dec = {"conv_in": _conv(next(ks), cfg.latent_channels, rev[0], 3, dtype),
           "up": []}
    dec["mid"] = {
        "res1": _st_res_init(next(ks), rev[0], rev[0], 0, dtype),
        "attn_norm": P.group_norm_init(rev[0], dtype),
        "attn": _attn_init(next(ks), rev[0], rev[0], dtype),
        "res2": _st_res_init(next(ks), rev[0], rev[0], 0, dtype),
    }
    for i, c in enumerate(rev):
        cin = rev[max(i - 1, 0)]
        blk = {"resnets": [
            _st_res_init(next(ks), cin if j == 0 else c, c, 0, dtype)
            for j in range(cfg.layers_per_block + 1)]}
        if i < len(rev) - 1:
            blk["up"] = _conv(next(ks), c, c, 3, dtype)
        dec["up"].append(blk)
    dec["norm_out"] = P.group_norm_init(rev[-1], dtype)
    dec["conv_out"] = _conv(next(ks), rev[-1], cfg.in_channels, 3, dtype)
    dec["time_conv_out"] = P.conv_init(next(ks), cfg.in_channels,
                                       cfg.in_channels, (3, 1, 1),
                                       dtype=dtype)
    return {"encoder": enc, "decoder": dec}


def _res2d_no_t(p, x, eps):
    h = jax.nn.silu(P.group_norm(p["norm1"], x, eps=eps))
    h = _conv2d(p["conv1"], h)
    h = jax.nn.silu(P.group_norm(p["norm2"], h, eps=eps))
    h = _conv2d(p["conv2"], h)
    skip = _conv2d(p["conv_shortcut"], x) if "conv_shortcut" in p else x
    return h + skip


def _vae_attn(pn, pa, x, eps):
    n, hh, ww, c = x.shape
    h = P.group_norm(pn, x, eps=eps).reshape(n, hh * ww, c)
    return x + _attn(pa, h, h, heads=1).reshape(n, hh, ww, c)


def svd_vae_encode(params, cfg: SVDVAEConfig, frames: jnp.ndarray,
                   scale: bool = True
                   ) -> jnp.ndarray:
    """frames [T, 3, H, W] in [-1,1] -> scaled latent means
    [T, 4, H/8, W/8] (the pipeline uses the distribution mean,
    depth_crafter_ppl.py:50-67)."""
    e = params["encoder"]
    x = frames.transpose(0, 2, 3, 1)
    x = _conv2d(e["conv_in"], x)
    for i, blk in enumerate(e["down"]):
        for r in blk["resnets"]:
            x = _res2d_no_t(r, x, cfg.eps)
        if "down" in blk:
            x = jnp.pad(x, ((0, 0), (0, 1), (0, 1), (0, 0)))
            dn = jax.lax.conv_dimension_numbers(
                x.shape, blk["down"]["w"].shape, ("NHWC", "HWIO", "NHWC"))
            x = jax.lax.conv_general_dilated(
                x, blk["down"]["w"].astype(x.dtype), (2, 2), "VALID",
                dimension_numbers=dn) + blk["down"]["b"].astype(x.dtype)
    x = _res2d_no_t(e["mid"]["res1"], x, cfg.eps)
    x = _vae_attn(e["mid"]["attn_norm"], e["mid"]["attn"], x, cfg.eps)
    x = _res2d_no_t(e["mid"]["res2"], x, cfg.eps)
    x = jax.nn.silu(P.group_norm(e["norm_out"], x, eps=cfg.eps))
    x = _conv2d(e["conv_out"], x)
    x = _conv2d(e["quant_conv"], x)
    mean = x[..., :cfg.latent_channels]
    out = mean.transpose(0, 3, 1, 2)
    # DepthCrafter's conditioning path concatenates RAW latent_dist.mode()
    # — no scaling-factor multiply (depth_crafter_ppl.py:51-67); only a
    # caller generating latents for the denoiser wants the 0.18215 scale
    return out * SVD_VAE_SCALING if scale else out


def svd_vae_decode(params, cfg: SVDVAEConfig, latents: jnp.ndarray
                   ) -> jnp.ndarray:
    """latents [T, 4, h, w] (scaled) -> frames [T, 3, H, W] in [-1,1].
    The whole chunk is one temporal group (num_frames = T)."""
    d = params["decoder"]
    t = latents.shape[0]
    x = (latents / SVD_VAE_SCALING).transpose(0, 2, 3, 1)
    x = _conv2d(d["conv_in"], x)
    emb = None  # no timestep conditioning in the temporal decoder
    x = _st_res(d["mid"]["res1"], x, emb, t, cfg.eps)
    x = _vae_attn(d["mid"]["attn_norm"], d["mid"]["attn"], x, cfg.eps)
    x = _st_res(d["mid"]["res2"], x, emb, t, cfg.eps)
    for i, blk in enumerate(d["up"]):
        for r in blk["resnets"]:
            x = _st_res(r, x, emb, t, cfg.eps)
        if "up" in blk:
            n, hh, ww, c = x.shape
            x = jax.image.resize(x, (n, hh * 2, ww * 2, c), "nearest")
            x = _conv2d(blk["up"], x)
    x = jax.nn.silu(P.group_norm(d["norm_out"], x, eps=cfg.eps))
    x = _conv2d(d["conv_out"], x)
    # final temporal conv over frames (TemporalDecoder.time_conv_out)
    x5 = x[None]  # [1, T, H, W, C]
    x5 = _conv_t(d["time_conv_out"], x5)[0]
    return x5.transpose(0, 3, 1, 2)
