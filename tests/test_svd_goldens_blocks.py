"""SVD UNet scalar oracles, round 2 (VERDICT r4 item 9): the blocks the
first golden suite left uncovered — GroupNorm channel grouping, the
spatial ResnetBlock2D, the temporal res block's conv alignment, the
spatial BasicTransformerBlock, and the down/upsample convs. All oracles
are independent numpy re-derivations with explicit loops (no diffusers /
torch in this env); the round-4 LayerNorm-eps bug showed this class of
defect is real and catchable this way.

Behavioral references: diffusers ResnetBlock2D / TemporalResnetBlock /
BasicTransformerBlock / Downsample2D / Upsample2D as consumed by
UNetSpatioTemporalConditionModel
(/root/reference/DepthCrafter/DepthCrafter/depthcrafter/unet.py:8-142
subclasses it; the architecture facts asserted here are from the
diffusers definitions, re-derived, not copied).
"""

import numpy as np
import jax
import jax.numpy as jnp

from worldforge_tpu.core import params as P
from worldforge_tpu.models.depthcrafter.unet import (
    _basic_block, _basic_block_init, _conv, _conv2d, _res2d, _res2d_init,
    _res_temporal, _res_temporal_init)
from tests.test_svd_goldens import (_np_attn, _np_dense, _np_geglu,
                                    _np_layer_norm)


def _np_group_norm(p, x, groups=32, eps=1e-6):
    """Explicit-loop GroupNorm oracle, channels-last [N,H,W,C]: torch
    semantics — C split into `groups` CONTIGUOUS channel blocks, stats
    over (H, W, group channels) per sample."""
    n, h, w, c = x.shape
    g = min(groups, c)
    while c % g:
        g -= 1
    cs = c // g
    out = np.empty_like(x, dtype=np.float32)
    for ni in range(n):
        for gi in range(g):
            sl = x[ni, :, :, gi * cs:(gi + 1) * cs].astype(np.float32)
            mean, var = sl.mean(), sl.var()
            out[ni, :, :, gi * cs:(gi + 1) * cs] = (
                (sl - mean) / np.sqrt(var + eps))
    return (out * np.asarray(p["scale"], np.float32)
            + np.asarray(p["bias"], np.float32))


def _np_conv2d(p, x, stride=1):
    """Explicit-loop conv oracle (cross-correlation, torch pad=1
    semantics): x [N,H,W,Cin], w [kh,kw,Cin,Cout]."""
    w = np.asarray(p["w"], np.float32)
    b = np.asarray(p["b"], np.float32)
    kh, kw, cin, cout = w.shape
    ph = pw = kh // 2 if stride == 1 else 1
    xp = np.pad(x, ((0, 0), (ph, ph), (pw, pw), (0, 0)))
    n, hp, wp, _ = xp.shape
    ho = (hp - kh) // stride + 1
    wo = (wp - kw) // stride + 1
    out = np.zeros((n, ho, wo, cout), np.float32)
    for ni in range(n):
        for i in range(ho):
            for j in range(wo):
                patch = xp[ni, i * stride:i * stride + kh,
                           j * stride:j * stride + kw]  # [kh,kw,cin]
                out[ni, i, j] = np.tensordot(patch, w, axes=3) + b
    return out


def _silu(x):
    return x / (1.0 + np.exp(-x))


def test_group_norm_contiguous_grouping_oracle():
    """C=64 with 32 groups -> 32 contiguous pairs. An interleaved or
    strided grouping would produce different per-group statistics; the
    input is built so adjacent channels carry very different scales."""
    rng = np.random.default_rng(0)
    c = 64
    x = rng.standard_normal((2, 3, 3, c)).astype(np.float32)
    x *= (1.0 + 10.0 * (np.arange(c) % 2))   # pair-asymmetric scales
    p = {"scale": jnp.asarray(rng.standard_normal(c), jnp.float32),
         "bias": jnp.asarray(rng.standard_normal(c), jnp.float32)}
    got = np.asarray(P.group_norm(p, jnp.asarray(x), eps=1e-6))
    want = _np_group_norm({k: np.asarray(v) for k, v in p.items()}, x)
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_conv2d_stride1_and_downsample_stride2_oracle():
    """stride 1: SAME padding kh//2. stride 2 (Downsample2D, torch
    conv pad=1): odd input 5 -> output 3 with the window anchored at
    (-1,-1) — an off-by-one in padding shifts every output."""
    rng = np.random.default_rng(1)
    p = _conv(jax.random.key(0), 3, 5, 3, jnp.float32)
    x = rng.standard_normal((2, 5, 7, 3)).astype(np.float32)
    got1 = np.asarray(_conv2d(p, jnp.asarray(x), stride=1))
    np.testing.assert_allclose(got1, _np_conv2d(p, x, 1), rtol=2e-4,
                               atol=2e-4)
    got2 = np.asarray(_conv2d(p, jnp.asarray(x), stride=2))
    want2 = _np_conv2d(p, x, 2)
    assert got2.shape == (2, 3, 4, 5)
    np.testing.assert_allclose(got2, want2, rtol=2e-4, atol=2e-4)


def test_res2d_scalar_oracle():
    """ResnetBlock2D end-to-end numpy oracle, cin != cout (shortcut conv
    exercised), with the timestep bias injected AFTER conv1 and BEFORE
    norm2 — the injection point a manifest cannot check."""
    rng = np.random.default_rng(2)
    cin, cout, temb_dim = 4, 6, 8
    p = _res2d_init(jax.random.key(1), cin, cout, temb_dim, jnp.float32)
    # randomize the norm affines + biases so nothing cancels vacuously
    p["norm1"] = {"scale": jnp.asarray(rng.standard_normal(cin), jnp.float32),
                  "bias": jnp.asarray(rng.standard_normal(cin), jnp.float32)}
    p["norm2"] = {"scale": jnp.asarray(rng.standard_normal(cout), jnp.float32),
                  "bias": jnp.asarray(rng.standard_normal(cout), jnp.float32)}
    x = rng.standard_normal((2, 4, 4, cin)).astype(np.float32)
    temb = rng.standard_normal((2, temb_dim)).astype(np.float32)

    h = _silu(_np_group_norm(p["norm1"], x, eps=1e-5))
    h = _np_conv2d(p["conv1"], h)
    t = _np_dense(p["time_emb_proj"], _silu(temb))
    h = h + t[:, None, None, :]
    h = _silu(_np_group_norm(p["norm2"], h, eps=1e-5))
    h = _np_conv2d(p["conv2"], h)
    want = h + _np_conv2d(p["conv_shortcut"], x)

    got = np.asarray(_res2d(p, jnp.asarray(x), jnp.asarray(temb), 1e-5))
    np.testing.assert_allclose(got, want, rtol=3e-4, atol=3e-4)


def test_res_temporal_symmetric_padding_support():
    """TemporalResnetBlock's (3,1,1) convs use SYMMETRIC temporal padding
    (diffusers padding=(1,0,0)), NOT the causal front-padding of the Wan
    VAE. Impulse at frame j must spread exactly to [j-2, j+2] through the
    two convs — a causal implementation would shift the support to one
    side."""
    c, f, j = 4, 9, 4
    p = _res_temporal_init(jax.random.key(2), c, 8, jnp.float32)
    x = np.zeros((1, f, 2, 2, c), np.float32)
    x[:, j] = np.random.default_rng(3).standard_normal((1, 2, 2, c))
    out = np.asarray(_res_temporal(p, jnp.asarray(x), None, 1e-5))
    delta = np.abs(out - x).reshape(f, -1).max(axis=1)
    assert delta[j - 2] > 1e-8 and delta[j + 2] > 1e-8, \
        "impulse must reach both +-2 frames (two symmetric convs)"
    outside = np.concatenate([delta[:j - 2], delta[j + 3:]])
    np.testing.assert_array_equal(outside, np.zeros_like(outside))


def test_res_temporal_scalar_oracle():
    """Full numpy oracle of the temporal res block: per-frame GroupNorm,
    explicit temporal conv loop, temb per (batch, frame)."""
    rng = np.random.default_rng(4)
    c, f, temb_dim = 4, 5, 8
    p = _res_temporal_init(jax.random.key(3), c, temb_dim, jnp.float32)
    for nk in ("norm1", "norm2"):
        p[nk] = {"scale": jnp.asarray(rng.standard_normal(c), jnp.float32),
                 "bias": jnp.asarray(rng.standard_normal(c), jnp.float32)}
    x = rng.standard_normal((2, f, 2, 3, c)).astype(np.float32)
    temb = rng.standard_normal((2, f, temb_dim)).astype(np.float32)

    def np_conv_t(cp, v):
        w = np.asarray(cp["w"], np.float32)     # [3,1,1,c,c]
        b = np.asarray(cp["b"], np.float32)
        vp = np.pad(v, ((0, 0), (1, 1), (0, 0), (0, 0), (0, 0)))
        out = np.zeros_like(v)
        for t in range(v.shape[1]):
            for kt in range(3):
                out[:, t] += np.tensordot(vp[:, t + kt], w[kt, 0, 0],
                                          axes=([-1], [0]))
        return out + b

    def np_gn_frames(nk, v):
        bb, ff = v.shape[:2]
        flat = v.reshape(bb * ff, *v.shape[2:])
        return _np_group_norm(p[nk], flat, eps=1e-5).reshape(v.shape)

    h = _silu(np_gn_frames("norm1", x))
    h = np_conv_t(p["conv1"], h)
    t = _np_dense(p["time_emb_proj"], _silu(temb))
    h = h + t[:, :, None, None, :]
    h = _silu(np_gn_frames("norm2", h))
    want = np_conv_t(p["conv2"], h) + x

    got = np.asarray(_res_temporal(p, jnp.asarray(x), jnp.asarray(temb),
                                   1e-5))
    np.testing.assert_allclose(got, want, rtol=3e-4, atol=3e-4)


def test_basic_block_scalar_oracle():
    """Spatial BasicTransformerBlock numpy oracle (the temporal twin is
    covered in test_svd_goldens): self-attn -> cross-attn -> GEGLU ff,
    pre-LayerNorm eps 1e-5 everywhere."""
    rng = np.random.default_rng(5)
    dim, ctx_dim, heads, n, s = 4, 6, 2, 3, 5
    p = _basic_block_init(jax.random.key(4), dim, ctx_dim, jnp.float32)
    x = rng.standard_normal((n, s, dim)).astype(np.float32)
    ctx = rng.standard_normal((n, 2, ctx_dim)).astype(np.float32)

    h = _np_layer_norm(p["norm1"], x)
    y = x + _np_attn(p["attn1"], h, h, heads)
    y = y + _np_attn(p["attn2"], _np_layer_norm(p["norm2"], y), ctx, heads)
    want = y + _np_geglu(p["ff"], _np_layer_norm(p["norm3"], y))

    got = np.asarray(_basic_block(p, jnp.asarray(x), jnp.asarray(ctx),
                                  heads))
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)


def test_upsample_nearest_semantics():
    """Upsample2D: nearest x2 (pixel replication, NOT bilinear) then a
    3x3 conv — F.interpolate(scale_factor=2, mode='nearest') semantics."""
    rng = np.random.default_rng(6)
    x = rng.standard_normal((1, 3, 4, 2)).astype(np.float32)
    up = np.asarray(jax.image.resize(jnp.asarray(x), (1, 6, 8, 2),
                                     "nearest"))
    want = np.repeat(np.repeat(x, 2, axis=1), 2, axis=2)
    np.testing.assert_array_equal(up, want)
