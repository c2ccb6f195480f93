"""Hand-derived numerical goldens for the SVD UNet quirks (no diffusers in
this env, so no torch oracle — these pin the semantics that a layout
manifest cannot: the embedding formula, AlphaBlender blending, and the
DepthCrafter per-frame CLIP conditioning delta).

Behavioral references:
- diffusers Timesteps/get_timestep_embedding (flip_sin_to_cos=True,
  downscale_freq_shift=0) — the formula is re-derived independently in
  numpy here, not copied from our implementation.
- AlphaBlender 'learned_with_images' with all-zero image_only_indicator.
- /root/reference/DepthCrafter/DepthCrafter/depthcrafter/unet.py:61-62:
  encoder_hidden_states [B,F,1024] -> [B*F,1,1024] (PER-FRAME CLIP
  conditioning — the custom forward's whole point vs stock SVD).
"""

import jax
import jax.numpy as jnp
import numpy as np

from worldforge_tpu.models.depthcrafter.unet import (
    SVDUNetConfig, _alpha_blend, init_svd_unet,
    sinusoidal_timestep_embedding, svd_unet_forward)


def test_sinusoidal_embedding_matches_diffusers_formula():
    """Independent numpy re-derivation of diffusers get_timestep_embedding:
    freqs_i = exp(-ln(10000) * i / half), emb = [cos(t*f) | sin(t*f)]."""
    dim = 256
    t = np.array([0.0, 1.0, 500.0, 999.0], np.float32)
    half = dim // 2
    freqs = np.exp(-np.log(10000.0)
                   * np.arange(half, dtype=np.float32) / half)
    want = np.concatenate([np.cos(t[:, None] * freqs[None]),
                           np.sin(t[:, None] * freqs[None])], axis=-1)
    got = np.asarray(sinusoidal_timestep_embedding(jnp.asarray(t), dim))
    # jax-vs-numpy fp32 trig argument reduction differs by ~3e-5 at large
    # t*freq; a formula error would be O(1)
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-4)
    # hand-checkable anchors: t=0 -> cos half all ones, sin half all zeros;
    # freqs[0]=1 -> element [i, half] == sin(t_i)
    np.testing.assert_array_equal(got[0, :half], np.ones(half, np.float32))
    np.testing.assert_array_equal(got[0, half:], np.zeros(half, np.float32))
    np.testing.assert_allclose(got[:, half], np.sin(t), rtol=1e-6)


def test_alpha_blender_semantics():
    """alpha = sigmoid(mix); switch (SpatioTemporalResBlock) inverts it;
    SVD checkpoints init mix_factor=0.5 -> alpha = sigmoid(0.5)."""
    xs = jnp.full((2, 3), 1.0, jnp.float32)
    xt = jnp.full((2, 3), -1.0, jnp.float32)
    m = {"mix_factor": jnp.asarray([0.5], jnp.float32)}
    a = 1.0 / (1.0 + np.exp(-0.5))  # sigmoid(0.5), hand value 0.6224593
    # transformer form (switch=False): a*spatial + (1-a)*temporal
    got = np.asarray(_alpha_blend(m, xs, xt, switch=False))
    np.testing.assert_allclose(got, np.full((2, 3), a - (1 - a)), rtol=1e-6)
    # res-block form (switch=True): (1-a)*spatial + a*temporal
    got = np.asarray(_alpha_blend(m, xs, xt, switch=True))
    np.testing.assert_allclose(got, np.full((2, 3), (1 - a) - a), rtol=1e-6)
    # saturation: mix=+30 -> pure spatial (switch=False)
    m30 = {"mix_factor": jnp.asarray([30.0], jnp.float32)}
    np.testing.assert_allclose(
        np.asarray(_alpha_blend(m30, xs, xt, switch=False)), np.asarray(xs))


def _spatial_only(params):
    """Saturate every AlphaBlender toward its spatial branch: res blocks
    (switch=True) need sigmoid(m)=0 -> m=-30; transformers (switch=False)
    need sigmoid(m)=1 -> m=+30. Distinguished structurally (res dicts carry
    'spatial_res_block', transformer dicts carry 'proj_in')."""
    def walk(d):
        if not isinstance(d, dict):
            if isinstance(d, list):
                for v in d:
                    walk(v)
            return
        if "time_mixer" in d:
            val = -30.0 if "spatial_res_block" in d else 30.0
            d["time_mixer"]["mix_factor"] = jnp.asarray([val], jnp.float32)
        for v in d.values():
            walk(v)
    walk(params)
    return params


def test_per_frame_clip_isolation():
    """THE DepthCrafter delta (unet.py:61-62): each frame cross-attends to
    its OWN CLIP embedding. With every AlphaBlender saturated spatial (the
    only cross-frame paths removed), perturbing frame j's embedding must
    change frame j's output and NO other frame's."""
    cfg = SVDUNetConfig.tiny()
    key = jax.random.key(0)
    params = _spatial_only(init_svd_unet(key, cfg))
    b, f, hh, ww = 1, 4, 16, 16
    sample = jax.random.normal(jax.random.key(1),
                               (b, f, cfg.in_channels, hh, ww), jnp.float32)
    ids = jnp.asarray([[6.0, 127.0, 0.02]], jnp.float32)
    ctx = jax.random.normal(jax.random.key(2),
                            (b, f, 1, cfg.cross_attention_dim), jnp.float32)
    base = np.asarray(svd_unet_forward(params, cfg, sample, 500.0, ctx, ids))

    j = 2
    ctx2 = ctx.at[:, j].add(1.0)
    out = np.asarray(svd_unet_forward(params, cfg, sample, 500.0, ctx2, ids))
    diff = np.abs(out - base).reshape(f, -1).max(axis=1)
    assert diff[j] > 1e-4, "frame j must see its own embedding"
    others = np.delete(diff, j)
    np.testing.assert_array_equal(others, np.zeros_like(others))


def test_added_time_ids_batch_isolation():
    """added_time_ids are flattened per batch element then projected
    ([B,3] -> sinusoid(3*256) -> [B,768] -> MLP): batch 0's ids must not
    leak into batch 1's output (catches flatten/reshape-order bugs).

    Needs channels > 32 groups: at the tiny config's widths GroupNorm has
    one channel per group, and norm2 then erases the per-channel temb bias
    EXACTLY (true of torch GroupNorm too) — the conditioning only survives
    through cross-channel group statistics, as at real SVD widths."""
    cfg = SVDUNetConfig(block_out_channels=(64, 64, 64, 64),
                        num_attention_heads=(2, 2, 2, 2),
                        layers_per_block=1, cross_attention_dim=16,
                        addition_time_embed_dim=8, projection_dim=24)
    params = init_svd_unet(jax.random.key(0), cfg)
    b, f, hh, ww = 2, 2, 8, 8
    sample = jax.random.normal(jax.random.key(1),
                               (b, f, cfg.in_channels, hh, ww), jnp.float32)
    ctx = jax.random.normal(jax.random.key(2),
                            (b, f, 1, cfg.cross_attention_dim), jnp.float32)
    ids = jnp.asarray([[6.0, 127.0, 0.02], [9.0, 63.0, 0.1]], jnp.float32)
    base = np.asarray(svd_unet_forward(params, cfg, sample, 500.0, ctx, ids))
    ids2 = ids.at[0].set(jnp.asarray([30.0, 1.0, 0.5]))
    out = np.asarray(svd_unet_forward(params, cfg, sample, 500.0, ctx, ids2))
    assert np.abs(out[0] - base[0]).max() > 1e-5
    np.testing.assert_array_equal(out[1], base[1])


# ---------------------------------------------------- temporal block oracle


def _np_dense(p, x):
    y = x @ np.asarray(p["w"], np.float32)
    if "b" in p:
        y = y + np.asarray(p["b"], np.float32)
    return y


def _np_layer_norm(p, x, eps=1e-5):
    # torch nn.LayerNorm default eps (diffusers transformer blocks use it
    # unchanged) — NOT this repo's 1e-6 house default
    mean = x.mean(axis=-1, keepdims=True)
    var = ((x - mean) ** 2).mean(axis=-1, keepdims=True)
    y = (x - mean) / np.sqrt(var + eps)
    return y * np.asarray(p["scale"], np.float32) + np.asarray(
        p["bias"], np.float32)


def _np_geglu(p, x):
    h = _np_dense(p["proj"], x)
    a, g = np.split(h, 2, axis=-1)
    from math import erf, sqrt
    gelu = np.vectorize(lambda v: 0.5 * v * (1.0 + erf(v / sqrt(2.0))))
    return _np_dense(p["out"], a * gelu(g).astype(np.float32))


def _np_attn(p, x, ctx, heads):
    """Explicit-loop scalar attention: per batch row, per head, per query —
    catches a transposed projection or a softmax over the wrong axis that a
    vectorized re-statement of the same einsum would replicate."""
    b, s, d = x.shape
    dh = d // heads
    q = x @ np.asarray(p["to_q"]["w"], np.float32)
    k = ctx @ np.asarray(p["to_k"]["w"], np.float32)
    v = ctx @ np.asarray(p["to_v"]["w"], np.float32)
    out = np.zeros((b, s, d), np.float32)
    for bi in range(b):
        for h in range(heads):
            qs = q[bi, :, h * dh:(h + 1) * dh]
            ks = k[bi, :, h * dh:(h + 1) * dh]
            vs = v[bi, :, h * dh:(h + 1) * dh]
            for i in range(s):
                logits = np.array([qs[i] @ ks[j] / np.sqrt(dh)
                                   for j in range(ks.shape[0])])
                w = np.exp(logits - logits.max())
                w /= w.sum()
                out[bi, i, h * dh:(h + 1) * dh] = sum(
                    w[j] * vs[j] for j in range(ks.shape[0]))
    return _np_dense(p["to_out"], out)


def test_temporal_block_scalar_oracle():
    """Independent numpy re-derivation (explicit loops) of the temporal
    transformer block — the block the layout manifest cannot validate
    numerically (round-3 VERDICT item 6; behavioral reference: diffusers
    TemporalBasicTransformerBlock, used by DepthCrafter's UNet via
    /root/reference/DepthCrafter/DepthCrafter/depthcrafter/unet.py:8-142):
    ff_in residual -> self-attn over FRAMES -> cross-attn to the first
    frame's CLIP context -> ff, all with pre-LayerNorms."""
    from worldforge_tpu.models.depthcrafter.unet import (_temporal_block,
                                                         _temporal_block_init)

    dim, ctx_dim, heads, n, f = 4, 6, 2, 3, 5
    p = _temporal_block_init(jax.random.key(3), dim, ctx_dim, jnp.float32)
    x = np.asarray(jax.random.normal(jax.random.key(4), (n, f, dim)),
                   np.float32)
    tctx = np.asarray(jax.random.normal(jax.random.key(5), (n, 2, ctx_dim)),
                      np.float32)

    # numpy oracle, step by step
    h = x + _np_geglu(p["ff_in"], _np_layer_norm(p["norm_in"], x))
    hn = _np_layer_norm(p["norm1"], h)
    h = h + _np_attn(p["attn1"], hn, hn, heads)
    h = h + _np_attn(p["attn2"], _np_layer_norm(p["norm2"], h), tctx, heads)
    want = h + _np_geglu(p["ff"], _np_layer_norm(p["norm3"], h))

    got = np.asarray(_temporal_block(p, jnp.asarray(x), jnp.asarray(tctx),
                                     heads))
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)


def test_st_transformer_regrouping_pins_frame_axis(monkeypatch):
    """Regrouping oracle for the [B,F,HW,C] <-> [B*HW,F,C] transpose pair
    in _st_transformer (the manifest-blind spot: a wrong transpose order
    would scramble (frame, pixel) pairs while keeping every shape legal).

    Technique: stub the spatial block to identity and the temporal block
    to (x + x frame-reversed), make proj_in/proj_out identity and fpos
    zero, saturate the blender temporal. Then
        out_B - out_A == (out_A - residual) frame-reversed
    holds IFF axis 1 of the regrouped tensor is the FRAME axis at fixed
    pixel in both directions — any transpose/reshape-order bug breaks the
    (f, p) correspondence."""
    import worldforge_tpu.models.depthcrafter.unet as unet_mod
    from worldforge_tpu.models.depthcrafter.unet import (_st_transformer,
                                                         _st_transformer_init)

    c, heads, f, hh, ww = 8, 2, 3, 4, 4
    p = _st_transformer_init(jax.random.key(7), c, heads, c, 1, jnp.float32)
    p["time_mixer"]["mix_factor"] = jnp.asarray([-30.0], jnp.float32)
    eye = jnp.eye(c, dtype=jnp.float32)
    for name in ("proj_in", "proj_out"):
        p[name]["w"] = eye
        p[name]["b"] = jnp.zeros((c,), jnp.float32)
    # fpos = fc2(silu(fc1(sinusoid))): zero both -> fpos = 0
    p["time_pos_embed"]["fc1"]["w"] = jnp.zeros_like(
        p["time_pos_embed"]["fc1"]["w"])
    p["time_pos_embed"]["fc2"]["w"] = jnp.zeros_like(
        p["time_pos_embed"]["fc2"]["w"])
    p["time_pos_embed"]["fc2"]["b"] = jnp.zeros_like(
        p["time_pos_embed"]["fc2"]["b"])

    monkeypatch.setattr(unet_mod, "_basic_block",
                        lambda blk, x, ctx, heads: x)
    ctx = jax.random.normal(jax.random.key(8), (f, 2, c), jnp.float32)
    x = jax.random.normal(jax.random.key(9), (f, hh, ww, c), jnp.float32)

    monkeypatch.setattr(unet_mod, "_temporal_block",
                        lambda blk, ht, tctx, heads: ht)
    out_a = np.asarray(_st_transformer(p, x, ctx, f, heads, 1e-5))

    monkeypatch.setattr(unet_mod, "_temporal_block",
                        lambda blk, ht, tctx, heads: ht + ht[:, ::-1])
    out_b = np.asarray(_st_transformer(p, x, ctx, f, heads, 1e-5))

    h = out_a - np.asarray(x)           # the pre-residual stream
    delta = out_b - out_a               # the frame-reversed copy
    np.testing.assert_allclose(delta, h[::-1], rtol=1e-5, atol=1e-5)
    # sanity: the stream is frame-asymmetric, so a scrambled regroup
    # could not pass by accident
    assert np.abs(h - h[::-1]).max() > 1e-3
