"""Avatar DiT + wav2vec2 audio stack tests (HF oracle for wav2vec2)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from worldforge_tpu.models.encoders.wav2vec2 import (Wav2Vec2Config,
                                                     get_audio_windows,
                                                     init_wav2vec2,
                                                     linear_interpolate,
                                                     wav2vec2_encode,
                                                     wav2vec2_features,
                                                     wav2vec2_forward)
from worldforge_tpu.models.longcat.avatar import (AvatarConfig,
                                                  audio_proj_forward,
                                                  avatar_dit_forward,
                                                  init_audio_proj,
                                                  init_avatar_dit,
                                                  regroup_audio_windows)


def test_linear_interpolate_matches_torch_semantics():
    x = jnp.arange(8, dtype=jnp.float32).reshape(1, 8, 1)
    y = np.asarray(linear_interpolate(x, 4))[0, :, 0]
    # align_corners: endpoints preserved
    assert y[0] == pytest.approx(0.0) and y[-1] == pytest.approx(7.0)
    np.testing.assert_allclose(y, np.linspace(0, 7, 4), rtol=1e-6)


def test_audio_windows_edges(rng):
    f = jnp.asarray(rng.standard_normal((1, 6, 2, 3)), jnp.float32)
    w = get_audio_windows(f, window=5)
    assert w.shape == (1, 6, 5, 2, 3)
    # frame 0's window clamps to frame 0 on the left
    np.testing.assert_array_equal(np.asarray(w[0, 0, 0]), np.asarray(f[0, 0]))
    np.testing.assert_array_equal(np.asarray(w[0, 0, 2]), np.asarray(f[0, 0]))
    np.testing.assert_array_equal(np.asarray(w[0, 0, 3]), np.asarray(f[0, 1]))


def test_regroup_audio_windows_shapes(rng):
    cfg = AvatarConfig.tiny()
    t_video = 1 + 3 * cfg.vae_scale
    a = jnp.asarray(rng.standard_normal(
        (1, t_video, cfg.audio_window, cfg.audio_blocks,
         cfg.audio_channels)), jnp.float32)
    first, latter = regroup_audio_windows(cfg, a)
    assert first.shape == (1, 1, 5, cfg.audio_blocks, cfg.audio_channels)
    assert latter.shape == (1, 3, cfg.window_vf, cfg.audio_blocks,
                            cfg.audio_channels)


def test_audio_proj_shapes(rng):
    cfg = AvatarConfig.tiny()
    p = init_audio_proj(jax.random.key(0), cfg)
    first = jnp.asarray(rng.standard_normal(
        (2, 1, 5, cfg.audio_blocks, cfg.audio_channels)), jnp.float32)
    latter = jnp.asarray(rng.standard_normal(
        (2, 3, cfg.window_vf, cfg.audio_blocks, cfg.audio_channels)),
        jnp.float32)
    tok = audio_proj_forward(p, cfg, first, latter)
    assert tok.shape == (2, 4, cfg.context_tokens, cfg.output_dim)


def test_avatar_dit_forward_and_cond_audio_isolation(rng):
    cfg = AvatarConfig.tiny()
    params = init_avatar_dit(jax.random.key(0), cfg, dtype=jnp.float32)
    t_lat = 1 + 2 * 1   # nt = 3 latent frames
    t_video = 1 + (t_lat - 1) * cfg.vae_scale
    x = jnp.asarray(rng.standard_normal((1, 16, t_lat, 8, 8)), jnp.float32)
    ts = jnp.asarray([500.0], jnp.float32)
    ctx = jnp.asarray(rng.standard_normal(
        (1, 6, cfg.base.caption_channels)), jnp.float32)
    audio = jnp.asarray(rng.standard_normal(
        (1, t_video, cfg.audio_window, cfg.audio_blocks,
         cfg.audio_channels)), jnp.float32)

    from worldforge_tpu.core.dtypes import FP32_POLICY
    out = avatar_dit_forward(params, cfg, x, ts, ctx, audio,
                             num_cond_latents=1, policy=FP32_POLICY)
    assert out.shape == (1, 16, t_lat, 8, 8)
    assert np.isfinite(np.asarray(out)).all()

    # audio of the conditioning frame (video frame 0) is sliced away for
    # cond latents — perturbing it must not change the output
    audio2 = audio.at[:, 0].add(10.0)
    out2 = avatar_dit_forward(params, cfg, x, ts, ctx, audio2,
                              num_cond_latents=1, policy=FP32_POLICY)
    np.testing.assert_allclose(np.asarray(out), np.asarray(out2), atol=1e-5)

    # ...but noise-frame audio does steer the output
    audio3 = audio.at[:, 1:].add(10.0)
    out3 = avatar_dit_forward(params, cfg, x, ts, ctx, audio3,
                              num_cond_latents=1, policy=FP32_POLICY)
    assert np.abs(np.asarray(out3) - np.asarray(out)).max() > 1e-4


def test_avatar_ref_attention_partitioning(rng):
    """avatar/attention.py:118-213 semantics: ref frame attends only to
    itself; noise frames in the mask_frame_range window ignore ref keys."""
    from worldforge_tpu.models.longcat.avatar import (avatar_self_attention,
                                                      init_avatar_layer)
    from worldforge_tpu.core.dtypes import FP32_POLICY
    from worldforge_tpu.ops.rope import rope_cos_sin

    cfg = AvatarConfig.tiny()
    p = init_avatar_layer(jax.random.key(0), cfg, dtype=jnp.float32)
    T, nh, nw = 7, 2, 2
    sf = nh * nw
    cos, sin = rope_cos_sin(T, nh, nw, cfg.base.head_dim)
    x = jnp.asarray(rng.standard_normal((1, T * sf, cfg.base.hidden_size)),
                    jnp.float32)
    # layout: 1 ref + 2 cond + 4 noise; anchor index 4, range 1 ->
    # noise-relative window [1, 4) = latent frames [4, 7) exclude ref keys;
    # latent frame 3 is the unmasked noise frame
    kw = dict(T=T, num_cond_latents=3, num_ref_latents=1, ref_img_index=4,
              mask_frame_range=1, policy=FP32_POLICY, attn_impl="sdpa")
    o, _ = avatar_self_attention(p, cfg, x, cos, sin, **kw)

    # perturb noise tokens: ref + cond outputs unchanged (they never see
    # noise keys)
    x2 = x.at[:, 3 * sf:].add(5.0)
    o2, _ = avatar_self_attention(p, cfg, x2, cos, sin, **kw)
    np.testing.assert_allclose(np.asarray(o[:, :3 * sf]),
                               np.asarray(o2[:, :3 * sf]), atol=1e-5)

    # perturb the REF tokens: cond output unchanged (cond excludes ref);
    # masked noise frames unchanged; at least one unmasked noise frame
    # changes (it attends to ref)
    x3 = x.at[:, :sf].add(5.0)
    o3, _ = avatar_self_attention(p, cfg, x3, cos, sin, **kw)
    np.testing.assert_allclose(np.asarray(o[:, sf:3 * sf]),
                               np.asarray(o3[:, sf:3 * sf]), atol=1e-5)
    np.testing.assert_allclose(np.asarray(o[:, 4 * sf:]),   # masked frames
                               np.asarray(o3[:, 4 * sf:]), atol=1e-5)
    assert np.abs(np.asarray(o3[:, 3 * sf:4 * sf]) -        # unmasked noise
                  np.asarray(o[:, 3 * sf:4 * sf])).max() > 1e-4


def test_rope_1d_and_attn_map(rng):
    from worldforge_tpu.models.longcat.avatar import (attn_map_with_target,
                                                      rope_1d_rotate)

    x = jnp.asarray(rng.standard_normal((1, 6, 2, 8)), jnp.float32)
    # position 0 -> identity; any position preserves pairwise norms
    np.testing.assert_allclose(
        np.asarray(rope_1d_rotate(x, jnp.zeros((1, 6)))), np.asarray(x),
        atol=1e-6)
    r = np.asarray(rope_1d_rotate(x, jnp.full((1, 6), 3.7)))
    np.testing.assert_allclose(
        np.linalg.norm(r.reshape(1, 6, 2, 4, 2), axis=-1),
        np.linalg.norm(np.asarray(x).reshape(1, 6, 2, 4, 2), axis=-1),
        atol=1e-5)

    # queries aligned with masked ref keys get higher per-speaker mass
    k = jnp.asarray(rng.standard_normal((1, 8, 2, 8)), jnp.float32)
    q = jnp.concatenate([k[:, :2] * 3.0, k[:, 4:6] * 3.0], axis=1)
    masks = jnp.zeros((2, 8)).at[0, :2].set(1).at[1, 4:6].set(1)
    m = np.asarray(attn_map_with_target(q, k, masks))
    assert m.shape == (2, 4)
    assert m[0, :2].mean() > m[1, :2].mean()   # first queries -> speaker 0
    assert m[1, 2:].mean() > m[0, 2:].mean()   # last queries -> speaker 1


def test_avatar_multitalk_forward(rng):
    cfg = AvatarConfig.tiny()
    params = init_avatar_dit(jax.random.key(0), cfg, dtype=jnp.float32)
    t_lat, h, w = 3, 8, 8
    t_video = 1 + (t_lat - 1) * cfg.vae_scale
    x = jnp.asarray(rng.standard_normal((1, 16, t_lat, h, w)), jnp.float32)
    ts = jnp.asarray([500.0], jnp.float32)
    ctx = jnp.asarray(rng.standard_normal(
        (1, 6, cfg.base.caption_channels)), jnp.float32)
    # two speakers' audio in the batch axis
    audio = jnp.asarray(rng.standard_normal(
        (2, t_video, cfg.audio_window, cfg.audio_blocks,
         cfg.audio_channels)), jnp.float32)
    masks = jnp.zeros((2, h, w)).at[0, :, :4].set(1).at[1, :, 4:].set(1)

    from worldforge_tpu.core.dtypes import FP32_POLICY
    from worldforge_tpu.models.longcat.avatar import avatar_dit_forward
    out = avatar_dit_forward(params, cfg, x, ts, ctx, audio,
                             num_cond_latents=1, ref_target_masks=masks,
                             policy=FP32_POLICY)
    assert out.shape == (1, 16, t_lat, h, w)
    assert np.isfinite(np.asarray(out)).all()

    # swapping the speaker masks changes the output (speaker routing live)
    out2 = avatar_dit_forward(params, cfg, x, ts, ctx, audio,
                              num_cond_latents=1,
                              ref_target_masks=masks[::-1],
                              policy=FP32_POLICY)
    assert np.abs(np.asarray(out2) - np.asarray(out)).max() > 1e-5


def test_avatar_kv_cache_matches_joint(rng):
    """Avatar cached-cond denoising == joint forward's noise outputs
    (same contract as the base LongCat vc test, with audio active)."""
    from worldforge_tpu.core.dtypes import FP32_POLICY
    from worldforge_tpu.models.longcat.avatar import (
        avatar_dit_cache_cond, avatar_dit_forward_with_cache)
    from worldforge_tpu.models.longcat.dit import LongCatDiTConfig

    base = LongCatDiTConfig.tiny()
    base = type(base)(**{**base.__dict__, "in_channels": 4,
                         "out_channels": 4})
    cfg = AvatarConfig(base=base, audio_blocks=2, audio_channels=8,
                       intermediate_dim=16, output_dim=8, context_tokens=4)
    params = init_avatar_dit(jax.random.key(0), cfg, dtype=jnp.float32)

    b, tc, tn, hh, ww = 1, 2, 3, 8, 8
    t_video = 1 + (tc + tn - 1) * cfg.vae_scale
    cond = jnp.asarray(rng.standard_normal((b, 4, tc, hh, ww)), jnp.float32)
    noise = jnp.asarray(rng.standard_normal((b, 4, tn, hh, ww)),
                        jnp.float32)
    ctx = jnp.asarray(rng.standard_normal((b, 6, base.caption_channels)),
                      jnp.float32)
    audio = jnp.asarray(rng.standard_normal(
        (b, t_video, cfg.audio_window, cfg.audio_blocks,
         cfg.audio_channels)), jnp.float32)
    t_val = 700.0

    full = jnp.concatenate([cond, noise], axis=2)
    tb = jnp.full((b, tc + tn), t_val, jnp.float32).at[:, :tc].set(0.0)
    out_joint = avatar_dit_forward(params, cfg, full, tb, ctx, audio,
                                   num_cond_latents=tc, policy=FP32_POLICY)

    kv = avatar_dit_cache_cond(params, cfg, cond, policy=FP32_POLICY)
    tb_n = jnp.full((b, tn), t_val, jnp.float32)
    out_cache = avatar_dit_forward_with_cache(
        params, cfg, noise, tb_n, ctx, audio, kv, (tc,),
        policy=FP32_POLICY)
    np.testing.assert_allclose(np.asarray(out_cache),
                               np.asarray(out_joint[:, :, tc:]),
                               atol=5e-4, rtol=5e-4)


# ------------------------------------------------------------- HF oracle

torch = pytest.importorskip("torch")


def test_wav2vec2_matches_hf(rng):
    transformers = pytest.importorskip("transformers")
    from worldforge_tpu.io.convert_wav2vec2 import convert_wav2vec2

    cfg = Wav2Vec2Config.tiny()
    hf_cfg = transformers.Wav2Vec2Config(
        conv_dim=list(cfg.conv_dim), conv_kernel=list(cfg.conv_kernel),
        conv_stride=list(cfg.conv_stride), hidden_size=cfg.hidden_size,
        num_hidden_layers=cfg.num_layers,
        num_attention_heads=cfg.num_heads,
        intermediate_size=cfg.intermediate_size,
        num_conv_pos_embeddings=cfg.num_conv_pos_embeddings,
        num_conv_pos_embedding_groups=cfg.num_conv_pos_embedding_groups,
        feat_extract_norm="group", do_stable_layer_norm=False,
        conv_bias=False, hidden_act="gelu", feat_proj_dropout=0.0,
        hidden_dropout=0.0, attention_dropout=0.0, activation_dropout=0.0,
        layerdrop=0.0, mask_time_prob=0.0,
        attn_implementation="eager")
    ref = transformers.Wav2Vec2Model(hf_cfg).eval()

    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    params = convert_wav2vec2(sd, cfg)

    audio = rng.standard_normal((1, 1600)).astype(np.float32)
    with torch.no_grad():
        out = ref(torch.tensor(audio), output_hidden_states=True)
    ref_stack = torch.stack(out.hidden_states[1:], dim=2).numpy()

    feats = wav2vec2_features(params, cfg, jnp.asarray(audio))
    got = np.asarray(wav2vec2_encode(params, cfg, feats))
    assert got.shape == ref_stack.shape
    rel = np.abs(got - ref_stack).max() / (np.abs(ref_stack).max() + 1e-8)
    assert rel < 1e-4, rel


def test_wav2vec2_forward_resamples(rng):
    cfg = Wav2Vec2Config.tiny()
    params = init_wav2vec2(jax.random.key(0), cfg)
    audio = jnp.asarray(rng.standard_normal((1, 1600)), jnp.float32)
    out = wav2vec2_forward(params, cfg, audio, seq_len=13)
    assert out.shape == (1, 13, cfg.num_layers, cfg.hidden_size)
    assert np.isfinite(np.asarray(out)).all()
