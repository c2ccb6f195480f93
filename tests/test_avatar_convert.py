"""Avatar DiT conversion parity vs the reference torch model
(longcat_video_dit_avatar.py; SDPA via the xformers stub)."""

import jax.numpy as jnp
import numpy as np
import pytest

from worldforge_tpu.core.dtypes import FP32_POLICY
from worldforge_tpu.io.convert_longcat import convert_avatar_dit
from worldforge_tpu.models.longcat.avatar import (AvatarConfig,
                                                  avatar_dit_forward)
from worldforge_tpu.models.longcat.dit import LongCatDiTConfig

torch = pytest.importorskip("torch")


@pytest.fixture(scope="module")
def avatar_ref():
    from tests.reference_oracle import import_avatar_dit
    mod = import_avatar_dit()
    torch.manual_seed(0)
    # AudioProjModel hardcodes blocks=12, channels=768
    # (avatar/blocks.py:8-22); everything else tiny.
    ref = mod.LongCatVideoAvatarTransformer3DModel(
        in_channels=4, out_channels=4, hidden_size=64, depth=2, num_heads=2,
        caption_channels=48, mlp_ratio=4, adaln_tembed_dim=32,
        frequency_embedding_size=16, cp_split_hw=[1, 1],
        enable_xformers=True, audio_window=5, intermediate_dim=16,
        output_dim=16, context_tokens=4, vae_scale=4).eval()
    base = LongCatDiTConfig(in_channels=4, out_channels=4, hidden_size=64,
                            depth=2, num_heads=2, caption_channels=48,
                            mlp_ratio=4, adaln_tembed_dim=32,
                            frequency_embedding_size=16)
    cfg = AvatarConfig(base=base, audio_window=5, audio_blocks=12,
                       audio_channels=768, intermediate_dim=16,
                       output_dim=16, context_tokens=4, vae_scale=4)
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    params = convert_avatar_dit(sd, cfg, dtype=jnp.float32)
    return ref, cfg, params


@pytest.mark.parametrize("num_cond", [0, 1])
def test_avatar_dit_conversion_parity(avatar_ref, rng, num_cond):
    ref, cfg, params = avatar_ref
    t_lat = 3
    t_video = 1 + cfg.vae_scale * (t_lat - 1)
    x = rng.standard_normal((1, 4, t_lat, 8, 8)).astype(np.float32)
    ctx = rng.standard_normal((1, 6, 48)).astype(np.float32)
    mask = np.ones((1, 1, 1, 6), np.int64)
    t = np.full((1, t_lat), 700.0, np.float32)
    if num_cond:
        t[:, :num_cond] = 0.0
    audio = rng.standard_normal(
        (1, t_video, cfg.audio_window, cfg.audio_blocks,
         cfg.audio_channels)).astype(np.float32) * 0.1

    with torch.no_grad():
        out_t = ref(torch.tensor(x), torch.tensor(t),
                    torch.tensor(ctx)[:, None],
                    encoder_attention_mask=torch.tensor(mask),
                    num_cond_latents=num_cond,
                    audio_embs=torch.tensor(audio)).numpy()

    out_j = np.asarray(avatar_dit_forward(
        params, cfg, jnp.asarray(x), jnp.asarray(t), jnp.asarray(ctx),
        jnp.asarray(audio),
        encoder_attention_mask=jnp.ones((1, 6), jnp.int32),
        num_cond_latents=num_cond, policy=FP32_POLICY))

    assert out_t.shape == out_j.shape
    rel = np.abs(out_t - out_j).max() / (np.abs(out_t).max() + 1e-8)
    assert rel < 1e-4, rel


def test_avatar_ref_mode_parity(avatar_ref, rng):
    """Ref-image mode (num_ref_latents=1, ref_img_index set): the ref
    frame must be RoPE-rotated at its ORIGINAL temporal index and the
    others at 0..N-2 (avatar/rope_3d.py:76-77) — regression for the
    temporal-grid fix; full torch-oracle parity."""
    ref, cfg, params = avatar_ref
    t_lat, num_cond, num_ref, ref_idx, mfr = 5, 2, 1, 7, 2
    t_video = 1 + cfg.vae_scale * (t_lat - num_ref - 1)
    x = rng.standard_normal((1, 4, t_lat, 8, 8)).astype(np.float32)
    ctx = rng.standard_normal((1, 6, 48)).astype(np.float32)
    mask = np.ones((1, 1, 1, 6), np.int64)
    t = np.full((1, t_lat), 650.0, np.float32)
    t[:, :num_cond] = 0.0
    audio = rng.standard_normal(
        (1, t_video, cfg.audio_window, cfg.audio_blocks,
         cfg.audio_channels)).astype(np.float32) * 0.1

    with torch.no_grad():
        out_t = ref(torch.tensor(x), torch.tensor(t),
                    torch.tensor(ctx)[:, None],
                    encoder_attention_mask=torch.tensor(mask),
                    num_cond_latents=num_cond,
                    audio_embs=torch.tensor(audio),
                    num_ref_latents=num_ref, ref_img_index=ref_idx,
                    mask_frame_range=mfr).numpy()

    out_j = np.asarray(avatar_dit_forward(
        params, cfg, jnp.asarray(x), jnp.asarray(t), jnp.asarray(ctx),
        jnp.asarray(audio),
        encoder_attention_mask=jnp.ones((1, 6), jnp.int32),
        num_cond_latents=num_cond, num_ref_latents=num_ref,
        ref_img_index=ref_idx, mask_frame_range=mfr, policy=FP32_POLICY))

    assert out_t.shape == out_j.shape
    rel = np.abs(out_t - out_j).max() / (np.abs(out_t).max() + 1e-8)
    assert rel < 1e-4, rel
