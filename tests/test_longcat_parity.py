"""LongCat DiT conversion parity vs the reference torch model (SDPA via
the xformers stub)."""

import jax.numpy as jnp
import numpy as np
import pytest

from worldforge_tpu.core.dtypes import FP32_POLICY
from worldforge_tpu.io.convert_longcat import convert_longcat_dit
from worldforge_tpu.models.longcat.dit import (LongCatDiTConfig,
                                               longcat_dit_forward)

torch = pytest.importorskip("torch")


@pytest.fixture(scope="module")
def longcat_ref():
    from tests.reference_oracle import import_longcat_dit
    mod = import_longcat_dit()
    torch.manual_seed(0)
    ref = mod.LongCatVideoTransformer3DModel(
        in_channels=4, out_channels=4, hidden_size=64, depth=2, num_heads=2,
        caption_channels=48, mlp_ratio=4, adaln_tembed_dim=32,
        frequency_embedding_size=16, cp_split_hw=[1, 1],
        enable_xformers=True).eval()
    cfg = LongCatDiTConfig(in_channels=4, out_channels=4, hidden_size=64,
                           depth=2, num_heads=2, caption_channels=48,
                           mlp_ratio=4, adaln_tembed_dim=32,
                           frequency_embedding_size=16)
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    params = convert_longcat_dit(sd, cfg, dtype=jnp.float32)
    return ref, cfg, params


@pytest.mark.parametrize("num_cond", [0, 1])
def test_longcat_dit_parity(longcat_ref, rng, num_cond):
    ref, cfg, params = longcat_ref
    x = rng.standard_normal((1, 4, 3, 8, 8)).astype(np.float32)
    ctx = rng.standard_normal((1, 6, 48)).astype(np.float32)
    mask = np.ones((1, 1, 1, 6), np.int64)
    t = np.full((1, 3), 700.0, np.float32)
    if num_cond:
        t[:, :num_cond] = 0.0

    with torch.no_grad():
        out_t = ref(torch.tensor(x), torch.tensor(t),
                    torch.tensor(ctx)[:, None],
                    encoder_attention_mask=torch.tensor(mask),
                    num_cond_latents=num_cond).numpy()

    out_j = np.asarray(longcat_dit_forward(
        params, cfg, jnp.asarray(x), jnp.asarray(t), jnp.asarray(ctx),
        encoder_attention_mask=jnp.ones((1, 6), jnp.int32),
        num_cond_latents=num_cond, policy=FP32_POLICY))

    assert out_t.shape == out_j.shape
    rel = np.abs(out_t - out_j).max() / (np.abs(out_t).max() + 1e-8)
    assert rel < 1e-4, rel


def test_longcat_dit_parity_varlen_text(longcat_ref, rng):
    """Masked text tokens (varlen cross-attn packing) must match."""
    ref, cfg, params = longcat_ref
    x = rng.standard_normal((2, 4, 3, 8, 8)).astype(np.float32)
    ctx = rng.standard_normal((2, 6, 48)).astype(np.float32)
    mask = np.zeros((2, 6), np.int64)
    mask[0, :4] = 1
    mask[1, :6] = 1
    t = np.full((2, 3), 500.0, np.float32)

    with torch.no_grad():
        out_t = ref(torch.tensor(x), torch.tensor(t),
                    torch.tensor(ctx)[:, None],
                    encoder_attention_mask=torch.tensor(
                        mask[:, None, None, :]),
                    num_cond_latents=0).numpy()

    out_j = np.asarray(longcat_dit_forward(
        params, cfg, jnp.asarray(x), jnp.asarray(t), jnp.asarray(ctx),
        encoder_attention_mask=jnp.asarray(mask.astype(np.int32)),
        num_cond_latents=0, policy=FP32_POLICY))
    rel = np.abs(out_t - out_j).max() / (np.abs(out_t).max() + 1e-8)
    assert rel < 1e-4, rel


def test_longcat_kv_cache_parity(longcat_ref, rng):
    """Cache-cond pass + cached forward vs the reference's return_kv /
    kv_cache_dict path (longcat_video_dit.py:280-360)."""
    from worldforge_tpu.models.longcat.dit import (
        longcat_dit_cache_cond, longcat_dit_forward_with_cache)

    ref, cfg, params = longcat_ref
    tc, tn = 2, 3
    cond = rng.standard_normal((1, 4, tc, 8, 8)).astype(np.float32)
    noise = rng.standard_normal((1, 4, tn, 8, 8)).astype(np.float32)
    ctx = rng.standard_normal((1, 6, 48)).astype(np.float32)
    mask = np.ones((1, 1, 1, 6), np.int64)

    with torch.no_grad():
        # reference: cache clean cond latents (t=0, skip cross-attn)
        _, kv_dict = ref(torch.tensor(cond),
                         torch.tensor(np.zeros((1, tc), np.float32)),
                         torch.tensor(ctx)[:, None],
                         encoder_attention_mask=torch.tensor(mask),
                         num_cond_latents=0, return_kv=True,
                         skip_crs_attn=True)
        t_n = torch.tensor(np.full((1, tn), 650.0, np.float32))
        out_r = ref(torch.tensor(noise), t_n, torch.tensor(ctx)[:, None],
                    encoder_attention_mask=torch.tensor(mask),
                    num_cond_latents=tc,
                    kv_cache_dict=kv_dict).numpy()

    kv = longcat_dit_cache_cond(params, cfg, jnp.asarray(cond),
                                policy=FP32_POLICY)
    out_j = np.asarray(longcat_dit_forward_with_cache(
        params, cfg, jnp.asarray(noise),
        jnp.full((1, tn), 650.0, jnp.float32), jnp.asarray(ctx), kv, (tc,),
        encoder_attention_mask=jnp.ones((1, 6), jnp.int32),
        policy=FP32_POLICY))
    rel = np.abs(out_r - out_j).max() / (np.abs(out_r).max() + 1e-8)
    assert rel < 1e-4, rel


def test_lora_merge_matches_reference(longcat_ref, rng, tmp_path):
    """convert_longcat_lora + merge_lora_stacked vs the reference's
    load_lora/enable_loras forward patching (lora_utils.py +
    longcat_video_dit.py:197-270), incl. the n_seperate>1 split-up case
    and the alpha_scale buffer."""
    from safetensors.torch import save_file

    from worldforge_tpu.io.convert_longcat import (convert_longcat_lora,
                                                   merge_lora_stacked)

    ref, cfg, params = longcat_ref
    r, n_sep = 4, 2
    hy = "___lorahyphen___"
    sd_l = {}
    g = torch.Generator().manual_seed(5)

    def name(path):
        return "lora" + hy + path.replace(".", hy)

    # blocks.0.attn.qkv: plain lora
    nm = name("blocks.0.attn.qkv")
    sd_l[f"{nm}.lora_down.weight"] = torch.randn(r, 64, generator=g) * 0.1
    sd_l[f"{nm}.lora_up.weight"] = torch.randn(192, r, generator=g) * 0.1
    sd_l[f"{nm}.alpha_scale"] = torch.tensor(64.0 / r)
    # blocks.1.ffn.w1: n_seperate=2 split up-projection
    out_dim = ref.blocks[1].ffn.w1.out_features
    nm2 = name("blocks.1.ffn.w1")
    sd_l[f"{nm2}.lora_down.weight"] = torch.randn(n_sep * r, 64,
                                                  generator=g) * 0.1
    for j in range(n_sep):
        sd_l[f"{nm2}.lora_up.blocks.{j}.weight"] = torch.randn(
            out_dim // n_sep, r, generator=g) * 0.1
    sd_l[f"{nm2}.alpha_scale"] = torch.tensor(64.0 / r)

    path = str(tmp_path / "lora.safetensors")
    save_file({k: v.contiguous() for k, v in sd_l.items()}, path)

    ref.load_lora(path, "t", multiplier=0.7, lora_network_dim=r,
                  lora_network_alpha=64)
    ref.enable_loras(["t"])

    x = rng.standard_normal((1, 4, 3, 8, 8)).astype(np.float32)
    ctx = rng.standard_normal((1, 6, 48)).astype(np.float32)
    mask = np.ones((1, 1, 1, 6), np.int64)
    t = np.full((1, 3), 400.0, np.float32)
    with torch.no_grad():
        out_r = ref(torch.tensor(x), torch.tensor(t),
                    torch.tensor(ctx)[:, None],
                    encoder_attention_mask=torch.tensor(mask),
                    num_cond_latents=0).numpy()
    ref.disable_all_loras()

    lora = convert_longcat_lora(
        {k: v.numpy() for k, v in sd_l.items()}, multiplier=0.7)
    merged = merge_lora_stacked(params, lora)
    out_j = np.asarray(longcat_dit_forward(
        merged, cfg, jnp.asarray(x), jnp.asarray(t), jnp.asarray(ctx),
        encoder_attention_mask=jnp.ones((1, 6), jnp.int32),
        num_cond_latents=0, policy=FP32_POLICY))
    rel = np.abs(out_r - out_j).max() / (np.abs(out_r).max() + 1e-8)
    assert rel < 1e-4, rel
