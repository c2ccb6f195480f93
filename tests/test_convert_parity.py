"""Checkpoint conversion + NUMERICAL PARITY against the reference torch
models (tiny configs, CPU). This is the core latent-drift guard:
convert a randomly-initialized reference model's state dict and require our
JAX forward to match the torch forward."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

from tests.reference_oracle import import_wan_reference
from worldforge_tpu.core.dtypes import FP32_POLICY
from worldforge_tpu.io.convert_wan import convert_wan_dit, convert_wan_vae
from worldforge_tpu.models.wan.dit import WanDiTConfig, wan_dit_forward
from worldforge_tpu.models.wan.vae import (WanVAEConfig, vae_decode,
                                           vae_encode)


@pytest.fixture(scope="module")
def wan_ref():
    return import_wan_reference()


def _np_sd(model):
    return {k: v.detach().numpy() for k, v in model.state_dict().items()}


def test_wan_dit_parity(wan_ref, rng):
    wan_model, _ = wan_ref
    torch.manual_seed(0)
    cfg = WanDiTConfig(model_type="i2v", patch_size=(1, 2, 2), text_len=512,
                       in_dim=12, dim=64, ffn_dim=128, freq_dim=32,
                       text_dim=48, out_dim=4, num_heads=2, num_layers=2)
    ref = wan_model.WanModel(
        model_type="i2v", patch_size=(1, 2, 2), text_len=512, in_dim=12,
        dim=64, ffn_dim=128, freq_dim=32, text_dim=48, out_dim=4,
        num_heads=2, num_layers=2).eval()
    # zero-init head would make the test vacuous; perturb it
    with torch.no_grad():
        ref.head.head.weight.normal_(0, 0.02)

    params = convert_wan_dit(_np_sd(ref), cfg, dtype=jnp.float32)

    x = rng.standard_normal((4, 3, 8, 8)).astype(np.float32)
    y = rng.standard_normal((8, 3, 8, 8)).astype(np.float32)
    ctx = rng.standard_normal((512, 48)).astype(np.float32)
    clip = rng.standard_normal((1, 257, 1280)).astype(np.float32)
    t = 500.0

    with torch.no_grad():
        out_t = ref([torch.from_numpy(x)], torch.tensor([t]),
                    [torch.from_numpy(ctx)], seq_len=3 * 4 * 4,
                    clip_fea=torch.from_numpy(clip),
                    y=[torch.from_numpy(y)])[0].numpy()

    out_j = wan_dit_forward(
        params, cfg, jnp.asarray(x)[None], jnp.asarray([t]),
        jnp.asarray(ctx)[None], clip_fea=jnp.asarray(clip),
        y=jnp.asarray(y)[None], policy=FP32_POLICY)
    out_j = np.asarray(out_j[0])

    assert out_t.shape == out_j.shape
    err = np.abs(out_t - out_j).max()
    scale = np.abs(out_t).max() + 1e-8
    assert err / scale < 1e-4, f"rel err {err/scale:.2e} (abs {err:.2e})"

    # bf16 compute policy (production) stays within the BASELINE 1e-2 drift
    out_b = np.asarray(wan_dit_forward(
        params, cfg, jnp.asarray(x)[None], jnp.asarray([t]),
        jnp.asarray(ctx)[None], clip_fea=jnp.asarray(clip),
        y=jnp.asarray(y)[None])[0])
    assert np.abs(out_t - out_b).max() / scale < 1e-2


def test_wan_vae_parity_encode_decode(wan_ref, rng):
    _, wan_vae = wan_ref
    torch.manual_seed(1)
    # reference default cfg scaled down: dim 8, z 4, same topology as ours
    ref = wan_vae.WanVAE_(dim=8, z_dim=4, dim_mult=[1, 2, 2, 2],
                          num_res_blocks=1, attn_scales=[],
                          temperal_downsample=[False, True, True]).eval()
    cfg = WanVAEConfig.tiny()
    params = convert_wan_vae(_np_sd(ref), cfg, dtype=jnp.float32)

    video = rng.standard_normal((1, 3, 9, 16, 16)).astype(np.float32) * 0.5
    scale = [torch.zeros(4), torch.ones(4)]  # identity normalization
    with torch.no_grad():
        ref.clear_cache()
        z_t = ref.encode(torch.from_numpy(video), scale).numpy()

    mean = jnp.zeros((4,))
    std = jnp.ones((4,))
    z_j = np.asarray(vae_encode(params, cfg, jnp.asarray(video),
                                mean=mean, std=std))
    assert z_t.shape == z_j.shape
    err = np.abs(z_t - z_j).max() / (np.abs(z_t).max() + 1e-8)
    assert err < 1e-3, f"encode rel err {err:.2e}"

    z = rng.standard_normal(z_t.shape).astype(np.float32)
    with torch.no_grad():
        ref.clear_cache()
        x_t = ref.decode(torch.from_numpy(z), scale).clamp(-1, 1).numpy()
    x_j = np.asarray(vae_decode(params, cfg, jnp.asarray(z),
                                mean=mean, std=std))
    err = np.abs(x_t - x_j).max() / (np.abs(x_t).max() + 1e-8)
    assert err < 1e-3, f"decode rel err {err:.2e}"


def test_wan_dit_flf2v_parity(wan_ref, rng):
    """flf2v variant: 2x257 CLIP tokens + positional emb_pos
    (model.py:359-367, 487-488)."""
    wan_model, _ = wan_ref
    torch.manual_seed(2)
    kw = dict(model_type="flf2v", patch_size=(1, 2, 2), text_len=512,
              in_dim=12, dim=64, ffn_dim=128, freq_dim=32, text_dim=48,
              out_dim=4, num_heads=2, num_layers=2)
    ref = wan_model.WanModel(**kw).eval()
    with torch.no_grad():
        ref.head.head.weight.normal_(0, 0.02)
        ref.img_emb.emb_pos.normal_(0, 0.02)

    from worldforge_tpu.models.wan.dit import WanDiTConfig, wan_dit_forward
    cfg = WanDiTConfig(**kw)
    params = convert_wan_dit(_np_sd(ref), cfg, dtype=jnp.float32)

    x = rng.standard_normal((4, 3, 8, 8)).astype(np.float32)
    y = rng.standard_normal((8, 3, 8, 8)).astype(np.float32)
    ctx = rng.standard_normal((512, 48)).astype(np.float32)
    clip = rng.standard_normal((2, 257, 1280)).astype(np.float32)  # first+last
    t = 300.0

    with torch.no_grad():
        # reference stacks first/last CLIP embeds on batch and re-views to
        # [B, 2*257, d] inside MLPProj (model.py:364-367)
        out_t = ref([torch.from_numpy(x)], torch.tensor([t]),
                    [torch.from_numpy(ctx)], seq_len=3 * 4 * 4,
                    clip_fea=torch.from_numpy(clip),
                    y=[torch.from_numpy(y)])[0].numpy()

    clip_j = clip.reshape(1, 514, 1280)      # same memory layout
    out_j = np.asarray(wan_dit_forward(
        params, cfg, jnp.asarray(x)[None], jnp.asarray([t]),
        jnp.asarray(ctx)[None], clip_fea=jnp.asarray(clip_j),
        y=jnp.asarray(y)[None], policy=FP32_POLICY)[0])
    rel = np.abs(out_t - out_j).max() / (np.abs(out_t).max() + 1e-8)
    assert rel < 1e-4, rel
