"""SVD UNet/VAE conversion risk reduction (round-1 VERDICT item 8).

diffusers is not installed in-image, so the DepthCrafter SVD UNet has no
local torch oracle (COMPONENTS.md deviation 2). This file pins down
everything that CAN be verified offline:

1. A full state-dict MANIFEST (names + torch shapes) of the checkpoint
   layout the converter expects, frozen as a fixture
   (tests/fixtures/svd_unet_manifest.json / svd_vae_manifest.json) — the
   reviewable contract against the published
   diffusers UNetSpatioTemporalConditionModel / AutoencoderKLTemporalDecoder
   layouts (tencent/DepthCrafter + stabilityai SVD).
2. An exact ROUNDTRIP: an inverse writer serializes our init pytree into
   the torch layout; convert_svd_unet/vae must reproduce the pytree
   bit-exactly (catches transpose/reshape/naming bugs in the converter).
3. LOUD-FAILURE contracts: a missing checkpoint key and an unconsumed
   checkpoint key both raise ValueError naming the problem (not a bare
   KeyError at weight-load time on a real host).
4. Hand-derived AlphaBlender goldens (unet.py:8-142 semantics): the
   SpatioTemporalResBlock mixes with switch_spatial_to_temporal_mix=True
   (alpha = 1 - sigmoid(mix_factor) on the spatial branch) while the
   TransformerSpatioTemporalModel mixes unswitched.
"""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from worldforge_tpu.io.convert_depthcrafter import (convert_svd_unet,
                                                    convert_svd_vae)
from worldforge_tpu.models.depthcrafter.unet import (SVDUNetConfig,
                                                     _alpha_blend,
                                                     init_svd_unet)
from worldforge_tpu.models.depthcrafter.vae import SVDVAEConfig, init_svd_vae

FIXDIR = os.path.join(os.path.dirname(__file__), "fixtures")


# ---------------------------------------------------- inverse writers
# Mirror io/convert_depthcrafter.py helper-for-helper: our pytree -> the
# diffusers torch layout. The converter must invert these exactly.


def _w_d(sd, name, p):
    sd[f"{name}.weight"] = np.ascontiguousarray(np.asarray(p["w"]).T)
    if "b" in p:
        sd[f"{name}.bias"] = np.asarray(p["b"])


def _w_c(sd, name, p):
    w = np.asarray(p["w"])          # ours [*k, in, out]
    nd = w.ndim - 2
    perm = (nd + 1, nd) + tuple(range(nd))
    sd[f"{name}.weight"] = np.ascontiguousarray(w.transpose(perm))
    sd[f"{name}.bias"] = np.asarray(p["b"])


def _w_gn(sd, name, p):
    sd[f"{name}.weight"] = np.asarray(p["scale"])
    sd[f"{name}.bias"] = np.asarray(p["bias"])


def _w_res2d(sd, pre, p):
    _w_gn(sd, f"{pre}.norm1", p["norm1"])
    _w_c(sd, f"{pre}.conv1", p["conv1"])
    _w_gn(sd, f"{pre}.norm2", p["norm2"])
    _w_c(sd, f"{pre}.conv2", p["conv2"])
    if "time_emb_proj" in p:
        _w_d(sd, f"{pre}.time_emb_proj", p["time_emb_proj"])
    if "conv_shortcut" in p:
        _w_c(sd, f"{pre}.conv_shortcut", p["conv_shortcut"])


def _w_st_res(sd, pre, p):
    _w_res2d(sd, f"{pre}.spatial_res_block", p["spatial_res_block"])
    _w_res2d(sd, f"{pre}.temporal_res_block", p["temporal_res_block"])
    sd[f"{pre}.time_mixer.mix_factor"] = np.asarray(
        p["time_mixer"]["mix_factor"])


def _w_attn(sd, pre, p):
    _w_d(sd, f"{pre}.to_q", p["to_q"])
    _w_d(sd, f"{pre}.to_k", p["to_k"])
    _w_d(sd, f"{pre}.to_v", p["to_v"])
    _w_d(sd, f"{pre}.to_out.0", p["to_out"])


def _w_geglu(sd, pre, p):
    _w_d(sd, f"{pre}.net.0.proj", p["proj"])
    _w_d(sd, f"{pre}.net.2", p["out"])


def _w_basic(sd, pre, p):
    _w_gn(sd, f"{pre}.norm1", p["norm1"])
    _w_attn(sd, f"{pre}.attn1", p["attn1"])
    _w_gn(sd, f"{pre}.norm2", p["norm2"])
    _w_attn(sd, f"{pre}.attn2", p["attn2"])
    _w_gn(sd, f"{pre}.norm3", p["norm3"])
    _w_geglu(sd, f"{pre}.ff", p["ff"])


def _w_temporal_basic(sd, pre, p):
    _w_gn(sd, f"{pre}.norm_in", p["norm_in"])
    _w_geglu(sd, f"{pre}.ff_in", p["ff_in"])
    _w_basic(sd, pre, {k: p[k] for k in
                       ("norm1", "attn1", "norm2", "attn2", "norm3", "ff")})


def _w_st_transformer(sd, pre, p):
    _w_gn(sd, f"{pre}.norm", p["norm"])
    _w_d(sd, f"{pre}.proj_in", p["proj_in"])
    for i, b in enumerate(p["blocks"]):
        _w_basic(sd, f"{pre}.transformer_blocks.{i}", b)
    for i, b in enumerate(p["temporal_blocks"]):
        _w_temporal_basic(sd, f"{pre}.temporal_transformer_blocks.{i}", b)
    _w_d(sd, f"{pre}.time_pos_embed.linear_1", p["time_pos_embed"]["fc1"])
    _w_d(sd, f"{pre}.time_pos_embed.linear_2", p["time_pos_embed"]["fc2"])
    sd[f"{pre}.time_mixer.mix_factor"] = np.asarray(
        p["time_mixer"]["mix_factor"])
    _w_d(sd, f"{pre}.proj_out", p["proj_out"])


def svd_unet_to_torch_layout(params) -> dict:
    sd = {}
    _w_c(sd, "conv_in", params["conv_in"])
    _w_d(sd, "time_embedding.linear_1", params["time_embedding"]["fc1"])
    _w_d(sd, "time_embedding.linear_2", params["time_embedding"]["fc2"])
    _w_d(sd, "add_embedding.linear_1", params["add_embedding"]["fc1"])
    _w_d(sd, "add_embedding.linear_2", params["add_embedding"]["fc2"])
    for i, blk in enumerate(params["down_blocks"]):
        pre = f"down_blocks.{i}"
        for j, r in enumerate(blk["resnets"]):
            _w_st_res(sd, f"{pre}.resnets.{j}", r)
        for j, a in enumerate(blk["attentions"]):
            _w_st_transformer(sd, f"{pre}.attentions.{j}", a)
        if "downsampler" in blk:
            _w_c(sd, f"{pre}.downsamplers.0.conv", blk["downsampler"])
    for j, r in enumerate(params["mid_block"]["resnets"]):
        _w_st_res(sd, f"mid_block.resnets.{j}", r)
    _w_st_transformer(sd, "mid_block.attentions.0",
                      params["mid_block"]["attentions"][0])
    for i, blk in enumerate(params["up_blocks"]):
        pre = f"up_blocks.{i}"
        for j, r in enumerate(blk["resnets"]):
            _w_st_res(sd, f"{pre}.resnets.{j}", r)
        for j, a in enumerate(blk["attentions"]):
            _w_st_transformer(sd, f"{pre}.attentions.{j}", a)
        if "upsampler" in blk:
            _w_c(sd, f"{pre}.upsamplers.0.conv", blk["upsampler"])
    _w_gn(sd, "conv_norm_out", params["conv_norm_out"])
    _w_c(sd, "conv_out", params["conv_out"])
    return sd


def svd_vae_to_torch_layout(params) -> dict:
    sd = {}
    enc, dec = params["encoder"], params["decoder"]
    _w_c(sd, "encoder.conv_in", enc["conv_in"])
    for i, blk in enumerate(enc["down"]):
        pre = f"encoder.down_blocks.{i}"
        for j, r in enumerate(blk["resnets"]):
            _w_res2d(sd, f"{pre}.resnets.{j}", r)
        if "down" in blk:
            _w_c(sd, f"{pre}.downsamplers.0.conv", blk["down"])
    _w_res2d(sd, "encoder.mid_block.resnets.0", enc["mid"]["res1"])
    _w_gn(sd, "encoder.mid_block.attentions.0.group_norm",
          enc["mid"]["attn_norm"])
    _w_attn(sd, "encoder.mid_block.attentions.0", enc["mid"]["attn"])
    _w_res2d(sd, "encoder.mid_block.resnets.1", enc["mid"]["res2"])
    _w_gn(sd, "encoder.conv_norm_out", enc["norm_out"])
    _w_c(sd, "encoder.conv_out", enc["conv_out"])
    _w_c(sd, "quant_conv", enc["quant_conv"])

    _w_c(sd, "decoder.conv_in", dec["conv_in"])
    _w_st_res(sd, "decoder.mid_block.resnets.0", dec["mid"]["res1"])
    _w_gn(sd, "decoder.mid_block.attentions.0.group_norm",
          dec["mid"]["attn_norm"])
    _w_attn(sd, "decoder.mid_block.attentions.0", dec["mid"]["attn"])
    _w_st_res(sd, "decoder.mid_block.resnets.1", dec["mid"]["res2"])
    for i, blk in enumerate(dec["up"]):
        pre = f"decoder.up_blocks.{i}"
        for j, r in enumerate(blk["resnets"]):
            _w_st_res(sd, f"{pre}.resnets.{j}", r)
        if "up" in blk:
            _w_c(sd, f"{pre}.upsamplers.0.conv", blk["up"])
    _w_gn(sd, "decoder.conv_norm_out", dec["norm_out"])
    _w_c(sd, "decoder.conv_out", dec["conv_out"])
    _w_c(sd, "decoder.time_conv_out", dec["time_conv_out"])
    return sd


# ------------------------------------------------------------------ tests


def _assert_trees_equal(a, b):
    la, ta = jax.tree_util.tree_flatten_with_path(a)
    lb, tb = jax.tree_util.tree_flatten_with_path(b)
    assert ta == tb, "tree structure mismatch"
    for (pa, va), (_, vb) in zip(la, lb):
        np.testing.assert_array_equal(
            np.asarray(va), np.asarray(vb),
            err_msg=jax.tree_util.keystr(pa))


def _check_manifest(sd, fixture):
    path = os.path.join(FIXDIR, fixture)
    manifest = {k: list(np.asarray(v).shape) for k, v in sorted(sd.items())}
    if not os.path.exists(path):  # first run: freeze the contract
        os.makedirs(FIXDIR, exist_ok=True)
        with open(path, "w") as f:
            json.dump(manifest, f, indent=1, sort_keys=True)
    with open(path) as f:
        frozen = json.load(f)
    assert manifest == frozen, (
        f"checkpoint layout contract changed vs {fixture} — if deliberate, "
        f"delete the fixture and re-run to regenerate")


def test_svd_unet_roundtrip_and_manifest():
    cfg = SVDUNetConfig.tiny()
    params = init_svd_unet(jax.random.key(0), cfg)
    sd = svd_unet_to_torch_layout(params)
    _check_manifest(sd, "svd_unet_manifest.json")
    conv = convert_svd_unet(sd, cfg, strict=True)
    _assert_trees_equal(params, conv)


def test_svd_vae_roundtrip_and_manifest():
    cfg = SVDVAEConfig.tiny()
    params = init_svd_vae(jax.random.key(1), cfg)
    sd = svd_vae_to_torch_layout(params)
    _check_manifest(sd, "svd_vae_manifest.json")
    conv = convert_svd_vae(sd, cfg, strict=True)
    _assert_trees_equal(params, conv)


def test_missing_key_fails_loudly():
    cfg = SVDUNetConfig.tiny()
    sd = svd_unet_to_torch_layout(init_svd_unet(jax.random.key(0), cfg))
    del sd["mid_block.attentions.0.proj_in.weight"]
    with pytest.raises(ValueError, match="missing key.*proj_in"):
        convert_svd_unet(sd, cfg)


def test_unconsumed_key_fails_loudly():
    cfg = SVDUNetConfig.tiny()
    sd = svd_unet_to_torch_layout(init_svd_unet(jax.random.key(0), cfg))
    sd["a_new_upstream_module.weight"] = np.zeros((3,), np.float32)
    with pytest.raises(ValueError, match="never consumed"):
        convert_svd_unet(sd, cfg, strict=True)


def test_alpha_blender_goldens():
    """Hand-derived from diffusers AlphaBlender('learned_with_images')
    with an all-video batch (image_only_indicator = zeros):
    alpha = sigmoid(mix_factor); switch_spatial_to_temporal_mix=True (the
    SpatioTemporalResBlock) flips it BEFORE blending; the blend is always
    alpha*x_spatial + (1-alpha)*x_temporal."""
    xs = jnp.full((2, 3), 1.0)
    xt = jnp.full((2, 3), -1.0)

    # mix_factor = 0 -> alpha 0.5 either way -> exact mean
    p = {"mix_factor": jnp.asarray([0.0])}
    np.testing.assert_allclose(_alpha_blend(p, xs, xt, switch=False), 0.0,
                               atol=1e-7)
    np.testing.assert_allclose(_alpha_blend(p, xs, xt, switch=True), 0.0,
                               atol=1e-7)

    # mix_factor -> +inf: unswitched blend saturates to SPATIAL, the
    # switched (res-block) blend saturates to TEMPORAL
    p = {"mix_factor": jnp.asarray([20.0])}
    np.testing.assert_allclose(_alpha_blend(p, xs, xt, switch=False), 1.0,
                               atol=1e-6)
    np.testing.assert_allclose(_alpha_blend(p, xs, xt, switch=True), -1.0,
                               atol=1e-6)

    # published init mix_factor = 0.5: alpha = sigmoid(0.5) = 0.6224593
    p = {"mix_factor": jnp.asarray([0.5])}
    a = 1.0 / (1.0 + np.exp(-0.5))
    np.testing.assert_allclose(np.asarray(_alpha_blend(p, xs, xt, False)),
                               a * 1.0 + (1 - a) * -1.0, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(_alpha_blend(p, xs, xt, True)),
                               (1 - a) * 1.0 + a * -1.0, rtol=1e-6)