"""VACE host-side preprocessing (vace_processor.py behavior)."""

import jax
import jax.numpy as jnp
import numpy as np

from worldforge_tpu.io.vace_processor import (VaceImageProcessor,
                                              VaceVideoProcessor,
                                              prepare_source)
from worldforge_tpu.models.wan.vae import WanVAEConfig, init_wan_vae
from worldforge_tpu.pipelines.wan_vace import prepare_vace_context


def test_image_processor_size_rule():
    p = VaceImageProcessor(seq_len=1024)
    # 480x832 -> latent area 60*104=6240 > 1024 -> scaled down, 8-divisible
    oh, ow = p.output_size(480, 832)
    assert oh % 8 == 0 and ow % 8 == 0
    assert (oh // 8) * (ow // 8) <= 1024
    # already small enough -> unchanged (floor to stride)
    oh, ow = p.output_size(64, 64, seq_len=10_000)
    assert (oh, ow) == (64, 64)


def test_image_processor_batch(rng):
    p = VaceImageProcessor(seq_len=64)
    img = rng.integers(0, 256, (48, 80, 3), np.uint8)
    out, (oh, ow) = p.load_image_batch(img)
    assert out.shape == (3, 1, oh, ow)
    o = np.asarray(out)
    assert o.min() >= -1.0 and o.max() <= 1.0


def test_video_processor_keep_last(rng):
    p = VaceVideoProcessor(seq_len=256, max_area=48 * 80, keep_last=True)
    vid = rng.integers(0, 256, (17, 48, 80, 3), np.uint8)
    out, ids, (oh, ow), fps = p.load_video(vid, fps=16.0)
    # frame budget: latent frames capped by seq_len / latent_area
    assert out.shape[0] == 3 and out.shape[2:] == (oh, ow)
    assert out.shape[1] == len(ids)
    assert (out.shape[1] - 1) % 4 == 0          # (of-1)*df+1 form
    assert ids[0] == 0 and ids[-1] == 16        # keep_last spans the clip
    assert oh % 8 == 0 and ow % 8 == 0
    assert fps > 0


def test_video_processor_pair_same_ids(rng):
    p = VaceVideoProcessor(seq_len=128, max_area=32 * 32)
    vid = rng.integers(0, 256, (9, 32, 32, 3), np.uint8)
    msk = rng.integers(0, 256, (9, 32, 32, 3), np.uint8)
    v, m, ids, (oh, ow), _ = p.load_video_pair(vid, msk)
    assert v.shape == m.shape == (3, len(ids), oh, ow)


def test_prepare_source_fills_and_letterboxes(rng):
    ref = jnp.asarray(rng.uniform(-1, 1, (3, 1, 20, 40)), jnp.float32)
    videos, masks, refs = prepare_source(
        [None], [None], [[ref]], num_frames=5, image_size=(32, 32))
    assert videos[0].shape == (3, 5, 32, 32) and float(videos[0].sum()) == 0
    assert masks[0].shape == (1, 5, 32, 32) and float(masks[0].min()) == 1.0
    canvas = refs[0][0]
    assert canvas.shape == (3, 1, 32, 32)
    c = np.asarray(canvas)
    # 20x40 fits as 16x32 centered vertically; bands above/below are white
    assert (c[:, 0, :8] == 1.0).all() and (c[:, 0, -8:] == 1.0).all()


def test_prepare_vace_context_with_refs(rng):
    vae_cfg = WanVAEConfig.tiny()
    vae_params = init_wan_vae(jax.random.key(0), vae_cfg)
    frames = jnp.asarray(rng.uniform(-1, 1, (1, 3, 5, 16, 16)), jnp.float32)
    masks = jnp.asarray(rng.integers(0, 2, (1, 1, 5, 16, 16)), jnp.float32)
    ref = jnp.asarray(rng.uniform(-1, 1, (1, 3, 1, 16, 16)), jnp.float32)
    ctx = prepare_vace_context(frames, masks, vae_params, vae_cfg,
                               ref_images=[ref])
    z = vae_cfg.z_dim
    assert ctx.shape == (1, 2 * z + 64, 3, 2, 2)   # 1 ref frame + 2 video
    c = np.asarray(ctx)
    # reactive half and mask channels are zero over the ref frame
    assert (c[0, z:, 0] == 0.0).all()
    assert not (c[0, :z, 0] == 0.0).all()
