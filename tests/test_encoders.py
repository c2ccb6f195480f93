"""UMT5 + CLIP vision encoder tests (tiny configs, CPU)."""

import jax
import jax.numpy as jnp
import numpy as np

from worldforge_tpu.models.encoders.umt5 import (
    UMT5Config, init_umt5, rel_position_bucket_matrix, umt5_encode)
from worldforge_tpu.models.encoders.clip_vision import (
    CLIPVisionConfig, clip_vision_hidden, init_clip_vision, preprocess_clip)


def test_rel_bucket_matrix_properties():
    m = rel_position_bucket_matrix(8, 8, num_buckets=32, max_distance=128)
    assert m.shape == (8, 8)
    assert (np.diag(m) == 0).all()           # zero distance -> bucket 0
    assert (m[0, 1:] >= 16).all()            # future positions: upper half
    assert (m[1:, 0] < 16).all()             # past positions: lower half
    assert m.max() < 32 and m.min() >= 0


def test_umt5_encode_shapes_and_masking(rng):
    cfg = UMT5Config.tiny()
    params = init_umt5(jax.random.key(0), cfg, dtype=jnp.float32)
    ids = jnp.asarray(rng.integers(0, cfg.vocab_size, (2, 10)))
    mask = jnp.asarray([[1] * 10, [1] * 4 + [0] * 6])
    out = umt5_encode(params, cfg, ids, mask, compute_dtype=jnp.float32)
    assert out.shape == (2, 10, cfg.d_model)
    assert np.isfinite(np.asarray(out)).all()
    # padded positions are zeroed
    np.testing.assert_array_equal(np.asarray(out[1, 4:]), 0.0)
    assert np.abs(np.asarray(out[1, :4])).max() > 0


def test_umt5_mask_blocks_information(rng):
    """Changing a masked token must not affect valid-token outputs."""
    cfg = UMT5Config.tiny()
    params = init_umt5(jax.random.key(0), cfg, dtype=jnp.float32)
    ids1 = jnp.asarray(rng.integers(0, cfg.vocab_size, (1, 8)))
    ids2 = ids1.at[0, 7].set((ids1[0, 7] + 1) % cfg.vocab_size)
    mask = jnp.asarray([[1] * 6 + [0] * 2])
    o1 = umt5_encode(params, cfg, ids1, mask, compute_dtype=jnp.float32)
    o2 = umt5_encode(params, cfg, ids2, mask, compute_dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(o1[:, :6]), np.asarray(o2[:, :6]),
                               atol=1e-6)


def test_clip_vision_shapes(rng):
    cfg = CLIPVisionConfig.tiny()  # 28px, patch 14 -> 4+1 tokens
    params = init_clip_vision(jax.random.key(0), cfg)
    px = jnp.asarray(rng.standard_normal((1, 3, 28, 28)), jnp.float32)
    out = clip_vision_hidden(params, cfg, px)
    assert out.shape == (1, 5, cfg.width)
    assert np.isfinite(np.asarray(out)).all()
    # penultimate differs from final
    out_last = clip_vision_hidden(params, cfg, px, penultimate=False)
    assert np.abs(np.asarray(out - out_last)).max() > 1e-6


def test_preprocess_clip(rng):
    img = rng.uniform(0, 1, (30, 40, 3)).astype(np.float32)
    px = preprocess_clip(img, size=28)
    assert px.shape == (1, 3, 28, 28)
    assert np.isfinite(px).all()
