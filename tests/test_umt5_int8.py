"""int8 serving build of the UMT5 text encoder.

Gates the build that makes single-chip prompt->video serving possible
(docs/SERVING.md): `init_umt5_int8` quantizes the 24 transformer layers
to W8A8 during layerwise construction while the embedding table stays
bf16. Checks (tiny config):

1. `init_umt5_layerwise` with no transform is bit-identical to
   `init_umt5` (same key schedule) — the layerwise path is a pure
   capacity restructuring.
2. int8 encoder output drift vs the fp32 encoder is bounded, and padded
   positions stay exactly zero (the Wan vendored encoder's output-mask
   contract, t5.py usage).
"""

import numpy as np

import jax
import jax.numpy as jnp

from worldforge_tpu.models.encoders.umt5 import (UMT5Config, init_umt5,
                                                 init_umt5_int8,
                                                 init_umt5_layerwise,
                                                 umt5_encode)


def test_layerwise_init_matches_plain():
    cfg = UMT5Config.tiny()
    a = init_umt5(jax.random.key(7), cfg, dtype=jnp.bfloat16)
    b = init_umt5_layerwise(jax.random.key(7), cfg, dtype=jnp.bfloat16)
    la = jax.tree_util.tree_leaves_with_path(a)
    lb = jax.tree_util.tree_leaves_with_path(b)
    assert [p for p, _ in la] == [p for p, _ in lb]
    for (pa, xa), (_, xb) in zip(la, lb):
        np.testing.assert_array_equal(np.asarray(xa), np.asarray(xb),
                                      err_msg=str(pa))


def test_int8_encode_drift_bounded():
    cfg = UMT5Config.tiny()
    params = init_umt5(jax.random.key(7), cfg, dtype=jnp.float32)
    params_q = init_umt5_int8(jax.random.key(7), cfg)
    assert params_q["blocks"]["q"].keys() >= {"w8", "scale"}
    # embedding must NOT be quantized (gather, not matmul)
    assert params_q["embed"].dtype == jnp.bfloat16

    rng = np.random.default_rng(0)
    ids = jnp.asarray(rng.integers(0, cfg.vocab_size, (2, 16)))
    mask = jnp.asarray((np.arange(16)[None] < np.array([[16], [9]]))
                       .astype(np.int32))

    out_fp = np.asarray(umt5_encode(params, cfg, ids, mask,
                                    compute_dtype=jnp.float32))
    out_q = np.asarray(umt5_encode(params_q, cfg, ids, mask))

    # padded positions exactly zero in both
    assert np.all(out_fp[1, 9:] == 0.0) and np.all(out_q[1, 9:] == 0.0)

    drift = np.abs(out_fp - out_q).max() / (np.abs(out_fp).max() + 1e-8)
    # int8 + bf16-vs-fp32 compute at tiny width; measured ~1e-2
    assert 0.0 < drift < 0.05, f"umt5 int8 drift {drift:.4f}"
