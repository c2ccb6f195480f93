"""3D RoPE parity vs an independent complex-arithmetic oracle implementing the
reference equations (wan/modules/model.py:31-70)."""

import jax.numpy as jnp
import numpy as np

from worldforge_tpu.ops.rope import (apply_rope, rope_3d_split, rope_cos_sin)


def _oracle_rope_3d(x, f, h, w, theta=10000.0):
    """numpy/complex oracle: per-axis complex freqs, concatenated t/h/w."""
    b, s, nh, d = x.shape
    assert s == f * h * w
    dim_t, dim_h, dim_w = rope_3d_split(d)

    def freqs(n, dim):
        inv = 1.0 / (theta ** (np.arange(0, dim, 2, dtype=np.float64) / dim))
        return np.exp(1j * np.outer(np.arange(n), inv))  # [n, dim/2]

    ft = freqs(f, dim_t)[:, None, None, :]
    fh = freqs(h, dim_h)[None, :, None, :]
    fw = freqs(w, dim_w)[None, None, :, :]
    fr = np.concatenate([
        np.broadcast_to(ft, (f, h, w, dim_t // 2)),
        np.broadcast_to(fh, (f, h, w, dim_h // 2)),
        np.broadcast_to(fw, (f, h, w, dim_w // 2)),
    ], axis=-1).reshape(s, d // 2)

    xc = x.astype(np.float64).reshape(b, s, nh, d // 2, 2)
    xc = xc[..., 0] + 1j * xc[..., 1]
    yc = xc * fr[None, :, None, :]
    y = np.stack([yc.real, yc.imag], axis=-1).reshape(b, s, nh, d)
    return y.astype(np.float32)


def test_split_dims():
    assert rope_3d_split(128) == (44, 42, 42)
    assert rope_3d_split(64) == (24, 20, 20)


def test_rope_matches_complex_oracle(rng):
    f, h, w, d = 3, 4, 5, 64
    x = rng.standard_normal((2, f * h * w, 2, d)).astype(np.float32)
    cos, sin = rope_cos_sin(f, h, w, d)
    out = apply_rope(jnp.asarray(x), cos, sin)
    ref = _oracle_rope_3d(x, f, h, w)
    np.testing.assert_allclose(np.asarray(out), ref, atol=1e-5, rtol=1e-5)


def test_rope_preserves_norm(rng):
    f, h, w, d = 2, 3, 3, 128
    x = rng.standard_normal((1, f * h * w, 1, d)).astype(np.float32)
    cos, sin = rope_cos_sin(f, h, w, d)
    out = np.asarray(apply_rope(jnp.asarray(x), cos, sin))
    np.testing.assert_allclose(np.linalg.norm(out, axis=-1),
                               np.linalg.norm(x, axis=-1), rtol=1e-5)


def test_rope_offsets_match_slices(rng):
    """CP-sharded rope (h/w offsets) must equal slices of the full table."""
    f, h, w, d = 2, 4, 6, 64
    cos_full, sin_full = rope_cos_sin(f, h, w, d)
    cos_off, sin_off = rope_cos_sin(f, 2, 3, d, h_offset=1, w_offset=2)
    full = np.asarray(cos_full).reshape(f, h, w, d // 2)
    off = np.asarray(cos_off).reshape(f, 2, 3, d // 2)
    np.testing.assert_allclose(off, full[:, 1:3, 2:5], atol=0, rtol=0)


def test_fused_qk_kernel_matches_apply_rope(rng):
    """The Pallas fused q/k kernel (interpret mode on CPU) must match the
    apply_rope fallback exactly — guards the kernel the TPU path uses."""
    f, h, w, d = 2, 8, 13, 128   # s = 208 -> block_s 104, heads 8, d 128
    nh = 8
    s = f * h * w
    q = rng.standard_normal((1, s, nh, d)).astype(np.float32)
    k = rng.standard_normal((1, s, nh, d)).astype(np.float32)
    cos, sin = rope_cos_sin(f, h, w, d)
    from worldforge_tpu.ops.rope import apply_rope_qk
    qo, ko = apply_rope_qk(jnp.asarray(q), jnp.asarray(k), cos, sin,
                           interpret=True)
    np.testing.assert_allclose(np.asarray(qo), np.asarray(
        apply_rope(jnp.asarray(q), cos, sin)), atol=1e-6, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(ko), np.asarray(
        apply_rope(jnp.asarray(k), cos, sin)), atol=1e-6, rtol=1e-6)
