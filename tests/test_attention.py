"""Attention numerics: Pallas kernel (interpret mode on CPU) vs fp32 einsum."""

import jax.numpy as jnp
import numpy as np
import pytest

from worldforge_tpu.ops.attention import attention, sdpa_reference
from worldforge_tpu.ops.flash_attention import flash_attention


def _rand_qkv(rng, b, sq, sk, h, d, dtype=jnp.float32):
    q = jnp.asarray(rng.standard_normal((b, sq, h, d)), dtype)
    k = jnp.asarray(rng.standard_normal((b, sk, h, d)), dtype)
    v = jnp.asarray(rng.standard_normal((b, sk, h, d)), dtype)
    return q, k, v


def test_reference_softmax_rows_sum_to_one(rng):
    q, k, v = _rand_qkv(rng, 1, 8, 8, 2, 16)
    ones = jnp.ones_like(v)
    o = sdpa_reference(q, k, ones)
    np.testing.assert_allclose(np.asarray(o), 1.0, atol=1e-5)


@pytest.mark.parametrize("sq,sk", [(256, 256), (300, 520), (512, 257)])
def test_pallas_matches_reference(rng, sq, sk):
    q, k, v = _rand_qkv(rng, 2, sq, sk, 2, 64)
    ref = sdpa_reference(q, k, v)
    out = flash_attention(q, k, v)  # interpret mode on CPU
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-3, rtol=2e-3)


@pytest.mark.parametrize("kv_lens", [[257, 512], [1, 768]])
def test_pallas_kv_lens_masking(rng, kv_lens):
    b = len(kv_lens)
    q, k, v = _rand_qkv(rng, b, 128, 768, 2, 64)
    lens = jnp.asarray(kv_lens, jnp.int32)
    ref = sdpa_reference(q, k, v, kv_lens=lens)
    out = flash_attention(q, k, v, kv_lens=lens)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-3, rtol=2e-3)


def test_head_dim_128(rng):
    q, k, v = _rand_qkv(rng, 1, 256, 256, 1, 128)
    ref = sdpa_reference(q, k, v)
    out = flash_attention(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-3, rtol=2e-3)


def test_dispatcher_reference_on_cpu(rng):
    q, k, v = _rand_qkv(rng, 1, 64, 64, 2, 32)
    out = attention(q, k, v)  # CPU -> reference path
    ref = sdpa_reference(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-6)


def test_return_lse_matches_manual_softmax_stats(rng):
    """(o, m, l) from return_lse must satisfy the LSE-merge contract:
    o normalized, m the row max of scaled scores, l the softmax mass at m."""
    q, k, v = _rand_qkv(rng, 2, 256, 384, 2, 64)
    scale = 0.125
    out, m, l = flash_attention(q, k, v, scale=scale, return_lse=True)
    s = jnp.einsum("bqhd,bkhd->bhqk", q.astype(jnp.float32),
                   k.astype(jnp.float32)) * scale
    m_ref = jnp.max(s, axis=-1)
    l_ref = jnp.sum(jnp.exp(s - m_ref[..., None]), axis=-1)
    np.testing.assert_allclose(np.asarray(m), np.asarray(m_ref),
                               atol=1e-5, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(l), np.asarray(l_ref),
                               atol=1e-4, rtol=1e-4)
    ref = sdpa_reference(q, k, v, scale=scale)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-3, rtol=2e-3)
