"""2D spatial context parallelism tests on the virtual mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from worldforge_tpu.ops.attention import sdpa_reference
from worldforge_tpu.parallel.cp2d import (get_optimal_split, make_mesh_2d,
                                          split_cp_2d, gather_cp_2d,
                                          ulysses_attention_2d)


def test_optimal_split():
    assert get_optimal_split(4) == (2, 2)
    assert get_optimal_split(8) == (2, 4)
    assert get_optimal_split(6) == (2, 3)
    assert get_optimal_split(7) == (1, 7)
    assert get_optimal_split(1) == (1, 1)


def test_split_gather_roundtrip(rng):
    mesh = make_mesh_2d(dp=1, fsdp=1, sp_h=2, sp_w=4)
    x = jnp.asarray(rng.standard_normal((1, 2, 4, 8, 16)), jnp.float32)
    with mesh:
        f = jax.jit(lambda x: gather_cp_2d(split_cp_2d(x, mesh), mesh))
        out = f(x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(x), atol=1e-7)


@pytest.mark.parametrize("sph,spw", [(2, 2), (2, 4)])
def test_ulysses_2d_matches_reference(rng, sph, spw):
    mesh = make_mesh_2d(dp=1, fsdp=1, sp_h=sph, sp_w=spw)
    b, t, hh, ww, nh, d = 1, 2, 4, 8, 8, 16
    q = jnp.asarray(rng.standard_normal((b, t, hh, ww, nh, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal(q.shape), jnp.float32)
    v = jnp.asarray(rng.standard_normal(q.shape), jnp.float32)
    flat = lambda x: x.reshape(b, t * hh * ww, nh, d)
    ref = sdpa_reference(flat(q), flat(k), flat(v)).reshape(q.shape)
    with mesh:
        shd = NamedSharding(mesh, P("dp", None, "sp_h", "sp_w", None, None))
        qs, ks, vs = (jax.device_put(x, shd) for x in (q, k, v))
        out = jax.jit(lambda a, b_, c: ulysses_attention_2d(
            a, b_, c, mesh=mesh))(qs, ks, vs)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-5, rtol=1e-5)


def test_wan_forward_cp2d_matches_single_device(rng):
    """Full product model over the 2D (sp_h x sp_w) mesh == single-device
    output. Exercises the grid-layout residual stream (the carry stays
    [B, F, H', W', D] sharded between blocks — the round-3 fix for the
    involuntary flat<->grid reshard per block), grid RoPE, the shard-local
    cross-attention (incl. the i2v CLIP branch), and the sharded head."""
    from worldforge_tpu.models.wan.dit import (WanDiTConfig, init_wan_dit,
                                               wan_dit_forward)

    cfg = WanDiTConfig(model_type="i2v", in_dim=8, out_dim=4, dim=64,
                       ffn_dim=128, num_heads=4, num_layers=2, text_len=16,
                       text_dim=32, freq_dim=16, clip_dim=64)
    params = init_wan_dit(jax.random.key(0), cfg, dtype=jnp.float32)
    b, f, hh, ww = 1, 3, 8, 8
    x = jnp.asarray(rng.standard_normal((b, 4, f, hh, ww)), jnp.float32)
    y = jnp.asarray(rng.standard_normal((b, 4, f, hh, ww)), jnp.float32)
    t = jnp.asarray([500.0], jnp.float32)
    ctx = jnp.asarray(rng.standard_normal((b, cfg.text_len, cfg.text_dim)),
                      jnp.float32)
    clip_fea = jnp.asarray(rng.standard_normal((b, 257, cfg.clip_dim)),
                           jnp.float32)

    ref = wan_dit_forward(params, cfg, x, t, ctx, clip_fea=clip_fea, y=y)
    mesh = make_mesh_2d(dp=1, fsdp=2, sp_h=2, sp_w=2)
    with mesh:
        out = jax.jit(lambda p, x, y: wan_dit_forward(
            p, cfg, x, t, ctx, clip_fea=clip_fea, y=y, mesh=mesh))(
                params, x, y)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-4, rtol=2e-4)


def test_rope_cp_offsets_match_full_table():
    """Per-shard RoPE via h/w offsets == slices of the full table (the
    reference shards precomputed freqs, rope_3d.py:91-96)."""
    from worldforge_tpu.ops.rope import rope_cos_sin
    f, h, w, d = 2, 8, 8, 32
    cos_full, _ = rope_cos_sin(f, h, w, d)
    full = np.asarray(cos_full).reshape(f, h, w, d // 2)
    # shard (sp_h=2, sp_w=2): shard (1,0) owns rows 4:8, cols 0:4
    cos_sh, _ = rope_cos_sin(f, 4, 4, d, h_offset=4, w_offset=0)
    np.testing.assert_array_equal(
        np.asarray(cos_sh).reshape(f, 4, 4, d // 2), full[:, 4:8, 0:4])
