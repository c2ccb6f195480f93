"""Layer-streaming executor: correctness vs in-memory scan."""

import jax
import jax.numpy as jnp
import numpy as np

from worldforge_tpu.core import params as P
from worldforge_tpu.runtime.streaming import (StreamingExecutor,
                                              stream_layers, to_host_blocks)


def _make_blocks(key, n_layers, dim):
    layers = [P.dense_init(k, dim, dim)
              for k in P.split_keys(key, n_layers)]
    return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *layers)


def test_streaming_matches_scan(rng):
    n, dim = 5, 16
    blocks = _make_blocks(jax.random.key(0), n, dim)
    x = jnp.asarray(rng.standard_normal((2, dim)), jnp.float32)

    def layer(p, h):
        return jax.nn.tanh(P.dense(p, h))

    ref, _ = jax.lax.scan(lambda h, p: (layer(p, h), None), x, blocks)
    host = to_host_blocks(blocks)
    for prefetch in (0, 1, 2, 7):
        got = stream_layers(host, n, layer, x, prefetch=prefetch)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=1e-6)


def test_streaming_wan_layer_equivalence(rng):
    """Streamed Wan DiT layers == the scan-based model forward."""
    from worldforge_tpu.core.dtypes import FP32_POLICY
    from worldforge_tpu.models.wan.dit import (WanDiTConfig,
                                               init_wan_dit_layer,
                                               wan_dit_layer_forward)
    from worldforge_tpu.ops.rope import rope_cos_sin

    cfg = WanDiTConfig(model_type="t2v", in_dim=4, out_dim=4, dim=64,
                       ffn_dim=128, num_heads=2, num_layers=3, text_len=8,
                       text_dim=32, freq_dim=16)
    layers = [init_wan_dit_layer(k, cfg, dtype=jnp.float32)
              for k in P.split_keys(jax.random.key(0), 3)]
    blocks = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *layers)

    f, gh, gw = 3, 4, 4
    x = jnp.asarray(rng.standard_normal((1, f * gh * gw, cfg.dim)),
                    jnp.float32)
    e = jnp.asarray(rng.standard_normal((1, 6, cfg.dim)), jnp.float32)
    ctx = jnp.asarray(rng.standard_normal((1, 8, cfg.dim)), jnp.float32)
    cos, sin = rope_cos_sin(f, gh, gw, cfg.dim // cfg.num_heads)

    def layer_fn(p, h):
        return wan_dit_layer_forward(p, cfg, h, e, ctx, cos, sin,
                                     policy=FP32_POLICY)

    ref = x
    for p in layers:
        ref = layer_fn(p, ref)

    ex = StreamingExecutor(to_host_blocks(blocks), 3, layer_fn, prefetch=1)
    got = ex(x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=2e-5,
                               atol=2e-5)
