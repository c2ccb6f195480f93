"""core.params dense numerics — mixed bf16-weight / fp32-activation path.

The serving builds store per-block adaLN weights bf16 (ops/quant.py capacity
lever) while the activation stream stays fp32 per the dtype policy. The
reference runs those layers as true fp32 Linears under autocast(float32)
(/root/reference/longcat_for_worldforge/longcat_video/modules/
longcat_video_dit.py:82-85, blocks.py FinalLayer_FP32) — so the only
deviation we accept is bf16 WEIGHT rounding; the fp32 INPUT must not be
truncated (round-3 advisor finding). dense() preserves it with a two-term
bf16 activation split; these tests bound the error of that path.
"""

import jax
import jax.numpy as jnp
import numpy as np

from worldforge_tpu.core import params as P


def _rel(a, b):
    return np.abs(a - b).max() / (np.abs(b).max() + 1e-12)


def test_dense_bf16_weights_fp32_inputs(rng):
    """bf16-stored weights + fp32 inputs under compute_dtype=fp32 must be
    fp32-input accurate (vs x @ w.astype(f32)), NOT bf16-truncation
    accurate. The two-term split's residual is O(2^-16) relative; plain
    truncation sits at O(2^-8) ~ 4e-3 and must fail the bound."""
    k = jax.random.key(0)
    p = P.dense_init(k, 512, 256, dtype=jnp.bfloat16)
    # adversarial inputs: magnitudes that lose real mantissa bits in bf16
    x = jnp.asarray(rng.standard_normal((4, 96, 512)) * 3.0
                    + rng.standard_normal((4, 96, 512)) * 1e-3,
                    jnp.float32)

    exact = np.asarray(x, np.float64) @ np.asarray(
        p["w"].astype(jnp.float32), np.float64) + np.asarray(p["b"], np.float64)
    got = np.asarray(P.dense(p, x, compute_dtype=jnp.float32), np.float64)
    trunc = np.asarray(
        jax.lax.dot_general(x.astype(jnp.bfloat16), p["w"],
                            (((2,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
        + p["b"].astype(jnp.float32), np.float64)

    assert got.dtype == np.float64 and got.shape == exact.shape
    err_split = _rel(got, exact)
    err_trunc = _rel(trunc, exact)
    # split path: fp32-input accurate (second-order bf16 residual)
    assert err_split < 3e-5, err_split
    # sanity: the old truncation really was ~100x worse on the same data
    assert err_trunc > 10 * err_split, (err_trunc, err_split)


def test_dense_bf16_weights_bf16_inputs_single_dot(rng):
    """bf16 inputs take the single-dot path (no residual term to recover)
    and still accumulate fp32."""
    p = P.dense_init(jax.random.key(1), 128, 64, dtype=jnp.bfloat16)
    x = jnp.asarray(rng.standard_normal((8, 128)), jnp.bfloat16)
    got = P.dense(p, x, compute_dtype=jnp.float32)
    assert got.dtype == jnp.float32
    ref = (jax.lax.dot_general(x, p["w"], (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)
           + p["b"].astype(jnp.float32))
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-6)


def test_quantize_tree_adaln_downcast_gating():
    """Per-block adaln downcasts to bf16; the non-scanned `final` island
    stays fp32 (reference FinalLayer_FP32); downcast_adaln=False leaves
    everything untouched even when the predicate selects nothing."""
    from worldforge_tpu.ops.quant import quantize_tree

    k = jax.random.key(2)
    tree = {
        "blocks": {"adaln": P.dense_init(k, 32, 192, dtype=jnp.float32)},
        "final": {"adaln": P.dense_init(k, 32, 64, dtype=jnp.float32),
                  "linear": P.dense_init(k, 32, 16, dtype=jnp.float32)},
    }
    qt = quantize_tree(tree)
    assert qt["blocks"]["adaln"]["w"].dtype == jnp.bfloat16
    assert qt["final"]["adaln"]["w"].dtype == jnp.float32
    assert qt["final"]["linear"]["w"].dtype == jnp.float32

    # a predicate selecting nothing + downcast off must be a no-op
    qt2 = quantize_tree(tree, predicate=lambda p: False,
                        downcast_adaln=False)
    for path in (("blocks", "adaln"), ("final", "adaln")):
        assert qt2[path[0]][path[1]]["w"].dtype == jnp.float32
