"""int8 dynamic-quant dense path (serving mode)."""

import jax
import jax.numpy as jnp
import numpy as np

from worldforge_tpu.core import params as P
from worldforge_tpu.ops.quant import (dense_q8, is_quantized, quantize_dense,
                                      quantize_tree)


def test_dense_q8_close_to_fp(rng):
    k = jax.random.key(0)
    p = P.dense_init(k, 256, 512)
    x = jnp.asarray(rng.standard_normal((4, 64, 256)), jnp.float32)
    ref = np.asarray(P.dense(p, x))
    got = np.asarray(dense_q8(quantize_dense(p), x))
    rel = np.abs(got - ref).max() / (np.abs(ref).max() + 1e-8)
    assert rel < 0.03, rel


def test_dense_dispatches_on_w8(rng):
    p = P.dense_init(jax.random.key(1), 32, 16)
    q = quantize_dense(p)
    assert is_quantized(q) and not is_quantized(p)
    x = jnp.asarray(rng.standard_normal((2, 32)), jnp.float32)
    np.testing.assert_allclose(np.asarray(P.dense(q, x)),
                               np.asarray(dense_q8(q, x)), rtol=1e-6)


def test_quantize_tree_selective(rng):
    tree = {"qkv": P.dense_init(jax.random.key(0), 64, 192),
            "adaln": P.dense_init(jax.random.key(1), 32, 384),
            "q_norm": {"scale": jnp.ones((32,))}}
    qt = quantize_tree(tree)
    assert is_quantized(qt["qkv"])
    assert not is_quantized(qt["adaln"])          # modulation stays fp
    assert "scale" in qt["q_norm"]                # norms untouched


def test_init_wan_dit_int8_matches_quantize_tree():
    """The layer-by-layer on-device int8 builder (used to fit 14B on a
    16 GB chip) must equal quantize_tree over the bf16 stacked init."""
    from worldforge_tpu.models.wan.dit import (WanDiTConfig, init_wan_dit,
                                               init_wan_dit_int8)

    cfg = WanDiTConfig.tiny()
    key = jax.random.key(7)
    ref = quantize_tree(init_wan_dit(key, cfg, dtype=jnp.float32))
    got = init_wan_dit_int8(key, cfg, dtype=jnp.float32)
    ref_l, treedef_r = jax.tree_util.tree_flatten_with_path(ref)
    got_l, treedef_g = jax.tree_util.tree_flatten_with_path(got)
    assert treedef_r == treedef_g
    for (pr, a), (_, b) in zip(ref_l, got_l):
        name = jax.tree_util.keystr(pr)
        a, b = np.asarray(a), np.asarray(b)
        if a.dtype == np.int8:
            # the builder inits+quantizes inside jit; XLA's x/c -> x*(1/c)
            # rewrites shift values by ~1 ulp, so int8 codes are compared
            # via the DEQUANTIZED weights (the serving-mode contract) and
            # fp leaves with a 1-ulp tolerance rather than raw bits
            continue
        np.testing.assert_allclose(a.astype(np.float64),
                                   b.astype(np.float64), rtol=3e-7,
                                   atol=1e-9, err_msg=name)

    def deq(t):
        return {k: (np.asarray(v["w8"], np.float32)
                    * np.asarray(v["scale"])[..., None, :]
                    if isinstance(v, dict) and "w8" in v else
                    deq(v) if isinstance(v, dict) else v)
                for k, v in t.items()} if isinstance(t, dict) else t

    ra, ga = jax.tree_util.tree_leaves(deq(ref)), \
        jax.tree_util.tree_leaves(deq(got))
    for a, b in zip(ra, ga):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-7)


def test_quantized_wan_layer_forward(rng):
    from worldforge_tpu.core.dtypes import FP32_POLICY
    from worldforge_tpu.models.wan.dit import (WanDiTConfig, init_wan_dit,
                                               wan_dit_forward)

    cfg = WanDiTConfig(model_type="t2v", in_dim=4, out_dim=4, dim=64,
                       ffn_dim=128, num_heads=2, num_layers=2, text_len=8,
                       text_dim=32, freq_dim=16)
    params = init_wan_dit(jax.random.key(0), cfg, dtype=jnp.float32)
    x = jnp.asarray(rng.standard_normal((1, 4, 3, 8, 8)), jnp.float32)
    t = jnp.asarray([500.0], jnp.float32)
    ctx = jnp.asarray(rng.standard_normal((1, 8, 32)), jnp.float32)

    ref = np.asarray(wan_dit_forward(params, cfg, x, t, ctx,
                                     policy=FP32_POLICY))
    qp = quantize_tree(params)
    got = np.asarray(wan_dit_forward(qp, cfg, x, t, ctx, policy=FP32_POLICY))
    rel = np.abs(got - ref).max() / (np.abs(ref).max() + 1e-8)
    assert np.isfinite(got).all()
    assert rel < 0.08, rel    # W8A8 end-to-end drift on a 2-layer model


def test_init_longcat_dit_int8_matches_quantize_tree():
    """Layerwise int8 builder == quantize_tree over the direct init (the
    depth-dependent key schedule makes this non-trivial: the non-block
    params must come from the FULL-depth schedule tail)."""
    from worldforge_tpu.models.longcat.dit import (LongCatDiTConfig,
                                                   init_longcat_dit,
                                                   init_longcat_dit_int8)

    cfg = LongCatDiTConfig.tiny()
    key = jax.random.key(7)
    ref = quantize_tree(init_longcat_dit(key, cfg, dtype=jnp.float32))
    got = init_longcat_dit_int8(key, cfg, dtype=jnp.float32)
    ref_l, treedef_r = jax.tree_util.tree_flatten_with_path(ref)
    got_l, treedef_g = jax.tree_util.tree_flatten_with_path(got)
    assert treedef_r == treedef_g
    for (pr, a), (_, b) in zip(ref_l, got_l):
        a, b = np.asarray(a), np.asarray(b)
        if a.dtype == np.int8:
            continue  # compared dequantized below (see wan test comment)
        np.testing.assert_allclose(a.astype(np.float64),
                                   b.astype(np.float64), rtol=3e-7,
                                   atol=1e-9,
                                   err_msg=jax.tree_util.keystr(pr))

    def deq(t):
        return {k: (np.asarray(v["w8"], np.float32)
                    * np.asarray(v["scale"])[..., None, :]
                    if isinstance(v, dict) and "w8" in v else
                    deq(v) if isinstance(v, dict) else v)
                for k, v in t.items()} if isinstance(t, dict) else t

    for a, b in zip(jax.tree_util.tree_leaves(deq(ref)),
                    jax.tree_util.tree_leaves(deq(got))):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-7)


def test_quantized_longcat_forward(rng):
    """int8 tree must keep the adaLN (t_embedder/adaln/final) islands in
    fp and drift <8% through the full forward at tiny scale."""
    from worldforge_tpu.core.dtypes import FP32_POLICY
    from worldforge_tpu.models.longcat.dit import (LongCatDiTConfig,
                                                   init_longcat_dit,
                                                   longcat_dit_forward)
    from worldforge_tpu.ops.quant import is_quantized

    cfg = LongCatDiTConfig.tiny()
    params = init_longcat_dit(jax.random.key(0), cfg, dtype=jnp.float32)
    qp = quantize_tree(params)
    assert not is_quantized(qp["t_embedder"]["fc1"])
    assert not is_quantized(qp["final"]["linear"])
    assert is_quantized(qp["blocks"]["qkv"]) and \
        is_quantized(qp["blocks"]["w2"])

    x = jnp.asarray(rng.standard_normal((1, cfg.in_channels, 3, 4, 4)),
                    jnp.float32)
    t = jnp.full((1, 3), 500.0, jnp.float32)
    ctx = jnp.asarray(rng.standard_normal((1, 6, cfg.caption_channels)),
                      jnp.float32)
    ref = np.asarray(longcat_dit_forward(params, cfg, x, t, ctx,
                                         policy=FP32_POLICY))
    got = np.asarray(longcat_dit_forward(qp, cfg, x, t, ctx,
                                         policy=FP32_POLICY))
    rel = np.abs(got - ref).max() / (np.abs(ref).max() + 1e-8)
    assert np.isfinite(got).all()
    assert rel < 0.08, rel


def test_quantized_avatar_forward(rng):
    """Avatar DiT (base + audio cross-attn, keys a_q/a_kv/a_proj) through
    quantize_tree: quantized big matmuls, bounded forward drift."""
    from worldforge_tpu.core.dtypes import FP32_POLICY
    from worldforge_tpu.models.longcat.avatar import (AvatarConfig,
                                                      avatar_dit_forward,
                                                      init_avatar_dit)
    from worldforge_tpu.models.longcat.dit import LongCatDiTConfig
    from worldforge_tpu.ops.quant import is_quantized

    base = LongCatDiTConfig(in_channels=4, out_channels=4, hidden_size=64,
                            depth=2, num_heads=2, caption_channels=32,
                            adaln_tembed_dim=32,
                            frequency_embedding_size=16)
    cfg = AvatarConfig(base=base, audio_blocks=2, audio_channels=8,
                       intermediate_dim=16, output_dim=8, context_tokens=4)
    params = init_avatar_dit(jax.random.key(0), cfg, dtype=jnp.float32)
    qp = quantize_tree(params)
    assert is_quantized(qp["blocks"]["a_q"])
    assert is_quantized(qp["blocks"]["qkv"])
    assert not is_quantized(qp["t_embedder"]["fc1"])

    t_frames, hh, ww = 3, 8, 8
    x = jnp.asarray(rng.standard_normal((1, 4, t_frames, hh, ww)),
                    jnp.float32)
    t = jnp.full((1, t_frames), 500.0, jnp.float32)
    ctx = jnp.asarray(rng.standard_normal((1, 6, 32)), jnp.float32)
    n_video = 1 + 4 * (t_frames - 1)   # vae stride 4: 3 latent -> 9 video
    audio = jnp.asarray(rng.standard_normal(
        (1, n_video, cfg.audio_window, cfg.base.depth, cfg.output_dim)),
        jnp.float32)
    ref = np.asarray(avatar_dit_forward(params, cfg, x, t, ctx, audio,
                                        policy=FP32_POLICY))
    got = np.asarray(avatar_dit_forward(qp, cfg, x, t, ctx, audio,
                                        policy=FP32_POLICY))
    rel = np.abs(got - ref).max() / (np.abs(ref).max() + 1e-8)
    assert np.isfinite(got).all()
    assert 0.0 < rel < 0.08, rel


# ------------------------------------------------------------------ int4


def test_int4_pack_roundtrip():
    """Weights already on the int4 grid survive quantize->dequantize
    bit-exactly (incl. the stacked [L,in,out] layout and group scales)."""
    from worldforge_tpu.ops.quant import dequantize_int4, quantize_weight_int4

    rng = np.random.default_rng(0)
    for shape, group in [((64, 48), 16), ((3, 32, 20), 8), ((50, 12), 128)]:
        q = rng.integers(-7, 8, size=shape).astype(np.float32)
        g0 = group if shape[-2] % group == 0 else shape[-2]
        q.reshape(*shape[:-2], shape[-2] // g0, g0, shape[-1])[..., 0, :] = 7
        # ^ every scale group holds a |q|=7 so max|w|/7 recovers s exactly
        s = np.exp(rng.standard_normal(
            (*shape[:-2], shape[-2] // (group if shape[-2] % group == 0
                                        else shape[-2]), shape[-1]))
        ).astype(np.float32)
        g = group if shape[-2] % group == 0 else shape[-2]
        w = (q.reshape(*shape[:-2], shape[-2] // g, g, shape[-1])
             * s[..., :, None, :]).reshape(shape)
        w4, s4 = quantize_weight_int4(jnp.asarray(w), group=group)
        assert w4.dtype == jnp.uint8 and w4.shape[-2] == shape[-2] // 2
        back = np.asarray(dequantize_int4({"w4": w4, "scale4": s4},
                                          dtype=jnp.float32))
        np.testing.assert_allclose(back, w, rtol=2e-6, atol=2e-6)


def test_dense_q4_close_to_fp(rng):
    from worldforge_tpu.ops.quant import dense_q4, quantize_dense_int4

    k = jax.random.key(0)
    p = P.dense_init(k, 256, 512)
    x = jnp.asarray(rng.standard_normal((4, 64, 256)), jnp.float32)
    ref = np.asarray(P.dense(p, x))
    q = quantize_dense_int4(p, group=64)
    got = np.asarray(dense_q4(q, x))
    rel = np.abs(got - ref).max() / (np.abs(ref).max() + 1e-8)
    assert rel < 0.08, rel   # int4 grid is 16x coarser than int8's 3%
    # core dense dispatches on w4
    np.testing.assert_allclose(np.asarray(P.dense(q, x)), got, rtol=1e-6)


def test_quantize_tree_int4_mixed(rng):
    """int4_keys routes matched leaves to W4; the rest stay W8A8 (the
    Wan-14B i2v capacity config: FFN int4 + attention int8 ~= 13.6 GB)."""
    tree = {"qkv": P.dense_init(jax.random.key(0), 64, 192),
            "fc1": P.dense_init(jax.random.key(1), 64, 128),
            "adaln": P.dense_init(jax.random.key(2), 32, 384)}
    qt = quantize_tree(tree, int4_keys=("fc1", "fc2"), int4_group=32)
    assert "w8" in qt["qkv"] and "w4" in qt["fc1"]
    assert not is_quantized(qt["adaln"])
    qt_all = quantize_tree(tree, int4_keys=("*",), int4_group=32)
    assert "w4" in qt_all["qkv"] and "w4" in qt_all["fc1"]


def test_quantized_wan_layer_forward_int4(rng):
    """Full tiny Wan forward in the all-int4 capacity mode: finite,
    bounded drift (coarser than W8A8 but the fp32 islands hold)."""
    from worldforge_tpu.core.dtypes import FP32_POLICY
    from worldforge_tpu.models.wan.dit import (WanDiTConfig, init_wan_dit,
                                               wan_dit_forward)

    cfg = WanDiTConfig(model_type="t2v", in_dim=4, out_dim=4, dim=64,
                       ffn_dim=128, num_heads=2, num_layers=2, text_len=8,
                       text_dim=32, freq_dim=16)
    params = init_wan_dit(jax.random.key(0), cfg, dtype=jnp.float32)
    # the head is zero-init (reference convention) -> the output would be
    # identically 0 for both trees and the gate vacuous; give it weights
    h = params["head"]["head"]
    params["head"]["head"] = dict(h, w=0.2 * jax.random.normal(
        jax.random.key(3), h["w"].shape, h["w"].dtype))
    x = jnp.asarray(rng.standard_normal((1, 4, 3, 8, 8)), jnp.float32)
    t = jnp.asarray([500.0], jnp.float32)
    ctx = jnp.asarray(rng.standard_normal((1, 8, 32)), jnp.float32)

    ref = np.asarray(wan_dit_forward(params, cfg, x, t, ctx,
                                     policy=FP32_POLICY))
    qp = quantize_tree(params, int4_keys=("*",), int4_group=32)
    got = np.asarray(wan_dit_forward(qp, cfg, x, t, ctx, policy=FP32_POLICY))
    rel = np.abs(got - ref).max() / (np.abs(ref).max() + 1e-8)
    assert np.isfinite(got).all()
    assert 0.0 < rel < 0.15, rel


def test_init_wan_dit_w4_matches_quantize_tree():
    """Layerwise mixed w4/int8 builder == quantize_tree(int4_keys) over
    the direct init (dequantized-weight comparison, as the int8 test)."""
    from worldforge_tpu.models.wan.dit import (WanDiTConfig, init_wan_dit,
                                               init_wan_dit_w4)
    from worldforge_tpu.ops.quant import dequantize_int4

    cfg = WanDiTConfig.tiny()
    key = jax.random.key(7)
    ref = quantize_tree(init_wan_dit(key, cfg, dtype=jnp.float32),
                        int4_keys=("fc1", "fc2"), int4_group=32)
    got = init_wan_dit_w4(key, cfg, dtype=jnp.float32, int4_group=32)
    assert "w4" in got["blocks"]["ffn"]["fc1"]
    assert "w8" in got["blocks"]["self_attn"]["q"]

    def deq(t):
        if isinstance(t, dict):
            if "w4" in t:
                return {"w": np.asarray(dequantize_int4(t, jnp.float32))}
            if "w8" in t:
                return {"w": np.asarray(t["w8"], np.float32)
                        * np.asarray(t["scale"])[..., None, :]}
            return {k: deq(v) for k, v in t.items()}
        return t

    for a, b in zip(jax.tree_util.tree_leaves(deq(ref)),
                    jax.tree_util.tree_leaves(deq(got))):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-7)


def test_int4_excludes_conditioning_embeddings():
    """Regression: int4_keys=("fc1","fc2") targets the FFN; the
    text_embedding / img_emb conditioning MLPs (leaf names also fc1/fc2)
    must stay W8A8, not drop to 4-bit (zero capacity win, fidelity cost)."""
    import jax
    from worldforge_tpu.models.wan.dit import WanDiTConfig, init_wan_dit_w4

    cfg = WanDiTConfig.tiny("i2v")
    p = init_wan_dit_w4(jax.random.key(0), cfg, dtype=jnp.float32,
                        int4_group=32)
    assert "w4" in p["blocks"]["ffn"]["fc1"]
    assert "w4" in p["blocks"]["ffn"]["fc2"]
    for mod in ("text_embedding", "img_emb"):
        for leaf in ("fc1", "fc2"):
            node = p[mod][leaf]
            assert "w4" not in node, f"{mod}/{leaf} got int4"
            assert "w8" in node, f"{mod}/{leaf} lost int8"


def test_lora_over_int8_base(rng):
    """LoRA adapters over a quantized base: init_lora finds quantized
    leaves, apply_lora attaches unmerged terms, dense() applies the delta,
    and gradients flow (the module-docstring capability in training/lora)."""
    import jax
    from worldforge_tpu.core import params as P
    from worldforge_tpu.ops.quant import quantize_tree
    from worldforge_tpu.training.lora import apply_lora, init_lora

    key = jax.random.key(3)
    base = {"attn": {"q": P.dense_init(key, 64, 64, dtype=jnp.float32)}}
    qbase = quantize_tree(base, predicate=lambda p: True)
    assert "w8" in qbase["attn"]["q"]

    lora = init_lora(jax.random.key(4), qbase, rank=4, targets=("q",))
    assert list(lora) == ["attn/q"]
    assert lora["attn/q"]["down"].shape == (64, 4)

    x = jax.random.normal(jax.random.key(5), (2, 64), jnp.float32)
    merged = apply_lora(qbase, lora)
    # zero-init up => delta starts at exactly 0
    np.testing.assert_allclose(np.asarray(P.dense(merged["attn"]["q"], x)),
                               np.asarray(P.dense(qbase["attn"]["q"], x)))

    def loss(lo):
        m = apply_lora(qbase, lo)
        return jnp.sum(P.dense(m["attn"]["q"], x) ** 2)

    g = jax.grad(loss)(lora)
    assert float(jnp.abs(g["attn/q"]["up"]).max()) > 0.0
    # and a nonzero adapter changes the output
    lora2 = jax.tree_util.tree_map(lambda a: a + 0.1, lora)
    y2 = P.dense(apply_lora(qbase, lora2)["attn"]["q"], x)
    assert float(jnp.abs(y2 - P.dense(qbase["attn"]["q"], x)).max()) > 1e-4


def test_lora_over_int4_base(rng):
    """Same over the int4 capacity build (packed in-dim must unpack to the
    right adapter shape)."""
    import jax
    from worldforge_tpu.core import params as P
    from worldforge_tpu.ops.quant import quantize_tree
    from worldforge_tpu.training.lora import apply_lora, init_lora

    base = {"ffn": {"fc1": P.dense_init(jax.random.key(6), 64, 96,
                                        dtype=jnp.float32)}}
    qbase = quantize_tree(base, predicate=lambda p: True,
                          int4_keys=("fc1",), int4_group=32)
    assert "w4" in qbase["ffn"]["fc1"]
    lora = init_lora(jax.random.key(7), qbase, rank=4, targets=("fc1",))
    assert lora["ffn/fc1"]["down"].shape == (64, 4)
    assert lora["ffn/fc1"]["up"].shape == (4, 96)
    x = jax.random.normal(jax.random.key(8), (2, 64), jnp.float32)
    merged = apply_lora(qbase, lora)
    np.testing.assert_allclose(np.asarray(P.dense(merged["ffn"]["fc1"], x)),
                               np.asarray(P.dense(qbase["ffn"]["fc1"], x)))


# ------------------------------------------------------------------ int6


def test_int6_pack_roundtrip():
    """Weights already on the int6 grid survive quantize->dequantize
    bit-exactly (incl. the stacked [L,in,out] layout and group scales)."""
    from worldforge_tpu.ops.quant import dequantize_int6, quantize_weight_int6

    rng = np.random.default_rng(0)
    for shape, group in [((64, 48), 16), ((3, 32, 20), 8), ((48, 12), 128)]:
        in_dim = shape[-2]
        g = group if group and (in_dim // 4) % group == 0 else in_dim
        q = rng.integers(-31, 32, size=shape).astype(np.float32)
        q.reshape(*shape[:-2], in_dim // g, g, shape[-1])[..., 0, :] = 31
        # ^ every scale group holds a |q|=31 so max|w|/31 recovers s exactly
        s = np.exp(rng.standard_normal(
            (*shape[:-2], in_dim // g, shape[-1]))).astype(np.float32)
        w = (q.reshape(*shape[:-2], in_dim // g, g, shape[-1])
             * s[..., :, None, :]).reshape(shape)
        w6, s6 = quantize_weight_int6(jnp.asarray(w), group=group)
        assert w6.dtype == jnp.uint8
        assert w6.shape == (*shape[:-2], 3, in_dim // 4, shape[-1])
        back = np.asarray(dequantize_int6({"w6": w6, "scale6": s6},
                                          dtype=jnp.float32))
        np.testing.assert_allclose(back, w, rtol=2e-6, atol=2e-6)


def test_dense_q6_close_to_fp(rng):
    """int6 error sits between int8 (~3%) and int4 (~8%): the 31-level grid
    is ~4.4x finer than int4's 7, so gate at 4%. core dense dispatches."""
    from worldforge_tpu.ops.quant import dense_q6, quantize_dense_int6

    k = jax.random.key(0)
    p = P.dense_init(k, 256, 512)
    x = jnp.asarray(rng.standard_normal((4, 64, 256)), jnp.float32)
    ref = np.asarray(P.dense(p, x))
    q = quantize_dense_int6(p, group=64)
    got = np.asarray(dense_q6(q, x))
    rel = np.abs(got - ref).max() / (np.abs(ref).max() + 1e-8)
    assert rel < 0.04, rel
    np.testing.assert_allclose(np.asarray(P.dense(q, x)), got, rtol=1e-6)
    # and it must be strictly more accurate than the int4 grid on the
    # same weights (the whole point of the 6-bit rung)
    from worldforge_tpu.ops.quant import dense_q4, quantize_dense_int4
    got4 = np.asarray(dense_q4(quantize_dense_int4(p, group=64), x))
    rel4 = np.abs(got4 - ref).max() / (np.abs(ref).max() + 1e-8)
    assert rel < rel4, (rel, rel4)


def test_quantize_tree_int6_mixed(rng):
    """int6_keys routes matched leaves to W6 and takes precedence over
    int4_keys (the drift-bar recipe: int6 FFN + int4 attention)."""
    tree = {"qkv": P.dense_init(jax.random.key(0), 64, 192),
            "fc1": P.dense_init(jax.random.key(1), 64, 128),
            "adaln": P.dense_init(jax.random.key(2), 32, 384)}
    qt = quantize_tree(tree, int4_keys=("*",), int4_group=16,
                       int6_keys=("fc1", "fc2"), int6_group=16)
    assert "w4" in qt["qkv"] and "w6" in qt["fc1"]
    assert is_quantized(qt["fc1"]) and not is_quantized(qt["adaln"])


def test_init_wan_dit_w4_int6_ffn():
    """The layerwise capacity builder with int6_keys: FFN at 6-bit, the
    attention projections at int4, conditioning embeddings still W8A8."""
    from worldforge_tpu.models.wan.dit import WanDiTConfig, init_wan_dit_w4

    cfg = WanDiTConfig.tiny("i2v")
    p = init_wan_dit_w4(jax.random.key(0), cfg, dtype=jnp.float32,
                        int4_keys=("*",), int4_group=16,
                        int6_keys=("fc1", "fc2"), int6_group=16)
    assert "w6" in p["blocks"]["ffn"]["fc1"]
    assert "w4" in p["blocks"]["self_attn"]["q"]
    assert "w8" in p["text_embedding"]["fc1"]


def test_lora_over_int6_base(rng):
    """LoRA shape derivation over the int6 plane-packed layout."""
    import jax
    from worldforge_tpu.core import params as P
    from worldforge_tpu.ops.quant import quantize_tree
    from worldforge_tpu.training.lora import apply_lora, init_lora

    base = {"ffn": {"fc1": P.dense_init(jax.random.key(6), 64, 96,
                                        dtype=jnp.float32)}}
    qbase = quantize_tree(base, predicate=lambda p: True,
                          int6_keys=("fc1",), int6_group=16)
    assert "w6" in qbase["ffn"]["fc1"]
    lora = init_lora(jax.random.key(7), qbase, rank=4, targets=("fc1",))
    assert lora["ffn/fc1"]["down"].shape == (64, 4)
    assert lora["ffn/fc1"]["up"].shape == (4, 96)
    x = jax.random.normal(jax.random.key(8), (2, 64), jnp.float32)
    merged = apply_lora(qbase, lora)
    np.testing.assert_allclose(np.asarray(P.dense(merged["ffn"]["fc1"], x)),
                               np.asarray(P.dense(qbase["ffn"]["fc1"], x)))
