"""Flow-matching train step (worldforge_tpu/training) — loss decreases on
an overfit batch, grads flow through the remat'd scan, and the sigma/
velocity convention matches the inference solvers."""

import jax
import jax.numpy as jnp
import numpy as np
import optax

from worldforge_tpu.models.wan.dit import WanDiTConfig, init_wan_dit
from worldforge_tpu.training import flow_match_loss, make_train_step


def _setup(seed=0):
    cfg = WanDiTConfig.tiny("t2v")
    params = init_wan_dit(jax.random.key(seed), cfg, dtype=jnp.float32)
    rng = np.random.default_rng(seed)
    batch = {
        "x0": jnp.asarray(rng.standard_normal((2, cfg.in_dim, 3, 8, 8)),
                          jnp.float32),
        "context": jnp.asarray(
            rng.standard_normal((2, cfg.text_len, cfg.text_dim)),
            jnp.float32),
    }
    return cfg, params, batch


def test_train_step_decreases_loss():
    cfg, params, batch = _setup()
    opt = optax.adamw(1e-3)
    opt_state = opt.init(params)
    step = jax.jit(make_train_step(cfg, opt))
    losses = []
    for i in range(6):
        # fixed key: same sigma/noise each step -> pure overfit signal
        params, opt_state, loss = step(params, opt_state, batch,
                                       jax.random.key(42))
        losses.append(float(loss))
    assert np.isfinite(losses).all(), losses
    assert all(b < a for a, b in zip(losses, losses[1:])), losses
    assert losses[-1] < losses[0] * 0.97, losses


def test_loss_convention_matches_solver():
    """pred == target velocity (eps - x0) zeroes the loss; and the
    corrupted sample recovers x0 via the solver identity
    x0 = x_sigma - sigma*v (sampling/unipc.flow_pred_x0 convention)."""
    cfg, params, batch = _setup(1)
    x0 = batch["x0"]
    noise = jnp.asarray(
        np.random.default_rng(2).standard_normal(x0.shape), jnp.float32)
    sigma = jnp.asarray([0.3, 0.8], jnp.float32)
    s = sigma[:, None, None, None, None]
    x_sigma = (1 - s) * x0 + s * noise
    v_true = noise - x0
    np.testing.assert_allclose(np.asarray(x_sigma - s * v_true),
                               np.asarray(x0), rtol=1e-5, atol=1e-5)
    # the loss at the true velocity is the model's own squared error —
    # strictly positive for a random-init model, zero if pred == target
    loss = flow_match_loss(params, cfg, x0, noise, sigma, batch["context"],
                           remat=False)
    assert float(loss) > 0.0


def test_train_step_fsdp_sharded():
    """The same step jits over a (dp, fsdp, sp) mesh with FSDP params and
    dp-sharded batch (8 virtual devices via conftest)."""
    from jax.sharding import NamedSharding, PartitionSpec as PS

    from worldforge_tpu.core.mesh import make_mesh
    from worldforge_tpu.parallel.sharding import shard_params_fsdp

    cfg, params, batch = _setup(3)
    mesh = make_mesh(dp=2, fsdp=2, sp=2)
    params = shard_params_fsdp(params, mesh)
    batch = {k: jax.device_put(v, NamedSharding(
        mesh, PS("dp", *([None] * (v.ndim - 1))))) for k, v in batch.items()}
    opt = optax.adamw(1e-3)
    opt_state = opt.init(params)
    step = jax.jit(make_train_step(cfg, opt, mesh=mesh))
    params2, opt_state, loss = step(params, opt_state, batch,
                                    jax.random.key(0))
    assert np.isfinite(float(loss))
    # params actually moved
    d = jax.tree_util.tree_map(
        lambda a, b: float(jnp.abs(a - b).max()), params, params2)
    assert max(jax.tree_util.tree_leaves(d)) > 0.0


def test_train_step_longcat():
    """The same machinery trains the LongCat DiT (per-frame timestep
    adapter): loss finite and decreasing on an overfit batch."""
    from worldforge_tpu.models.longcat.dit import (LongCatDiTConfig,
                                                   init_longcat_dit)
    from worldforge_tpu.training import longcat_forward

    cfg = LongCatDiTConfig.tiny()
    params = init_longcat_dit(jax.random.key(0), cfg, dtype=jnp.float32)
    rng = np.random.default_rng(5)
    batch = {
        "x0": jnp.asarray(rng.standard_normal((1, cfg.in_channels, 3, 4, 4)),
                          jnp.float32),
        "context": jnp.asarray(rng.standard_normal(
            (1, 6, cfg.caption_channels)), jnp.float32),
    }
    opt = optax.adamw(1e-3)
    opt_state = opt.init(params)
    step = jax.jit(make_train_step(cfg, opt, forward_fn=longcat_forward))
    losses = []
    for _ in range(4):
        params, opt_state, loss = step(params, opt_state, batch,
                                       jax.random.key(9))
        losses.append(float(loss))
    assert np.isfinite(losses).all(), losses
    assert losses[-1] < losses[0], losses


def test_lora_train_step():
    """LoRA finetune: base frozen, adapters start at zero effect, loss
    decreases; merged-apply matches merge_lora's math on 2D leaves."""
    from worldforge_tpu.training.lora import (apply_lora, init_lora,
                                              make_lora_train_step)

    cfg, params, batch = _setup(7)
    # the Wan head is ZERO-init (reference convention) — it blocks all
    # upstream gradients unless it trains too. Full finetune updates it;
    # LoRA doesn't target it, so give it real weights (as a loaded
    # checkpoint would).
    h = params["head"]["head"]
    params["head"]["head"] = dict(h, w=0.2 * jax.random.normal(
        jax.random.key(2), h["w"].shape, h["w"].dtype))
    lora = init_lora(jax.random.key(1), params, rank=4)
    assert any(p.endswith("q") for p in lora)          # wan attn targeted
    assert any(p.startswith("blocks/") for p in lora)  # stacked adapters

    # zero-init up => apply is an exact no-op
    merged0 = apply_lora(params, lora)
    for a, b in zip(jax.tree_util.tree_leaves(params),
                    jax.tree_util.tree_leaves(merged0)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    opt = optax.adamw(1e-2)
    opt_state = opt.init(lora)
    step = jax.jit(make_lora_train_step(cfg, opt, params))
    losses = []
    for _ in range(5):
        lora, opt_state, loss = step(lora, opt_state, batch,
                                     jax.random.key(11))
        losses.append(float(loss))
    assert np.isfinite(losses).all(), losses
    assert losses[-1] < losses[0], losses

    # base params untouched by training (only adapters moved)
    merged = apply_lora(params, lora)
    moved = [float(jnp.abs(a - b).max()) for a, b in
             zip(jax.tree_util.tree_leaves(params),
                 jax.tree_util.tree_leaves(merged))]
    assert max(moved) > 0.0


def test_lora_export_roundtrip(tmp_path):
    """save/load identity, and export_reference_lora round-trips through
    the inference loader (convert_longcat_lora -> merge_lora_stacked):
    the merged weights equal apply_lora's on a LongCat model."""
    from worldforge_tpu.io.convert_longcat import (convert_longcat_lora,
                                                   merge_lora_stacked)
    from worldforge_tpu.models.longcat.dit import (LongCatDiTConfig,
                                                   init_longcat_dit)
    from worldforge_tpu.training.lora import (apply_lora,
                                              export_reference_lora,
                                              init_lora, load_lora,
                                              save_lora)

    cfg = LongCatDiTConfig.tiny()
    params = init_longcat_dit(jax.random.key(0), cfg, dtype=jnp.float32)
    lora = init_lora(jax.random.key(1), params, rank=4)
    assert any(p.endswith("qkv") for p in lora)
    # give the zero-init ups real values so the delta is nonzero
    lora = {p: {"down": a["down"],
                "up": 0.1 * jax.random.normal(jax.random.fold_in(
                    jax.random.key(2), i), a["up"].shape, jnp.float32)}
            for i, (p, a) in enumerate(sorted(lora.items()))}

    # disk round-trip
    f = str(tmp_path / "adapters.safetensors")
    save_lora(f, lora)
    back = load_lora(f)
    assert sorted(back) == sorted(lora)
    for p in lora:
        np.testing.assert_array_equal(np.asarray(lora[p]["down"]),
                                      np.asarray(back[p]["down"]))
        np.testing.assert_array_equal(np.asarray(lora[p]["up"]),
                                      np.asarray(back[p]["up"]))

    # reference-format round-trip: stacked blocks only (the loader's
    # domain — the reference's LoRA surface is the DiT blocks)
    scale = 0.7
    blocks_lora = {p: a for p, a in lora.items() if p.startswith("blocks/")}
    sd = export_reference_lora(blocks_lora, scale=scale)
    assert any(k.startswith("blocks.0.attn.qkv.lora_down") for k in sd), \
        sorted(sd)[:4]
    merged_ref = merge_lora_stacked(params, convert_longcat_lora(sd))
    merged_ours = apply_lora(params, blocks_lora, scale=scale)
    flat_a = jax.tree_util.tree_leaves(merged_ref)
    flat_b = jax.tree_util.tree_leaves(merged_ours)
    for a, b in zip(flat_a, flat_b):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-6, atol=2e-6)
