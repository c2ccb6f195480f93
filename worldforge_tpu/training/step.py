"""Flow-matching training step for the Wan DiT (TPU-native).

No reference counterpart — WorldForge is inference-only (SURVEY.md §5:
"No training checkpoints (no training)"); this exists so the framework is
a complete production stack: the SAME scan-over-layers forward
(models/wan/dit.py) runs under jax.grad with rematerialization
(jax.checkpoint around each scan body), optimizer state inherits the
weights' FSDP shardings, and the whole update jits over any
(dp, fsdp, sp) mesh — exercised by `parallel/dryrun.py`'s train phase on
virtual devices.

Loss convention matches the inference solvers (sampling/unipc.py
add_noise): x_sigma = (1-sigma) x0 + sigma eps, and the model predicts the
flow velocity v = eps - x0 (so pred_x0 = x_sigma - sigma*v, the identity
`flow_pred_x0` uses). Timesteps feed the DiT as sigma*1000 (the Wan
flow-sigma timestep scale).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def _wan_forward(params, cfg, x_sigma, t, context, *, y=None, clip_fea=None,
                 mesh=None, remat=True):
    from worldforge_tpu.models.wan.dit import wan_dit_forward
    return wan_dit_forward(params, cfg, x_sigma, t, context, y=y,
                           clip_fea=clip_fea, remat=remat, mesh=mesh)


def longcat_forward(params, cfg, x_sigma, t, context, *, y=None,
                    clip_fea=None, mesh=None, remat=True):
    """LongCat adapter: per-frame timestep vector (blocks.py:166-205)."""
    from worldforge_tpu.models.longcat.dit import longcat_dit_forward
    tv = jnp.broadcast_to(t[:, None], (t.shape[0], x_sigma.shape[2]))
    return longcat_dit_forward(params, cfg, x_sigma, tv, context,
                               mesh=mesh, remat=remat)


def flow_match_loss(params, cfg, x0, noise, sigma, context, *, y=None,
                    clip_fea=None, mesh=None, remat: bool = True,
                    forward_fn=_wan_forward):
    """Per-batch flow-matching MSE. x0/noise: [B, C, F, H, W]; sigma: [B]
    in (0, 1]; context: [B, text_len, text_dim]."""
    s = sigma[:, None, None, None, None]
    x_sigma = (1.0 - s) * x0 + s * noise
    t = sigma * 1000.0
    v = forward_fn(params, cfg, x_sigma, t, context, y=y,
                   clip_fea=clip_fea, remat=remat, mesh=mesh)
    target = (noise - x0).astype(jnp.float32)
    return jnp.mean(jnp.square(v - target))


def make_train_step(cfg, optimizer, *, mesh=None, remat: bool = True,
                    forward_fn=_wan_forward):
    """Returns a jittable `step(params, opt_state, batch, key) ->
    (params, opt_state, loss)`. batch: dict with "x0" [B,C,F,H,W] and
    "context" [B,L,D] (plus optional "y"/"clip_fea" for i2v). sigma is
    sampled uniform (0,1] per sample from `key`.

    Sharding: params/opt_state keep whatever placement they carry (FSDP
    via parallel/sharding.py); batch shards on the mesh's dp axis; grads
    psum automatically under GSPMD."""

    def step(params, opt_state, batch, key):
        b = batch["x0"].shape[0]
        k_sig, k_eps = jax.random.split(key)
        sigma = jax.random.uniform(k_sig, (b,), jnp.float32,
                                   minval=1e-3, maxval=1.0)
        noise = jax.random.normal(k_eps, batch["x0"].shape, jnp.float32)
        loss, grads = jax.value_and_grad(flow_match_loss)(
            params, cfg, batch["x0"], noise, sigma, batch["context"],
            y=batch.get("y"), clip_fea=batch.get("clip_fea"), mesh=mesh,
            remat=remat, forward_fn=forward_fn)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        import optax
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    return step
