"""LoRA finetuning: train low-rank adapters with the base weights frozen.

Complements the inference-side LoRA machinery (models/longcat/dit.py
merge_lora / io/convert_longcat.py merge_lora_stacked load the reference's
released adapters); here adapters are TRAINED — gradients flow only
through {down, up}, the base pytree stays untouched (and can be int8/bf16
while adapters train in fp32). Adapter format matches merge_lora:
path -> {down [in,r] | [L,in,r], up [r,out] | [L,r,out]} with up
zero-initialized (delta starts at exactly 0).
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp

from worldforge_tpu.training.step import _wan_forward, flow_match_loss

LORA_TARGETS = ("q", "k", "v", "o", "fc1", "fc2",           # wan
                "qkv", "attn_proj", "x_q", "x_kv", "x_proj",  # longcat
                "w1", "w2", "w3")


def init_lora(key, params, *, rank: int = 16, targets=LORA_TARGETS,
              dtype=jnp.float32) -> Dict[str, dict]:
    """Create zero-effect adapters for every matching dense leaf.
    Stacked scan weights [L, in, out] get per-layer adapters."""
    adapters: Dict[str, dict] = {}

    def walk(node, path):
        if isinstance(node, dict):
            if ("w" in node and not isinstance(node["w"], dict)
                    and getattr(node["w"], "ndim", 0) in (2, 3)
                    and path.split("/")[-1] in targets):
                w = node["w"]
                k = jax.random.fold_in(key, len(adapters))
                if w.ndim == 2:
                    dshape, ushape = (w.shape[0], rank), (rank, w.shape[1])
                else:
                    dshape = (w.shape[0], w.shape[1], rank)
                    ushape = (w.shape[0], rank, w.shape[2])
                adapters[path] = {
                    "down": (jax.random.normal(k, dshape, dtype)
                             / jnp.sqrt(jnp.float32(rank)).astype(dtype)),
                    "up": jnp.zeros(ushape, dtype),
                }
                return
            for kk, v in node.items():
                walk(v, f"{path}/{kk}" if path else kk)

    walk(params, "")
    return adapters


def apply_lora(params, lora: Dict[str, dict], scale: float = 1.0):
    """Functional, trace-friendly merge: w' = w + scale * down @ up
    (batched over the stacked layer axis when present). Returns a new
    tree; base leaves are shared, only targeted dicts are rebuilt."""
    def walk(node, path):
        if isinstance(node, dict):
            if path in lora:
                a = lora[path]
                delta = jnp.matmul(a["down"].astype(jnp.float32),
                                   a["up"].astype(jnp.float32)) * scale
                w = node["w"].astype(jnp.float32) + delta
                return dict(node, w=w.astype(node["w"].dtype))
            return {k: walk(v, f"{path}/{k}" if path else k)
                    for k, v in node.items()}
        return node

    return walk(params, "")


def make_lora_train_step(cfg, optimizer, base_params, *, mesh=None,
                         remat: bool = True, scale: float = 1.0,
                         forward_fn=_wan_forward):
    """Returns `step(lora, opt_state, batch, key) -> (lora, opt_state,
    loss)`; only the adapters update. base_params is closed over
    (donate/shard it once)."""

    def loss_fn(lora, x0, noise, sigma, context, y, clip_fea):
        merged = apply_lora(base_params, lora, scale=scale)
        return flow_match_loss(merged, cfg, x0, noise, sigma, context,
                               y=y, clip_fea=clip_fea, mesh=mesh,
                               remat=remat, forward_fn=forward_fn)

    def step(lora, opt_state, batch, key):
        b = batch["x0"].shape[0]
        k_sig, k_eps = jax.random.split(key)
        sigma = jax.random.uniform(k_sig, (b,), jnp.float32,
                                   minval=1e-3, maxval=1.0)
        noise = jax.random.normal(k_eps, batch["x0"].shape, jnp.float32)
        loss, grads = jax.value_and_grad(loss_fn)(
            lora, batch["x0"], noise, sigma, batch["context"],
            batch.get("y"), batch.get("clip_fea"))
        updates, opt_state = optimizer.update(grads, opt_state, lora)
        import optax
        lora = optax.apply_updates(lora, updates)
        return lora, opt_state, loss

    return step
