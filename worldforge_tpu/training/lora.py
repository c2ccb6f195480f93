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
import numpy as np

from worldforge_tpu.training.step import _wan_forward, flow_match_loss

LORA_TARGETS = ("q", "k", "v", "o", "fc1", "fc2",           # wan
                "qkv", "attn_proj", "x_q", "x_kv", "x_proj",  # longcat
                "w1", "w2", "w3")


def init_lora(key, params, *, rank: int = 16, targets=LORA_TARGETS,
              dtype=jnp.float32) -> Dict[str, dict]:
    """Create zero-effect adapters for every matching dense leaf.
    Stacked scan weights [L, in, out] get per-layer adapters."""
    adapters: Dict[str, dict] = {}

    def leaf_shape(node):
        """(in, out) or (L, in, out) for dense OR quantized leaves."""
        if "w" in node and not isinstance(node["w"], dict) \
                and getattr(node["w"], "ndim", 0) in (2, 3):
            return tuple(node["w"].shape)
        if "w8" in node and getattr(node["w8"], "ndim", 0) in (2, 3):
            return tuple(node["w8"].shape)
        if "w4" in node and getattr(node["w4"], "ndim", 0) in (2, 3):
            s = node["w4"].shape  # packed 2-per-byte on the in-dim
            return s[:-2] + (s[-2] * 2, s[-1])
        if "w6" in node and getattr(node["w6"], "ndim", 0) in (3, 4):
            s = node["w6"].shape  # [.., 3 planes, in/4, out]
            return s[:-3] + (s[-2] * 4, s[-1])
        return None

    def walk(node, path):
        if isinstance(node, dict):
            shape = leaf_shape(node)
            if shape is not None and path.split("/")[-1] in targets:
                k = jax.random.fold_in(key, len(adapters))
                if len(shape) == 2:
                    dshape, ushape = (shape[0], rank), (rank, shape[1])
                else:
                    dshape = (shape[0], shape[1], rank)
                    ushape = (shape[0], rank, shape[2])
                # down ~ N(0, 1/fan_in) (kaiming-style, the PEFT/kohya
                # convention): keeps x @ down at unit scale so the first
                # adamw steps on `up` see well-scaled gradients; 1/rank
                # would make the rank-16 activations ~sqrt(in/rank) big
                fan_in = shape[-2]
                adapters[path] = {
                    "down": (jax.random.normal(k, dshape, dtype)
                             / jnp.sqrt(jnp.float32(fan_in)).astype(dtype)),
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
                if "w" not in node:
                    # int8/int4 frozen base: leave the quantized weight in
                    # place and attach unmerged low-rank terms; core.params
                    # dense() adds ((x @ down) @ up) * scale at matmul time
                    return dict(node, lora_down=a["down"], lora_up=a["up"],
                                lora_scale=jnp.float32(scale))
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


# ------------------------------------------------- persistence / interop

# inverse of io/convert_longcat.py::_TORCH_TO_TREE — exported LongCat
# adapters use the reference's module names (lora_utils.py:15-197) so the
# reference repo (and our own convert_longcat_lora -> merge_lora_stacked
# path) can load them directly.
_TREE_TO_TORCH = {
    "qkv": "attn.qkv", "attn_proj": "attn.proj",
    "x_q": "cross_attn.q_linear", "x_kv": "cross_attn.kv_linear",
    "x_proj": "cross_attn.proj", "w1": "ffn.w1", "w2": "ffn.w2",
    "w3": "ffn.w3", "adaln": "adaLN_modulation.1",
}


def save_lora(path: str, lora: Dict[str, dict]) -> None:
    """Write adapters to one safetensors file (keys '<path>::down/up')."""
    from safetensors.numpy import save_file
    flat = {}
    for p, a in lora.items():
        flat[f"{p}::down"] = np.asarray(a["down"])
        flat[f"{p}::up"] = np.asarray(a["up"])
    save_file(flat, path)


def load_lora(path: str) -> Dict[str, dict]:
    from safetensors.numpy import load_file
    lora: Dict[str, dict] = {}
    for k, v in load_file(path).items():
        p, leaf = k.rsplit("::", 1)
        lora.setdefault(p, {})[leaf] = jnp.asarray(v)
    return lora


def export_reference_lora(lora: Dict[str, dict], *, scale: float = 1.0
                          ) -> Dict[str, np.ndarray]:
    """Trained adapters -> the reference's lora_utils state-dict layout
    (per-layer '<module>.lora_down.weight' [r,in] / '.lora_up.weight'
    [out,r] / '.alpha'). Stacked [L,...] adapters unroll to 'blocks.<i>.*';
    alpha is set to rank*scale so the reference merge (multiplier *
    alpha/rank * up@down) reproduces apply_lora(..., scale) exactly.
    LongCat tree names map back to the reference module names; other
    targets keep their '/'->'.' tree path."""
    sd: Dict[str, np.ndarray] = {}

    def emit(base, down, up):
        rank = down.shape[1]
        sd[f"{base}.lora_down.weight"] = np.ascontiguousarray(
            np.asarray(down, np.float32).T)
        sd[f"{base}.lora_up.weight"] = np.ascontiguousarray(
            np.asarray(up, np.float32).T)
        sd[f"{base}.alpha"] = np.asarray(rank * scale, np.float32)

    for p, a in lora.items():
        parts = p.split("/")
        leaf = _TREE_TO_TORCH.get(parts[-1], parts[-1])
        down, up = np.asarray(a["down"]), np.asarray(a["up"])
        if down.ndim == 3:  # stacked over the scanned layer axis
            prefix = ".".join(parts[:-1]) or "blocks"
            for i in range(down.shape[0]):
                emit(f"{prefix}.{i}.{leaf}", down[i], up[i])
        else:
            emit(".".join(parts[:-1] + [leaf]) if len(parts) > 1 else leaf,
                 down, up)
    return sd
