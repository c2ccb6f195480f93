"""Torch checkpoint reading helpers (host-side; torch CPU is in-image).

Reads .safetensors (preferred) or .pth/.pt state dicts into numpy, with
sharded-index support (model.safetensors.index.json).
"""

from __future__ import annotations

import json
import os
from typing import Dict, Iterable, Optional

import numpy as np


def _to_numpy(t) -> np.ndarray:
    import torch
    if t.dtype == torch.bfloat16:
        return t.float().numpy().astype(np.float32)
    return t.numpy()


def load_state_dict(path: str) -> Dict[str, np.ndarray]:
    """Load a single file or a sharded-safetensors directory into
    {name: np.ndarray}."""
    if os.path.isdir(path):
        idx = os.path.join(path, "model.safetensors.index.json")
        if os.path.exists(idx):
            with open(idx) as f:
                index = json.load(f)
            shards = sorted(set(index["weight_map"].values()))
            out: Dict[str, np.ndarray] = {}
            for shard in shards:
                out.update(load_state_dict(os.path.join(path, shard)))
            return out
        files = [f for f in sorted(os.listdir(path))
                 if f.endswith((".safetensors", ".pth", ".pt", ".bin"))]
        out = {}
        for f in files:
            out.update(load_state_dict(os.path.join(path, f)))
        return out

    if path.endswith(".safetensors"):
        from safetensors import safe_open
        out = {}
        with safe_open(path, framework="pt", device="cpu") as f:
            for name in f.keys():
                out[name] = _to_numpy(f.get_tensor(name))
        return out

    import torch
    sd = torch.load(path, map_location="cpu", weights_only=True)
    if isinstance(sd, dict) and "state_dict" in sd:
        sd = sd["state_dict"]
    return {k: _to_numpy(v) for k, v in sd.items()}


def linear_w(sd: Dict[str, np.ndarray], name: str) -> np.ndarray:
    """torch Linear weight [out, in] -> our dense kernel [in, out]."""
    return np.ascontiguousarray(sd[name].T)


def conv3d_to_patch_dense(w: np.ndarray) -> np.ndarray:
    """Conv3d kernel [out, in, kt, kh, kw] with kernel==stride ->
    dense [kt*kh*kw*in, out] matching our patchify feature order
    (pt, ph, pw, c)."""
    out_c = w.shape[0]
    w = np.transpose(w, (2, 3, 4, 1, 0))  # kt kh kw in out
    return np.ascontiguousarray(w.reshape(-1, out_c))


def conv_to_hwio(w: np.ndarray) -> np.ndarray:
    """Conv2d/3d [out, in, *k] -> [*k, in, out]."""
    nd = w.ndim - 2
    perm = tuple(range(2, 2 + nd)) + (1, 0)
    return np.ascontiguousarray(np.transpose(w, perm))


def deconv_to_hwio(w: np.ndarray) -> np.ndarray:
    """ConvTranspose2d [in, out, kh, kw] -> HWIO [kh, kw, in, out],
    spatially FLIPPED: jax.lax.conv_transpose(transpose_kernel=False) is a
    fractionally-strided forward conv, whereas torch's ConvTranspose2d is
    the conv gradient — equivalent only with the kernel mirrored
    (verified against torch; caught by tests/test_heads_parity.py)."""
    return np.ascontiguousarray(np.transpose(w, (2, 3, 0, 1))[::-1, ::-1])


class StrictStateDict:
    """Wraps a state dict for converters: tracks consumed keys and turns a
    missing key into a loud layout-mismatch error naming the offending key
    and the frozen manifest to check, instead of a bare KeyError deep in a
    helper at real-weight-load time. ``context`` is a short description of
    the expected layout (e.g. which tests/fixtures manifest froze it)."""

    def __init__(self, sd, context: str = ""):
        self.sd = sd
        self.context = context
        self.used = set()

    def __getitem__(self, k):
        if k not in self.sd:
            raise ValueError(
                f"checkpoint layout mismatch: missing key '{k}'"
                + (f" ({self.context})" if self.context else ""))
        self.used.add(k)
        return self.sd[k]

    def __contains__(self, k):
        return k in self.sd
