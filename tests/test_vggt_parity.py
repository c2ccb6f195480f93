"""VGGT aggregator parity vs the reference torch Aggregator (vit_small
backbone at tiny image size)."""

import jax.numpy as jnp
import numpy as np
import pytest

from worldforge_tpu.io.convert_vggt import convert_vggt_aggregator
from worldforge_tpu.models.vggt.model import (VGGTConfig,
                                              vggt_aggregator_forward)
from worldforge_tpu.models.vggt.vit import DinoViTConfig

torch = pytest.importorskip("torch")


def _import_aggregator():
    import importlib
    import sys
    import types

    base = "/root/reference/vggt"
    if base not in sys.path:
        sys.path.insert(0, base)
    # stub only the parent packages whose __init__ we must skip; let
    # vggt.layers import for real (aggregator needs its exports)
    for name, path in (("vggt", f"{base}/vggt"),
                       ("vggt.models", f"{base}/vggt/models")):
        if name not in sys.modules:
            pkg = types.ModuleType(name)
            pkg.__path__ = [path]
            sys.modules[name] = pkg
    return importlib.import_module("vggt.models.aggregator")


def test_aggregator_parity(rng):
    mod = _import_aggregator()
    torch.manual_seed(0)
    ref = mod.Aggregator(img_size=28, patch_size=14, embed_dim=384,
                         depth=2, num_heads=6, mlp_ratio=4.0,
                         num_register_tokens=4,
                         patch_embed="dinov2_vits14_reg").eval()

    cfg = VGGTConfig(img_size=28, patch_size=14, embed_dim=384, depth=2,
                     num_heads=6, num_register_tokens=4,
                     intermediate_layer_idx=(0, 1),
                     backbone=DinoViTConfig(img_size=28, patch_size=14,
                                            embed_dim=384, depth=12,
                                            num_heads=6,
                                            num_register_tokens=4))
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    params = convert_vggt_aggregator(sd, cfg, prefix="")

    imgs = rng.uniform(0, 1, (1, 2, 3, 28, 28)).astype(np.float32)
    with torch.no_grad():
        outs, patch_start = ref(torch.tensor(imgs))
    assert patch_start == cfg.patch_start_idx

    taps = vggt_aggregator_forward(params, cfg, jnp.asarray(imgs),
                                   taps=(0, 1))
    for i in (0, 1):
        r = outs[i].numpy()
        g = np.asarray(taps[i])
        assert g.shape == r.shape
        rel = np.abs(g - r).max() / (np.abs(r).max() + 1e-8)
        assert rel < 1e-4, (i, rel)
