"""VGGT camera + DPT head torch-oracle parity at tiny scale."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from worldforge_tpu.io.convert_vggt import _convert_dpt, _dense, _ln, _vit_block
from worldforge_tpu.models.vggt.heads import (CameraHeadConfig,
                                              DPTHeadConfig,
                                              camera_head_forward,
                                              dpt_head_forward)

torch = pytest.importorskip("torch")


def _import_heads():
    import importlib
    import sys
    import types

    base = "/root/reference/vggt"
    if base not in sys.path:
        sys.path.insert(0, base)
    for name, path in (("vggt", f"{base}/vggt"),
                       ("vggt.heads", f"{base}/vggt/heads")):
        if name not in sys.modules:
            pkg = types.ModuleType(name)
            pkg.__path__ = [path]
            sys.modules[name] = pkg
    ch = importlib.import_module("vggt.heads.camera_head")
    dh = importlib.import_module("vggt.heads.dpt_head")
    return ch, dh


def test_camera_head_parity(rng):
    ch, _ = _import_heads()
    torch.manual_seed(0)
    ref = ch.CameraHead(dim_in=64, trunk_depth=2, num_heads=4).eval()
    with torch.no_grad():
        ref.empty_pose_tokens.normal_(0, 0.5)   # zeros would be vacuous

    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    dtype = jnp.float32
    params = {
        "trunk": [_vit_block(sd, f"trunk.{i}", dtype) for i in range(2)],
        "token_norm": _ln(sd, "token_norm", dtype),
        "trunk_norm": _ln(sd, "trunk_norm", dtype),
        "empty_pose": jnp.asarray(sd["empty_pose_tokens"], dtype),
        "embed_pose": _dense(sd, "embed_pose", dtype),
        "mod": _dense(sd, "poseLN_modulation.1", dtype),
        "branch_fc1": _dense(sd, "pose_branch.fc1", dtype),
        "branch_fc2": _dense(sd, "pose_branch.fc2", dtype),
    }
    cfg = CameraHeadConfig(dim_in=64, trunk_depth=2, num_heads=4)

    tokens = rng.standard_normal((1, 3, 64)).astype(np.float32)
    # reference consumes [B, S, P, 2C] lists and slices token 0
    agg = np.zeros((1, 3, 5, 64), np.float32)
    agg[:, :, 0] = tokens
    with torch.no_grad():
        preds = ref([torch.tensor(agg)], num_iterations=4)
    ref_out = preds[-1].numpy()

    got = np.asarray(camera_head_forward(params, cfg, jnp.asarray(tokens)))
    assert got.shape == ref_out.shape
    rel = np.abs(got - ref_out).max() / (np.abs(ref_out).max() + 1e-8)
    assert rel < 1e-4, rel


def test_dpt_head_parity(rng):
    _, dh = _import_heads()
    torch.manual_seed(0)
    ref = dh.DPTHead(dim_in=64, patch_size=14, output_dim=2,
                     activation="exp", conf_activation="expp1",
                     features=16, out_channels=[8, 16, 32, 32],
                     pos_embed=True).eval()
    sd = {f"depth_head.{k}": v.detach().numpy()
          for k, v in ref.state_dict().items()}
    params = _convert_dpt(sd, "depth_head", jnp.float32)
    cfg = DPTHeadConfig(dim_in=64, patch_size=14, features=16,
                        out_channels=(8, 16, 32, 32))

    b, s, gh, gw = 1, 2, 2, 2
    p_tok = 5 + gh * gw
    taps = [rng.standard_normal((b, s, p_tok, 64)).astype(np.float32)
            for _ in range(4)]
    images = np.zeros((b, s, 3, gh * 14, gw * 14), np.float32)

    class _Taps(list):
        pass

    # reference indexes aggregated_tokens_list[layer_idx]; its
    # intermediate_layer_idx defaults to vit-l taps — build a list long
    # enough and place ours at those indices
    full = [torch.tensor(taps[0])] * 24
    for j, idx in enumerate(ref.intermediate_layer_idx):
        full[idx] = torch.tensor(taps[j])
    with torch.no_grad():
        pred_r, conf_r = ref(full, torch.tensor(images), 5)

    pred_g, conf_g = dpt_head_forward(params, cfg, taps, (gh * 14, gw * 14),
                                      5)
    ref_pred = pred_r.numpy()
    # reference returns [B, S, H, W, C] for preds
    got_pred = np.asarray(pred_g)
    assert got_pred.shape == ref_pred.shape
    rel = np.abs(got_pred - ref_pred).max() / (np.abs(ref_pred).max() + 1e-8)
    relc = np.abs(np.asarray(conf_g) - conf_r.numpy()).max() / (
        np.abs(conf_r.numpy()).max() + 1e-8)
    assert rel < 5e-4, rel
    assert relc < 5e-4, relc
