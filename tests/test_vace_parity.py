"""VACE model conversion parity vs the reference VaceWanModel (torch)."""

import jax.numpy as jnp
import numpy as np
import pytest

from worldforge_tpu.core.dtypes import FP32_POLICY
from worldforge_tpu.io.convert_wan import convert_vace
from worldforge_tpu.models.wan.dit import WanDiTConfig
from worldforge_tpu.models.wan.vace import VaceConfig, vace_forward

torch = pytest.importorskip("torch")


def test_vace_conversion_parity(rng):
    from tests.reference_oracle import import_wan_reference
    import importlib

    import_wan_reference()          # installs stubs + SDPA patch
    vm = importlib.import_module("wan.modules.vace_model")

    torch.manual_seed(0)
    ref = vm.VaceWanModel(
        vace_layers=None, vace_in_dim=12, model_type="t2v",
        patch_size=(1, 2, 2), text_len=16, in_dim=4, dim=64, ffn_dim=128,
        freq_dim=32, text_dim=48, out_dim=4, num_heads=2,
        num_layers=2).eval()
    with torch.no_grad():
        # zero-init head/projections make the test vacuous; perturb
        ref.head.head.weight.normal_(0, 0.02)
        for blk in ref.vace_blocks:
            blk.after_proj.weight.normal_(0, 0.02)
            blk.after_proj.bias.normal_(0, 0.02)
        ref.vace_blocks[0].before_proj.weight.normal_(0, 0.02)

    cfg = VaceConfig(
        base=WanDiTConfig(model_type="t2v", patch_size=(1, 2, 2),
                          text_len=16, in_dim=4, dim=64, ffn_dim=128,
                          freq_dim=32, text_dim=48, out_dim=4, num_heads=2,
                          num_layers=2),
        vace_in_dim=12)
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    params = convert_vace(sd, cfg, dtype=jnp.float32)

    x = rng.standard_normal((4, 3, 8, 8)).astype(np.float32)
    vctx = rng.standard_normal((12, 3, 8, 8)).astype(np.float32)
    ctx = rng.standard_normal((16, 48)).astype(np.float32)
    t = 500.0

    with torch.no_grad():
        out_t = ref([torch.from_numpy(x)], torch.tensor([t]),
                    [torch.from_numpy(vctx)], [torch.from_numpy(ctx)],
                    seq_len=3 * 4 * 4,
                    vace_context_scale=1.3)[0].numpy()

    out_j = np.asarray(vace_forward(
        params, cfg, jnp.asarray(x)[None], jnp.asarray([t]),
        jnp.asarray(vctx)[None], jnp.asarray(ctx)[None],
        vace_context_scale=1.3, policy=FP32_POLICY)[0])

    assert out_t.shape == out_j.shape
    rel = np.abs(out_t - out_j).max() / (np.abs(out_t).max() + 1e-8)
    assert rel < 1e-4, rel
