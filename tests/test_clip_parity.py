"""CLIP vision encoder parity vs live HF transformers."""

import jax.numpy as jnp
import numpy as np
import pytest

from worldforge_tpu.io.convert_encoders import convert_clip_vision
from worldforge_tpu.models.encoders.clip_vision import (CLIPVisionConfig,
                                                        clip_vision_hidden)

torch = pytest.importorskip("torch")


def test_clip_vision_matches_hf(rng):
    transformers = pytest.importorskip("transformers")

    hf_cfg = transformers.CLIPVisionConfig(
        hidden_size=32, intermediate_size=128, num_hidden_layers=3,
        num_attention_heads=4, image_size=28, patch_size=14,
        hidden_act="quick_gelu", attention_dropout=0.0)
    ref = transformers.CLIPVisionModel(hf_cfg).eval()

    cfg = CLIPVisionConfig(image_size=28, patch_size=14, width=32,
                           layers=3, heads=4)
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    params = convert_clip_vision(sd, cfg, dtype=jnp.float32)

    px = rng.standard_normal((1, 3, 28, 28)).astype(np.float32)
    with torch.no_grad():
        out = ref(pixel_values=torch.tensor(px),
                  output_hidden_states=True)
    # WF uses the penultimate hidden state (pipeline :207-211)
    ref_pen = out.hidden_states[-2].numpy()

    got = np.asarray(clip_vision_hidden(params, cfg, jnp.asarray(px)))
    assert got.shape == ref_pen.shape
    rel = np.abs(got - ref_pen).max() / (np.abs(ref_pen).max() + 1e-8)
    assert rel < 1e-4, rel
