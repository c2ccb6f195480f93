"""UMT5 encoder parity vs the live HF transformers implementation."""

import jax.numpy as jnp
import numpy as np
import pytest

from worldforge_tpu.io.convert_encoders import convert_umt5
from worldforge_tpu.models.encoders.umt5 import UMT5Config, umt5_encode

torch = pytest.importorskip("torch")


def test_umt5_matches_hf(rng):
    transformers = pytest.importorskip("transformers")

    hf_cfg = transformers.UMT5Config(
        vocab_size=128, d_model=32, d_kv=8, d_ff=48, num_layers=2,
        num_heads=4, relative_attention_num_buckets=8,
        relative_attention_max_distance=16, feed_forward_proj="gated-gelu",
        dropout_rate=0.0, is_encoder_decoder=False, use_cache=False,
        tie_word_embeddings=False)
    ref = transformers.UMT5EncoderModel(hf_cfg).eval()

    cfg = UMT5Config(vocab_size=128, d_model=32, d_ff=48, num_layers=2,
                     num_heads=4, d_head=8, rel_buckets=8,
                     rel_max_distance=16)
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    params = convert_umt5(sd, cfg, dtype=jnp.float32)

    ids = rng.integers(0, 128, (2, 12)).astype(np.int64)
    mask = np.ones((2, 12), np.int64)
    mask[1, 8:] = 0

    with torch.no_grad():
        out_t = ref(input_ids=torch.tensor(ids),
                    attention_mask=torch.tensor(mask)
                    ).last_hidden_state.numpy()

    out_j = np.asarray(umt5_encode(params, cfg, jnp.asarray(ids),
                                   jnp.asarray(mask),
                                   compute_dtype=jnp.float32))
    assert out_t.shape == out_j.shape
    # masked positions may differ (HF zeroes nothing; ours may) — compare
    # valid positions only
    rel0 = np.abs(out_j[0] - out_t[0]).max() / (np.abs(out_t[0]).max())
    rel1 = np.abs(out_j[1, :8] - out_t[1, :8]).max() / (
        np.abs(out_t[1, :8]).max())
    assert rel0 < 1e-4, rel0
    assert rel1 < 1e-4, rel1
