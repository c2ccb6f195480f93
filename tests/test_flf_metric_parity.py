"""FLF flow-similarity metric parity vs the reference selector
(_compute_flow_metrics) given identical flow fields."""

import jax.numpy as jnp
import numpy as np
import pytest

from worldforge_tpu.sampling.channel_select import _flow_similarity_scores

torch = pytest.importorskip("torch")


def test_flow_metric_matches_reference(rng):
    from tests.reference_oracle import import_wan_scheduler

    mod = import_wan_scheduler()
    sel = mod.VideoMotionPCASelector()

    b, c, tm1, h, w = 1, 5, 3, 8, 8
    # moderate-magnitude flows so EPE/outlier branches all activate
    ref_f = (rng.standard_normal((b, c, tm1, 2, h, w)) * 4).astype(np.float32)
    pred_f = ref_f + (rng.standard_normal(ref_f.shape) * 2).astype(np.float32)

    got = np.asarray(_flow_similarity_scores(jnp.asarray(pred_f),
                                             jnp.asarray(ref_f)))
    for ch in range(c):
        with torch.no_grad():
            r = sel._compute_flow_metrics(
                torch.tensor(ref_f[:, ch]),       # [1, T-1, 2, H, W]
                torch.tensor(pred_f[:, ch]))
        assert got[ch] == pytest.approx(r, abs=1e-5), ch

    # identical flows -> similarity 1
    ones = np.asarray(_flow_similarity_scores(jnp.asarray(ref_f),
                                              jnp.asarray(ref_f)))
    np.testing.assert_allclose(ones, 1.0, atol=1e-4)
