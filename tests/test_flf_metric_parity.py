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


def test_longcat_flow_metric_matches_reference(rng):
    """The LONGCAT metric differs from Wan's (OR outlier mask, 0.4/0.4/0.2
    weights — longcat scheduler :210-242); variant='longcat' must match the
    reference VideoMotionChannelSelector given identical flows."""
    from tests.reference_oracle import import_longcat_scheduler

    mod = import_longcat_scheduler()
    sel = mod.VideoMotionChannelSelector(debug=False)

    b, c, tm1, h, w = 1, 5, 3, 8, 8
    ref_f = (rng.standard_normal((b, c, tm1, 2, h, w)) * 4).astype(np.float32)
    pred_f = ref_f + (rng.standard_normal(ref_f.shape) * 2).astype(np.float32)

    got = np.asarray(_flow_similarity_scores(jnp.asarray(pred_f),
                                             jnp.asarray(ref_f),
                                             variant="longcat"))
    wan = np.asarray(_flow_similarity_scores(jnp.asarray(pred_f),
                                             jnp.asarray(ref_f)))
    assert np.abs(got - wan).max() > 1e-4  # the variants genuinely differ
    for ch in range(c):
        with torch.no_grad():
            r = sel._compute_flow_metrics(
                torch.tensor(ref_f[:, ch]),       # [1, T-1, 2, H, W]
                torch.tensor(pred_f[:, ch]))
        assert got[ch] == pytest.approx(r, abs=1e-5), ch


def test_wan_selection_schedule_matches_reference(rng):
    """Schedule parity (reference :404-437) with canned similarity scores
    injected via instance monkeypatching (the read-only module is not
    modified)."""
    from tests.reference_oracle import import_wan_scheduler
    from worldforge_tpu.sampling.channel_select import select_channels_wan

    mod = import_wan_scheduler()
    sel = mod.VideoMotionPCASelector()
    dummy = torch.zeros(1, 16, 3, 4, 4)

    for trial in range(20):
        scores = rng.uniform(0, 1, 16).astype(np.float64)
        sel._compute_channel_correlations = \
            lambda *a, **k: scores.tolist()
        for step in (0, 1, 2, 5, 6, 10, 11, 25, 49):
            ref = sel.select_motion_related_channels(
                dummy, dummy, current_step=step)
            got = select_channels_wan(scores, step)
            assert got == ref, (trial, step, got, ref)


def test_longcat_selection_schedule_matches_reference(rng):
    """LongCat schedule parity (longcat scheduler :326-381) with canned
    scores, both distill modes and max_replace overrides; the device mask
    must agree with the host list."""
    import jax.numpy as jnp
    from tests.reference_oracle import import_longcat_scheduler
    from worldforge_tpu.sampling.channel_select import (
        select_channels_longcat, select_mask_longcat_device)

    mod = import_longcat_scheduler()
    sel = mod.VideoMotionChannelSelector()
    dummy = torch.zeros(1, 16, 3, 4, 4)

    for trial in range(15):
        scores = rng.uniform(0, 1, 16).astype(np.float64)

        def make_metric(sc):
            state = {"i": 0}

            def metric(*a, **k):
                v = float(sc[state["i"] % len(sc)])
                state["i"] += 1
                return v

            return metric

        for distill in (False, True):
            for mr in (None, 4):
                for step in (0, 1, 2, 3, 4, 5, 6, 10, 15):
                    sel.use_optical_flow = False
                    sel._compute_flow_metrics = make_metric(scores)
                    ref = sel.select_motion_related_channels(
                        dummy, dummy, current_step=step,
                        use_distill=distill, max_replace_threshold=mr)
                    got = select_channels_longcat(scores, step, distill,
                                                  max_replace=mr)
                    assert got == ref, (trial, step, distill, mr, got, ref)
                    dev = np.asarray(select_mask_longcat_device(
                        jnp.asarray(scores, jnp.float32),
                        jnp.asarray(step), distill, max_replace=mr))
                    assert sorted(np.nonzero(dev)[0].tolist()) == ref, \
                        (trial, step, distill, mr)
