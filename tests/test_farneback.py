"""Farneback optical flow parity vs cv2 (the reference's exact algorithm:
scheduling_unipc_multistep_clean.py:218-222), plus end-to-end FLF
channel-selection parity against the reference selector running its real
cv2 flow path."""

import jax.numpy as jnp
import numpy as np
import pytest

from worldforge_tpu.ops.farneback import farneback_flow

cv2 = pytest.importorskip("cv2")


def _smooth_u8(rng, h, w):
    img = rng.integers(0, 256, (h, w)).astype(np.float32)
    return cv2.GaussianBlur(img, (7, 7), 2).astype(np.uint8)


@pytest.mark.parametrize("h,w", [(60, 104), (90, 160), (128, 128)])
def test_farneback_matches_cv2(rng, h, w):
    """Batched device flow == cv2.calcOpticalFlowFarneback to <1e-3 px,
    covering both the single-level (<64 px) and multi-level regimes."""
    imgs_a, imgs_b = [], []
    for i in range(4):
        a = _smooth_u8(rng, h, w)
        b = np.roll(a, int(rng.integers(-4, 5)), axis=1)
        b = np.roll(b, int(rng.integers(-3, 4)), axis=0)
        if i % 2:
            b = np.clip(b.astype(np.float32) * 0.9 + 10, 0, 255) \
                .astype(np.uint8)
        imgs_a.append(a)
        imgs_b.append(b)
    ref = np.stack([
        cv2.calcOpticalFlowFarneback(a, b, None, 0.5, 3, 15, 3, 5, 1.2, 0)
        for a, b in zip(imgs_a, imgs_b)])
    got = np.asarray(farneback_flow(
        jnp.asarray(np.stack(imgs_a), jnp.float32),
        jnp.asarray(np.stack(imgs_b), jnp.float32)))
    np.testing.assert_allclose(got, ref, atol=1e-3)


def test_farneback_nondefault_params(rng):
    """Parameter plumbing (winsize/iterations/poly_n/poly_sigma/levels)."""
    a = _smooth_u8(rng, 72, 96)
    b = np.roll(a, 3, axis=1)
    ref = cv2.calcOpticalFlowFarneback(a, b, None, 0.5, 2, 9, 2, 7, 1.5, 0)
    got = np.asarray(farneback_flow(
        jnp.asarray(a[None], jnp.float32), jnp.asarray(b[None], jnp.float32),
        levels=2, winsize=9, iterations=2, poly_n=7, poly_sigma=1.5))[0]
    np.testing.assert_allclose(got, ref, atol=1e-3)


def test_flf_selection_end_to_end_vs_reference(rng):
    """channel_similarities (device Farneback) vs the reference selector's
    full cv2 flow path: per-channel similarity scores to 1e-4 and identical
    selection sets across the Wan schedule."""
    torch = pytest.importorskip("torch")
    from tests.reference_oracle import import_wan_scheduler
    from worldforge_tpu.sampling.channel_select import (
        channel_similarities, select_channels_wan)

    mod = import_wan_scheduler()
    sel = mod.VideoMotionPCASelector()

    b, c, t, h, w = 1, 6, 4, 40, 56
    base = rng.standard_normal((b, 1, t, h, w)).astype(np.float32)
    base = np.asarray(jnp.cumsum(jnp.asarray(base), axis=2))  # temporal drift
    ref_video = (base + 0.3 * rng.standard_normal(
        (b, c, t, h, w)).astype(np.float32))
    pred = ref_video + np.roll(ref_video, 1, axis=-1) * 0.4 \
        + 0.2 * rng.standard_normal(ref_video.shape).astype(np.float32)

    with torch.no_grad():
        ref_scores = sel._compute_channel_correlations(
            torch.tensor(pred), torch.tensor(ref_video), None, True,
            channel_motion_features=None)
    # reference builds ref-motion features via its optical-flow loop when
    # called through select_motion_related_channels; replicate that here
    with torch.no_grad():
        feats = []
        rv = torch.tensor(ref_video)
        gmin, gmax = rv.min(), rv.max()
        grange = gmax - gmin + 1e-8
        for ch in range(c):
            rgb = rv[:, ch:ch + 1].repeat(1, 3, 1, 1, 1)
            rgb = (rgb - gmin) / grange
            feats.append(sel._extract_optical_flow_motion(rgb, None))
        ref_scores = sel._compute_channel_correlations(
            torch.tensor(pred), rv, None, True, channel_motion_features=feats)

    got_scores = channel_similarities(jnp.asarray(pred),
                                      jnp.asarray(ref_video))
    np.testing.assert_allclose(got_scores, np.asarray(ref_scores), atol=1e-4)

    for step in (2, 5, 6, 10, 11, 25):
        sel._compute_channel_correlations = \
            lambda *a, **k: list(map(float, np.asarray(ref_scores)))
        ref_sel = sel.select_motion_related_channels(
            torch.tensor(pred), torch.tensor(ref_video), current_step=step)
        got_sel = select_channels_wan(got_scores, step)
        assert got_sel == ref_sel, (step, got_sel, ref_sel)
