"""Optical flow + FLF channel selection tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from worldforge_tpu.ops.flow import optical_flow, video_channel_flows
from worldforge_tpu.sampling.channel_select import (
    apply_channel_replacement, select_channels_longcat, select_channels_wan)


def _texture(rng, h, w):
    """Smooth random texture (so LK has gradients to lock onto)."""
    base = rng.standard_normal((h, w)).astype(np.float32)
    from scipy.ndimage import gaussian_filter
    return gaussian_filter(base, 2.0) * 50.0 + 128.0


def test_flow_recovers_translation(rng):
    h, w = 64, 64
    img = _texture(rng, h, w)
    dx, dy = 2.0, -1.0
    # shift: i2(x, y) = i1(x - dx, y - dy) -> flow from i1 to i2 = (dx, dy)
    xs = np.arange(w)[None, :] - dx
    ys = np.arange(h)[:, None] - dy
    from scipy.ndimage import map_coordinates
    i2 = map_coordinates(img, [np.broadcast_to(ys, (h, w)),
                               np.broadcast_to(xs, (h, w))], order=1)
    fl = optical_flow(jnp.asarray(img)[None], jnp.asarray(i2)[None])
    u = np.asarray(fl[0, 0]); v = np.asarray(fl[0, 1])
    # interior only (borders are unreliable)
    assert abs(np.median(u[8:-8, 8:-8]) - dx) < 0.5
    assert abs(np.median(v[8:-8, 8:-8]) - dy) < 0.5


def test_video_channel_flows_shape(rng):
    vid = jnp.asarray(rng.standard_normal((1, 4, 5, 32, 32)), jnp.float32)
    fl = video_channel_flows(vid)
    assert fl.shape == (1, 4, 4, 2, 32, 32)
    assert np.isfinite(np.asarray(fl)).all()


def test_wan_selection_schedule():
    scores = np.array([0.9, 0.1, 0.8, 0.2, 0.85, 0.82, 0.83, 0.81,
                       0.86, 0.84, 0.87, 0.88, 0.89, 0.9, 0.91, 0.92])
    assert select_channels_wan(scores, 0) == []
    assert select_channels_wan(scores, 4) == []          # <=5: none
    assert select_channels_wan(scores, 8) == [1]         # <=10: worst 1
    sel = select_channels_wan(scores, 20)                 # threshold mode
    assert sel == [1, 3]                                  # two clear outliers
    # all-equal scores -> min 2 forced
    assert len(select_channels_wan(np.full(16, 0.5), 20)) == 2


def test_wan_selection_max_cap():
    scores = np.concatenate([np.zeros(10), np.ones(6)])
    sel = select_channels_wan(scores, 20)
    assert len(sel) == 6  # capped at max_replace=6


def test_longcat_selection_schedule():
    scores = np.array([0.9, 0.1, 0.8, 0.2])
    assert select_channels_longcat(scores, 0, distill=False) == []
    assert select_channels_longcat(scores, 3, distill=False) == [1]
    assert select_channels_longcat(scores, 10, distill=False) == [1]
    assert select_channels_longcat(scores, 10, distill=False, max_replace=2) == [1, 3]
    assert select_channels_longcat(scores, 2, distill=True) == [1]
    # distill late: threshold picks {1, 3} (mean-0.625*std = 0.277),
    # within max_replace=3 — oracle-verified in test_flf_metric_parity
    assert select_channels_longcat(scores, 10, distill=True) == [1, 3]


def test_apply_channel_replacement(rng):
    enc = jnp.zeros((1, 4, 2, 4, 4))
    pred = jnp.ones((1, 4, 2, 4, 4))
    out = apply_channel_replacement(enc, pred, [1, 3])
    out = np.asarray(out)
    assert (out[:, 0] == 0).all() and (out[:, 2] == 0).all()
    assert (out[:, 1] == 1).all() and (out[:, 3] == 1).all()
    # empty selection is identity
    out2 = apply_channel_replacement(enc, pred, [])
    assert (np.asarray(out2) == 0).all()


def test_fuse_latents_blend_identity(rng):
    """With identity VAE stubs, fuse is the masked pixel blend + FLF."""
    from worldforge_tpu.sampling.guidance import fuse_latents
    x0 = jnp.asarray(rng.standard_normal((1, 3, 2, 8, 8)), jnp.float32)
    ref01 = jnp.asarray(rng.uniform(0, 1, (1, 3, 2, 8, 8)), jnp.float32)
    mask = jnp.ones((1, 1, 2, 8, 8), jnp.float32)
    ident = lambda z: z
    out = fuse_latents(x0, ref01, mask, ident, ident)
    np.testing.assert_allclose(np.asarray(out), np.asarray(2 * ref01 - 1),
                               atol=1e-6)  # mask=1 -> pure reference
    mask0 = jnp.zeros_like(mask)
    out0 = fuse_latents(x0, ref01, mask0, ident, ident)
    np.testing.assert_allclose(np.asarray(out0), np.asarray(x0), atol=1e-6)
