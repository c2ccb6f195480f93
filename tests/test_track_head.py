"""Track head: shape/behavior tests + torch-oracle parity for the
BaseTrackerPredictor refinement loop."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from worldforge_tpu.models.vggt.track import (TrackHeadConfig,
                                              bilinear_sample,
                                              flow_embedding,
                                              init_track_head,
                                              init_track_predictor,
                                              track_head_forward,
                                              track_predictor_forward)


def test_bilinear_sample_border_vs_zeros():
    grid = jnp.arange(12, dtype=jnp.float32).reshape(1, 3, 4, 1)
    pts = jnp.asarray([[[0.5, 0.0], [-1.0, 0.0], [10.0, 2.0]]], jnp.float32)
    b = np.asarray(bilinear_sample(grid, pts, padding="border"))[0, :, 0]
    z = np.asarray(bilinear_sample(grid, pts, padding="zeros"))[0, :, 0]
    assert b[0] == pytest.approx(0.5)          # interior interp
    assert b[1] == pytest.approx(0.0)          # clamped to col 0
    assert b[2] == pytest.approx(11.0)         # clamped to max corner
    assert z[0] == pytest.approx(0.5)
    assert z[1] == pytest.approx(0.0) and z[2] == pytest.approx(0.0)


def test_track_predictor_shapes(rng):
    cfg = TrackHeadConfig.tiny()
    p = init_track_predictor(jax.random.key(0), cfg)
    fmaps = jnp.asarray(rng.standard_normal((1, 3, 8, 8, cfg.features)),
                        jnp.float32)
    qp = jnp.asarray([[[4.0, 4.0], [2.0, 6.0]]], jnp.float32)  # stride-px
    preds, vis, conf = track_predictor_forward(p, cfg, qp, fmaps)
    assert len(preds) == cfg.iters
    assert preds[-1].shape == (1, 3, 2, 2)
    assert vis.shape == conf.shape == (1, 3, 2)
    v = np.asarray(vis)
    assert (v > 0).all() and (v < 1).all()
    # query frame coords pinned to the input points
    np.testing.assert_allclose(np.asarray(preds[-1][:, 0]), np.asarray(qp),
                               rtol=1e-5)


def test_track_head_end_to_end(rng):
    cfg = TrackHeadConfig.tiny()
    params = init_track_head(jax.random.key(0), cfg)
    b, s, c2 = 1, 2, cfg.dim_in   # dim_in is the [frame||global] concat width
    gh = gw = 2
    p_tok = 5 + gh * gw
    taps = [jnp.asarray(rng.standard_normal((b, s, p_tok, c2)), jnp.float32)
            for _ in range(4)]
    preds, vis, conf = track_head_forward(
        params, cfg, taps, (gh * 14, gw * 14), 5,
        jnp.asarray([[[10.0, 12.0]]], jnp.float32))
    assert preds[-1].shape == (b, s, 1, 2)
    assert np.isfinite(np.asarray(preds[-1])).all()


# ----------------------------------------------------------- torch oracle

torch = pytest.importorskip("torch")


def test_track_predictor_matches_reference(rng):
    from tests.reference_oracle import import_vggt_track
    from worldforge_tpu.io.convert_vggt import convert_track_predictor

    mod = import_vggt_track()
    depth = 2
    ref = mod.BaseTrackerPredictor(
        stride=2, corr_levels=2, corr_radius=2, latent_dim=16,
        hidden_size=32, use_spaceatt=True, depth=depth, predict_conf=True)
    ref.eval()
    # default nn.MultiheadAttention num_heads in blocks is 8 > 32/8=4 ok

    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    cfg = TrackHeadConfig(features=16, iters=2, stride=2, corr_levels=2,
                          corr_radius=2, hidden_size=32, depth=depth,
                          num_heads=8, num_virtual=64)
    params = convert_track_predictor(sd, depth)

    fmaps = rng.standard_normal((1, 3, 12, 16, 16)).astype(np.float32)
    qp = np.asarray([[[7.0, 5.0], [3.5, 9.0]]], np.float32)

    with torch.no_grad():
        rp, rvis, rconf = ref(
            torch.tensor(qp), torch.tensor(fmaps).permute(0, 1, 4, 2, 3),
            iters=2)
    preds, vis, conf = track_predictor_forward(
        params, cfg, jnp.asarray(qp),
        jnp.asarray(fmaps), iters=2)

    for mine, theirs in zip(preds, rp):
        np.testing.assert_allclose(np.asarray(mine), theirs.numpy(),
                                   rtol=2e-3, atol=2e-4)
    np.testing.assert_allclose(np.asarray(vis), rvis.numpy(), atol=1e-4)
    np.testing.assert_allclose(np.asarray(conf), rconf.numpy(), atol=1e-4)


def test_flow_embedding_matches_reference(rng):
    from tests.reference_oracle import import_vggt_track
    mod = import_vggt_track()
    from vggt.heads.track_modules.utils import get_2d_embedding  # noqa
    flows = rng.standard_normal((2, 5, 2)).astype(np.float32)
    ref = get_2d_embedding(torch.tensor(flows), 8, cat_coords=False)
    got = flow_embedding(jnp.asarray(flows), 8)
    np.testing.assert_allclose(np.asarray(got), ref.numpy(), rtol=1e-5,
                               atol=1e-5)
