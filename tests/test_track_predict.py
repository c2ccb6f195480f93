"""Track-prediction orchestration (multi-query, reorder, augmentation)."""

import jax
import jax.numpy as jnp
import numpy as np

from worldforge_tpu.sfm.track_predict import predict_tracks
from worldforge_tpu.sfm.tracker import init_sfm_tracker


def _grid_extractor(img):
    # deterministic 4-point extractor
    h, w = img.shape[:2]
    return np.asarray([[w * 0.25, h * 0.25], [w * 0.75, h * 0.25],
                       [w * 0.25, h * 0.75], [w * 0.75, h * 0.75]],
                      np.float32)


def test_predict_tracks_shapes(rng):
    params = init_sfm_tracker(jax.random.key(0))
    images = rng.uniform(0, 1, (3, 128, 128, 3)).astype(np.float32)
    tracks, vis, confs, p3d, colors = predict_tracks(
        params, images, _grid_extractor, query_frame_num=2,
        fine_tracking=False, complete_non_vis=False, coarse_iters=1)
    # 2 query frames x 4 points
    assert tracks.shape == (3, 8, 2)
    assert vis.shape == (3, 8)
    assert confs is None and p3d is None
    assert colors.shape == (8, 3) and colors.dtype == np.uint8
    # query rows: each query's frame-q track equals its keypoints
    np.testing.assert_allclose(tracks[0, :4], _grid_extractor(images[0]),
                               atol=1e-4)
    np.testing.assert_allclose(tracks[1, 4:], _grid_extractor(images[1]),
                               atol=1e-4)


def test_predict_tracks_conf_gating(rng):
    params = init_sfm_tracker(jax.random.key(0))
    images = rng.uniform(0, 1, (2, 128, 128, 3)).astype(np.float32)
    conf = np.full((2, 128, 128), 2.0, np.float32)   # all above 1.2
    p3d = rng.standard_normal((2, 128, 128, 3)).astype(np.float32)
    tracks, vis, confs, pts, colors = predict_tracks(
        params, images, _grid_extractor, conf=conf, points_3d=p3d,
        query_frame_num=1, fine_tracking=False, complete_non_vis=False,
        coarse_iters=1)
    assert confs.shape == (4,) and (confs == 2.0).all()
    assert pts.shape == (4, 3)


def test_predict_tracks_augments_low_vis(rng):
    params = init_sfm_tracker(jax.random.key(0))
    images = rng.uniform(0, 1, (2, 128, 128, 3)).astype(np.float32)
    # min_vis=1 likely satisfied; with min_vis huge, augmentation loops
    # once per frame then stops on repeat (final_trial)
    tracks, vis, *_ = predict_tracks(
        params, images, _grid_extractor, query_frame_num=1,
        fine_tracking=False, complete_non_vis=True, min_vis=10**6,
        non_vis_thresh=2.0, coarse_iters=1)
    assert tracks.shape[1] > 4       # extra queries appended
