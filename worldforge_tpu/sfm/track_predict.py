"""Track prediction orchestration (multi-query-frame tracking for SfM).

Behavioral reference: vggt/vggt/dependency/track_predict.py:12-310:
  - predict_tracks (:12-133): rank query frames (DINO similarity + FPS,
    frame 0 forced first), coarse fmaps computed ONCE for the whole
    sequence (:77), per-query keypoint extraction + tracking with the
    query frame swapped to position 0, optional confidence/3D lookup,
    chunked query batches, non-visible-frame augmentation
  - _forward_on_query (:135-230): keypoints -> colors -> conf/points3d
    gating (conf > 1.2, keep when > 512 survive) -> reorder -> track ->
    reorder back
  - _augment_non_visible_frames (:232-310): while any frame has fewer
    than min_vis tracks visible above non_vis_thresh, re-query the first
    such frame; on the second failure of the same frame, one final
    "all-in" trial over every failing frame with a FRESH sp+sift+aliked
    2048-keypoint extractor set (:293-299)

Keypoints come from a pluggable `extract_fn(image_hw3) -> [K, 2]` (e.g. a
jitted sfm/superpoint.py detector) and the tracker is the pytree from
sfm/tracker.py — everything else is host-side numpy orchestration.
"""

from __future__ import annotations

from typing import Callable, List, Optional, Tuple

import jax.numpy as jnp
import numpy as np

from worldforge_tpu.sfm.tracker import (compute_tracker_fmaps,
                                        sfm_tracker_forward)
from worldforge_tpu.sfm.utils import (calculate_index_mappings,
                                      rank_frames_by_similarity,
                                      switch_tensor_order)


def _forward_on_query(query_index: int, images: np.ndarray, fmaps,
                      tracker_params, extract_fn, conf, points_3d,
                      max_points_num: int, fine_tracking: bool,
                      coarse_iters: int):
    s, hh, ww, _ = images.shape
    kpts = np.asarray(extract_fn(images[query_index]))
    kpts = kpts[(kpts[:, 0] >= 0) & (kpts[:, 1] >= 0)]
    if kpts.shape[0] == 0:
        kpts = np.asarray([[ww / 2.0, hh / 2.0]], np.float32)

    kl = np.clip(np.round(kpts).astype(np.int64), 0,
                 [ww - 1, hh - 1])
    colors = (images[query_index][kl[:, 1], kl[:, 0]] * 255).astype(np.uint8)

    pred_conf = pred_p3d = None
    if conf is not None and points_3d is not None:
        scale = conf.shape[-1] / ww
        ks = np.clip(np.round(kpts * scale).astype(np.int64), 0,
                     conf.shape[-1] - 1)
        pred_conf = conf[query_index][ks[:, 1], ks[:, 0]]
        pred_p3d = points_3d[query_index][ks[:, 1], ks[:, 0]]
        valid = pred_conf > 1.2          # track_predict.py:195-200
        if valid.sum() > 512:
            kpts, colors = kpts[valid], colors[valid]
            pred_conf, pred_p3d = pred_conf[valid], pred_p3d[valid]

    order = calculate_index_mappings(query_index, s)
    (imgs_feed,) = switch_tensor_order([images], order, dim=0)
    (fmaps_feed,) = switch_tensor_order([fmaps], order, dim=1)

    n = kpts.shape[0]
    chunks = max(1, -(-s * n // max_points_num))
    tracks, vis = [], []
    for qc in np.array_split(kpts, chunks):
        fine, _, v = sfm_tracker_forward(
            tracker_params, jnp.asarray(imgs_feed)[None],
            jnp.asarray(qc, jnp.float32)[None],
            coarse_iters=coarse_iters, fine_tracking=fine_tracking,
            fmaps=fmaps_feed)
        tracks.append(np.asarray(fine[0]))
        vis.append(np.asarray(v[0]))
    track = np.concatenate(tracks, axis=1)
    visv = np.concatenate(vis, axis=1)
    track, visv = switch_tensor_order([track, visv], order, dim=0)
    return track, visv, pred_conf, pred_p3d, colors


def predict_tracks(
    tracker_params,
    images: np.ndarray,               # [S, H, W, 3] in [0, 1]
    extract_fn: Callable[[np.ndarray], np.ndarray],
    rank_features: Optional[np.ndarray] = None,   # [S, D] for FPS ranking
    conf: Optional[np.ndarray] = None,
    points_3d: Optional[np.ndarray] = None,
    query_frame_num: int = 5,
    max_points_num: int = 163840,
    fine_tracking: bool = True,
    complete_non_vis: bool = True,
    min_vis: int = 500,
    non_vis_thresh: float = 0.1,
    coarse_iters: int = 6,
    final_trial_extract_fn: Optional[Callable] = None,
) -> Tuple[np.ndarray, np.ndarray, Optional[np.ndarray],
           Optional[np.ndarray], np.ndarray]:
    """Returns (tracks [S, P, 2], vis [S, P], confs, points3d, colors)
    (track_predict.py:12-133).

    final_trial_extract_fn: fresh extractor set for the augmentation
    loop's last "all-in" attempt — the reference builds a 2048-keypoint
    sp+sift+aliked set there (:293-299) so the retry sees NEW keypoints;
    wire e.g. extractors.combined_extract_fn over all three. Falls back
    to extract_fn (a deterministic re-run, which cannot add tracks) with
    a warning when omitted."""
    s = images.shape[0]
    if rank_features is not None:
        query_frames = rank_frames_by_similarity(
            rank_features, min(query_frame_num, s))
    else:
        query_frames = list(range(min(query_frame_num, s)))
    if 0 in query_frames:
        query_frames.remove(0)
    query_frames = [0, *query_frames][:query_frame_num]

    # coarse fmaps once for the whole sequence (reference :77); queries
    # only reorder them
    fmaps = compute_tracker_fmaps(tracker_params,
                                  jnp.asarray(images)[None])

    tracks, viss, confs, p3ds, colors = [], [], [], [], []

    def run(qi, efn):
        t, v, c, p, col = _forward_on_query(
            qi, images, fmaps, tracker_params, efn, conf, points_3d,
            max_points_num, fine_tracking, coarse_iters)
        tracks.append(t)
        viss.append(v)
        if c is not None:
            confs.append(c)
            p3ds.append(p)
        colors.append(col)

    for qi in query_frames:
        run(qi, extract_fn)

    if complete_non_vis:
        # :232-310 — requery frames with too few visible tracks
        last_query, final_trial = -1, False
        while True:
            vis_all = np.concatenate(viss, axis=1)
            enough = (vis_all > non_vis_thresh).sum(axis=-1)
            non_vis = np.where(enough < min_vis)[0].tolist()
            if not non_vis or final_trial:
                break
            cur_fn = extract_fn
            if non_vis[0] == last_query:
                final_trial = True           # last try: hit them all
                todo = non_vis
                if final_trial_extract_fn is not None:
                    cur_fn = final_trial_extract_fn   # fresh detectors
                else:
                    print("predict_tracks: no final_trial_extract_fn — "
                          "the all-in retry reuses the same extractor "
                          "(deterministic, adds no new tracks)")
            else:
                todo = [non_vis[0]]
            last_query = non_vis[0]
            for qi in todo:
                run(qi, cur_fn)

    return (np.concatenate(tracks, axis=1),
            np.concatenate(viss, axis=1),
            np.concatenate(confs, axis=0) if confs else None,
            np.concatenate(p3ds, axis=0) if p3ds else None,
            np.concatenate(colors, axis=0))
