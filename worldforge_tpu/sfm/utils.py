"""VGGSfM support utilities: query-frame ranking + index plumbing.

Behavioral reference: vggt/vggt/dependency/vggsfm_utils.py:
  - generate_rank_by_dino (:51-116): DINO features -> cosine similarity ->
    most-central frame -> farthest point sampling
  - farthest_point_sampling (:118-150)
  - calculate_index_mappings / switch_tensor_order (:153-187)

The feature extraction here reuses the in-repo DINOv2 backbone
(models/vggt/vit.py) instead of a torch.hub download; ranking math is
pure numpy (host-side, tiny).
"""

from __future__ import annotations

from typing import List, Optional, Sequence

import numpy as np


def farthest_point_sampling(distance_matrix: np.ndarray, num_samples: int,
                            most_common_frame_index: int = 0) -> List[int]:
    """Greedy FPS over a pairwise distance matrix
    (vggsfm_utils.py:118-150)."""
    dm = np.maximum(np.asarray(distance_matrix, np.float64), 0.0)
    n = dm.shape[0]
    selected = [most_common_frame_index]
    check = dm[most_common_frame_index].copy()
    check[selected] = 0
    while len(selected) < num_samples and len(selected) < n:
        far = int(np.argmax(check))
        selected.append(far)
        check = dm[far].copy()
        check[selected] = 0
    return selected


def rank_frames_by_similarity(features: np.ndarray, query_frame_num: int,
                              spatial: bool = False) -> List[int]:
    """features: [S, D] (cls tokens) or [S, P, D] (patch tokens, spatial).
    Normalize, build cosine similarity, pick the most-central frame, FPS
    the rest (generate_rank_by_dino :85-110)."""
    f = np.asarray(features, np.float64)
    if spatial:
        # per-patch cosine similarity, averaged over patches (:85-92)
        f = f / np.maximum(np.linalg.norm(f, axis=-1, keepdims=True), 1e-12)
        sim = np.einsum("spd,qpd->sq", f, f) / f.shape[1]
    else:
        f = f / np.maximum(np.linalg.norm(f, axis=-1, keepdims=True), 1e-12)
        sim = f @ f.T
    dist = 100.0 - sim
    np.fill_diagonal(sim, -100.0)
    most_common = int(np.argmax(sim.sum(axis=1)))
    return farthest_point_sampling(dist, query_frame_num, most_common)


def calculate_index_mappings(query_index: int, s: int) -> np.ndarray:
    """Order that swaps [query_index] and [0] (vggsfm_utils.py:153-173)."""
    order = np.arange(s)
    order[0] = query_index
    order[query_index] = 0
    return order


def switch_tensor_order(tensors: Sequence, order: np.ndarray, dim: int = 1):
    """Reorder each (possibly None) array along `dim`
    (vggsfm_utils.py:176-187)."""
    return [None if t is None else np.take(np.asarray(t), order, axis=dim)
            for t in tensors]
