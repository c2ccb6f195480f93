"""Keypoint extractor factory mirroring the reference's
initialize_feature_extractors / extract_keypoints
(/root/reference/vggt/vggt/dependency/vggsfm_utils.py:189-253):
"+"-separated method strings ("aliked", "sp", "sift", "aliked+sp+sift"),
each extractor contributing keypoints that are concatenated (sub-pixel by
default; rounding is opt-in, see combined_extract_fn).

- aliked: sfm/aliked.py (the reference DEFAULT), jitted
- sp:     sfm/superpoint.py, jitted
- sift:   OpenCV SIFT — the reference's lightglue SIFT wrapper is itself a
          cv2.SIFT frontend (detect on uint8 grayscale, strongest
          max_num_keypoints by response); only keypoint COORDS are consumed
          downstream (vggsfm_utils.py:243-251), so descriptors are skipped

Every extractor closes over its params and exposes the product interface
`extract_fn(image_hw3 float [0,1]) -> [K, 2] float (x, y)` consumed by
sfm/track_predict.py.
"""

from __future__ import annotations

import functools
from typing import Callable, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np


def sift_extract(image_hw3: np.ndarray, max_num_keypoints: int = 4096
                 ) -> np.ndarray:
    """cv2 SIFT keypoints, strongest-first ([K, 2] float (x, y))."""
    import cv2

    gray = cv2.cvtColor((np.asarray(image_hw3) * 255.0).astype(np.uint8),
                        cv2.COLOR_RGB2GRAY)
    sift = cv2.SIFT_create(nfeatures=max_num_keypoints)
    kps = sift.detect(gray, None)
    if not kps:
        return np.zeros((0, 2), np.float32)
    kps = sorted(kps, key=lambda k: -k.response)[:max_num_keypoints]
    return np.asarray([k.pt for k in kps], np.float32)


def make_superpoint_extractor(params, cfg) -> Callable:
    from worldforge_tpu.sfm.superpoint import superpoint_forward

    fwd = jax.jit(functools.partial(superpoint_forward, params, cfg))

    def extract(image_hw3: np.ndarray) -> np.ndarray:
        # NTSC-weighted grayscale, matching the lightglue/HF SuperPoint
        # frontends (transformers image_processing_superpoint.py:86-89)
        img = np.asarray(image_hw3, np.float32)
        gray = img @ np.asarray([0.2989, 0.587, 0.114], np.float32)
        out = fwd(jnp.asarray(gray)[None, :, :, None])
        kpts = np.asarray(out["keypoints"][0])
        return kpts[np.asarray(out["scores"][0]) > 0]

    return extract


def make_aliked_extractor(params, cfg) -> Callable:
    from worldforge_tpu.sfm.aliked import aliked_forward, pad_to_multiple

    fwd = jax.jit(functools.partial(aliked_forward, params, cfg))

    def extract(image_hw3: np.ndarray) -> np.ndarray:
        hh, ww = image_hw3.shape[:2]
        padded = pad_to_multiple(np.asarray(image_hw3, np.float32))
        out = fwd(jnp.asarray(padded)[None])
        kpts = np.asarray(out["keypoints"][0])
        ok = (np.asarray(out["scores"][0]) > 0) \
            & (kpts[:, 0] < ww) & (kpts[:, 1] < hh)
        return kpts[ok]

    return extract


def make_extractors(method: str = "aliked", max_query_num: int = 4096,
                    det_thres: float = 0.005,
                    superpoint_params=None, superpoint_cfg=None,
                    aliked_params=None, aliked_cfg=None
                    ) -> Dict[str, Callable]:
    """initialize_feature_extractors analog: returns {name: extract_fn}.
    Unknown methods are skipped with a warning; empty -> aliked default
    (vggsfm_utils.py:219-224)."""
    import dataclasses

    extractors: Dict[str, Callable] = {}

    def _aliked():
        from worldforge_tpu.sfm.aliked import ALIKEDConfig, init_aliked
        cfg = aliked_cfg or ALIKEDConfig.n16()
        cfg = dataclasses.replace(cfg, max_num_keypoints=max_query_num,
                                  detection_threshold=det_thres)
        p = aliked_params
        if p is None:  # random init — converted weights via convert_aliked
            p = init_aliked(jax.random.key(0), cfg)
        return make_aliked_extractor(p, cfg)

    for m in method.lower().split("+"):
        m = m.strip()
        if m == "aliked":
            extractors["aliked"] = _aliked()
        elif m == "sp":
            from worldforge_tpu.sfm.superpoint import SuperPointConfig, \
                init_superpoint
            cfg = superpoint_cfg or SuperPointConfig()
            cfg = dataclasses.replace(cfg, max_num_keypoints=max_query_num,
                                      detection_threshold=det_thres)
            p = superpoint_params
            if p is None:
                p = init_superpoint(jax.random.key(1), cfg)
            extractors["sp"] = make_superpoint_extractor(p, cfg)
        elif m == "sift":
            extractors["sift"] = functools.partial(
                sift_extract, max_num_keypoints=max_query_num)
        else:
            print(f"Warning: unknown feature extractor '{m}', ignoring.")
    if not extractors:
        print(f"Warning: no valid extractors in '{method}', "
              f"using ALIKED by default.")
        extractors["aliked"] = _aliked()
    return extractors


def combined_extract_fn(extractors: Dict[str, Callable],
                        round_keypoints: bool = False) -> Callable:
    """extract_keypoints analog (vggsfm_utils.py:227-253): concatenate
    every extractor's keypoints, optionally rounding. Default False: the
    tracking path extracts with round_keypoints=False so sub-pixel
    locations seed the tracker (track_predict.py:172); pass True only to
    mirror the reference function's standalone default."""

    def extract(image_hw3: np.ndarray) -> np.ndarray:
        parts = []
        for fn in extractors.values():
            k = np.asarray(fn(image_hw3), np.float32)
            if round_keypoints:
                k = np.round(k)
            parts.append(k.reshape(-1, 2))
        return np.concatenate(parts, axis=0) if parts else \
            np.zeros((0, 2), np.float32)

    return extract
