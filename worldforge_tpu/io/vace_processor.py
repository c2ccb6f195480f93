"""VACE source preprocessing (host side).

Behavioral reference: wan/utils/vace_processor.py:
  - VaceImageProcessor (:9-90): seq-len-capped output size (latent-area
    sqrt rule), max-scale resize + center crop, normalize to [-1, 1]
  - VaceVideoProcessor (:93-270): latent-area sizing with frame budget
    (seq_len), fps-capped frame-id sampling (zero_start) or keep-last
    uniform resampling, bicubic-antialias resize + center crop
  - prepare_source (:272-305): None slots -> zero video + ones mask;
    ref images letterboxed onto a white [-1,1] canvas

TPU note: all of this is host-side numpy/jax preprocessing that runs
once per clip — device work starts at the VAE encode. Video decode
(decord upstream) is out of scope here; callers pass decoded frame
arrays ([T, H, W, 3] uint8 or float).
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def _resize_crop(frames: jnp.ndarray, oh: int, ow: int) -> jnp.ndarray:
    """[T, H, W, C] float in [0,1] -> [C, T, oh, ow] in [-1, 1]; max-scale
    resize (antialiased cubic, matching F.interpolate bicubic+antialias)
    then center crop (vace_processor.py:117-149)."""
    t, ih, iw, c = frames.shape
    if (ih, iw) != (oh, ow):
        scale = max(ow / iw, oh / ih)
        rh, rw = round(scale * ih), round(scale * iw)
        frames = jax.image.resize(frames, (t, rh, rw, c), method="cubic",
                                  antialias=True)
        y1, x1 = (rh - oh) // 2, (rw - ow) // 2
        frames = frames[:, y1:y1 + oh, x1:x1 + ow]
    return frames.transpose(3, 0, 1, 2) * 2.0 - 1.0


def _to_float01(frames: np.ndarray) -> jnp.ndarray:
    frames = jnp.asarray(frames)
    if frames.dtype == jnp.uint8:
        frames = frames.astype(jnp.float32) / 255.0
    return frames.astype(jnp.float32)


@dataclasses.dataclass
class VaceImageProcessor:
    """Image(s) -> normalized tensor at a seq-len-capped size
    (vace_processor.py:9-90)."""
    downsample: Tuple[int, int, int] = (4, 8, 8)
    seq_len: int = 32760

    def output_size(self, h: int, w: int,
                    seq_len: Optional[int] = None) -> Tuple[int, int]:
        seq_len = self.seq_len if seq_len is None else seq_len
        dh, dw = self.downsample[1:]
        scale = min(1.0, float(np.sqrt(seq_len / ((h / dh) * (w / dw)))))
        oh = int(h * scale) // dh * dh
        ow = int(w * scale) // dw * dw
        return oh, ow

    def load_image_batch(self, *images: np.ndarray,
                         seq_len: Optional[int] = None):
        """images: [H, W, 3] arrays. Returns (*tensors [3,1,oh,ow], (oh,ow))."""
        h, w = images[0].shape[:2]
        oh, ow = self.output_size(h, w, seq_len)
        outs = [
            _resize_crop(_to_float01(img)[None], oh, ow) for img in images
        ]
        return (*outs, (oh, ow))


def _latent_size(h: int, w: int, num_src_frames: int, seq_len: int,
                 max_area: float, downsample: Tuple[int, int, int],
                 frame_cap: int) -> Tuple[int, int, int]:
    """Shared sizing rule (vace_processor.py:161-175, 193-207): latent
    area capped by seq_len and max_area, frames by the seq-len budget."""
    df, dh, dw = downsample
    ratio = h / w
    area_z = min(seq_len, max_area / (dh * dw), (h // dh) * (w // dw))
    of = min(frame_cap, int(seq_len / area_z))
    target_area_z = min(area_z, int(seq_len / of))
    oh = round(np.sqrt(target_area_z * ratio))
    ow = int(target_area_z / oh)
    return (of - 1) * df + 1, oh * dh, ow * dw


@dataclasses.dataclass
class VaceVideoProcessor:
    """Video -> (frame ids, crop bbox, output size, fps) + normalized
    tensor (vace_processor.py:93-270)."""
    downsample: Tuple[int, int, int] = (4, 8, 8)
    min_area: float = 480 * 832
    max_area: float = 480 * 832
    min_fps: float = 16.0
    max_fps: float = 16.0
    zero_start: bool = True
    seq_len: int = 32760
    keep_last: bool = True

    def set_area(self, area: float) -> None:
        self.min_area = self.max_area = float(area)

    def set_seq_len(self, seq_len: int) -> None:
        self.seq_len = int(seq_len)

    # -- frame-id / shape deduction -------------------------------------

    def _frameids_default(self, fps, frame_timestamps, h, w, crop_box, rng):
        """fps-capped, zero-start (or random-start) window
        (:154-185)."""
        target_fps = min(fps, self.max_fps)
        duration = float(frame_timestamps[-1].mean())
        x1, x2, y1, y2 = (0, w, 0, h) if crop_box is None else crop_box
        of, oh, ow = _latent_size(
            y2 - y1, x2 - x1, len(frame_timestamps), self.seq_len,
            self.max_area, self.downsample,
            (int(duration * target_fps) - 1) // self.downsample[0] + 1)
        target_duration = of / target_fps
        begin = 0.0 if self.zero_start else float(
            rng.uniform(0, duration - target_duration))
        ts = np.linspace(begin, begin + target_duration, of)
        ids = np.argmax((ts[:, None] >= frame_timestamps[None, :, 0])
                        & (ts[:, None] < frame_timestamps[None, :, 1]),
                        axis=1).tolist()
        return ids, (x1, x2, y1, y2), (oh, ow), target_fps

    def _frameids_keep_last(self, fps, frame_timestamps, h, w, crop_box, rng):
        """uniform resample over the whole clip, fps implied (:187-218)."""
        duration = float(frame_timestamps[-1].mean())
        x1, x2, y1, y2 = (0, w, 0, h) if crop_box is None else crop_box
        of, oh, ow = _latent_size(
            y2 - y1, x2 - x1, len(frame_timestamps), self.seq_len,
            self.max_area, self.downsample,
            (len(frame_timestamps) - 1) // self.downsample[0] + 1)
        ts = np.linspace(0.0, duration, of)
        ids = np.argmax((ts[:, None] >= frame_timestamps[None, :, 0])
                        & (ts[:, None] <= frame_timestamps[None, :, 1]),
                        axis=1).tolist()
        return ids, (x1, x2, y1, y2), (oh, ow), of / duration

    def get_frameid_bbox(self, fps, frame_timestamps, h, w, crop_box=None,
                         rng=None):
        rng = np.random.default_rng(2024) if rng is None else rng
        fn = (self._frameids_keep_last if self.keep_last
              else self._frameids_default)
        return fn(fps, frame_timestamps, h, w, crop_box, rng)

    # -- array path ------------------------------------------------------

    def load_video_batch(self, *videos: np.ndarray, fps: float = 16.0,
                         crop_box=None, seed: int = 2024):
        """videos: [T, H, W, 3] decoded frame arrays (uint8 or float01).
        Returns (*tensors [3,T',oh,ow] in [-1,1], frame_ids, (oh,ow), fps)."""
        rng = np.random.default_rng(seed)
        length = min(v.shape[0] for v in videos)
        # synthetic per-frame [start, end) timestamps at the given fps
        starts = np.arange(length, dtype=np.float32) / fps
        frame_timestamps = np.stack([starts, starts + 1.0 / fps], axis=-1)
        h, w = videos[0].shape[1:3]
        ids, (x1, x2, y1, y2), (oh, ow), out_fps = self.get_frameid_bbox(
            fps, frame_timestamps, h, w, crop_box, rng)
        outs = []
        for v in videos:
            sel = _to_float01(np.asarray(v)[ids, y1:y2, x1:x2])
            outs.append(_resize_crop(sel, oh, ow))
        return (*outs, ids, (oh, ow), out_fps)

    def load_video(self, video: np.ndarray, **kw):
        return self.load_video_batch(video, **kw)

    def load_video_pair(self, video: np.ndarray, mask: np.ndarray, **kw):
        return self.load_video_batch(video, mask, **kw)


def prepare_source(
    src_video: List[Optional[jnp.ndarray]],
    src_mask: List[Optional[jnp.ndarray]],
    src_ref_images: List[Optional[List[Optional[jnp.ndarray]]]],
    num_frames: int,
    image_size: Tuple[int, int],
) -> Tuple[list, list, list]:
    """Fill None slots and letterbox ref images (vace_processor.py:272-305):
    missing video -> zeros [3,T,H,W], missing mask -> ones [1,T,H,W];
    ref images bilinear-fit onto a white (+1) canvas, centered."""
    ch, cw = image_size
    for i, (v, m) in enumerate(zip(src_video, src_mask)):
        if v is None and m is None:
            src_video[i] = jnp.zeros((3, num_frames, ch, cw), jnp.float32)
            src_mask[i] = jnp.ones((1, num_frames, ch, cw), jnp.float32)
    for refs in src_ref_images:
        if refs is None:
            continue
        for j, ref in enumerate(refs):
            if ref is None or ref.shape[-2:] == (ch, cw):
                continue
            rh, rw = ref.shape[-2:]
            scale = min(ch / rh, cw / rw)
            nh, nw = int(rh * scale), int(rw * scale)
            img = jax.image.resize(ref.reshape(3, rh, rw), (3, nh, nw),
                                   method="bilinear")
            canvas = jnp.ones((3, 1, ch, cw), ref.dtype)
            top, left = (ch - nh) // 2, (cw - nw) // 2
            canvas = canvas.at[:, 0, top:top + nh, left:left + nw].set(img)
            refs[j] = canvas
    return src_video, src_mask, src_ref_images
