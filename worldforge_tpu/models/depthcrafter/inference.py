"""DepthCrafter inference entry: frames -> normalized depth (stage 1 of the
4D warp CLI, warp_depthcrafter.py:30-137)."""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np

from worldforge_tpu.models.depthcrafter.unet import SVDUNetConfig
from worldforge_tpu.models.depthcrafter.vae import SVDVAEConfig
from worldforge_tpu.pipelines.depthcrafter import (DepthCrafterPipeline,
                                                   normalize_depth)


def estimate_depth(frames: np.ndarray, *, num_inference_steps: int = 5,
                   guidance_scale: float = 1.0, max_res: int = 1024,
                   window_size: int = 110, overlap: int = 25,
                   checkpoint: Optional[str] = None,
                   seed: int = 42) -> np.ndarray:
    """frames [T, H, W, 3] float [0,1] -> depth [T, H', W'] in [0, 1]
    (64-multiple resize like read_video_frames, depthcrafter/utils.py:22-138).
    """
    t, h, w, _ = frames.shape
    scale = min(max_res / max(h, w), 1.0)
    nh = round(h * scale / 64) * 64 or 64
    nw = round(w * scale / 64) * 64 or 64
    if (nh, nw) != (h, w):
        from PIL import Image
        frames = np.stack([np.asarray(Image.fromarray(
            (f * 255).astype(np.uint8)).resize((nw, nh), Image.BICUBIC))
            for f in frames]).astype(np.float32) / 255.0

    if checkpoint is None:
        raise SystemExit(
            "DepthCrafter weights required: convert the tencent/DepthCrafter "
            "checkpoint (see worldforge_tpu.io.convert_depthcrafter) or pass "
            "--depth_npz with precomputed depth.")

    from worldforge_tpu.io.convert_depthcrafter import load_converted_depthcrafter
    pipe = load_converted_depthcrafter(checkpoint)
    out = pipe(jax.random.key(seed), frames,
               num_inference_steps=num_inference_steps,
               guidance_scale=guidance_scale, window_size=window_size,
               overlap=overlap)
    return normalize_depth(out)
