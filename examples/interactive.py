"""Load-once, iterate-params interactive session (the TPU equivalent of
/root/reference/longcat_for_worldforge/longcat_interactive.ipynb: models
stay resident; re-run generate with different guidance params).

Usage (e.g. in IPython):
    from examples.interactive import Session
    s = Session(random_init=True)                  # or checkpoint_dir=...
    out = s.generate(scene="truck", guide_steps=15, omega=4.0)
    out = s.generate(scene="truck", guide_steps=18, omega=6.0)  # fast re-run
"""

from __future__ import annotations

import numpy as np


class Session:
    def __init__(self, video_ref: str = "/root/reference/test_case/truck/imgs",
                 checkpoint_dir=None, random_init: bool = False,
                 backend: str = "longcat", resize=(96, 160), num_frames=9):
        import jax
        import jax.numpy as jnp
        from worldforge_tpu.io.frames import (read_frames_from_directory,
                                              resize_to_mod)
        from worldforge_tpu.io.checkpoints import (load_longcat_pipeline,
                                                   load_wan_pipeline)

        self.backend = backend
        frames, masks, _ = read_frames_from_directory(video_ref)
        video = np.stack(frames).astype(np.float32) / 255.0
        if resize is not None:
            from PIL import Image
            h, w = resize
            video = np.stack([np.asarray(Image.fromarray(
                (f * 255).astype(np.uint8)).resize((w, h)))
                for f in video]).astype(np.float32) / 255.0
        self.video = resize_to_mod(video[:num_frames], 16)
        t, hh, ww, _ = self.video.shape
        self.mask = (np.stack(masks[:num_frames]).astype(np.float32)
                     if masks else np.ones((t, hh, ww), np.float32))
        if self.mask.shape[1:] != (hh, ww):
            from PIL import Image
            self.mask = np.stack([np.asarray(Image.fromarray(
                (m * 255).astype(np.uint8)).resize((ww, hh), Image.NEAREST))
                for m in self.mask]).astype(np.float32) / 255.0

        if backend == "longcat":
            self.pipe, self.encode_text = load_longcat_pipeline(
                checkpoint_dir, random_init=random_init)
        else:
            self.pipe, self.encode_text, self.encode_image = \
                load_wan_pipeline(checkpoint_dir, random_init=random_init)

    def generate(self, scene: str = "truck", *, num_inference_steps=16,
                 guidance_scale=4.0, guide_steps=15, omega=4.0,
                 resample_steps=2, resample_round=None, use_flf=True,
                 seed=42, **kw):
        import jax
        import jax.numpy as jnp
        from worldforge_tpu.sampling.guidance import GuidanceConfig
        from worldforge_tpu.utils.prompts import get_prompt

        t, hh, ww, _ = self.video.shape
        g = GuidanceConfig(
            guided=True, guide_steps=guide_steps,
            resample_steps=resample_steps,
            resample_round=resample_round or guide_steps, omega=omega,
            use_flf=use_flf,
            flf_backend="longcat" if self.backend == "longcat" else "wan")
        image = jnp.asarray(
            self.video[0].transpose(2, 0, 1)[None] * 2.0 - 1.0)
        ref = jnp.asarray(self.video.transpose(3, 0, 1, 2)[None])
        mask = jnp.asarray(self.mask[None, None])
        prompt = get_prompt(scene)
        if self.backend == "longcat":
            pe, pm = self.encode_text(prompt)
            return self.pipe.generate_i2v(
                jax.random.key(seed), image, pe, pm, None, None,
                height=hh, width=ww, num_frames=t,
                num_inference_steps=num_inference_steps,
                guidance_scale=guidance_scale, video_ref=ref, mask=mask,
                guidance=g, **kw)
        pe = self.encode_text(prompt)
        ie = self.encode_image(self.video[0])
        return self.pipe.generate(
            jax.random.key(seed), image, pe, None, ie, height=hh, width=ww,
            num_frames=t, num_inference_steps=num_inference_steps,
            guidance_scale=guidance_scale, video_ref=ref, mask=mask,
            guidance=g, **kw)
