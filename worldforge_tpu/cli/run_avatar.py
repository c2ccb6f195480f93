"""Avatar (audio-driven talking-head) generation CLI.

The reference vendors the avatar model without a runnable script
(longcat_video/modules/avatar/ — upstream capability, SURVEY §2.4); this
CLI completes the path: reference image + waveform -> wav2vec2 features ->
per-frame windows -> AvatarPipeline.generate_i2v_audio -> mp4.

Audio input: a mono 16 kHz .npy waveform (decode your audio to that with
any host tool — this environment has no audio codecs baked in).
"""

from __future__ import annotations

import argparse

import numpy as np


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="LongCat avatar i2v-audio (TPU)")
    p.add_argument("--checkpoint_dir", type=str, default=None,
                   help="converted avatar DiT + VAE + wav2vec2 dir")
    p.add_argument("--image", type=str, required=True)
    p.add_argument("--audio", type=str, required=True,
                   help=".npy mono waveform @ 16 kHz")
    p.add_argument("--prompt", type=str, default="a person talking")
    p.add_argument("--negative_prompt", type=str, default=None)
    p.add_argument("--num-frames", type=int, default=93)
    p.add_argument("--num-inference-steps", type=int, default=50)
    p.add_argument("--guidance-scale", type=float, default=4.0)
    p.add_argument("--use_distill", action="store_true")
    p.add_argument("--resize", type=int, nargs=2, default=None,
                   metavar=("H", "W"))
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--fps", type=int, default=25)
    p.add_argument("--output", type=str, default="output_avatar.mp4")
    p.add_argument("--random-init", action="store_true",
                   help="tiny random-weight smoke run (no checkpoints)")
    return p


def _load_waveform(path: str, target_sr: int = 16000) -> "np.ndarray":
    """Load a mono float32 waveform [1, T] at 16 kHz from .wav (stdlib,
    16/32-bit PCM, downmixed + linearly resampled) or .npy (raw array,
    assumed already 16 kHz — the wav2vec2 front end's rate)."""
    if path.endswith(".npy"):
        return np.load(path).astype(np.float32).reshape(1, -1)
    import wave
    with wave.open(path, "rb") as f:
        sr = f.getframerate()
        n = f.getnframes()
        width = f.getsampwidth()
        ch = f.getnchannels()
        raw = f.readframes(n)
    if width == 3:  # 24-bit PCM: widen each 3-byte sample to int32
        b = np.frombuffer(raw, dtype=np.uint8).reshape(-1, 3)
        x = ((b[:, 0].astype(np.int32)) | (b[:, 1].astype(np.int32) << 8)
             | (b[:, 2].astype(np.int32) << 16))
        x = ((x << 8) >> 8).astype(np.float32) / float(2 ** 23 - 1)
    elif width in (1, 2, 4):
        dtype = {1: np.uint8, 2: np.int16, 4: np.int32}[width]
        x = np.frombuffer(raw, dtype=dtype).astype(np.float32)
        if width == 1:
            x = (x - 128.0) / 128.0
        else:
            x = x / float(np.iinfo(dtype).max)
    else:
        raise ValueError(f"unsupported WAV sample width: {width} bytes")
    if ch > 1:
        x = x.reshape(-1, ch).mean(axis=1)
    if sr != target_sr:
        t_new = np.linspace(0.0, 1.0, int(round(len(x) * target_sr / sr)),
                            endpoint=False)
        t_old = np.linspace(0.0, 1.0, len(x), endpoint=False)
        x = np.interp(t_new, t_old, x).astype(np.float32)
    return x.reshape(1, -1)


def main(argv=None) -> None:
    args = build_parser().parse_args(argv)

    import jax
    import jax.numpy as jnp

    from worldforge_tpu.io.checkpoints import load_avatar_pipeline
    from worldforge_tpu.io.frames import export_video, load_image
    from worldforge_tpu.utils.prompts import get_negative_prompt

    pipe, encode_text, encode_audio = load_avatar_pipeline(
        args.checkpoint_dir, random_init=args.random_init,
        use_distill=args.use_distill)

    img = load_image(args.image).astype(np.float32) / 255.0  # [H,W,3] [0,1]
    if args.resize is not None:
        import cv2
        img = cv2.resize(img, (args.resize[1], args.resize[0]),
                         interpolation=cv2.INTER_AREA)
    h, w = img.shape[:2]
    image = jnp.asarray(img.transpose(2, 0, 1)[None] * 2.0 - 1.0,
                        jnp.float32)

    wav = _load_waveform(args.audio)
    audio_windows = encode_audio(wav, args.num_frames)

    pe, pm = encode_text(args.prompt)
    neg = args.negative_prompt or get_negative_prompt(static=False)
    ne, nm = encode_text(neg)

    video = pipe.generate_i2v_audio(
        jax.random.key(args.seed), image, audio_windows, pe, pm, ne, nm,
        height=h, width=w, num_frames=args.num_frames,
        num_inference_steps=args.num_inference_steps,
        guidance_scale=args.guidance_scale,
        use_distill=args.use_distill)
    frames = np.asarray(video[0]).transpose(1, 2, 3, 0)   # [T, H, W, 3]
    export_video(frames, args.output, fps=args.fps)
    print(f"wrote {args.output}: {frames.shape}")


if __name__ == "__main__":
    main()
