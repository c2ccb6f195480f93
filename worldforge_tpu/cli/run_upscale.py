"""Standalone 480p->720p upscale CLI (LongCat refine).

Flag surface mirrors /root/reference/longcat_for_worldforge/run_upscale.py
:54-181 (torchrun multi-GPU there; here sharding is a jit property and
`--context_parallel_size` maps to the sp mesh axis)."""

from __future__ import annotations

import argparse



def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="LongCat 480p->720p upscale (TPU)")
    p.add_argument("--checkpoint_dir", type=str, default=None)
    p.add_argument("--input", type=str, required=True,
                   help="stage-1 video file or frame directory")
    p.add_argument("--output", type=str, default="output_720p.mp4")
    p.add_argument("--prompt", type=str, default="")
    p.add_argument("--num-inference-steps", type=int, default=50)
    p.add_argument("--t-thresh", type=float, default=0.6)
    p.add_argument("--spatial-refine-only", action="store_true")
    p.add_argument("--no-bsa", action="store_true")
    p.add_argument("--bsa-sparsity", type=float, default=0.875)
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--fps", type=int, default=30)
    p.add_argument("--context_parallel_size", type=int, default=1)
    p.add_argument("--random-init", action="store_true")
    p.add_argument("--target-height", type=int, default=720)
    p.add_argument("--target-width", type=int, default=1280)
    return p


def main(argv=None) -> None:
    import jax

    args = build_parser().parse_args(argv)

    from worldforge_tpu.cli.warp_depthcrafter import _load_frames
    frames = _load_frames(args.input)  # [T, H, W, 3] in [0,1]

    from worldforge_tpu.io.checkpoints import load_longcat_pipeline
    pipe, encode_text = load_longcat_pipeline(args.checkpoint_dir,
                                              random_init=args.random_init)
    pe, pmask = encode_text(args.prompt)

    out = pipe.generate_refine(
        jax.random.key(args.seed), frames, pe, pmask,
        height=args.target_height, width=args.target_width,
        num_inference_steps=args.num_inference_steps,
        t_thresh=args.t_thresh,
        spatial_refine_only=args.spatial_refine_only,
        use_bsa=not args.no_bsa, bsa_sparsity=args.bsa_sparsity)

    from worldforge_tpu.io.frames import export_video
    frames_out = [out[0].transpose(1, 2, 3, 0)[i]
                  for i in range(out.shape[2])]
    export_video(frames_out, args.output, fps=args.fps)
    print(f"Upscaled video saved to: {args.output}")


if __name__ == "__main__":
    main()
