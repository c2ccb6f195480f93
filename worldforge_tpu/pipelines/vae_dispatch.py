"""Shared streaming-vs-single-pass Wan-VAE dispatch for the pipelines.

Centralizes the logic previously duplicated across WanI2VPipeline /
LongCatPipeline (decode fn, encode fn, fused-runner function pair), and
makes the streaming ENCODE shape-aware: `vae_encode_streaming` requires
T = 1 + 4k input frames (the causal [1, 4, 4, ...] chunking,
vae_stream.py:268-288), but e.g. `generate_refine` pads frames to the
BSA latent granularity producing T = 4k (matching the reference's
padding, pipeline_longcat_video.py:1411-1428) — those calls fall back to
the single-pass encoder rather than crash in the chunk reshape.
"""

from __future__ import annotations

import functools

import jax

from worldforge_tpu.models.wan.vae import vae_decode, vae_encode


def streaming_encode_ok(t_frames: int) -> bool:
    """vae_encode_streaming's chunking needs T = 1 + 4k."""
    return (t_frames - 1) % 4 == 0


def vae_fn_pair(streaming: bool, chunk: int = 1):
    """(decode_fn, encode_fn) with signature f(params, cfg, x) — the raw
    function pair for fused runners that close over params. The encode fn
    is shape-aware (see module docstring)."""
    if not streaming:
        return vae_decode, vae_encode
    from worldforge_tpu.models.wan.vae_stream import (vae_decode_streaming,
                                                      vae_encode_streaming)
    dec = functools.partial(vae_decode_streaming, chunk=chunk)

    def enc(params, cfg, video):
        if streaming_encode_ok(video.shape[2]):
            return vae_encode_streaming(params, cfg, video)
        return vae_encode(params, cfg, video)

    return dec, enc


def jit_vae_fns(params, cfg, streaming: bool, chunk: int = 1):
    """Jitted (decode(z), encode(video)) closures over fixed params.

    params is threaded as a REAL jit argument, not a closure capture:
    jax inlines captured arrays into the StableHLO as constants, and at
    production VAE size the serialized module then exceeds the remote-
    compile request limit (HTTP 413 through the axon tunnel) — and would
    bloat the compile cache on any host."""
    dec, enc = vae_fn_pair(streaming, chunk)
    jdec = jax.jit(lambda p, z: dec(p, cfg, z))
    jenc = jax.jit(lambda p, v: enc(p, cfg, v))
    return (lambda z: jdec(params, z)), (lambda v: jenc(params, v))
