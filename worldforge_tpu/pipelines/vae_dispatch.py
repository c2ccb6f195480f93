"""Shared streaming-vs-single-pass Wan-VAE dispatch for the pipelines.

Centralizes the logic previously duplicated across WanI2VPipeline /
LongCatPipeline (decode fn, encode fn, fused-runner function pair), and
makes the ENCODE shape-aware: the causal chunking consumes T = 1 + 4k
input frames ([1, 4, 4, ...]), but e.g. `generate_refine` pads frames to
the BSA latent granularity producing T = 4k (matching the reference's
padding, pipeline_longcat_video.py:1411-1428). The reference encoder
SILENTLY DROPS the tail frames past the last full causal chunk
(autoencoder_kl_wan.py:1155-1166: iter_ = 1 + (T-1)//4 and the final
chunk reads x[:, :, 1+4(i-1) : 1+4i] — a T=64 input encodes frames
[0:61]); we mirror that by truncating to T' = 1 + 4*((T-1)//4) before
encoding. Same latent count as before, reference-exact values — and it
keeps the 720p refine on the STREAMING encoder (round 4: the previous
single-pass fallback materialized a 24 GB first-conv activation at
704x1280x64f and could not compile on 16 GB).
"""

from __future__ import annotations

import functools

import jax

from worldforge_tpu.models.wan.vae import vae_decode, vae_encode


def streaming_encode_ok(t_frames: int) -> bool:
    """The causal chunking needs T = 1 + 4k."""
    return (t_frames - 1) % 4 == 0


def _truncate_to_causal(video):
    """Drop tail frames past the last full causal chunk — the reference
    encoder's own (implicit) behavior for T != 1+4k inputs (module
    docstring)."""
    t = video.shape[2]
    if streaming_encode_ok(t):
        return video
    return video[:, :, : 1 + 4 * ((t - 1) // 4)]


def vae_fn_pair(streaming: bool, chunk: int = 1, spatial_chunks: int = 1):
    """(decode_fn, encode_fn) with signature f(params, cfg, x) — the raw
    function pair for fused runners that close over params. The encode fn
    is shape-aware (see module docstring). spatial_chunks>1 H-strip-tiles
    the streaming decoder's spatial convs (exact; the 720p-decode-next-to-
    DiT capacity knob — vae_stream.py)."""
    if not streaming:
        return vae_decode, (lambda p, cfg, v:
                            vae_encode(p, cfg, _truncate_to_causal(v)))
    from worldforge_tpu.models.wan.vae_stream import (vae_decode_streaming,
                                                      vae_encode_streaming)
    dec = functools.partial(vae_decode_streaming, chunk=chunk,
                            spatial_chunks=spatial_chunks)

    def enc(params, cfg, video):
        return vae_encode_streaming(params, cfg, _truncate_to_causal(video),
                                    spatial_chunks=spatial_chunks)

    return dec, enc


def jit_vae_fns(params, cfg, streaming: bool, chunk: int = 1,
                spatial_chunks: int = 1):
    """Jitted (decode(z), encode(video)) closures over fixed params.

    params is threaded as a REAL jit argument, not a closure capture:
    jax inlines captured arrays into the StableHLO as constants, and at
    production VAE size the serialized module then exceeds the remote-
    compile request limit (HTTP 413 through the axon tunnel) — and would
    bloat the compile cache on any host."""
    dec, enc = vae_fn_pair(streaming, chunk, spatial_chunks)
    jdec = jax.jit(lambda p, z: dec(p, cfg, z))
    jenc = jax.jit(lambda p, v: enc(p, cfg, v))
    return (lambda z: jdec(params, z)), (lambda v: jenc(params, v))
