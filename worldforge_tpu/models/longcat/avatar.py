"""LongCat avatar DiT: audio-conditioned talking-head variant.

Behavioral reference: longcat_video/modules/avatar/:
  - longcat_video_dit_avatar.py:24-192 (LongCatAvatarSingleStreamBlock:
    base LongCat block + audio cross-attn with its own 3-way adaLN
    modulation over NOISE frames only; cond frames receive zero audio)
  - longcat_video_dit_avatar.py:373-513 (audio window regrouping: frame 0
    keeps its full 5-sample window; each latent frame (vae_scale=4 video
    frames) packs [first-half of frame a, middles, last-half of frame d]
    into an 8-sample window)
  - blocks.py:8-88 (AudioProjModel: flattened window x 12 wav2vec blocks
    x 768 -> relu MLP -> 32 context tokens of 768)
  - attention.py:281-460 (SingleStreamAttention: PER-FRAME cross
    attention — each latent frame's tokens attend to that frame's 32
    audio tokens; qk RMSNorm)

Scope: singletalk (human_num=None) AND multitalk (two-speaker,
attention-map-driven 1D RoPE partitioning, attention.py:343-386) — see
`multitalk_rope_partition` / the human_num branch below; both are
parity-tested in tests/test_avatar_pipeline.py.

TPU-first: per-frame audio cross-attention maps to a single batched SDPA
with the frame axis folded into batch — no varlen packing needed since
every frame has exactly context_tokens keys. Blocks are stacked and
scanned like the base model.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from worldforge_tpu.core import params as P
from worldforge_tpu.core.dtypes import DEFAULT_POLICY, Policy
from worldforge_tpu.models.longcat.dit import (LongCatDiTConfig, _heads_hd,
                                               _modulate_per_frame, _rms_hd,
                                               _cross_attention_lc,
                                               _self_attention_lc,
                                               init_longcat_layer,
                                               swiglu_ffn,
                                               timestep_embedding)
from worldforge_tpu.ops.attention import attention
from worldforge_tpu.ops.rope import rope_cos_sin


@dataclasses.dataclass(frozen=True)
class AvatarConfig:
    base: LongCatDiTConfig = dataclasses.field(
        default_factory=LongCatDiTConfig)
    audio_window: int = 5
    audio_blocks: int = 12          # stacked wav2vec2 encoder layers
    audio_channels: int = 768
    intermediate_dim: int = 512
    output_dim: int = 768
    context_tokens: int = 32
    vae_scale: int = 4
    audio_prenorm: bool = False
    class_range: int = 24           # multitalk RoPE band span
    class_interval: int = 4

    @property
    def window_vf(self) -> int:
        return self.audio_window + self.vae_scale - 1

    @classmethod
    def tiny(cls) -> "AvatarConfig":
        return cls(base=LongCatDiTConfig.tiny(), audio_blocks=2,
                   audio_channels=8, intermediate_dim=16, output_dim=8,
                   context_tokens=4)


# ----------------------------------------------------------- audio proj


def init_audio_proj(key, cfg: AvatarConfig, dtype=jnp.float32) -> dict:
    ks = P.split_keys(key, 4)
    in_dim = cfg.audio_window * cfg.audio_blocks * cfg.audio_channels
    in_dim_vf = cfg.window_vf * cfg.audio_blocks * cfg.audio_channels
    return {
        "proj1": P.dense_init(ks[0], in_dim, cfg.intermediate_dim,
                              dtype=dtype),
        "proj1_vf": P.dense_init(ks[1], in_dim_vf, cfg.intermediate_dim,
                                 dtype=dtype),
        "proj2": P.dense_init(ks[2], cfg.intermediate_dim,
                              cfg.intermediate_dim, dtype=dtype),
        "proj3": P.dense_init(ks[3], cfg.intermediate_dim,
                              cfg.context_tokens * cfg.output_dim,
                              dtype=dtype),
        "norm": P.layer_norm_init(cfg.output_dim, dtype=dtype),
    }


def audio_proj_forward(p, cfg: AvatarConfig, first: jnp.ndarray,
                       latter: jnp.ndarray) -> jnp.ndarray:
    """first [B, 1, W, S, C]; latter [B, T-1, W+vs-1, S, C] ->
    [B, T, context_tokens, output_dim] (blocks.py:41-88)."""
    b = first.shape[0]
    f = jax.nn.relu(P.dense(p["proj1"], first.reshape(b, 1, -1)))
    lf = jax.nn.relu(P.dense(p["proj1_vf"],
                             latter.reshape(b, latter.shape[1], -1)))
    x = jnp.concatenate([f, lf], axis=1)                  # [B, T, inter]
    x = jax.nn.relu(P.dense(p["proj2"], x))
    tok = P.dense(p["proj3"], x).reshape(
        b, x.shape[1], cfg.context_tokens, cfg.output_dim)
    return P.layer_norm(p["norm"], tok, eps=1e-5)


def regroup_audio_windows(cfg: AvatarConfig,
                          audio_cond: jnp.ndarray
                          ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """audio_cond [B, T_video, W, S, C] (per-video-frame sliding windows of
    W=5 wav2vec features x S=12 blocks) -> (first [B,1,W,S,C],
    latter [B,(T_video-1)//vae_scale, W+vs-1, S, C]) — the avatar model's
    window regrouping (longcat_video_dit_avatar.py:413-428): per latent
    frame of vae_scale video frames keep [first half of frame a | middle
    samples | last half of frame d]."""
    first = audio_cond[:, :1]
    latter = audio_cond[:, 1:]
    b, tm1, w, s, c = latter.shape
    vs = cfg.vae_scale
    mid = cfg.audio_window // 2
    lat = latter.reshape(b, tm1 // vs, vs, w, s, c)
    head = lat[:, :, :1, :mid + 1].reshape(b, tm1 // vs, -1, s, c)
    tail = lat[:, :, -1:, mid:].reshape(b, tm1 // vs, -1, s, c)
    midp = lat[:, :, 1:-1, mid:mid + 1].reshape(b, tm1 // vs, -1, s, c)
    return first, jnp.concatenate([head, midp, tail], axis=2)


# ------------------------------------------------------------ multitalk


def rope_1d_rotate(x: jnp.ndarray, pos: jnp.ndarray,
                   base: float = 10000.0) -> jnp.ndarray:
    """Interleaved-pair 1D RoPE (avatar/rope_3d.py:126-168 + rotate_half
    :33-37). x [..., S, H, D] with positions pos [..., S]."""
    d = x.shape[-1]
    freqs = 1.0 / (base ** (jnp.arange(0, d, 2, dtype=jnp.float32) / d))
    ang = pos.astype(jnp.float32)[..., None] * freqs      # [..., S, D/2]
    cos = jnp.repeat(ang, 2, axis=-1)[..., None, :]
    sin = jnp.sin(cos)
    cos = jnp.cos(cos)
    xf = x.astype(jnp.float32)
    x2 = xf.reshape(xf.shape[:-1] + (d // 2, 2))
    rot = jnp.stack([-x2[..., 1], x2[..., 0]], axis=-1).reshape(xf.shape)
    return (xf * cos + rot * sin).astype(x.dtype)


def attn_map_with_target(noise_q: jnp.ndarray, ref_k: jnp.ndarray,
                         ref_target_masks: jnp.ndarray,
                         split_num: int = 2) -> jnp.ndarray:
    """Per-speaker attention mass of noise queries onto masked reference
    tokens (audio_process/torch_utils.py:30-107): heads split into
    `split_num` groups, per group softmax(q k^T / sqrt(d)) over ref
    tokens, masked mean over ref tokens and heads, averaged over groups.
    noise_q [B, Sn, H, D]; ref_k [B, Sref, H, D]; masks [C, Sref].
    Returns [C, Sn]."""
    b, sn, h, d = noise_q.shape
    scale = 1.0 / math.sqrt(d)
    hc = h // split_num
    maps = []
    for g in range(split_num):
        q = noise_q[:, :, g * hc:(g + 1) * hc].astype(jnp.float32)
        k = ref_k[:, :, g * hc:(g + 1) * hc].astype(jnp.float32)
        att = jax.nn.softmax(
            jnp.einsum("bqhd,bkhd->bhqk", q * scale, k), axis=-1)
        m = ref_target_masks.astype(jnp.float32)          # [C, Sref]
        num = jnp.einsum("bhqk,ck->cbhq", att, m)
        per = num / jnp.maximum(m.sum(axis=1)[:, None, None, None], 1e-8)
        maps.append(per.mean(axis=(1, 2)))                # [C, Sn]
    return sum(maps) / split_num


def normalize_and_scale(column: jnp.ndarray, source_range, target_range,
                        epsilon: float = 1e-8) -> jnp.ndarray:
    """Linear rescale (avatar/attention.py:17-23)."""
    smin, smax = source_range
    tmin, tmax = target_range
    return (column - smin) / (smax - smin + epsilon) * (tmax - tmin) + tmin


def multitalk_positions(x_ref_attn_map: jnp.ndarray,
                        class_range: int = 24,
                        class_interval: int = 4) -> jnp.ndarray:
    """Token RoPE positions from the 2-speaker attention map
    (avatar/attention.py:343-360): speaker 1 normalized into
    [0, interval], speaker 2 into [range-interval, range]; background
    tokens sit at range//2; each token takes the band of its argmax
    speaker. Returns [Sn] float positions."""
    h1 = normalize_and_scale(
        x_ref_attn_map[0],
        (x_ref_attn_map[0].min(), x_ref_attn_map[0].max()),
        (0.0, float(class_interval)))
    h2 = normalize_and_scale(
        x_ref_attn_map[1],
        (x_ref_attn_map[1].min(), x_ref_attn_map[1].max()),
        (float(class_range - class_interval), float(class_range)))
    back = jnp.full_like(h1, class_range // 2)
    stacked = jnp.stack([h1, h2, back], axis=1)           # [Sn, 3]
    idx = jnp.argmax(x_ref_attn_map, axis=0)              # [Sn]
    return jnp.take_along_axis(stacked, idx[:, None], axis=1)[:, 0]


# ------------------------------------------------- ref-aware self-attn


def avatar_self_attention(p, cfg: AvatarConfig, x_m, cos, sin, T: int,
                          num_cond_latents: int, num_ref_latents: int,
                          ref_img_index: Optional[int],
                          mask_frame_range: Optional[int],
                          policy: Policy, attn_impl: str,
                          ref_target_masks: Optional[jnp.ndarray] = None):
    """Avatar self-attention with reference-frame partitioning
    (avatar/attention.py:118-213, video continuation):
      - ref frames (first num_ref_latents) attend only to themselves
      - cond frames attend only to cond frames (ref excluded)
      - noise frames attend to everything, EXCEPT noise frames within
        mask_frame_range of ref_img_index, which attend to non-ref keys
        only (suppresses action repetition near the anchor frame)
    All indices are static python ints — each partition is its own SDPA
    call, fused by XLA."""
    from worldforge_tpu.models.longcat.dit import _heads_hd, _rms_hd
    from worldforge_tpu.ops.rope import apply_rope_qk

    base = cfg.base
    b, n, c = x_m.shape
    cdt = policy.compute_dtype
    h = base.num_heads
    sf = n // T
    qkv = P.dense(p["qkv"], x_m.astype(cdt))
    q, k, v = jnp.split(qkv, 3, axis=-1)
    q = _rms_hd(p["q_norm"], _heads_hd(q, h), base.eps)
    k = _rms_hd(p["k_norm"], _heads_hd(k, h), base.eps)
    v = _heads_hd(v, h)
    q, k = apply_rope_qk(q, k, cos, sin, out_dtype=cdt)

    attn = lambda q_, k_, v_: attention(q_, k_, v_, impl=attn_impl)
    nr = num_ref_latents * sf
    nc = num_cond_latents * sf

    o_ref = attn(q[:, :nr], k[:, :nr], v[:, :nr])
    o_cond = attn(q[:, nr:nc], k[:, nr:nc], v[:, nr:nc])

    # multitalk: per-speaker attention mass of noise queries on the ref
    # frame's masked tokens (avatar/attention.py:206-213)
    x_ref_attn_map = None
    if ref_target_masks is not None and num_cond_latents < T:
        x_ref_attn_map = attn_map_with_target(q[:, nc:], k[:, :sf],
                                              ref_target_masks)

    if num_cond_latents == T:
        o = jnp.concatenate([o_ref, o_cond], axis=1)
        return P.dense(p["attn_proj"],
                       o.reshape(b, n, c).astype(cdt)), x_ref_attn_map

    q_noise = q[:, nc:]
    num_noisy = T - num_cond_latents
    start = end = 0
    if mask_frame_range is not None and mask_frame_range > 0 \
            and ref_img_index is not None:
        start = ref_img_index - mask_frame_range - num_cond_latents \
            + num_ref_latents
        end = ref_img_index + mask_frame_range - num_cond_latents \
            + num_ref_latents + 1
    if start >= 0 and end > start and end <= num_noisy:
        sp, ep = start * sf, end * sf
        o_front = attn(q_noise[:, :sp], k, v)
        o_mask = attn(q_noise[:, sp:ep], k[:, nr:], v[:, nr:])
        o_back = attn(q_noise[:, ep:], k, v)
        o_noise = jnp.concatenate([o_front, o_mask, o_back], axis=1)
    else:
        o_noise = attn(q_noise, k, v)
    o = jnp.concatenate([o_ref, o_cond, o_noise], axis=1)
    return P.dense(p["attn_proj"],
                   o.reshape(b, n, c).astype(cdt)), x_ref_attn_map


# -------------------------------------------------------------- block


def init_avatar_layer(key, cfg: AvatarConfig, dtype=jnp.float32) -> dict:
    kb, k1, k2, k3, k4 = jax.random.split(key, 5)
    c = cfg.base.hidden_size
    hd = cfg.base.head_dim
    p = init_longcat_layer(kb, cfg.base, dtype)
    p.update({
        "audio_adaln": P.dense_init(k1, cfg.base.adaln_tembed_dim, 3 * c,
                                    dtype=jnp.float32),
        "pre_video_norm": P.layer_norm_init(c, dtype=dtype),
        "pre_audio_norm": P.layer_norm_init(cfg.output_dim, dtype=dtype),
        "a_q": P.dense_init(k2, c, c, dtype=dtype),
        "a_kv": P.dense_init(k3, cfg.output_dim, 2 * c, dtype=dtype),
        "a_q_norm": P.rms_norm_init(hd, dtype=jnp.float32),
        "a_k_norm": P.rms_norm_init(hd, dtype=jnp.float32),
        "a_proj": P.dense_init(k4, c, c, dtype=dtype),
    })
    return p


def _audio_cross_attention(p, cfg: AvatarConfig, x_noise: jnp.ndarray,
                           audio: jnp.ndarray, t_noise: int,
                           policy: Policy, attn_impl: str) -> jnp.ndarray:
    """Per-frame cross attention (attention.py:329-440, singletalk).
    x_noise [B, T_n*S_f, C]; audio [B, T_n, M, C_a]."""
    b, n, c = x_noise.shape
    cdt = policy.compute_dtype
    h = cfg.base.num_heads
    sf = n // t_noise
    xq = x_noise.reshape(b * t_noise, sf, c)
    q = _rms_hd(p["a_q_norm"],
                _heads_hd(P.dense(p["a_q"], xq.astype(cdt)), h),
                cfg.base.eps).astype(cdt)
    cond = audio.reshape(b * t_noise, audio.shape[2], -1)
    kv = P.dense(p["a_kv"], cond.astype(cdt))
    k, v = jnp.split(kv, 2, axis=-1)
    k = _rms_hd(p["a_k_norm"], _heads_hd(k, h), cfg.base.eps).astype(cdt)
    v = _heads_hd(v, h)
    o = attention(q, k, v, impl=attn_impl)
    o = P.dense(p["a_proj"], o.reshape(b * t_noise, sf, c).astype(cdt))
    return o.reshape(b, n, c)


def _audio_cross_attention_multitalk(p, cfg: AvatarConfig,
                                     x_noise: jnp.ndarray,
                                     audio: jnp.ndarray, t_noise: int,
                                     x_ref_attn_map: jnp.ndarray,
                                     policy: Policy,
                                     attn_impl: str) -> jnp.ndarray:
    """Two-speaker audio cross attention (avatar/attention.py:329-430,
    multitalk): query tokens get 1D-RoPE positions in the band of the
    speaker they attend to most; each speaker's audio keys sit at its
    band center; audio holds BOTH speakers' tokens per frame
    ([B, T_n, 2M, C_a])."""
    b, n, c = x_noise.shape
    cdt = policy.compute_dtype
    base = cfg.base
    h = base.num_heads
    sf = n // t_noise
    ci, cr = cfg.class_interval, cfg.class_range

    xq = x_noise.reshape(b * t_noise, sf, c)
    q = _rms_hd(p["a_q_norm"],
                _heads_hd(P.dense(p["a_q"], xq.astype(cdt)), h),
                base.eps)
    # per-token positions over the WHOLE noise sequence (:351-360)
    pos = multitalk_positions(x_ref_attn_map, cr, ci)      # [n]
    qf = q.reshape(b, n, h, -1)
    qf = rope_1d_rotate(qf, jnp.broadcast_to(pos[None], (b, n)))
    q = qf.reshape(b * t_noise, sf, h, -1).astype(cdt)

    cond = audio.reshape(b * t_noise, audio.shape[2], -1)
    kv = P.dense(p["a_kv"], cond.astype(cdt))
    k, v = jnp.split(kv, 2, axis=-1)
    k = _rms_hd(p["a_k_norm"], _heads_hd(k, h), base.eps)
    na = cond.shape[1]
    per_frame = jnp.where(jnp.arange(na) < na // 2,
                          (0.0 + ci) / 2.0, (cr - ci + cr) / 2.0)
    kf = k.reshape(b, t_noise * na, h, -1)
    kpos = jnp.broadcast_to(jnp.tile(per_frame, t_noise)[None],
                            (b, t_noise * na))
    kf = rope_1d_rotate(kf, kpos)
    k = kf.reshape(b * t_noise, na, h, -1).astype(cdt)
    v = _heads_hd(v, h)
    o = attention(q, k, v, impl=attn_impl)
    o = P.dense(p["a_proj"], o.reshape(b * t_noise, sf, c).astype(cdt))
    return o.reshape(b, n, c)


def avatar_layer_forward(p, cfg: AvatarConfig, x, t_emb, ctx, kv_lens,
                         audio, cos, sin, T: int, num_cond_latents: int = 0,
                         num_ref_latents: int = 0,
                         ref_img_index: Optional[int] = None,
                         mask_frame_range: Optional[int] = None,
                         ref_target_masks: Optional[jnp.ndarray] = None,
                         policy: Policy = DEFAULT_POLICY,
                         attn_impl: str = "auto", token_chunk: int = 1,
                         mesh=None):
    """Base LongCat block with the audio cross-attn branch inserted between
    text cross-attn and FFN (longcat_video_dit_avatar.py:98-192).
    audio: [B, T, M, C_a] per-latent-frame context tokens (2M tokens per
    frame in multitalk). ref_target_masks [2, Nh*Nw] enables multitalk.
    mesh: sp>1 routes the base self-attention through Ulysses
    (_self_attention_lc; the ref-map/multitalk variant stays unsharded —
    its attention-map statistics need the full sequence per device)."""
    base = cfg.base
    b, n, c = x.shape
    mod = P.dense(p["adaln"], jax.nn.silu(t_emb.astype(jnp.float32)),
                  compute_dtype=jnp.float32)
    sh_a, sc_a, g_a, sh_f, sc_f, g_f = jnp.split(mod, 6, axis=-1)

    xf = x.astype(jnp.float32)
    x_m = _modulate_per_frame(xf, sh_a, sc_a, T, base.eps)
    x_ref_attn_map = None
    if (num_ref_latents > 0 and num_cond_latents > 1) \
            or ref_target_masks is not None:
        y, x_ref_attn_map = avatar_self_attention(
            p, cfg, x_m.astype(policy.compute_dtype), cos, sin, T,
            max(num_cond_latents, 1), max(num_ref_latents, 1),
            ref_img_index, mask_frame_range, policy, attn_impl,
            ref_target_masks=ref_target_masks)
    else:
        y = _self_attention_lc(p, base, x_m.astype(policy.compute_dtype),
                               cos, sin, T, num_cond_latents, policy,
                               attn_impl, mesh=mesh)
    yf = y.astype(jnp.float32).reshape(b, T, n // T, c)
    xf = xf + (g_a[:, :, None] * yf).reshape(b, n, c)

    # text cross-attn
    h2 = P.layer_norm(p["pre_crs_norm"], xf, eps=base.eps,
                      out_dtype=policy.compute_dtype)
    xf = xf + _cross_attention_lc(p, base, h2, ctx, kv_lens, T,
                                  num_cond_latents, policy,
                                  attn_impl).astype(jnp.float32)

    # audio cross-attn over noise frames with its own modulation
    # (longcat_video_dit_avatar.py:160-178)
    nc = num_cond_latents * (n // T) if num_cond_latents else 0
    t_noise = T - num_cond_latents
    amod = P.dense(p["audio_adaln"],
                   jax.nn.silu(t_emb[:, num_cond_latents:]
                               .astype(jnp.float32)),
                   compute_dtype=jnp.float32)
    a_sh, a_sc, a_g = jnp.split(amod, 3, axis=-1)        # [B, T_n, C]
    xv = P.layer_norm(p["pre_video_norm"], xf[:, nc:], eps=base.eps,
                      out_dtype=policy.compute_dtype)
    audio_n = audio[:, num_cond_latents:]
    if cfg.audio_prenorm:
        audio_n = P.layer_norm(p["pre_audio_norm"], audio_n, eps=base.eps)
    if ref_target_masks is not None and x_ref_attn_map is not None:
        a_out = _audio_cross_attention_multitalk(
            p, cfg, xv, audio_n, t_noise, x_ref_attn_map, policy,
            attn_impl).astype(jnp.float32)
    else:
        a_out = _audio_cross_attention(p, cfg, xv, audio_n, t_noise,
                                       policy, attn_impl
                                       ).astype(jnp.float32)
    a_out = _modulate_per_frame(a_out, a_sh, a_sc, t_noise, base.eps)
    a_out = (a_g[:, :, None] * a_out.reshape(b, t_noise, -1, c)
             ).reshape(b, n - nc, c)
    if nc:
        a_out = jnp.concatenate(
            [jnp.zeros((b, nc, c), a_out.dtype), a_out], axis=1)
    xf = xf + a_out

    # FFN
    x_m = _modulate_per_frame(xf, sh_f, sc_f, T, base.eps).astype(
        policy.compute_dtype)
    ff = swiglu_ffn(p, x_m, token_chunk)
    ff = ff.astype(jnp.float32).reshape(b, T, n // T, c)
    return xf + (g_f[:, :, None] * ff).reshape(b, n, c)


# ----------------------------------------------------------- KV cache


def avatar_dit_cache_cond(params, cfg: AvatarConfig, cond_latents,
                          policy: Policy = DEFAULT_POLICY):
    """Cache clean cond-frame K/V per block. skip_crs_attn=True during
    caching gates BOTH text and audio branches
    (longcat_video_dit_avatar.py:143-178 under `if not skip_crs_attn`),
    so the avatar cache pass is exactly the base one over the avatar
    blocks (extra audio params unused)."""
    from worldforge_tpu.models.longcat.dit import longcat_dit_cache_cond

    return longcat_dit_cache_cond(params, cfg.base, cond_latents,
                                  policy=policy)


def avatar_dit_forward_with_cache(params, cfg: AvatarConfig, hidden_states,
                                  timestep, encoder_hidden_states,
                                  audio_embs, kv_cache, cond_grid,
                                  encoder_attention_mask=None,
                                  policy: Policy = DEFAULT_POLICY,
                                  attn_impl: str = "auto"):
    """Denoise noise latents against cached cond K/V with audio
    conditioning (avatar attention.py:216-280 + block kv_cache branch:
    text cross-attn over ALL noise tokens, audio with num_cond_latents=0).
    hidden_states [B, C, T_noise, H, W]; audio_embs covers the FULL video
    ([B, T_video, W, S, C_a]) — the last T_noise latent frames are used."""
    from worldforge_tpu.models.wan.dit import patchify, unpatchify
    from worldforge_tpu.models.longcat.dit import (_cross_attention_lc,
                                                   timestep_embedding)
    from worldforge_tpu.ops.rope import (apply_rope, apply_rope_qk,
                                         rope_cos_sin)

    base = cfg.base
    b, _, T, H, W = hidden_states.shape
    pt, ph, pw = base.patch_size
    nt, nh, nw = T // pt, H // ph, W // pw
    tc = cond_grid[0]
    n_cond = tc * nh * nw

    if timestep.ndim == 1:
        timestep = jnp.broadcast_to(timestep[:, None], (b, nt))

    x = P.dense(params["x_embedder"],
                patchify(hidden_states.astype(policy.compute_dtype),
                         base.patch_size))
    te = timestep_embedding(timestep.reshape(-1),
                            base.frequency_embedding_size)
    te = P.dense(params["t_embedder"]["fc1"], te, compute_dtype=jnp.float32)
    te = P.dense(params["t_embedder"]["fc2"], jax.nn.silu(te),
                 compute_dtype=jnp.float32)
    t_emb = te.reshape(b, nt, base.adaln_tembed_dim)

    ctx = P.dense(params["y_embedder"]["fc2"], P.gelu_tanh(
        P.dense(params["y_embedder"]["fc1"],
                encoder_hidden_states.astype(policy.compute_dtype))))
    kv_lens = (encoder_attention_mask.sum(axis=1).astype(jnp.int32)
               if encoder_attention_mask is not None else None)

    first, latter = regroup_audio_windows(cfg, audio_embs)
    audio = audio_proj_forward(params["audio_proj"], cfg, first,
                               latter)[:, -nt:]

    cos_full, sin_full = rope_cos_sin(tc + nt, nh, nw, base.head_dim)
    cos_q, sin_q = cos_full[n_cond:], sin_full[n_cond:]
    h = base.num_heads
    cdt = policy.compute_dtype

    def body(carry, inputs):
        layer, kv = inputs
        xf = carry
        mod = P.dense(layer["adaln"], jax.nn.silu(t_emb),
                      compute_dtype=jnp.float32)
        sh_a, sc_a, g_a, sh_f, sc_f, g_f = jnp.split(mod, 6, axis=-1)
        x_m = _modulate_per_frame(xf, sh_a, sc_a, nt, base.eps).astype(cdt)
        qkv = P.dense(layer["qkv"], x_m)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        q = _rms_hd(layer["q_norm"], _heads_hd(q, h), base.eps)
        k = _rms_hd(layer["k_norm"], _heads_hd(k, h), base.eps)
        v_h = _heads_hd(v, h)
        k_full = jnp.concatenate([kv[0].astype(jnp.float32), k], axis=1)
        v_full = jnp.concatenate([kv[1].astype(cdt), v_h.astype(cdt)],
                                 axis=1)
        q = apply_rope(q, cos_q, sin_q, out_dtype=cdt)
        k_full = apply_rope(k_full, cos_full, sin_full, out_dtype=cdt)
        o = attention(q, k_full, v_full, impl=attn_impl)
        o = P.dense(layer["attn_proj"],
                    o.reshape(b, nt * nh * nw,
                              base.hidden_size).astype(cdt))
        of = o.astype(jnp.float32).reshape(b, nt, -1, base.hidden_size)
        xf = xf + (g_a[:, :, None] * of).reshape(xf.shape)

        # text cross-attn (num_cond_latents=None in cache mode :141-143)
        h2 = P.layer_norm(layer["pre_crs_norm"], xf, eps=base.eps,
                          out_dtype=cdt)
        xf = xf + _cross_attention_lc(layer, base, h2, ctx, kv_lens, nt, 0,
                                      policy,
                                      attn_impl).astype(jnp.float32)

        # audio cross-attn with num_cond_latents=0 (:145-147)
        amod = P.dense(layer["audio_adaln"], jax.nn.silu(t_emb),
                       compute_dtype=jnp.float32)
        a_sh, a_sc, a_g = jnp.split(amod, 3, axis=-1)
        xv = P.layer_norm(layer["pre_video_norm"], xf, eps=base.eps,
                          out_dtype=cdt)
        audio_n = audio
        if cfg.audio_prenorm:
            audio_n = P.layer_norm(layer["pre_audio_norm"], audio_n,
                                   eps=base.eps)
        a_out = _audio_cross_attention(layer, cfg, xv, audio_n, nt, policy,
                                       attn_impl).astype(jnp.float32)
        a_out = _modulate_per_frame(a_out, a_sh, a_sc, nt, base.eps)
        xf = xf + (a_g[:, :, None]
                   * a_out.reshape(b, nt, -1, base.hidden_size)
                   ).reshape(xf.shape)

        x_m2 = _modulate_per_frame(xf, sh_f, sc_f, nt, base.eps).astype(cdt)
        ff = P.dense(layer["w2"], jax.nn.silu(P.dense(layer["w1"], x_m2))
                     * P.dense(layer["w3"], x_m2))
        ff = ff.astype(jnp.float32).reshape(b, nt, -1, base.hidden_size)
        xf = xf + (g_f[:, :, None] * ff).reshape(xf.shape)
        return xf, None

    xN, _ = jax.lax.scan(body, x.astype(jnp.float32),
                         (params["blocks"], kv_cache))

    fmod = P.dense(params["final"]["adaln"], jax.nn.silu(t_emb),
                   compute_dtype=jnp.float32)
    sh, sc = jnp.split(fmod, 2, axis=-1)
    xN = _modulate_per_frame(xN, sh, sc, nt, base.eps)
    out = P.dense(params["final"]["linear"], xN, compute_dtype=jnp.float32)
    return unpatchify(out, (nt, nh, nw), base.patch_size,
                      base.out_channels).astype(jnp.float32)


# -------------------------------------------------------------- model


def init_avatar_dit(key, cfg: AvatarConfig, dtype=jnp.bfloat16) -> dict:
    from worldforge_tpu.models.longcat.dit import init_longcat_dit

    kb, ka, kl = jax.random.split(key, 3)
    params = init_longcat_dit(kb, cfg.base, dtype)
    layers = [init_avatar_layer(k, cfg, dtype)
              for k in P.split_keys(kl, cfg.base.depth)]
    params["blocks"] = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs),
                                              *layers)
    params["audio_proj"] = init_audio_proj(ka, cfg, jnp.float32)
    return params


def avatar_dit_forward(params, cfg: AvatarConfig, hidden_states, timestep,
                       encoder_hidden_states, audio_embs,
                       encoder_attention_mask=None,
                       num_cond_latents: int = 0,
                       num_ref_latents: Optional[int] = None,
                       ref_img_index: Optional[int] = None,
                       mask_frame_range: Optional[int] = None,
                       ref_target_masks: Optional[jnp.ndarray] = None,
                       policy: Policy = DEFAULT_POLICY,
                       attn_impl: str = "auto", token_chunk: int = 1,
                       mesh=None):
    """hidden_states [B, C_in, T, H, W]; audio_embs [B, T_video, W, S, C_a]
    per-video-frame wav2vec windows — with the batch axis holding the TWO
    speakers when ref_target_masks ([2, H, W] pixel masks, multitalk) is
    given (longcat_video_dit_avatar.py:435-461). Returns
    [B, C_out, T, H, W] fp32 (:373-513)."""
    from worldforge_tpu.models.wan.dit import patchify, unpatchify

    b, _, T, H, W = hidden_states.shape
    pt, ph, pw = cfg.base.patch_size
    nt, nh, nw = T // pt, H // ph, W // pw
    base = cfg.base

    if timestep.ndim == 1:
        timestep = jnp.broadcast_to(timestep[:, None], (b, nt))

    x = P.dense(params["x_embedder"],
                patchify(hidden_states.astype(policy.compute_dtype),
                         base.patch_size))
    if mesh is not None and mesh.size > 1:
        from jax.sharding import NamedSharding, PartitionSpec as PS
        sp_ok = (mesh.shape.get("sp", 1) > 1
                 and (nt * nh * nw) % mesh.shape["sp"] == 0)
        x = jax.lax.with_sharding_constraint(
            x, NamedSharding(mesh, PS("dp", "sp" if sp_ok else None,
                                      None)))

    te = timestep_embedding(timestep.reshape(-1),
                            base.frequency_embedding_size)
    te = P.dense(params["t_embedder"]["fc1"], te, compute_dtype=jnp.float32)
    te = P.dense(params["t_embedder"]["fc2"], jax.nn.silu(te),
                 compute_dtype=jnp.float32)
    t_emb = te.reshape(b, nt, base.adaln_tembed_dim)

    ctx = P.dense(params["y_embedder"]["fc2"], P.gelu_tanh(
        P.dense(params["y_embedder"]["fc1"],
                encoder_hidden_states.astype(policy.compute_dtype))))
    kv_lens = (encoder_attention_mask.sum(axis=1).astype(jnp.int32)
               if encoder_attention_mask is not None else None)

    first, latter = regroup_audio_windows(cfg, audio_embs)
    audio = audio_proj_forward(params["audio_proj"], cfg, first, latter)
    if num_ref_latents:
        # a ref image at the front reuses frame 0's audio as padding
        # (longcat_video_dit_avatar.py:431-433)
        audio = jnp.concatenate([audio[:, :1], audio], axis=1)
    audio = audio[:, -nt:]

    token_masks = None
    if ref_target_masks is not None:
        if num_cond_latents <= 0:
            # reference assert (avatar/attention.py:208) — without it the
            # failure is an opaque XLA broadcast error deep in the scan
            raise ValueError(
                "multitalk (ref_target_masks) only supports image-to-video"
                " or video continuation: num_cond_latents must be > 0")
        # [2, H, W] pixel masks -> [2, Nh*Nw] token masks (nearest,
        # :453-461); both speakers' audio tokens concat per frame (:445)
        tm = jax.image.resize(ref_target_masks.astype(jnp.float32),
                              (ref_target_masks.shape[0], nh, nw),
                              method="nearest")
        token_masks = (tm > 0).reshape(ref_target_masks.shape[0], -1)
        audio = audio.transpose(1, 0, 2, 3).reshape(
            1, nt, -1, cfg.output_dim)             # [1, T, 2M, C_a]

    if num_ref_latents and ref_img_index is not None:
        # ref-image mode: the ref frame keeps its ORIGINAL temporal
        # position, the cond/noise frames start at 0
        # (avatar/rope_3d.py:76-77: grid_t = [frame_index, 0..N-ref-1])
        tpos = (float(ref_img_index),
                *range(nt - num_ref_latents))
        cos, sin = rope_cos_sin(nt, nh, nw, base.head_dim,
                                t_positions=tpos)
    else:
        cos, sin = rope_cos_sin(nt, nh, nw, base.head_dim)

    def body(carry, layer):
        out = avatar_layer_forward(layer, cfg, carry, t_emb, ctx, kv_lens,
                                   audio, cos, sin, nt, num_cond_latents,
                                   num_ref_latents or 0, ref_img_index,
                                   mask_frame_range, token_masks, policy,
                                   attn_impl, token_chunk=token_chunk,
                                   mesh=mesh)
        return out, None

    xN, _ = jax.lax.scan(body, x.astype(jnp.float32), params["blocks"])

    fmod = P.dense(params["final"]["adaln"],
                   jax.nn.silu(t_emb.astype(jnp.float32)),
                   compute_dtype=jnp.float32)
    sh, sc = jnp.split(fmod, 2, axis=-1)
    xN = _modulate_per_frame(xN, sh, sc, nt, base.eps)
    out = P.dense(params["final"]["linear"], xN, compute_dtype=jnp.float32)
    return unpatchify(out, (nt, nh, nw), base.patch_size,
                      base.out_channels).astype(jnp.float32)
