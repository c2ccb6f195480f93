"""Camera distortion models (COLMAP SIMPLE_RADIAL / RADIAL / OPENCV).

Behavioral reference: vggt/vggt/dependency/distortion.py:
  - apply_distortion (:101-153): 1-param simple radial, 2-param radial,
    4-param OpenCV (radial + tangential)
  - single_undistortion (:32-48)
  - iterative_undistortion (:51-98): Newton iterations with a numerically
    differentiated 2x2 Jacobian

TPU-first: the Newton loop runs as a fixed-trip `lax.fori_loop` (the
reference's early exit at max_step_norm is a no-op for well-conditioned
lens models within machine precision) and the 2x2 solve is closed-form —
no linalg.solve, fully batched and jittable.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def apply_distortion(params: jnp.ndarray, u: jnp.ndarray, v: jnp.ndarray):
    """params [B, k] (k in {1, 2, 4}); u/v [B, N] normalized coords.
    Returns distorted (u, v)."""
    k = params.shape[1]
    u2, v2 = u * u, v * v
    r2 = u2 + v2
    if k == 1:
        radial = params[:, 0:1] * r2
        du, dv = u * radial, v * radial
    elif k == 2:
        radial = params[:, 0:1] * r2 + params[:, 1:2] * r2 * r2
        du, dv = u * radial, v * radial
    elif k == 4:
        k1, k2 = params[:, 0:1], params[:, 1:2]
        p1, p2 = params[:, 2:3], params[:, 3:4]
        uv = u * v
        radial = k1 * r2 + k2 * r2 * r2
        du = u * radial + 2 * p1 * uv + p2 * (r2 + 2 * u2)
        dv = v * radial + 2 * p2 * uv + p1 * (r2 + 2 * v2)
    else:
        raise ValueError(f"unsupported distortion parameter count {k}")
    return u + du, v + dv


def single_undistortion(params: jnp.ndarray,
                        tracks: jnp.ndarray) -> jnp.ndarray:
    """One forward application (distortion.py:32-48). tracks [B, N, 2]."""
    u, v = apply_distortion(params, tracks[..., 0], tracks[..., 1])
    return jnp.stack([u, v], axis=-1)


def iterative_undistortion(params: jnp.ndarray, tracks: jnp.ndarray,
                           max_iterations: int = 100,
                           rel_step_size: float = 1e-6) -> jnp.ndarray:
    """Invert the distortion by Newton iteration (distortion.py:51-98).
    tracks [B, N, 2] distorted normalized coords -> undistorted."""
    orig_u, orig_v = tracks[..., 0], tracks[..., 1]
    eps = jnp.finfo(tracks.dtype).eps

    def body(_, uv):
        u, v = uv
        du_, dv_ = apply_distortion(params, u, v)
        dx = orig_u - du_
        dy = orig_v - dv_
        su = jnp.maximum(jnp.abs(u) * rel_step_size, eps)
        sv = jnp.maximum(jnp.abs(v) * rel_step_size, eps)
        j00 = (apply_distortion(params, u + su, v)[0]
               - apply_distortion(params, u - su, v)[0]) / (2 * su) + 1.0
        j01 = (apply_distortion(params, u, v + sv)[0]
               - apply_distortion(params, u, v - sv)[0]) / (2 * sv)
        j10 = (apply_distortion(params, u + su, v)[1]
               - apply_distortion(params, u - su, v)[1]) / (2 * su)
        j11 = (apply_distortion(params, u, v + sv)[1]
               - apply_distortion(params, u, v - sv)[1]) / (2 * sv) + 1.0
        det = j00 * j11 - j01 * j10
        det = jnp.where(jnp.abs(det) < eps, eps, det)
        step_u = (j11 * dx - j01 * dy) / det
        step_v = (j00 * dy - j10 * dx) / det
        return u + step_u, v + step_v

    u, v = jax.lax.fori_loop(0, max_iterations, body,
                             (orig_u, orig_v))
    return jnp.stack([u, v], axis=-1)
