"""VGGT aggregator/heads tests (tiny configs, CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from worldforge_tpu.models.vggt.heads import (CameraHeadConfig, DPTHeadConfig,
                                              camera_head_forward,
                                              dpt_head_forward,
                                              init_camera_head, init_dpt_head)
from worldforge_tpu.models.vggt.model import (VGGTConfig, make_positions,
                                              init_vggt_aggregator,
                                              rope2d_rotate,
                                              vggt_aggregator_forward)
from worldforge_tpu.models.vggt.utils import (pose_encoding_to_extri_intri,
                                              quat_to_mat)
from worldforge_tpu.models.vggt.vit import (DinoViTConfig,
                                            dino_vit_patch_tokens,
                                            init_dino_vit)


def test_quat_to_mat_identity_and_orthogonality(rng):
    ident = quat_to_mat(np.array([0.0, 0, 0, 1.0]))
    np.testing.assert_allclose(ident, np.eye(3), atol=1e-12)
    q = rng.standard_normal(4)
    R = quat_to_mat(q)
    np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-9)
    np.testing.assert_allclose(np.linalg.det(R), 1.0, atol=1e-9)


def test_pose_encoding_conversion():
    enc = np.zeros((1, 1, 9))
    enc[..., 6] = 1.0          # identity quat (scalar-last)
    enc[..., 7] = np.pi / 2    # fov_h 90deg
    enc[..., 8] = np.pi / 2
    extr, K = pose_encoding_to_extri_intri(enc, (100, 200))
    np.testing.assert_allclose(extr[0, 0, :, :3], np.eye(3), atol=1e-9)
    np.testing.assert_allclose(K[0, 0, 1, 1], 50.0, atol=1e-6)   # H/2 / tan45
    np.testing.assert_allclose(K[0, 0, 0, 0], 100.0, atol=1e-6)  # W/2
    assert K[0, 0, 0, 2] == 100.0 and K[0, 0, 1, 2] == 50.0


def test_rope2d_identity_at_position_zero(rng):
    """Special tokens at position 0 must be unrotated (aggregator :224-229)."""
    x = jnp.asarray(rng.standard_normal((1, 3, 2, 16)), jnp.float32)
    pos = np.array([[0, 0], [1, 2], [3, 4]])
    out = rope2d_rotate(x, pos)
    np.testing.assert_allclose(np.asarray(out[:, 0]), np.asarray(x[:, 0]),
                               atol=1e-6)
    assert np.abs(np.asarray(out[:, 1] - x[:, 1])).max() > 1e-4
    # norm preserved
    np.testing.assert_allclose(np.linalg.norm(np.asarray(out), axis=-1),
                               np.linalg.norm(np.asarray(x), axis=-1),
                               rtol=1e-5)


def test_dino_backbone_shapes(rng):
    cfg = DinoViTConfig.tiny()  # 28px / patch14 -> 2x2 grid
    params = init_dino_vit(jax.random.key(0), cfg)
    imgs = jnp.asarray(rng.standard_normal((2, 3, 28, 28)), jnp.float32)
    out = dino_vit_patch_tokens(params, cfg, imgs)
    assert out.shape == (2, 4, cfg.embed_dim)
    # non-square input exercises pos-embed interpolation
    imgs2 = jnp.asarray(rng.standard_normal((1, 3, 28, 42)), jnp.float32)
    out2 = dino_vit_patch_tokens(params, cfg, imgs2)
    assert out2.shape == (1, 2 * 3, cfg.embed_dim)


def test_aggregator_taps_and_shapes(rng):
    cfg = VGGTConfig.tiny()
    params = init_vggt_aggregator(jax.random.key(0), cfg)
    imgs = jnp.asarray(rng.uniform(0, 1, (1, 3, 3, 28, 28)), jnp.float32)
    taps = vggt_aggregator_forward(params, cfg, imgs)
    p = cfg.patch_start_idx + 4  # special + 2x2 patches
    assert set(taps.keys()) == {0, 1, 2, 3}
    assert taps[3].shape == (1, 3, p, 2 * cfg.embed_dim)
    assert np.isfinite(np.asarray(taps[3])).all()


def test_camera_head_iterative(rng):
    cfg = CameraHeadConfig.tiny()
    params = init_camera_head(jax.random.key(0), cfg)
    toks = jnp.asarray(rng.standard_normal((1, 3, cfg.dim_in)), jnp.float32)
    pose = camera_head_forward(params, cfg, toks, num_iterations=4)
    assert pose.shape == (1, 3, 9)
    assert (np.asarray(pose[..., 7:]) >= 0).all()  # fov relu


def test_dpt_head_shapes(rng):
    cfg = DPTHeadConfig.tiny()
    params = init_dpt_head(jax.random.key(0), cfg)
    b, s, gh, gw = 1, 2, 2, 2
    p_start = 3
    toks = [jnp.asarray(rng.standard_normal(
        (b, s, p_start + gh * gw, cfg.dim_in)), jnp.float32)
        for _ in range(4)]
    pred, conf = dpt_head_forward(params, cfg, toks, (28, 28), p_start)
    assert pred.shape == (1, 2, 28, 28, 1)
    assert conf.shape == (1, 2, 28, 28)
    assert (np.asarray(pred) > 0).all()   # exp activation
    assert (np.asarray(conf) > 1).all()   # 1 + exp


def test_full_vggt_tiny(rng):
    from worldforge_tpu.models.vggt.inference import (init_vggt_full,
                                                      vggt_forward)
    cfg = VGGTConfig.tiny()
    params = init_vggt_full(jax.random.key(0), cfg, enable_point=True)
    imgs = jnp.asarray(rng.uniform(0, 1, (1, 2, 3, 28, 28)), jnp.float32)
    out = vggt_forward(params, cfg, imgs)
    assert out["pose_enc"].shape == (1, 2, 9)
    assert out["depth"].shape == (1, 2, 28, 28, 1)
    assert out["depth_conf"].shape == (1, 2, 28, 28)
    assert out["world_points"].shape == (1, 2, 28, 28, 3)
    assert out["world_points_conf"].shape == (1, 2, 28, 28)
    assert np.isfinite(np.asarray(out["depth"])).all()
    assert np.isfinite(np.asarray(out["world_points"])).all()
