"""SfM support stack: distortion/projection oracle parity, FPS ranking,
SuperPoint detector behavior."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from worldforge_tpu.sfm.distortion import (apply_distortion,
                                           iterative_undistortion,
                                           single_undistortion)
from worldforge_tpu.sfm.projection import img_from_cam, project_3d_points
from worldforge_tpu.sfm.superpoint import (SuperPointConfig, init_superpoint,
                                           simple_nms, superpoint_forward)
from worldforge_tpu.sfm.utils import (calculate_index_mappings,
                                      farthest_point_sampling,
                                      rank_frames_by_similarity,
                                      switch_tensor_order)

torch = pytest.importorskip("torch")
from tests.reference_oracle import import_vggt_dependency  # noqa: E402


@pytest.mark.parametrize("k", [1, 2, 4])
def test_distortion_matches_reference(rng, k):
    dist, _ = import_vggt_dependency()
    # realistic lens ranges: outside these the distortion stops being
    # invertible and Newton legitimately diverges (in both implementations)
    params = rng.uniform(-0.02, 0.02, (3, k)).astype(np.float32)
    tracks = rng.uniform(-0.5, 0.5, (3, 50, 2)).astype(np.float32)

    ref = dist.single_undistortion(params, tracks).numpy()
    got = np.asarray(single_undistortion(jnp.asarray(params),
                                         jnp.asarray(tracks)))
    np.testing.assert_allclose(got, ref, atol=1e-6)

    ref_it = dist.iterative_undistortion(params, tracks.copy()).numpy()
    got_it = np.asarray(iterative_undistortion(jnp.asarray(params),
                                               jnp.asarray(tracks)))
    # the reference early-exits on a GLOBAL step norm, leaving a few points
    # ~1e-4 from the fixed point; ours runs fixed-trip Newton, so compare
    # loosely against the oracle and tightly on the true contract: the
    # round trip distort(undistort(x)) == x
    np.testing.assert_allclose(got_it, ref_it, atol=2e-3)
    u, v = apply_distortion(jnp.asarray(params), got_it[..., 0],
                            got_it[..., 1])
    np.testing.assert_allclose(np.stack([u, v], -1), tracks, atol=1e-5)


def test_projection_matches_reference(rng):
    _, proj = import_vggt_dependency()
    pts = rng.uniform(-2, 2, (40, 3)).astype(np.float32)
    pts[:, 2] += 5.0                    # keep points in front of cameras
    ext = np.broadcast_to(np.eye(3, 4, dtype=np.float32), (2, 3, 4)).copy()
    ext[1, :3, 3] = [0.1, -0.2, 0.3]
    K = np.broadcast_to(np.array([[100, 0, 64], [0, 100, 48], [0, 0, 1]],
                                 np.float32), (2, 3, 3)).copy()
    extra = rng.uniform(-0.02, 0.02, (2, 1)).astype(np.float32)

    ref2d, refcam = proj.project_3D_points_np(pts, ext, K,
                                              extra_params=extra)
    got2d, gotcam = project_3d_points(jnp.asarray(pts), jnp.asarray(ext),
                                      jnp.asarray(K),
                                      extra_params=jnp.asarray(extra))
    np.testing.assert_allclose(np.asarray(gotcam), refcam, atol=1e-5)
    rel = np.abs(np.asarray(got2d) - ref2d).max() / np.abs(ref2d).max()
    assert rel < 1e-4, rel


def test_fps_and_index_utils():
    dm = np.array([[0, 1, 5], [1, 0, 2], [5, 2, 0]], np.float32)
    sel = farthest_point_sampling(dm, 3, most_common_frame_index=0)
    assert sel[0] == 0 and sel[1] == 2          # farthest from 0 is 2
    assert sorted(sel) == [0, 1, 2]

    order = calculate_index_mappings(3, 5)
    np.testing.assert_array_equal(order, [3, 1, 2, 0, 4])
    t = np.arange(10).reshape(1, 5, 2)
    (sw,) = switch_tensor_order([t], order, dim=1)
    np.testing.assert_array_equal(sw[0, 0], t[0, 3])
    (none_out,) = switch_tensor_order([None], order)
    assert none_out is None


def test_rank_frames_by_similarity(rng):
    # frame 0 and 1 nearly identical; frame 2 orthogonal-ish
    f = rng.standard_normal((3, 16)).astype(np.float32)
    f[1] = f[0] + 0.01 * rng.standard_normal(16)
    sel = rank_frames_by_similarity(f, 2)
    assert len(sel) == 2
    assert 2 in sel                              # the diverse frame selected


def test_superpoint_detects_synthetic_peaks(rng):
    cfg = SuperPointConfig.tiny()
    params = init_superpoint(jax.random.key(0), cfg)
    img = jnp.asarray(rng.uniform(0, 1, (1, 32, 32, 1)), jnp.float32)
    out = superpoint_forward(params, cfg, img)
    k = cfg.max_num_keypoints
    assert out["keypoints"].shape == (1, k, 2)
    assert out["scores"].shape == (1, k)
    assert out["descriptors"].shape == (1, k, cfg.descriptor_dim)
    valid = np.asarray(out["scores"][0]) > 0
    if valid.any():
        d = np.asarray(out["descriptors"][0])[valid]
        np.testing.assert_allclose(np.linalg.norm(d, axis=-1), 1.0,
                                   atol=1e-5)
        kp = np.asarray(out["keypoints"][0])[valid]
        assert (kp >= 0).all() and (kp < 32).all()


def test_simple_nms_suppresses_neighbors():
    s = jnp.zeros((1, 16, 16))
    s = s.at[0, 5, 5].set(1.0).at[0, 5, 6].set(0.9).at[0, 12, 12].set(0.8)
    out = np.asarray(simple_nms(s, radius=2))
    assert out[0, 5, 5] == 1.0
    assert out[0, 5, 6] == 0.0          # suppressed by stronger neighbor
    assert out[0, 12, 12] == 0.8        # isolated peak survives
