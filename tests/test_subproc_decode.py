"""Fresh-process VAE decode recovery (runtime/subproc.py — VERDICT r4
item 5): the subprocess round-trip must reproduce the in-process
streaming decode exactly, on CPU, for both the random-init and the
pickled-params source."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from worldforge_tpu.models.wan.vae import WanVAEConfig, init_wan_vae
from worldforge_tpu.pipelines.vae_dispatch import jit_vae_fns
from worldforge_tpu.runtime.subproc import (decode_in_subprocess,
                                            save_params_host)

CHILD_ENV = {"JAX_PLATFORMS": "cpu",
             "XLA_FLAGS": "--xla_force_host_platform_device_count=1",
             # conftest forces highest matmul precision in the parent;
             # without it the child's default-precision CPU convs diverge
             # by ~4e-2 (measured) and the exactness gate is meaningless
             "JAX_DEFAULT_MATMUL_PRECISION": "highest"}


@pytest.fixture(scope="module")
def tiny_setup():
    cfg = WanVAEConfig.tiny()
    params = init_wan_vae(jax.random.key(1), cfg, dtype=jnp.float32)
    lat = np.asarray(jax.random.normal(jax.random.key(7),
                                       (1, cfg.z_dim, 3, 8, 8), jnp.float32))
    dec, _ = jit_vae_fns(params, cfg, streaming=True, chunk=1)
    ref = np.asarray(dec(jnp.asarray(lat)), np.float32)
    ref01 = np.clip((ref + 1.0) / 2.0, 0.0, 1.0)
    return cfg, params, lat, ref01


def test_subprocess_matches_inprocess_init_seed(tiny_setup, tmp_path):
    cfg, _, lat, ref01 = tiny_setup
    video, times = decode_in_subprocess(
        lat, cfg, params_seed=1, dtype="float32", reps=2,
        env=CHILD_ENV, workdir=str(tmp_path), verbose=False)
    assert video.shape == ref01.shape
    assert len(times) == 2 and all(t > 0 for t in times)
    np.testing.assert_allclose(video.astype(np.float32), ref01, atol=2e-3)


def test_subprocess_matches_inprocess_pickled_params(tiny_setup, tmp_path):
    """Real-deployment path: params saved host-side at load time, child
    restores the exact tree instead of re-initializing."""
    cfg, params, lat, ref01 = tiny_setup
    ppath = str(tmp_path / "vae_params.pkl")
    save_params_host(params, ppath)
    video, times = decode_in_subprocess(
        lat, cfg, params_path=ppath, dtype="float32", reps=1,
        env=CHILD_ENV, workdir=str(tmp_path), verbose=False)
    assert len(times) == 1
    np.testing.assert_allclose(video.astype(np.float32), ref01, atol=2e-3)


def test_subprocess_failure_raises_with_stderr(tiny_setup, tmp_path):
    cfg, _, lat, _ = tiny_setup
    with pytest.raises(RuntimeError, match="subprocess decode failed"):
        decode_in_subprocess(
            lat, cfg, params_path=str(tmp_path / "missing.pkl"),
            dtype="float32", env=CHILD_ENV, workdir=str(tmp_path),
            verbose=False)
