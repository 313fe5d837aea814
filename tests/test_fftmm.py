"""Matmul (Cooley-Tukey einsum) FFTs vs jnp.fft, and the PM-level
FASTPM_TPU_FFT=mm mode (ops/fftmm.py)."""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from fastpm_tpu.ops import fftmm
from fastpm_tpu.mesh import PM


@pytest.mark.parametrize("shape", [(16, 16, 16), (32, 16, 8),
                                   (24, 36, 48)])
def test_rfftn_irfftn_match_numpy(shape):
    rng = np.random.default_rng(11)
    x = rng.standard_normal(shape).astype(np.float32)
    a = np.asarray(jax.jit(fftmm.rfftn_mm)(jnp.asarray(x)))
    b = np.fft.rfftn(x)
    assert np.max(np.abs(a - b)) / np.max(np.abs(b)) < 2e-6
    k = b.astype(np.complex64)
    inv = np.asarray(jax.jit(
        lambda kk: fftmm.irfftn_mm(kk, shape))(jnp.asarray(k)))
    invb = np.fft.irfftn(k, s=shape, axes=(0, 1, 2))
    assert np.max(np.abs(inv - invb)) / np.max(np.abs(invb)) < 2e-6


def test_ifftn_matches_numpy():
    rng = np.random.default_rng(12)
    shape = (16, 24, 32)
    c = (rng.standard_normal(shape)
         + 1j * rng.standard_normal(shape)).astype(np.complex64)
    f1 = np.asarray(jax.jit(fftmm.ifftn_mm)(jnp.asarray(c)))
    f2 = np.fft.ifftn(c)
    assert np.max(np.abs(f1 - f2)) / np.max(np.abs(f2)) < 2e-6


def test_pm_mm_mode_round_trip_and_pair():
    rng = np.random.default_rng(13)
    x = rng.standard_normal((32, 32, 32)).astype(np.float32)
    pm_ref = PM(32, 64.0)
    k_ref = np.asarray(pm_ref.r2c(jnp.asarray(x)))
    os.environ["FASTPM_TPU_FFT"] = "mm"
    try:
        pm = PM(32, 64.0)
        assert pm._use_mm_fft
        k = pm.r2c(jnp.asarray(x))
        assert (np.max(np.abs(np.asarray(k) - k_ref))
                / np.max(np.abs(k_ref))) < 2e-6
        back = np.asarray(pm.c2r(k))
        assert np.max(np.abs(back - x)) / np.max(np.abs(x)) < 2e-6
        ka = pm.r2c(jnp.asarray(x))
        xb = rng.standard_normal((32, 32, 32)).astype(np.float32)
        kb = pm.r2c(jnp.asarray(xb))
        fa, fb = pm.c2r_pair(ka, kb)
        assert np.max(np.abs(np.asarray(fa) - x)) < 1e-4
        assert np.max(np.abs(np.asarray(fb) - xb)) < 1e-4
    finally:
        del os.environ["FASTPM_TPU_FFT"]


def test_unsupported_size_falls_back():
    os.environ["FASTPM_TPU_FFT"] = "mm"
    try:
        # 134 = 2*67: even, but the prime cofactor 67 exceeds the
        # 64-wide factor budget -> no CT split
        pm = PM((134, 8, 8), 64.0)
        assert not pm._use_mm_fft     # falls back to jnp.fft
        x = jnp.ones((134, 8, 8), jnp.float32)
        k = pm.r2c(x)
        assert k.shape == (134, 8, 5)
    finally:
        del os.environ["FASTPM_TPU_FFT"]
