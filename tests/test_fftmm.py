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


@pytest.mark.parametrize("axis", [0, 1, 2])
def test_axis_helpers_match_numpy(axis):
    rng = np.random.default_rng(14)
    x = rng.standard_normal((8, 12, 16)).astype(np.float32)
    c = (rng.standard_normal((8, 12, 16))
         + 1j * rng.standard_normal((8, 12, 16))).astype(np.complex64)
    a = np.asarray(fftmm.fft_mm_axis(jnp.asarray(c), axis))
    b = np.fft.fft(c, axis=axis)
    assert np.max(np.abs(a - b)) / np.max(np.abs(b)) < 2e-6
    a = np.asarray(fftmm.fft_mm_axis(jnp.asarray(c), axis,
                                     inverse=True))
    b = np.fft.ifft(c, axis=axis)
    assert np.max(np.abs(a - b)) / np.max(np.abs(b)) < 2e-6
    a = np.asarray(fftmm.rfft_mm_axis(jnp.asarray(x), axis))
    b = np.fft.rfft(x, axis=axis)
    assert np.max(np.abs(a - b)) / np.max(np.abs(b)) < 2e-6
    k = b.astype(np.complex64)
    a = np.asarray(fftmm.irfft_mm_axis(jnp.asarray(k),
                                       x.shape[axis], axis))
    b2 = np.fft.irfft(k, n=x.shape[axis], axis=axis)
    assert np.max(np.abs(a - b2)) / np.max(np.abs(b2)) < 2e-6


def test_sharded_engines_mm_match_single_device():
    """SlabPM/PencilPM r2c+c2r round trips under FASTPM_TPU_FFT=mm
    match the single-device mm PM (pfft.py mm wiring)."""
    import jax
    from jax.sharding import Mesh, PartitionSpec as P, NamedSharding
    from fastpm_tpu.parallel.pfft import SlabPM, PencilPM

    os.environ["FASTPM_TPU_FFT"] = "mm"
    try:
        rng = np.random.default_rng(15)
        x = rng.standard_normal((32, 32, 32)).astype(np.float32)
        pm = PM(32, 64.0)
        assert pm._use_mm_fft
        want_k = np.asarray(pm.r2c(jnp.asarray(x)))
        want_x = np.asarray(pm.c2r(pm.r2c(jnp.asarray(x))))

        devs = np.array(jax.devices()[:8])
        mesh = Mesh(devs, ("x",))
        spm = SlabPM(pm, mesh, axis="x")
        f = jax.jit(jax.shard_map(
            lambda a: spm.c2r_local(spm.r2c_local(a)),
            mesh=mesh, in_specs=P("x"), out_specs=P("x")))
        got = np.asarray(f(jnp.asarray(x)))
        assert np.max(np.abs(got - want_x)) < 1e-5

        mesh2 = Mesh(devs.reshape(4, 2), ("x", "y"))
        ppm = PencilPM(pm, mesh2, axes=("x", "y"))
        f2 = jax.jit(jax.shard_map(
            lambda a: ppm.c2r_local(ppm.r2c_local(a)),
            mesh=mesh2, in_specs=P("x", "y"), out_specs=P("x", "y")))
        got2 = np.asarray(f2(jnp.asarray(x)))
        assert np.max(np.abs(got2 - want_x)) < 1e-5
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


def test_fft_variant_matrix():
    """rfftn/irfftn stay numpy-exact across the round-4 variant axes:
    the CT split policy (sqrt | wide) and the direct hermitian-axis
    contraction (FASTPM_TPU_FFT_DIRECT)."""
    from fastpm_tpu.ops import fftmm
    rng = np.random.RandomState(0)
    x = rng.standard_normal((8, 12, 16)).astype(np.float32)
    ref_f = np.fft.rfftn(x)
    kk = np.fft.rfftn(rng.standard_normal((8, 12, 16))).astype(
        np.complex64)
    ref_i = np.fft.irfftn(kk, s=x.shape, axes=(0, 1, 2))
    try:
        for fac in ("sqrt", "wide"):
            for direct in ("0", "1"):
                os.environ["FASTPM_TPU_FFT_FAC"] = fac
                os.environ["FASTPM_TPU_FFT_DIRECT"] = direct
                fftmm._dft_tables.cache_clear()
                got_f = np.asarray(fftmm.rfftn_mm(jnp.asarray(x)))
                got_i = np.asarray(fftmm.irfftn_mm(jnp.asarray(kk),
                                                   x.shape))
                assert np.max(np.abs(got_f - ref_f)) < 1e-4 * np.max(
                    np.abs(ref_f))
                assert np.max(np.abs(got_i - ref_i)) < 1e-5 * np.max(
                    np.abs(ref_i))
    finally:
        os.environ.pop("FASTPM_TPU_FFT_FAC", None)
        os.environ.pop("FASTPM_TPU_FFT_DIRECT", None)
        fftmm._dft_tables.cache_clear()


def test_c2r_grad3_matches_per_component():
    """mesh.c2r_grad3 (the fused 3-gradient inverse) matches the
    per-component apply_grad + c2r pipeline on BOTH engines and BOTH
    diff orders -- including order 0, whose anti-hermitian Nyquist
    planes the packed-pair iFFT must NOT touch (kernels 3_2, EASTWOOD,
    NAIVE were silently corrupted by the pair before round 4)."""
    from fastpm_tpu import transfers
    rng = np.random.RandomState(1)
    x = rng.standard_normal((16, 16, 16)).astype(np.float32)
    dk = jnp.asarray(np.fft.rfftn(x).astype(np.complex64))
    try:
        for engine in ("xla", "mm"):
            if engine == "mm":
                os.environ["FASTPM_TPU_FFT"] = "mm"
            else:
                os.environ.pop("FASTPM_TPU_FFT", None)
            pm = PM(16, 16.0)
            for go in (0, 1):
                ref = [np.asarray(pm.c2r(
                    transfers.apply_grad(pm, dk, d, go)))
                    for d in range(3)]
                got = [np.asarray(g) for g in pm.c2r_grad3(dk, go)]
                for g, r in zip(got, ref):
                    assert np.max(np.abs(g - r)) < 2e-5 * np.max(
                        np.abs(r)), (engine, go)
    finally:
        os.environ.pop("FASTPM_TPU_FFT", None)


def test_c2r_grad3_direct_modes_and_wrap():
    """grad3_c2r_direct == grad3_c2r_mm (ct) on both diff orders, and
    its wrap=True output carries the periodic 0-planes on every axis
    (the readout pad_canvas layout straight from the synthesis
    matmuls)."""
    from fastpm_tpu.ops import fftmm
    rng = np.random.RandomState(3)
    x = rng.standard_normal((16, 16, 16)).astype(np.float32)
    dk = jnp.asarray(np.fft.rfftn(x).astype(np.complex64))
    os.environ["FASTPM_TPU_FFT"] = "mm"
    try:
        pm = PM(16, 16.0)
        for go in (0, 1):
            name = ["k", "k_finite"][go]
            args = (dk, tuple(pm.Nmesh), pm.table(name, 0),
                    pm.table(name, 1), pm.table(name, 2))
            ct = [np.asarray(g) for g in fftmm.grad3_c2r_mm(*args)]
            dd = [np.asarray(g) for g in fftmm.grad3_c2r_direct(*args)]
            for c, d in zip(ct, dd):
                assert np.max(np.abs(c - d)) < 2e-5 * (
                    np.max(np.abs(c)) + 1e-8), go
            dw = [np.asarray(g)
                  for g in fftmm.grad3_c2r_direct(*args, wrap=True)]
            for d, w in zip(dd, dw):
                assert w.shape == (17, 17, 17)
                np.testing.assert_allclose(w[:16, :16, :16], d,
                                           rtol=0, atol=1e-6)
                np.testing.assert_allclose(w[16], w[0], rtol=0,
                                           atol=1e-6)
                np.testing.assert_allclose(w[:, 16], w[:, 0], rtol=0,
                                           atol=1e-6)
                np.testing.assert_allclose(w[:, :, 16], w[:, :, 0],
                                           rtol=0, atol=1e-6)
    finally:
        os.environ.pop("FASTPM_TPU_FFT", None)


def test_merged_component_variants_match():
    """grad3_c2r_direct2 (one GEMM per complex stage via 2x2 block
    tables) == grad3_c2r_direct on both diff orders and both extension
    flags, and rfftn_direct2 == numpy rfftn. Non-cubic mesh so an axis
    mixup cannot cancel."""
    from fastpm_tpu.ops import fftmm
    rng = np.random.RandomState(7)
    s = (16, 8, 32)
    x = rng.standard_normal(s).astype(np.float32)
    ref = np.fft.rfftn(x)
    got = np.asarray(fftmm.rfftn_direct2(jnp.asarray(x)))
    assert np.max(np.abs(got - ref)) < 2e-5 * np.max(np.abs(ref))

    dk = jnp.asarray(ref.astype(np.complex64))
    tabs = [rng.standard_normal(n).astype(np.float32)
            for n in (16, 8, 17)]
    for zext, wrap in ((False, False), (True, False), (False, True)):
        a = fftmm.grad3_c2r_direct(dk, s, *tabs, zext=zext, wrap=wrap)
        b = fftmm.grad3_c2r_direct2(dk, s, *tabs, zext=zext, wrap=wrap)
        for u, v in zip(a, b):
            u, v = np.asarray(u), np.asarray(v)
            assert u.shape == v.shape
            assert np.max(np.abs(u - v)) < 1e-5 * (
                np.max(np.abs(u)) + 1e-8), (zext, wrap)


def test_mesh_dispatch_direct2_modes():
    """PM.r2c / PM.c2r_grad3 honor FASTPM_TPU_R2C / FASTPM_TPU_GRAD3
    = direct2 and agree with the default mm engine."""
    rng = np.random.RandomState(11)
    x = jnp.asarray(rng.standard_normal((16, 16, 16)).astype(np.float32))
    os.environ["FASTPM_TPU_FFT"] = "mm"
    try:
        pm = PM(16, 16.0)
        base_k = np.asarray(pm.r2c(x))
        base_g = [np.asarray(g) for g in pm.c2r_grad3(pm.r2c(x), 1)]
        os.environ["FASTPM_TPU_R2C"] = "direct2"
        os.environ["FASTPM_TPU_GRAD3"] = "direct2"
        got_k = np.asarray(pm.r2c(x))
        got_g = [np.asarray(g) for g in pm.c2r_grad3(pm.r2c(x), 1)]
        assert np.max(np.abs(got_k - base_k)) < 2e-5 * np.max(np.abs(base_k))
        for u, v in zip(base_g, got_g):
            assert np.max(np.abs(u - v)) < 2e-5 * (np.max(np.abs(u)) + 1e-8)
    finally:
        for k in ("FASTPM_TPU_FFT", "FASTPM_TPU_R2C", "FASTPM_TPU_GRAD3"):
            os.environ.pop(k, None)
