"""Device (JAX) NEST shell-map painting vs the exact host path.

The hybrid device painter must be BIT-IDENTICAL in pixel ids and
counts to paint_hpmap_nest (which the chealpix-pinned goldens gate):
the f32 device pixelization flags every row whose discretization
inputs sit within a conservative error margin of a boundary, and those
rows are recomputed with the host f64 path. The safety property tested
here: every f32-vs-f64 mismatch on random clouds is flagged risky."""

import numpy as np
import jax.numpy as jnp

from fastpm_tpu.healpix import (vec2pix_nest, vec2pix_nest_jax,
                                paint_hpmap_nest,
                                paint_hpmap_nest_device)


def test_device_pixels_match_host_or_flagged():
    rng = np.random.RandomState(3)
    n = 200000
    pos32 = (rng.standard_normal((n, 3)) * 150).astype(np.float32)
    for nside in (8, 32, 256):
        want = vec2pix_nest(nside, pos32.astype(np.float64))
        got, risky = vec2pix_nest_jax(nside, jnp.asarray(pos32))
        got = np.asarray(got).astype(np.int64)
        risky = np.asarray(risky)
        mismatch = got != want
        # every mismatch must be flagged (else the hybrid would emit a
        # wrong pixel), and the flagged fraction must stay small
        assert not np.any(mismatch & ~risky), (
            nside, np.flatnonzero(mismatch & ~risky)[:5])
        assert risky.mean() < 0.02, (nside, risky.mean())


def test_paint_hpmap_nest_device_matches_host():
    rng = np.random.RandomState(11)
    n, cap = 60000, 65536
    pos = (rng.standard_normal((n, 3)) * 120).astype(np.float32)
    aemit = rng.uniform(0.05, 1.0, n).astype(np.float32)
    v = rng.standard_normal((n, 3)).astype(np.float32)
    M0 = 2.5
    nside, nslices = 32, 16

    ids_h, mass_h, rmom_h, amid_h = paint_hpmap_nest(
        pos, aemit, v, M0, nside, nslices)

    def pad(a):
        out = np.zeros((cap,) + a.shape[1:], a.dtype)
        out[:n] = a
        return jnp.asarray(out)

    ids_d, mass_d, rmom_d, amid_d = paint_hpmap_nest_device(
        pad(pos), pad(aemit), pad(v), n, M0, nside, nslices)

    np.testing.assert_array_equal(ids_d, ids_h)
    np.testing.assert_array_equal(mass_d, mass_h)  # = count * M0 both
    np.testing.assert_allclose(rmom_d, rmom_h, rtol=2e-5, atol=1e-4)
    np.testing.assert_allclose(amid_d, amid_h, rtol=0, atol=1e-12)


def test_paint_device_aemit_one_extra_slice():
    pos = np.array([[1.0, 0, 0]], np.float32)
    ids, m, r, a = paint_hpmap_nest_device(
        jnp.asarray(pos), jnp.asarray(np.array([1.0], np.float32)),
        jnp.asarray(np.zeros((1, 3), np.float32)), 1, 1.0,
        nside=2, nslices=4)
    assert ids[0] // (12 * 4) == 4
