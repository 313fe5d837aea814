import numpy as np
import pytest

from fastpm_tpu.healpix import ang2pix_ring, vec2pix_ring, nside2npix, paint_hpmap
from fastpm_tpu.ncdm import _pix2vec_ring, divide_sphere_fibonacci, divide_fd


def test_pix_roundtrip():
    for nside in (1, 2, 4, 16):
        npix = nside2npix(nside)
        v = _pix2vec_ring(np.arange(npix), nside)
        np.testing.assert_array_equal(vec2pix_ring(nside, v),
                                      np.arange(npix))


def test_sky_uniformity():
    rng = np.random.RandomState(0)
    v = rng.standard_normal((100000, 3))
    counts = np.bincount(vec2pix_ring(8, v), minlength=nside2npix(8))
    assert counts.min() > 0
    assert counts.std() / counts.mean() < 0.12


def test_paint_hpmap():
    rng = np.random.RandomState(1)
    n = 10000
    pos = rng.standard_normal((n, 3))
    aemit = rng.uniform(0.2, 0.9, n)
    ids, values, amid = paint_hpmap(pos, aemit, nside=4, nslices=8)
    assert values.sum() == pytest.approx(n)
    assert np.all(np.diff(ids) > 0)  # unique, sorted
    assert np.all((amid > 0) & (amid < 1))


def test_fibonacci_sphere_isotropy():
    v = divide_sphere_fibonacci(8)
    assert v.shape == (17, 3)
    np.testing.assert_allclose((v ** 2).sum(axis=1), 1.0, atol=1e-12)
    # mean direction ~ 0
    assert np.abs(v.mean(axis=0)).max() < 0.15


def test_divide_fd_mass_closure():
    vel, mass = divide_fd(8, [0.1], lvk=True)
    assert mass.sum() == pytest.approx(1.0, rel=1e-6)
    assert np.all(np.diff(vel) > 0)  # increasing shell velocities
