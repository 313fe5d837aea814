"""read_angular_grid (reference libfastpmio/io.c:827-953 +
tests/testangulargrid.c): RA/DEC bigfile -> radial-shell source grid."""

import numpy as np
import pytest

from fastpm_tpu.io.bigfile import BigFile
from fastpm_tpu.io.angular import read_angular_grid, angular_grid_size


@pytest.fixture
def radec_file(tmp_path):
    path = str(tmp_path / "grid")
    bf = BigFile(path, create=True)
    rng = np.random.RandomState(4)
    n = 48
    ra = rng.uniform(0, 360, n)
    dec = rng.uniform(-90, 90, n)
    bf.create_block("RA", ra.astype(np.float64))
    bf.create_block("DEC", dec.astype(np.float64))
    return path, ra, dec


def test_grid_points(radec_file):
    path, ra, dec = radec_file
    r = [0.0, 1.0, 2.0, 3.0]
    aemit = [0.1, 0.2, 0.3, 0.4]
    store = read_angular_grid(path, r, aemit)
    n = len(ra)
    assert store.np_local == n * len(r)

    x = np.asarray(store.x)
    a = np.asarray(store.aemit)
    # the reference's conversion (io.c:925-930): theta = pi/2 - dec
    rar = np.deg2rad(ra)
    th = np.pi / 2 - np.deg2rad(dec)
    d = np.stack([np.sin(th) * np.cos(rar), np.sin(th) * np.sin(rar),
                  np.cos(th)], axis=-1)
    for j, (rj, aj) in enumerate(zip(r, aemit)):
        sl = slice(j * n, (j + 1) * n)
        np.testing.assert_allclose(x[sl], d * rj, atol=1e-5)
        np.testing.assert_allclose(a[sl], aj, atol=1e-7)
    # radius of every shell point is r[j]
    np.testing.assert_allclose(np.linalg.norm(x[n:2 * n], axis=-1), 1.0,
                               atol=1e-5)


def test_sampling_factor_and_size(radec_file):
    path, ra, dec = radec_file
    r = np.linspace(0, 7, 8)
    store = read_angular_grid(path, r, r, sampling_factor=3)
    expect_dirs = (len(ra) + 2) // 3
    assert store.np_local == expect_dirs * len(r)
    assert angular_grid_size(path, len(r), 3) == store.np_local


def test_append_to_store(radec_file):
    path, ra, dec = radec_file
    s1 = read_angular_grid(path, [1.0], [0.5])
    s2 = read_angular_grid(path, [2.0], [0.6], store=s1)
    assert s2.np_local == 2 * len(ra)
    np.testing.assert_allclose(np.asarray(s2.x[:len(ra)]),
                               np.asarray(s1.x[:len(ra)]), atol=0)
