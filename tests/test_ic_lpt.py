"""Golden validation of the IC + 2LPT pipeline against the reference's
deterministic regression values (tests/run-test-lightcone.check), which pin
the entire chain: ranlxd RNG -> GADGET seed table -> white noise ->
remove-variance -> P(k) interpolation -> growth -> 2LPT kernels -> readout.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from fastpm_tpu.mesh import PM
from fastpm_tpu.powerspectrum import FuncK
from fastpm_tpu.cosmology import Cosmology
from fastpm_tpu import ic, native
from fastpm_tpu.lpt import lpt_solve, lpt_evolve
from fastpm_tpu.store import lattice_store

POWERSPEC = "/root/repo/tests/fixtures/powerspec.txt"


@pytest.fixture(scope="module")
def lightcone_setup():
    """tests/lightcone.lua: nc=64, box=512, seed=100,
    remove_cosmic_variance, growth LCDM."""
    pm = PM(64, 512.0)
    c = Cosmology(h=0.6774, Omega_m=0.307494, T_cmb=0.0, growth_mode="lcdm")
    pk = FuncK.from_file(POWERSPEC)
    dk, var = ic.linear_field(pm, c, pk, seed=100, aout=1.0,
                              remove_cosmic_variance=True)
    return pm, c, pk, dk, var


def test_powerspec_file_pairs():
    pk = FuncK.from_file(POWERSPEC)
    assert pk.size == 1769  # run-test-lightcone.check:1


def test_white_noise_variance_golden(lightcone_setup):
    pm, c, pk, dk, var = lightcone_setup
    # run-test-lightcone.check:3 (fixed-amplitude ICs: 1 - 1/Norm up to
    # float32 rounding of the unit-amplitude modes)
    assert "%.8f" % var == "0.99999619"
    assert var == pytest.approx(1 - 1 / pm.Norm, abs=5e-9)


def test_2lpt_displacement_std_golden(lightcone_setup):
    pm, c, pk, dk, var = lightcone_setup
    store = lattice_store(pm, columns=("id",))
    dx1, dx2 = lpt_solve(pm, dk, store.x, "1_4")
    s1 = np.asarray(dx1, dtype=np.float64)
    s2 = np.asarray(dx2, dtype=np.float64)
    std1 = np.sqrt((s1 ** 2).mean(0) - s1.mean(0) ** 2)
    std2 = np.sqrt((s2 ** 2).mean(0) - s2.mean(0) ** 2)
    # run-test-lightcone.check:4-5; dx2 is phase-sensitive and therefore
    # validates the ranlxd sequence bit-exactly.
    assert ["%.6g" % s for s in std1] == ["5.36177"] * 3
    assert ["%.6g" % s for s in std2] == ["0.455678", "0.44748", "0.453293"]


def test_lpt_evolve_velocities(lightcone_setup):
    pm, c, pk, dk, var = lightcone_setup
    store = lattice_store(pm, columns=("id", "v", "acc"))
    dx1, dx2 = lpt_solve(pm, dk, store.x, "1_4")
    store = store.replace(dx1=dx1, dx2=dx2)
    out = lpt_evolve(c, 0.1, store)
    assert out.a_x == 0.1 and out.a_v == 0.1
    gi = c.growth_info(0.1)
    # velocity ~ Dv1 * dx1 at leading order
    Dv1 = gi.D1 * gi.f1 * 0.01 * c.E(0.1)
    v = np.asarray(out.v)
    pred = Dv1 * np.asarray(dx1)
    assert np.abs(v - pred).max() < 0.05 * np.abs(v).max() + 1e-3
    # za_only drops dx2
    za = lpt_evolve(c, 0.1, store, za_only=True)
    np.testing.assert_allclose(np.asarray(za.x),
                               np.asarray(store.x + np.float32(gi.D1) * dx1),
                               rtol=1e-6)


def test_white_noise_hermitian():
    pm = PM(16, 32.0)
    n = pm.Nmesh[0]
    dk = np.asarray(ic.gaussian_white_noise(pm, seed=7))
    # hermitian symmetry on the kz=0 and kz=Nyquist planes:
    # dk[-i, -j, kz] == conj(dk[i, j, kz])
    for kz in (0, n // 2):
        plane = dk[:, :, kz]
        mirrored = plane[(-np.arange(n)) % n][:, (-np.arange(n)) % n]
        np.testing.assert_allclose(mirrored, np.conj(plane), atol=1e-6)
    # unit-variance modes (16^3 realization scatter is a few percent)
    assert pm.compute_variance(dk) == pytest.approx(1.0, rel=0.15)
    # determinism
    dk2 = np.asarray(ic.gaussian_white_noise(pm, seed=7))
    np.testing.assert_array_equal(dk, dk2)
    # different seed differs
    dk3 = np.asarray(ic.gaussian_white_noise(pm, seed=8))
    assert not np.array_equal(dk, dk3)


def test_white_noise_slab_stability():
    """The gadget scheme is decomposition-stable: filling a slab matches
    the corresponding slice of the full fill."""
    nm = (16, 16, 16)
    full = native.gadget_white_noise(nm, seed=42)
    slab = native.gadget_white_noise(nm, seed=42, i0_start=4, i0_size=5)
    np.testing.assert_array_equal(full[4:9], slab)


def test_remove_variance():
    pm = PM(16, 32.0)
    dk = ic.gaussian_white_noise(pm, seed=3)
    fixed = np.asarray(ic.remove_variance(dk))
    mag = np.abs(fixed)
    nz = np.abs(np.asarray(dk)) > 0
    np.testing.assert_allclose(mag[nz], 1.0, rtol=1e-5)
    assert mag[0, 0, 0] == 0


def test_store_lattice_and_id_roundtrip():
    pm = PM(8, 16.0)
    store = lattice_store(pm, columns=("id", "rand"))
    assert store.np_local == 512
    q = np.asarray(store.q_from_id())
    np.testing.assert_allclose(q, np.asarray(store.x), atol=1e-6)
    # rand column reproduces the rank-0 ranlxd stream deterministically
    r2 = native.ranlxd_uniform(1231584, 512).astype(np.float32)
    np.testing.assert_array_equal(np.asarray(store.rand), r2)


def test_store_wrap():
    pm = PM(8, 16.0)
    store = lattice_store(pm, columns=())
    shifted = store.replace(x=store.x + jnp.float32(20.0))
    wrapped = shifted.wrap(16.0)
    x = np.asarray(wrapped.x)
    assert x.min() >= 0 and x.max() < 16.0


def test_slow_scheme_white_noise():
    """SLOW scheme (pmic_fill_gaussian_slow, initialcondition.c:312-352):
    full 3D scan of one global ranlxd stream; unit-variance hermitian
    modes after r2c."""
    pm = PM(32, 128.0)
    dk = ic.gaussian_white_noise(pm, seed=42, scheme="slow")
    var = pm.compute_variance(dk)
    assert abs(var - 1.0) < 0.05
    # deterministic
    dk2 = ic.gaussian_white_noise(pm, seed=42, scheme="slow")
    np.testing.assert_array_equal(np.asarray(dk), np.asarray(dk2))
    # different seed -> different field
    dk3 = ic.gaussian_white_noise(pm, seed=43, scheme="slow")
    assert not np.allclose(np.asarray(dk), np.asarray(dk3))
