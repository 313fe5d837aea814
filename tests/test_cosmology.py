import math

import numpy as np
import pytest

from fastpm_tpu.cosmology import Cosmology


def test_friedmann_closure():
    c = Cosmology(h=0.6774, Omega_m=0.307494, T_cmb=2.725, N_nu=3)
    # E(1) == 1 exactly by construction
    assert c.E(1.0) == pytest.approx(1.0, abs=1e-12)
    assert c.Omega_cdm + c.Omega_ncdm == pytest.approx(c.Omega_m)
    assert (c.Omega_m + c.Omega_r + c.Omega_k + c.Omega_Lambda
            == pytest.approx(1.0))


def test_eds_growth_limits():
    """In matter domination D1 ~ a, f1 ~ 1, D2 ~ -3/7 a^2, f2 ~ 2."""
    for mode in ("lcdm", "ode"):
        c = Cosmology(h=0.7, Omega_m=1.0, T_cmb=0.0, growth_mode=mode)
        gi = c.growth_info(1.0)
        assert gi.D1 == pytest.approx(1.0)
        assert gi.f1 == pytest.approx(1.0, rel=1e-4)
        assert gi.f2 == pytest.approx(2.0, rel=1e-3)
        gi5 = c.growth_info(0.5)
        assert gi5.D1 == pytest.approx(0.5, rel=1e-4)
        # D2 normalized to its value at a=1
        assert gi5.D2 == pytest.approx(0.25, rel=1e-3)


def test_growth_modes_agree_lcdm_background():
    """ODE and LCDM growth should agree for a Lambda+CDM background
    (cosmology.c comments in DGrowthFactorDa)."""
    base = dict(h=0.6774, Omega_m=0.307494, T_cmb=0.0)
    c_int = Cosmology(growth_mode="lcdm", **base)
    c_ode = Cosmology(growth_mode="ode", **base)
    for a in (0.1, 0.3, 0.5, 1.0):
        D_int = c_int.growth_info(a).D1
        D_ode = c_ode.growth_info(a).D1
        assert D_ode == pytest.approx(D_int, rel=2e-3)
        # derivative consistency (finite difference)
        eps = 1e-5
        for c in (c_int, c_ode):
            fd = (c.growth_info(a + eps).D1 - c.growth_info(a - eps).D1) / (2 * eps)
            assert c.dD1da(a) == pytest.approx(fd, rel=1e-4)
            fd2 = (c.dD1da(a + eps) - c.dD1da(a - eps)) / (2 * eps)
            assert c.d2D1da2(a) == pytest.approx(fd2, rel=1e-3)


def test_f1_is_dlogD_dloga():
    c = Cosmology(h=0.6774, Omega_m=0.307494, growth_mode="ode")
    for a in (0.2, 0.6, 1.0):
        gi = c.growth_info(a)
        assert gi.f1 == pytest.approx(a * c.dD1da(a) / gi.D1, rel=1e-6)


def test_dark_energy_clp():
    c = Cosmology(h=0.7, Omega_m=0.3, w0=-0.9, wa=0.1)
    # at a=1 Omega_DE_ESq == Omega_Lambda
    assert c.Omega_DE_ESq(1.0) == pytest.approx(c.Omega_Lambda)
    # cosmological-constant limit
    c2 = Cosmology(h=0.7, Omega_m=0.3, w0=-1.0, wa=0.0)
    for a in (0.3, 0.7):
        assert c2.Omega_DE_ESq(a) == pytest.approx(c2.Omega_Lambda)
    # derivative checks by finite difference
    eps = 1e-6
    for a in (0.4, 0.9):
        fd = (c.Omega_DE_ESq(a + eps) - c.Omega_DE_ESq(a - eps)) / (2 * eps)
        assert c.DOmega_DE_ESqDa(a) == pytest.approx(fd, rel=1e-5)


def test_hubble_derivatives():
    c = Cosmology(h=0.6774, Omega_m=0.307494, T_cmb=2.725, N_nu=3)
    eps = 1e-6
    for a in (0.1, 0.5, 1.0):
        fd = (c.E(a + eps) - c.E(a - eps)) / (2 * eps)
        assert c.dEda(a) == pytest.approx(fd, rel=1e-5)
        fd2 = (c.dEda(a + eps) - c.dEda(a - eps)) / (2 * eps)
        assert c.d2Eda2(a) == pytest.approx(fd2, rel=1e-4)


def test_ncdm_exact_vs_matterlike():
    """At late times massive neutrinos are matter-like; the exact FD
    density approaches m/93.14/h^2."""
    m = (0.2,)
    exact = Cosmology(h=0.6711, Omega_m=0.3175, T_cmb=2.7255,
                      N_eff=3.046, N_nu=3, m_ncdm=m, ncdm_matterlike=False)
    like = Cosmology(h=0.6711, Omega_m=0.3175, T_cmb=2.7255,
                     N_eff=3.046, N_nu=3, m_ncdm=m, ncdm_matterlike=True)
    # z=0 densities agree at the ~1% level (93.14 eV is the instantaneous-
    # decoupling value; the FD integral includes distortions)
    assert exact.Omega_ncdm == pytest.approx(like.Omega_ncdm, rel=0.05)
    # early times: exact ncdm is radiation-like, denser than a^-3 scaling
    a = 1e-4
    assert exact.Omega_ncdm_ESq(a) > like.Omega_ncdm / a ** 3


def test_rsd_factor():
    """Golden value from tests/run-test-nbodykit.sh:13 -- the nbodykit.lua
    cosmology (Omega_m=0.307494, h=0.6774, T_cmb=0), snapshot at z=0.5."""
    c = Cosmology(h=0.6774, Omega_m=0.307494, T_cmb=0.0)
    assert c.RSD_factor(1.0 / 1.5) == pytest.approx(1.140331e-02, rel=1e-6)
    assert c.RSD_factor(1.0) == pytest.approx(0.01, rel=1e-12)


def test_comoving_distance():
    c = Cosmology(h=0.7, Omega_m=1.0, T_cmb=0.0)
    # EdS: chi(a)/D_H = 2 (1 - sqrt(a))
    for a in (0.25, 0.5, 1.0):
        assert c.comoving_distance(a) == pytest.approx(
            2 * (1 - math.sqrt(a)), rel=1e-6)
