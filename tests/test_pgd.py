"""PGD correction (libfastpm/pgdcorrection.c) and the COLA + PGD +
wCDM config-ladder run."""

import numpy as np
import jax.numpy as jnp
import pytest

from fastpm_tpu.mesh import PM
from fastpm_tpu.pgd import PGDCorrection
from fastpm_tpu.cosmology import Cosmology
from fastpm_tpu.powerspectrum import FuncK
from fastpm_tpu.solver import Solver, SolverConfig
from fastpm_tpu import ic

POWERSPEC = "/root/repo/tests/fixtures/powerspec.txt"


def test_alpha_of_a():
    """alpha(a) = alpha0 * 10^(A a^2 - B a) (pgdcorrection.c:10-24)."""
    pgd = PGDCorrection(alpha0=0.8, A=4.0, B=8.0)
    for a in (0.2, 0.5, 1.0):
        want = 0.8 * 10 ** (4.0 * a * a - 8.0 * a)
        assert np.isclose(pgd.alpha(a), want, rtol=1e-12)


def test_pgd_pulls_toward_overdensity():
    """The PGD displacement points TOWARD a point overdensity (it
    sharpens halos by pulling particles in): for a particle left of the
    peak the x-displacement is positive."""
    pm = PM(32, 32.0)
    rho = np.zeros(pm.rshape, np.float32)
    rho[16, 16, 16] = 32.0 ** 3          # a delta spike, mean 1
    dk = pm.r2c(jnp.asarray(rho))
    pgd = PGDCorrection(alpha0=0.8, A=4.0, B=8.0, kl=0.3, ks=5.0)
    # mesh cell i holds the field at x = i * cellsize: the spike sits
    # at x = 16.0; probe symmetrically at +-4
    pos = jnp.asarray(np.array(
        [[12.0, 16.0, 16.0], [20.0, 16.0, 16.0]], np.float32))
    disp = np.asarray(pgd.compute(pm, pos, dk, a=1.0))
    assert abs(disp[0, 0]) > 1e-7
    assert disp[0, 0] > 0 and disp[1, 0] < 0
    # symmetric magnitudes
    np.testing.assert_allclose(disp[0, 0], -disp[1, 0], rtol=1e-3)


@pytest.mark.slow
def test_cola_pgd_wcdm_ladder():
    """The config-ladder combination (BASELINE.md): COLA force mode +
    PGD correction + CLP (w0/wa) dark energy, end-to-end on a small
    box. PGD must engage (nonzero pgdc consumed by the drift) and wCDM
    growth must differ from LCDM."""
    wcdm = Cosmology(h=0.6711, Omega_m=0.3175, w0=-1.1, wa=0.1,
                     growth_mode="ode", T_cmb=0.0)
    lcdm = Cosmology(h=0.6711, Omega_m=0.3175, growth_mode="ode",
                     T_cmb=0.0)
    g_w = wcdm.growth_info(0.5)
    g_l = lcdm.growth_info(0.5)
    assert abs(g_w.D1 - g_l.D1) > 1e-3

    cfg = SolverConfig(nc=16, boxsize=64.0,
                       time_step=list(np.linspace(0.2, 1.0, 4)),
                       force_mode="cola", pm_nc_factor=2, pgdc=True,
                       pgdc_alpha0=0.8, pgdc_A=4.0, pgdc_B=8.0,
                       pgdc_kl=2.0, pgdc_ks=10.0)
    s = Solver(cfg, wcdm)
    pk = FuncK.from_file(POWERSPEC)
    dk, _ = ic.linear_field(s.lptpm, wcdm, pk, seed=21, aout=1.0)
    s.setup_lpt(dk, 0.2)
    s.evolve()
    p = s.species["cdm"]
    assert p.a_x == 1.0
    assert np.isfinite(np.asarray(p.x)).all()
    assert p.pgdc is not None
    assert float(jnp.abs(p.pgdc).max()) > 0

    # a run without PGD must differ (the drift consumed pgdc)
    cfg2 = SolverConfig(nc=16, boxsize=64.0,
                        time_step=list(np.linspace(0.2, 1.0, 4)),
                        force_mode="cola", pm_nc_factor=2)
    s2 = Solver(cfg2, wcdm)
    dk2, _ = ic.linear_field(s2.lptpm, wcdm, pk, seed=21, aout=1.0)
    s2.setup_lpt(dk2, 0.2)
    s2.evolve()
    dx = np.abs(np.asarray(p.x) - np.asarray(s2.species["cdm"].x))
    dx = np.minimum(dx, 64.0 - dx)
    assert dx.max() > 1e-5
