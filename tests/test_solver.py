"""End-to-end solver tests, including the reference's golden broadband
growth checks (tests/run-test-lightcone.check:9+) which pin the full
force + kick/drift chain at every step."""

import numpy as np
import jax.numpy as jnp
import pytest

from fastpm_tpu.mesh import PM
from fastpm_tpu.powerspectrum import FuncK
from fastpm_tpu.cosmology import Cosmology
from fastpm_tpu import ic
from fastpm_tpu.solver import Solver, SolverConfig
from fastpm_tpu.diagnostics import attach_standard_handlers, Log

POWERSPEC = "/root/repo/tests/fixtures/powerspec.txt"
COSMO = Cosmology(h=0.6774, Omega_m=0.307494, T_cmb=0.0, growth_mode="lcdm")


def _run(cfg, seed=100, remove_cosmic_variance=True, echo=False):
    s = Solver(cfg, COSMO)
    log = attach_standard_handlers(s, Log(echo=echo))
    pk = FuncK.from_file(POWERSPEC)
    dk, var = ic.linear_field(s.lptpm, COSMO, pk, seed=seed, aout=1.0,
                              remove_cosmic_variance=remove_cosmic_variance)
    s.setup_lpt(dk, cfg.time_step[0])
    s.evolve()
    return s, log


@pytest.mark.slow
def test_lightcone_lua_broadband_goldens():
    """Replicates tests/lightcone.lua; every per-step broadband value
    must match the reference log exactly at %g precision."""
    cfg = SolverConfig(nc=64, boxsize=512.0,
                       time_step=list(np.linspace(0.1, 1, 8)),
                       force_mode="fastpm", pm_nc_factor=1, lpt_nc_factor=1)
    s, log = _run(cfg)
    goldens = [
        "D^2(0.1, 1.0) P(k<0.0490625) = 17305.5",
        "D^2(0.228571, 1.0) P(k<0.0490625) = 17200.9",
        "D^2(0.357143, 1.0) P(k<0.0490625) = 17110 ",
        "D^2(0.485714, 1.0) P(k<0.0490625) = 17064.7",
        "D^2(0.614286, 1.0) P(k<0.0490625) = 17043.4",
        "D^2(0.742857, 1.0) P(k<0.0490625) = 17028.1",
        "D^2(0.871429, 1.0) P(k<0.0490625) = 17014.2",
        "D^2(1, 1.0) P(k<0.0490625) = 17002.2",
    ]
    for g in goldens:
        assert log.contains(g), g


@pytest.mark.slow
def test_lightcone_ODE_broadband_goldens():
    """Same run with growth_mode='ode' (RKF45-integrated D1/D2 system);
    pins the ODE growth path end-to-end
    (tests/run-test-lightcone-ODE.check)."""
    cosmo = Cosmology(h=0.6774, Omega_m=0.307494, T_cmb=0.0,
                      growth_mode="ode")
    cfg = SolverConfig(nc=64, boxsize=512.0,
                       time_step=list(np.linspace(0.1, 1, 8)),
                       force_mode="fastpm", pm_nc_factor=1,
                       lpt_nc_factor=1)
    s = Solver(cfg, cosmo)
    log = attach_standard_handlers(s, Log())
    pk = FuncK.from_file(POWERSPEC)
    dk, var = ic.linear_field(s.lptpm, cosmo, pk, seed=100, aout=1.0,
                              remove_cosmic_variance=True)
    assert "%.8f" % var == "0.99999619"
    s.setup_lpt(dk, cfg.time_step[0])
    s.evolve()
    goldens = [
        "D^2(0.1, 1.0) P(k<0.0490625) = 17305.5",
        "D^2(0.228571, 1.0) P(k<0.0490625) = 17201.1",
        "D^2(0.357143, 1.0) P(k<0.0490625) = 17110.2",
        "D^2(0.485714, 1.0) P(k<0.0490625) = 17064.9",
        "D^2(0.614286, 1.0) P(k<0.0490625) = 17043.7",
        "D^2(0.742857, 1.0) P(k<0.0490625) = 17028.4",
        "D^2(0.871429, 1.0) P(k<0.0490625) = 17014.5",
        "D^2(1, 1.0) P(k<0.0490625) = 17002.5",
    ]
    for g in goldens:
        assert log.contains(g), g


def test_za_mode_is_analytic():
    """force_mode='za': the drift moves particles exactly along
    x = q + D1(a) dx1; no force needed."""
    cfg = SolverConfig(nc=16, boxsize=128.0, time_step=[0.2, 0.5, 1.0],
                       force_mode="za", za=True, pm_nc_factor=1)
    s = Solver(cfg, COSMO)
    pk = FuncK.from_file(POWERSPEC)
    dk, _ = ic.linear_field(s.lptpm, COSMO, pk, seed=5, aout=1.0)
    s.setup_lpt(dk, 0.2)
    p0 = s.species["cdm"]
    q = np.asarray(p0.q_from_id())
    dx1 = np.asarray(p0.dx1)
    s.evolve()
    p1 = s.species["cdm"]
    D1 = COSMO.growth_info(1.0).D1
    expected = q + D1 * dx1
    # за mode wraps positions; compare modulo box
    got = np.asarray(p1.x)
    diff = (got - expected + 64.0) % 128.0 - 64.0
    assert np.abs(diff).max() < 1e-3


def test_fastpm_preserves_linear_growth():
    """The FastPM scheme's defining property: with random-amplitude ICs
    the large-scale P(k) follows D1^2(a) regardless of step count."""
    cfg = SolverConfig(nc=32, boxsize=256.0, time_step=[0.3, 0.55, 1.0],
                       force_mode="fastpm", pm_nc_factor=1)
    s, log = _run(cfg, seed=11, remove_cosmic_variance=True)
    # the broadband lines divide by D^2; all should be ~equal
    vals = []
    for line in log.lines:
        if line.startswith("D^2("):
            vals.append(float(line.split("=")[1].split("Sigma8")[0]))
    assert len(vals) == 3
    assert max(vals) / min(vals) < 1.02


def test_cola_runs_and_stays_sane():
    cfg = SolverConfig(nc=16, boxsize=128.0, time_step=[0.2, 0.6, 1.0],
                       force_mode="cola", pm_nc_factor=1)
    s, log = _run(cfg, seed=3)
    p = s.species["cdm"]
    assert p.a_x == 1.0 and p.a_v == 1.0
    assert np.isfinite(np.asarray(p.x)).all()
    assert np.isfinite(np.asarray(p.v)).all()
    # COLA keeps dx1/dx2 persistent
    assert p.dx1 is not None and p.dx2 is not None


def test_vpm_switches_mesh():
    cfg = SolverConfig(nc=16, boxsize=128.0, time_step=[0.2, 1.0],
                       force_mode="fastpm",
                       pm_nc_factor=[(0.0, 1), (0.5, 2)])
    s = Solver(cfg, COSMO)
    assert s.find_pm(0.2).Nmesh[0] == 16
    assert s.find_pm(0.6).Nmesh[0] == 32
    assert s.find_pm(1.0).Nmesh[0] == 32


def test_snapshot_unit_conversion():
    cfg = SolverConfig(nc=16, boxsize=128.0, time_step=[0.5, 1.0],
                       force_mode="fastpm", pm_nc_factor=1)
    s, log = _run(cfg, seed=9)
    p = s.species["cdm"]
    snap = s.set_snapshot(p, None, None, 1.0)
    # internal a^2 dx/dt /H0 -> peculiar km/s at a=1: v_km_s = v * 100
    np.testing.assert_allclose(np.asarray(snap.v),
                               np.asarray(p.v) * 100.0, rtol=1e-6)


def test_check_values_in_program_flag():
    """check_values (pm_check_values analog) via the in-program fused
    finite-ness flag + deferred fetch (_cv_flag/_settle_cv): a clean
    run passes; a poisoned store raises FloatingPointError."""
    cfg = SolverConfig(nc=16, boxsize=64.0,
                       time_step=[0.5, 0.75, 1.0],
                       force_mode="fastpm", pm_nc_factor=1,
                       lpt_nc_factor=1, check_values=True)
    s = Solver(cfg, COSMO)
    pk = FuncK.from_file(POWERSPEC)
    dk, _ = ic.linear_field(s.lptpm, COSMO, pk, seed=7, aout=1.0)
    s.setup_lpt(dk, 0.5)
    s.evolve()   # clean run: no raise

    s2 = Solver(cfg, COSMO)
    dk, _ = ic.linear_field(s2.lptpm, COSMO, pk, seed=7, aout=1.0)
    s2.setup_lpt(dk, 0.5)
    p = s2.species["cdm"]
    bad = p.x.at[0, 0].set(jnp.nan)
    s2.species["cdm"] = p.replace(x=bad)
    with pytest.raises(FloatingPointError):
        s2.evolve()
