"""Lightcone tests: horizon tables, crossing solve, fov culling."""

import numpy as np
import jax.numpy as jnp
import pytest

from fastpm_tpu.cosmology import Cosmology
from fastpm_tpu.kdk import DriftFactor, KickFactor
from fastpm_tpu.lightcone import (Horizon, LightCone, USMesh,
                                  volume_density_from_ell)
from fastpm_tpu.store import Store
from fastpm_tpu import events as ev

COSMO = Cosmology(h=0.6774, Omega_m=0.307494, T_cmb=0.0, growth_mode="lcdm")


def test_horizon_table():
    hz = Horizon(COSMO, dh_factor=1.0)
    # chi(1) = 0; chi decreasing in a
    assert hz.distance(1.0) == pytest.approx(0.0, abs=1e-9)
    assert hz.distance(0.5) > hz.distance(0.8) > 0
    # against direct quadrature
    from fastpm_tpu.units import HUBBLE_DISTANCE
    want = COSMO.comoving_distance(0.5) * HUBBLE_DISTANCE
    assert hz.distance(0.5) == pytest.approx(want, rel=1e-6)
    # dh_factor scales
    hz2 = Horizon(COSMO, dh_factor=0.1)
    assert hz2.distance(0.5) == pytest.approx(0.1 * hz.distance(0.5),
                                              rel=1e-12)


def test_volume_density_from_ell():
    hz = Horizon(COSMO, dh_factor=1.0)
    d1 = volume_density_from_ell(100, 0.5, hz)
    d2 = volume_density_from_ell(200, 0.5, hz)
    assert d2 == pytest.approx(8 * d1, rel=1e-12)  # ~ ell^3


def test_fov_inside():
    lc = LightCone(cosmology=COSMO, fov=90.0)
    xo = np.array([[0, 0, 10.0],      # on axis: inside
                   [10.0, 0, 0],      # 90 deg off-axis: outside (fov/2=45)
                   [1.0, 0, 10.0]])   # ~6 deg: inside
    ok = lc.inside(xo)
    assert list(ok) == [True, False, True]
    # octant culling at full sky
    lc2 = LightCone(cosmology=COSMO, fov=360.0,
                    octants=(True,) + (False,) * 7, tol=0.0)
    xo = np.array([[1.0, 1, 1], [-5.0, 1, 1]])
    assert list(lc2.inside(xo)) == [True, False]


def test_crossing_solve_static_particle():
    """A static particle at radius r crosses when xi(a) == r; the solved
    aemit must satisfy that to high accuracy."""
    lc = LightCone(cosmology=COSMO, fov=360.0, dh_factor=0.05)
    n = 64
    rng = np.random.RandomState(0)
    x = rng.uniform(10, 60, (n, 3)).astype(np.float32)
    p = Store(x=jnp.asarray(x),
              v=jnp.zeros((n, 3), jnp.float32),
              acc=jnp.zeros((n, 3), jnp.float32),
              id=jnp.arange(n, dtype=jnp.uint32),
              rand=jnp.zeros(n, jnp.float32),
              a_x=0.1, a_v=0.1)
    drift = DriftFactor(COSMO, "fastpm", 0.1, 0.5, 1.0)
    kick = KickFactor(COSMO, "fastpm", 0.1, 0.5, 1.0)
    mesh = USMesh(lc, lambda: p, np.zeros((1, 3)), amin=0.1, amax=1.0)
    rec = mesh._solve_tile(p, drift, kick, np.zeros(3), 0.1, 1.0)
    assert rec is not None
    # device record: padded to a power-of-two cap, first n rows valid
    nrec = rec["n"]
    rec = {k: np.asarray(v)[:nrec] for k, v in rec.items() if k != "n"}
    r = np.sqrt((rec["x"].astype(np.float64) ** 2).sum(axis=1))
    xi = lc.horizon.distance(rec["aemit"].astype(np.float64))
    np.testing.assert_allclose(r, xi, atol=5e-4)
    # particles whose radius is outside [xi(1), xi(0.1)] never cross
    rmax = lc.horizon.distance(0.1)
    crossed_ids = set(rec["id"].reshape(-1).tolist())
    for i in range(n):
        rr = np.sqrt((x[i] ** 2).sum())
        if rr > rmax:
            assert i not in crossed_ids


def test_usmesh_emit_events():
    lc = LightCone(cosmology=COSMO, fov=360.0, dh_factor=0.05)
    p = Store(x=jnp.zeros((4, 3), jnp.float32),
              v=jnp.zeros((4, 3), jnp.float32),
              acc=jnp.zeros((4, 3), jnp.float32), a_x=0.5, a_v=0.5)
    mesh = USMesh(lc, lambda: p, np.zeros((1, 3)), amin=0.1, amax=1.0)
    got = []
    mesh.event_handlers.on(ev.EVENT_LIGHTCONE_READY, ev.STAGE_AFTER,
                           lambda e: got.append(e.whence))
    drift = DriftFactor(COSMO, "fastpm", 0.5, 0.5, 0.5)
    kick = KickFactor(COSMO, "fastpm", 0.5, 0.5, 0.5)
    mesh.intersect(drift, kick, 0.5, 0.5, ev.TIMESTEP_START)
    mesh.intersect(drift, kick, 1.0, 1.0, ev.TIMESTEP_END)
    assert got == [ev.TIMESTEP_START, ev.TIMESTEP_END]


@pytest.mark.slow
def test_lightcone_fof_tail_carry(tmp_path):
    """usmesh FOF with tail carry-over (run_usmesh_fof,
    src/fastpm.c:1334-1400): halos established once they are beyond
    rmin + padding/2 must all be written by the final TIMESTEP_END
    flush, and match a FOF over the full concatenated lightcone."""
    from fastpm_tpu.config.params import load_params_from_string
    from fastpm_tpu.cli import run_fastpm
    from fastpm_tpu.diagnostics import Log
    from fastpm_tpu.io.bigfile import BigFile
    from fastpm_tpu.fof import find_halos
    from fastpm_tpu.store import Store

    out = tmp_path / "lc"
    src = """
nc = 16
boxsize = 64.0
time_step = linspace(0.2, 1, 4)
output_redshifts = {0.0}
Omega_m = 0.307494
h = 0.6774
read_powerspectrum = "/root/repo/tests/fixtures/powerspec.txt"
random_seed = 100
force_mode = "fastpm"
growth_mode = "LCDM"
pm_nc_factor = 1
np_alloc_factor = 2.0
dh_factor = 0.05
lc_fov = 360
lc_amin = 0.2
lc_amax = 1.0
write_fof = "%(out)s/fof"
fof_nmin = 8
lc_usmesh_fof_padding = 10.0
lc_write_usmesh = "%(out)s/usmesh"
lc_usmesh_tiles = fastpm.outerproduct({-1, 0}, {-1, 0}, {-1, 0})
""" % dict(out=out)
    run_fastpm(load_params_from_string(src), Log(echo=False))

    bf = BigFile(str(out / "usmesh"))
    length = bf.open_block("LL-0.200/Length").read_all()
    aemit = bf.open_block("LL-0.200/Aemit").read_all()
    assert (length >= 8).all()
    # batches are written in aemit order within each append; the index
    # attrs must account for every halo
    att = bf.open_block("LL-0.200").attrs
    assert int(np.sum(att.get("aemitIndex.size"))) == len(length)

    # reference check: FOF over the whole lightcone at once finds the
    # same established halos (tail carry must not split or lose any)
    pos = bf.open_block("1/Position").read_all()
    vel = bf.open_block("1/Velocity").read_all()
    ae = bf.open_block("1/Aemit").read_all()
    ids = bf.open_block("1/ID").read_all()
    st = Store(x=jnp.asarray(pos), v=jnp.asarray(vel),
               id=jnp.asarray(ids.reshape(-1)), aemit=jnp.asarray(ae))
    cat, _ = find_halos(st, 0.2 * 64.0 / 16, 64.0, nmin=8,
                        periodic=False)
    assert len(length) == cat.nhalo
    np.testing.assert_array_equal(np.sort(length), np.sort(cat.length))
