"""comparehalos tool (python/comparehalos.py analog) and the (k, mu)
wedge power measurement behind it."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from fastpm_tpu.mesh import PM
from fastpm_tpu.powerspectrum import measure_power, measure_power_2d


def test_mu_average_recovers_1d():
    """Summing the (k, mu) wedges over mu reproduces the 1D P(k)."""
    pm = PM(32, 64.0)
    rng = np.random.RandomState(3)
    field = jnp.asarray(rng.standard_normal(pm.rshape)
                        .astype(np.float32))
    dk = pm.r2c(field)
    p1 = measure_power(pm, dk)
    p2 = measure_power_2d(pm, dk, Nmu=10)
    n2 = p2["Nmodes"].sum(axis=1)
    psum = (p2["power"] * p2["Nmodes"]).sum(axis=1)
    good = n2 > 0
    np.testing.assert_allclose(psum[good] / n2[good],
                               p1.p[good], rtol=1e-5)
    np.testing.assert_allclose(n2, p1.Nmodes, rtol=1e-6)


def test_anisotropic_field_shows_mu_dependence():
    """A field amplified along the z axis has power rising with mu."""
    pm = PM(32, 64.0)
    rng = np.random.RandomState(4)
    field = jnp.asarray(rng.standard_normal(pm.rshape)
                        .astype(np.float32))
    dk = pm.r2c(field)
    # multiply by (1 + mu^2)-like kernel: scale modes by kz^2/k^2
    kk = np.asarray(pm.integer_kk, dtype=np.float64)
    nz = pm.Nmesh[2]
    iz = np.arange(nz // 2 + 1)
    mu2 = (iz * iz)[None, None, :] / np.maximum(kk, 1)
    from fastpm_tpu.mesh import put_complex
    dk2 = put_complex(np.asarray(
        (np.asarray(dk.real) + 1j * np.asarray(dk.imag))
        * (1.0 + 2.0 * mu2)))
    r = measure_power_2d(pm, dk2, Nmu=5)
    # average over k bins 2..8 per mu wedge: increasing in mu
    sel = slice(2, 9)
    n = r["Nmodes"][sel]
    p = (r["power"][sel] * n).sum(axis=0) / np.maximum(n.sum(axis=0), 1)
    assert p[-1] > 2.0 * p[0]


def test_comparehalos_tool(tmp_path):
    """Run the tool end-to-end on synthetic catalogs."""
    from fastpm_tpu.io.bigfile import BigFile
    from fastpm_tpu.io.snapshots import write_snapshot_header
    from fastpm_tpu.tools import main_comparehalos
    from fastpm_tpu.cosmology import Cosmology

    rng = np.random.RandomState(0)
    box = 64.0
    c = Cosmology(h=0.6774, Omega_m=0.307494)

    def make_cat(path, n, with_length=True):
        bf = BigFile(str(path), create=True)
        x = rng.uniform(0, box, (n, 3)).astype(np.float32)
        v = rng.standard_normal((n, 3)).astype(np.float32) * 100
        bf.create_block("LL-0.200/Position", x)
        bf.create_block("LL-0.200/Velocity", v)
        if with_length:
            bf.create_block(
                "LL-0.200/Length",
                rng.randint(8, 400, n).astype(np.int32))
        write_snapshot_header(bf, c, 1.0, nc=32, boxsize=box,
                              species={})
        return path

    c1 = make_cat(tmp_path / "cat1", 3000)
    c2 = make_cat(tmp_path / "cat2", 2600)
    out = tmp_path / "cmp.txt"
    rc = main_comparehalos([str(out), str(c1), "--nmesh", "32",
                            "--nn", "3", "--nmax", "200",
                            "--", str(c2)])
    assert rc == 0
    outs = sorted(tmp_path.glob("cmp-nmin-*.txt"))
    assert len(outs) >= 3      # r1/r2/rx for at least one nmin
    arr = np.loadtxt(outs[0])
    assert arr.shape[1] == 4   # k mu power Nmodes
    assert np.isfinite(arr).all()
