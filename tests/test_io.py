"""Tests for bigfile IO, snapshots, complex-field dumps, and the CLI."""

import os

import numpy as np
import pytest

from fastpm_tpu.io.bigfile import BigFile
from fastpm_tpu.io.fields import write_complex, read_complex
from fastpm_tpu.io.snapshots import (write_snapshot, read_snapshot_header,
                                     read_species)
from fastpm_tpu.mesh import PM
from fastpm_tpu.cosmology import Cosmology
from fastpm_tpu.config.params import load_params_from_string
from fastpm_tpu.cli import run_fastpm
from fastpm_tpu.diagnostics import Log

COSMO = Cosmology(h=0.6774, Omega_m=0.307494, T_cmb=0.0, growth_mode="lcdm")


def test_bigfile_roundtrip(tmp_path):
    bf = BigFile(str(tmp_path / "f"), create=True)
    data = np.arange(30, dtype=np.float32).reshape(10, 3)
    block = bf.create_block("1/Position", data, Nfile=3)
    block.attrs.set("a.x", 0.5, "f8")
    block.attrs.set("name", "hello")
    block.attrs.set("ints", np.asarray([1, 2, 3], dtype=np.int64), "i8")

    bf2 = BigFile(str(tmp_path / "f"))
    b2 = bf2.open_block("1/Position")
    np.testing.assert_array_equal(b2.read_all(), data)
    assert b2.dtype == "<f4" and b2.nmemb == 3 and b2.Nfile == 3
    assert b2.attrs.get("a.x") == 0.5
    assert b2.attrs.get("name") == "hello"
    np.testing.assert_array_equal(b2.attrs.get("ints"), [1, 2, 3])
    assert set(bf2.list_blocks()) == {"1/Position"}


def test_bigfile_header_format(tmp_path):
    """The header must be parseable by the reference's fscanf format."""
    bf = BigFile(str(tmp_path / "f"), create=True)
    data = np.ones(7, dtype=np.int64)
    bf.create_block("ID", data, Nfile=2)
    text = open(tmp_path / "f" / "ID" / "header").read()
    lines = text.strip().split("\n")
    assert lines[0] == "DTYPE: <i8"
    assert lines[1] == "NMEMB: 1"
    assert lines[2] == "NFILE: 2"
    assert lines[3].startswith("000000: 3 : ")
    assert lines[4].startswith("000001: 4 : ")
    # checksum: each row is int64(1) = bytes 01 00.. -> sum = n rows
    assert lines[3] == "000000: 3 : 3 : 3"


def test_complex_field_roundtrip(tmp_path):
    import jax
    pm = PM(8, 16.0)
    rng = np.random.RandomState(0)
    dk = (rng.normal(size=pm.kshape) + 1j * rng.normal(size=pm.kshape)
          ).astype(np.complex64)
    write_complex(pm, dk, str(tmp_path / "IC"), "WhiteNoiseK")
    back = read_complex(pm, str(tmp_path / "IC"), "WhiteNoiseK")
    np.testing.assert_array_equal(back, dk)
    bf = BigFile(str(tmp_path / "IC"))
    attrs = bf.open_block("WhiteNoiseK").attrs
    assert attrs.get("Nmesh") == 8
    np.testing.assert_array_equal(attrs.get("ndarray.shape"), [8, 8, 5])


SMALL_LUA = """
nc = 16
boxsize = 64.0
time_step = linspace(0.2, 1, 3)
output_redshifts = {1.0, 0.0}
Omega_m = 0.307494
h = 0.6774
read_powerspectrum = "/root/repo/tests/fixtures/powerspec.txt"
random_seed = 100
force_mode = "fastpm"
growth_mode = "LCDM"
pm_nc_factor = 1
np_alloc_factor = 2.0
write_snapshot = "%(out)s/fastpm"
write_powerspectrum = "%(out)s/powerspec"
write_whitenoisek = "%(out)s/IC"
"""


@pytest.mark.slow
def test_cli_end_to_end(tmp_path):
    p = load_params_from_string(SMALL_LUA % dict(out=tmp_path))
    log = Log(echo=False)
    solver = run_fastpm(p, log)

    # power spectrum files per force step (3 timesteps -> 3 forces)
    ps_files = sorted(os.listdir(tmp_path))
    assert any(f.startswith("powerspec_") for f in ps_files)

    # snapshots at z=1 and z=0
    for a in ("0.5000", "1.0000"):
        path = str(tmp_path / f"fastpm_{a}")
        hdr = read_snapshot_header(path)
        assert hdr["NC"] == 16
        assert hdr["BoxSize"] == 64.0
        assert abs(hdr["ScalingFactor"] - float(a)) < 1e-6
        assert "ParamFile" in read_snapshot_header(path)
        data = read_species(path, "1")
        assert data["x"].shape == (16 ** 3, 3)
        assert data["v"].shape == (16 ** 3, 3)
        assert data["id"].shape[0] == 16 ** 3
        # sorted by id
        assert np.all(np.diff(data["id"][:, 0] if data["id"].ndim > 1
                              else data["id"]) > 0)
        # metadata restores the store state
        assert data["_attrs"]["a.x"] == pytest.approx(float(a))
        assert data["_attrs"]["M0"] > 0

    # snapshot velocity is peculiar km/s: at z=0, v = 100 * internal
    data = read_species(str(tmp_path / "fastpm_1.0000"), "1")
    v = data["v"]
    assert np.abs(v).max() < 3000  # sane km/s range

    # white noise file written and re-readable
    pm = solver.lptpm
    wn = read_complex(pm, str(tmp_path / "IC"), "WhiteNoiseK")
    assert wn.shape == pm.kshape


def test_snapshot_writer_direct(tmp_path):
    from fastpm_tpu.store import lattice_store
    pm = PM(8, 16.0)
    p = lattice_store(pm, columns=("v", "id", "rand"))
    rsd = write_snapshot(str(tmp_path / "snap"), COSMO,
                         {"cdm": p.replace(a_x=2.0 / 3, a_v=2.0 / 3, M0=5.0)},
                         nc=8, boxsize=16.0, param_text="nc = 8")
    # golden RSD factor at z=0.5 (run-test-nbodykit.sh:13)
    assert rsd == pytest.approx(1.140331e-02, rel=1e-6)
    hdr = read_snapshot_header(str(tmp_path / "snap"))
    assert hdr["ParamFile"] == "nc = 8"
    np.testing.assert_allclose(hdr["MassTable"], [0, 5.0, 0, 0, 0, 0])


def test_auto_nfile_and_chunked_checksum(tmp_path):
    """Nfile=None applies the reference fan-out rule (io.c:473-479) and
    the chunked writer's checksum equals the whole-buffer SysV sum."""
    from fastpm_tpu.io import bigfile as bfm

    assert bfm.auto_nfile(1) == 1
    assert bfm.auto_nfile(bfm.ITEMS_PER_FILE) == 1
    assert bfm.auto_nfile(bfm.ITEMS_PER_FILE + 1) == 2
    assert bfm.auto_nfile(5 * bfm.ITEMS_PER_FILE) == 5

    old = bfm.CHUNK_ROWS
    bfm.CHUNK_ROWS = 7  # force many chunks
    try:
        bf = bfm.BigFile(str(tmp_path / "bf"), create=True)
        data = np.arange(1000, dtype=np.float32).reshape(-1, 2)
        blk = bf.create_block("X", data, Nfile=3)
        assert blk.Nfile == 3
        whole = data.astype("<f4").tobytes()
        # per-file checksum == unchunked _sysv_sum of that file's slice
        start = 0
        for i, n in enumerate(blk.fsize):
            raw = data[start:start + n].astype("<f4").tobytes()
            assert blk._checksums[i] == bfm._sysv_sum(raw)
            start += n
        back = bf.open_block("X").read_all()
        assert np.array_equal(back, data)
    finally:
        bfm.CHUNK_ROWS = old


def test_halo_catalog_written_length_sorted(tmp_path):
    """Halo catalogs go to disk sorted by DESCENDING Length
    (fastpm_sort_snapshot + FastPMSnapshotSortByLength, io.c:90-108,
    src/fastpm.c:1495), ties broken ascending by MinID; every column
    rides the same permutation."""
    import jax.numpy as jnp
    from fastpm_tpu.fof import find_halos
    from fastpm_tpu.io.snapshots import write_halo_catalog
    from fastpm_tpu.store import Store

    rng = np.random.RandomState(0)
    L = 100.0
    # three clusters with lengths 30 / 50 / 40, scattered so the
    # finder's native (minid) order differs from the Length order
    pos = np.concatenate([
        10 + 0.1 * rng.standard_normal((30, 3)),
        50 + 0.1 * rng.standard_normal((50, 3)),
        80 + 0.1 * rng.standard_normal((40, 3))])
    st = Store(x=jnp.asarray(pos, jnp.float32),
               v=jnp.zeros((len(pos), 3), jnp.float32),
               id=jnp.arange(len(pos), dtype=jnp.uint32), M0=1.0)
    cat, _ = find_halos(st, 1.0, L, nmin=20)
    assert cat.nhalo == 3

    c = Cosmology(h=0.7, Omega_m=0.3, T_cmb=0.0, growth_mode="lcdm")
    path = str(tmp_path / "halos")
    write_halo_catalog(path, "LL-0.200", cat, c, 1.0, 32, L)

    bf = BigFile(path)
    length = bf.open_block("LL-0.200/Length").read_all()
    minid = bf.open_block("LL-0.200/MinID").read_all()
    x = bf.open_block("LL-0.200/Position").read_all().reshape(-1, 3)
    np.testing.assert_array_equal(length, [50, 40, 30])
    # the permutation moved whole rows: each written (Length, MinID,
    # Position) row matches the in-memory catalog at the same MinID
    for i in range(3):
        j = int(np.where(np.asarray(cat.minid) == minid[i])[0][0])
        assert length[i] == int(cat.length[j])
        np.testing.assert_allclose(x[i], np.asarray(cat.x[j]),
                                   rtol=1e-6)
