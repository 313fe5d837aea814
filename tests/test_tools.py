"""Offline tool equivalents of the reference's python/ scripts."""

import numpy as np
import pytest

from fastpm_tpu.tools import eisenstein_hu_pk, main_pklin
from fastpm_tpu.powerspectrum import FuncK, sigma_tophat


def test_eisenstein_hu_close_to_class():
    """EH98 with wiggles tracks the CLASS-generated reference table to
    a few percent over the BAO range once sigma8-matched."""
    ref = np.loadtxt("/root/repo/tests/fixtures/powerspec.txt")
    k = np.logspace(-3, 2, 4000)
    p = eisenstein_hu_pk(k)
    s8 = sigma_tophat(FuncK(k, p), 8.0)
    s8_ref = sigma_tophat(FuncK(ref[:, 0], ref[:, 1]), 8.0)
    p *= (s8_ref / s8) ** 2
    sel = (ref[:, 0] > 1e-2) & (ref[:, 0] < 1.0)
    pe = np.interp(ref[sel, 0], k, p)
    ratio = pe / ref[sel, 1]
    assert ratio.min() > 0.95 and ratio.max() < 1.06


def test_main_pklin(tmp_path, capsys):
    out = tmp_path / "pk.txt"
    main_pklin([str(out), "--sigma8", "0.8"])
    tab = np.loadtxt(out)
    assert tab.shape == (10000, 2)
    s8 = sigma_tophat(FuncK(tab[:, 0], tab[:, 1]), 8.0)
    assert abs(s8 - 0.8) < 1e-6


def test_gadget1_roundtrip(tmp_path):
    """main_gadget1 writes valid F77-record files (convert-to-gadget-1)."""
    import jax.numpy as jnp
    from fastpm_tpu.mesh import PM
    from fastpm_tpu.store import lattice_store
    from fastpm_tpu.cosmology import Cosmology
    from fastpm_tpu.io.snapshots import write_snapshot
    from fastpm_tpu.tools import main_gadget1

    pm = PM(8, 32.0)
    p = lattice_store(pm, columns=("v", "id"))
    p = p.replace(v=jnp.zeros_like(p.x), a_x=1.0, a_v=1.0, M0=1.0)
    c = Cosmology(h=0.7, Omega_m=0.3, growth_mode="lcdm")
    snap = str(tmp_path / "snap_1.0000")
    write_snapshot(snap, c, {"cdm": p}, 8, 32.0)
    main_gadget1([snap, str(tmp_path / "g1/out"), "--nperfile", "200"])

    import glob
    files = sorted(glob.glob(str(tmp_path / "g1/out.*")))
    assert len(files) == 8 ** 3 // 200  # 2 files
    total = 0
    for fn in files:
        with open(fn, "rb") as f:
            n = np.fromfile(f, "i4", 1)[0]
            assert n == 256
            hdr = f.read(256)
            n2 = np.fromfile(f, "i4", 1)[0]
            assert n2 == 256
            npart = np.frombuffer(hdr[:24], "u4")[1]
            nb = np.fromfile(f, "i4", 1)[0]
            pos = np.fromfile(f, "f4", nb // 4).reshape(-1, 3)
            assert np.fromfile(f, "i4", 1)[0] == nb
            assert len(pos) == npart
            total += npart
    assert total == 8 ** 3


def test_dump_roundtrip(tmp_path):
    """fastpm_utils_dump layout (padded real, geometry sidecar) and the
    DumpFile reader (python/fastpm.py)."""
    import jax.numpy as jnp
    from fastpm_tpu.mesh import PM
    from fastpm_tpu.dump import dump_field, load_field, DumpFile

    pm = PM(16, 64.0)
    rng = np.random.default_rng(0)
    r = rng.standard_normal((16, 16, 16)).astype(np.float32)
    fn = str(tmp_path / "field")
    dump_field(pm, fn, r)
    assert np.array_equal(load_field(pm, fn), r)
    assert np.allclose(DumpFile(fn).as_real(), r)
    dk = np.asarray(jnp.fft.rfftn(jnp.asarray(r))).astype(np.complex64)
    dump_field(pm, fn + "k", dk)
    assert np.array_equal(load_field(pm, fn + "k", "complex"), dk)
    assert np.allclose(DumpFile(fn + "k").as_complex(), dk)
    # the raw file is in the FFTW padded layout: nx*ny*2*(nz/2+1) floats
    import os
    assert os.path.getsize(fn) == 16 * 16 * 2 * 9 * 4
