import struct

import numpy as np
import pytest

from fastpm_tpu.io.legacy import (write_runpb_snapshot, read_runpb_snapshot,
                                  read_grafic_gaussian)


def test_runpb_roundtrip(tmp_path):
    rng = np.random.RandomState(0)
    n = 1000
    box = 100.0
    x = rng.uniform(0, box, (n, 3))
    v = rng.standard_normal((n, 3))
    ids = np.arange(n, dtype=np.int64)
    path = str(tmp_path / "tpm")
    write_runpb_snapshot(path, x, v, ids, aa=0.5, E=1.8, boxsize=box,
                         Nfile=3)
    back = read_runpb_snapshot(path)
    assert back["aa"] == pytest.approx(0.5)
    np.testing.assert_array_equal(back["id"], ids)
    # positions stored in box units
    np.testing.assert_allclose(back["x"] * box, x, atol=1e-4 * box)
    # velocity roundtrip: v_file = v * RSD * 100 / box
    RSD = 1.0 / (0.5 * 1.8 * 100.0)
    np.testing.assert_allclose(back["v"] * box / (RSD * 100.0), v,
                               atol=1e-4)


def test_grafic_reader(tmp_path):
    n0, n1, n2 = 4, 6, 8
    rng = np.random.RandomState(1)
    data = rng.standard_normal((n0, n1, n2)).astype("<f4")
    fn = tmp_path / "noise"
    with open(fn, "wb") as fp:
        fp.write(struct.pack("<i", 16))
        fp.write(struct.pack("<iii", n2, n1, n0))  # file dims reversed
        fp.write(struct.pack("<i", 42))
        fp.write(struct.pack("<i", 16))
        for plane in data:
            rec = plane.tobytes()
            fp.write(struct.pack("<i", len(rec)))
            fp.write(rec)
            fp.write(struct.pack("<i", len(rec)))
    out = read_grafic_gaussian((n0, n1, n2), str(fn))
    np.testing.assert_array_equal(out, data)
    with pytest.raises(ValueError):
        read_grafic_gaussian((8, 6, 4), str(fn))


def test_runpbic_roundtrip(tmp_path):
    """prepare_runpbic inverts the RunPB (x, v) pair back into the
    2LPT displacements (read_runpb_ic, src/runpb.c:225-299)."""
    import jax.numpy as jnp
    from fastpm_tpu.cosmology import Cosmology
    from fastpm_tpu.powerspectrum import FuncK
    from fastpm_tpu.solver import Solver, SolverConfig
    from fastpm_tpu import ic
    from fastpm_tpu.io.legacy import write_runpb_snapshot
    from fastpm_tpu.cli import prepare_runpbic
    from fastpm_tpu.diagnostics import Log

    c = Cosmology(h=0.6774, Omega_m=0.307494, growth_mode="lcdm")
    pk = FuncK.from_file("/root/repo/tests/fixtures/powerspec.txt")
    nc, box, aa = 16, 64.0, 0.1

    # cola keeps the dx1/dx2 columns on the store for comparison
    cfg = SolverConfig(nc=nc, boxsize=box, time_step=[aa, 1.0],
                       force_mode="cola", pm_nc_factor=1,
                       use_shift=True)
    s = Solver(cfg, c)
    dk, _ = ic.linear_field(s.lptpm, c, pk, seed=13, aout=1.0)
    s.setup_lpt(dk, aa)
    p = s.species["cdm"]
    dx1_ref = np.asarray(p.dx1)
    dx2_ref = np.asarray(p.dx2)

    # write a RunPB IC equivalent to this 2LPT field
    gi = c.growth_info(aa)
    D = gi.D1
    omega = c.Omega_cdm_a(aa)
    f1, f2 = omega ** (4 / 7), omega ** (6 / 11)
    ids = np.asarray(p.id).astype(np.int64)
    strides = np.array([nc * nc, nc, 1], dtype=np.int64)
    lattice = np.stack([(ids // strides[d]) % nc for d in range(3)],
                       axis=-1)
    opos = lattice / nc + 0.5 / nc
    xbox = opos + (D * dx1_ref + D * D * dx2_ref) / box
    vrsd = (f1 * D * dx1_ref + 2 * f2 * D * D * dx2_ref) / box
    _write_runpb_raw(str(tmp_path / "ic"), xbox, vrsd, ids, aa)

    s2 = Solver(cfg, c)
    prepare_runpbic(s2, str(tmp_path / "ic"), aa, Log(echo=False))
    np.testing.assert_allclose(np.asarray(s2.species["cdm"].dx1),
                               dx1_ref, atol=2e-4)
    np.testing.assert_allclose(np.asarray(s2.species["cdm"].dx2),
                               dx2_ref, atol=2e-3)
    # evolved positions agree with the direct 2LPT setup
    np.testing.assert_allclose(np.asarray(s2.species["cdm"].x),
                               np.asarray(p.x), atol=2e-3)


def _write_runpb_raw(path, xbox, vrsd, ids, aa):
    """Minimal RunPB writer in file (box-unit) conventions."""
    import struct
    hdr = struct.Struct("<iiiff")
    n = len(ids)
    with open(path + ".00", "wb") as f:
        f.write(struct.pack("<ii", 1, hdr.size))
        f.write(hdr.pack(n, 0, 0, aa, 0.0))
        np.remainder(xbox, 1.0).astype("<f4").tofile(f)
        np.asarray(vrsd, dtype="<f4").tofile(f)
        np.asarray(ids, dtype="<i8").tofile(f)
