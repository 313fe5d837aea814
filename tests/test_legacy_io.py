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
