"""End-to-end ncdm (massive neutrino particles) CLI run -- the analog
of the reference's tests/ncdm.lua CI run (no golden numbers are pinned
upstream; this exercises the Fermi-Dirac shell split, REPS dual-P(k)
ICs with scale-dependent growth, the multi-species SPMD force, and the
snapshot with both species end-to-end)."""

import os

import numpy as np
import pytest

from fastpm_tpu.config.params import load_params
from fastpm_tpu.diagnostics import Log
from fastpm_tpu.io.bigfile import BigFile


@pytest.mark.slow
def test_ncdm_end_to_end(tmp_path):
    src = open(os.path.join(os.path.dirname(__file__), "fixtures",
                            "ncdm.lua")).read()
    outdir = str(tmp_path / "out")
    conf = tmp_path / "ncdm.lua"
    conf.write_text(src.replace("OUTDIR", outdir))

    from fastpm_tpu import cli
    p = load_params(str(conf))
    log = Log(echo=False)
    cli.run_fastpm(p, log=log)

    snap = os.path.join(outdir, "fastpm_1.0000")
    bf = BigFile(snap)
    # CDM species
    x1 = bf.open_block("1/Position").read_all()
    assert len(x1) == 16 ** 3
    assert np.isfinite(x1).all()
    # ncdm species: (nc/every)^3 sites x n_shell x n_fib directions,
    # fibonacci sphere has 2*n_side^2... per thermalvelocity.c the
    # fibonacci count is n_side itself per shell split convention --
    # just require a nonzero multiple of the site count
    nsites = (16 // 4) ** 3
    x2 = bf.open_block("2/Position").read_all()
    assert len(x2) > 0 and len(x2) % nsites == 0
    assert np.isfinite(x2).all()
    m2 = bf.open_block("2/Mass").read_all()
    assert (m2 > 0).all()
    # neutrinos are much lighter than CDM particles
    hdr = bf.open_block("Header")
    mt = np.asarray(hdr.attrs.get("MassTable"))
    assert mt[2] == 0 or mt[2] < mt[1]  # per-particle masses vary
