"""Restart-from-snapshot equivalence (reference: tests/restart.lua +
run-test-restart.sh): a stop+restart run must match a straight-through
run."""

import numpy as np
import pytest

from fastpm_tpu.config.params import load_params_from_string
from fastpm_tpu.cli import run_fastpm, _prepare_time_step
from fastpm_tpu.diagnostics import Log


BASE = """
nc = 16
boxsize = 64.0
time_step = linspace(0.2, 1, 5)
-- aout = 0.6 coincides with a timestep: restart there is exact
-- (an interpolated aout cannot restart bit-identically; the reference's
-- restart.lua also uses aligned outputs)
aout = {0.6, 1.0}
Omega_m = 0.307494
h = 0.6774
read_powerspectrum = "/root/repo/tests/fixtures/powerspec.txt"
random_seed = 100
force_mode = "fastpm"
growth_mode = "LCDM"
pm_nc_factor = 1
np_alloc_factor = 2.0
write_snapshot = "%(out)s/fastpm"
"""


def test_prepare_time_step():
    ts = [0.1, 0.4, 0.7, 1.0]
    assert _prepare_time_step(ts, 0.4) == [0.4, 0.7, 1.0]
    assert _prepare_time_step(ts, 0.5) == [0.5, 0.7, 1.0]
    assert _prepare_time_step(ts, 0.1) == [0.1, 0.4, 0.7, 1.0]


@pytest.mark.slow
def test_restart_equivalence(tmp_path):
    out1 = tmp_path / "straight"
    out2 = tmp_path / "restarted"
    p1 = load_params_from_string(BASE % dict(out=out1))
    run_fastpm(p1, Log(echo=False))

    p2 = load_params_from_string(BASE % dict(out=out2))
    run_fastpm(p2, Log(echo=False),
               restart=str(out1 / "fastpm_0.6000"))

    from fastpm_tpu.io.snapshots import read_species
    a = read_species(str(out1 / "fastpm_1.0000"), "1")
    b = read_species(str(out2 / "fastpm_1.0000"), "1")
    np.testing.assert_array_equal(a["id"], b["id"])
    # restart loses only float32 roundoff in the km/s <-> internal
    # velocity conversion; positions must agree to that level
    np.testing.assert_allclose(a["x"], b["x"], atol=2e-3)
    np.testing.assert_allclose(a["v"], b["v"], atol=2e-1)
    # the restart must not rewrite the a=0.6 snapshot
    assert not (out2 / "fastpm_0.6000").exists()
